"""Dense tokenized news store.

The reference stores parsed news as a pandas DataFrame of Python lists and
re-tokenizes/pads inside the collate function per batch
(``rec_dataset.py:148-183``).  Here news features are fixed-shape int32
numpy arrays built ONCE (row 0 = padding article); batching is pure array
gathering.  Persisted as a compressed ``.npz`` + nid index.
"""

from __future__ import annotations

import json
import os
from dataclasses import dataclass, field
from typing import Dict, List, Optional, Sequence

import numpy as np

from newsreclib_tpu.data.batch import NewsFeatures


@dataclass
class NewsStore:
    nid2row: Dict[str, int]  # news id → row (1-based; 0 is padding)
    title: np.ndarray  # (N+1, Lt) int32
    abstract: Optional[np.ndarray] = None  # (N+1, La)
    category: Optional[np.ndarray] = None  # (N+1,)
    subcategory: Optional[np.ndarray] = None
    sentiment: Optional[np.ndarray] = None
    sentiment_score: Optional[np.ndarray] = None
    title_entities: Optional[np.ndarray] = None  # (N+1, Le)
    abstract_entities: Optional[np.ndarray] = None

    @property
    def num_news(self) -> int:
        return self.title.shape[0] - 1

    def rows(self, nids: Sequence[str]) -> np.ndarray:
        return np.asarray([self.nid2row.get(n, 0) for n in nids], dtype=np.int32)

    def features_for(self, rows: np.ndarray) -> NewsFeatures:
        """Gather a NewsFeatures table for the given row ids."""

        def take(arr):
            return None if arr is None else arr[rows]

        title = self.title[rows]
        return NewsFeatures(
            title=title,
            title_mask=title != 0,
            abstract=take(self.abstract),
            abstract_mask=None if self.abstract is None else self.abstract[rows] != 0,
            category=take(self.category),
            subcategory=take(self.subcategory),
            sentiment=take(self.sentiment),
            sentiment_score=take(self.sentiment_score),
            title_entities=take(self.title_entities),
            title_entities_mask=(
                None if self.title_entities is None else self.title_entities[rows] != 0
            ),
            abstract_entities=take(self.abstract_entities),
            abstract_entities_mask=(
                None
                if self.abstract_entities is None
                else self.abstract_entities[rows] != 0
            ),
        )

    def trim_titles(self, margin: int = 0, multiple: int = 8) -> "NewsStore":
        """Slice the title/abstract matrices to the corpus max token length
        rounded up to ``multiple`` (plus ``margin`` columns of headroom for
        VALID-conv encoders — ``DKN.TITLE_SPLIT_MARGIN``).

        The reference pads every title to the configured ``max_title_len``
        (``rec_dataset.py:170-178``); when the corpus max is shorter (e.g.
        the statfix fixture's 14-token titles vs the canonical 30), every
        encoder pays for pure padding.  Trimming is numerically exact:
        padding-token embeddings are hard zeros (``components/embedding.py``)
        and masked attention / SAME-padded convs ignore trailing pad columns.
        """

        def width(arr, extra):
            lens = (arr != 0).sum(axis=1)
            need = (int(lens.max()) if arr.shape[0] else 0) + extra
            w = max(multiple, -(-need // multiple) * multiple)
            return min(w, arr.shape[1])

        t_w = width(self.title, margin)
        a_w = None if self.abstract is None else width(self.abstract, 0)
        if t_w == self.title.shape[1] and (a_w is None or a_w == self.abstract.shape[1]):
            return self
        from dataclasses import replace

        return replace(
            self,
            title=self.title[:, :t_w],
            abstract=None if self.abstract is None else self.abstract[:, :a_w],
        )

    def save(self, path: str) -> None:
        os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
        arrays = {
            k: v
            for k, v in self.__dict__.items()
            if isinstance(v, np.ndarray)
        }
        np.savez_compressed(path, **arrays)
        with open(path + ".nids.json", "w") as f:
            json.dump(self.nid2row, f)

    @classmethod
    def load(cls, path: str) -> "NewsStore":
        data = dict(np.load(path if path.endswith(".npz") else path + ".npz"))
        with open((path if path.endswith(".npz") else path + ".npz") + ".nids.json") as f:
            nid2row = json.load(f)
        return cls(nid2row=nid2row, **data)


def pad_token_lists(lists: List[List[int]], max_len: int) -> np.ndarray:
    out = np.zeros((len(lists), max_len), dtype=np.int32)
    for i, toks in enumerate(lists):
        n = min(len(toks), max_len)
        out[i, :n] = toks[:n]
    return out


def build_news_store(
    nids: List[str],
    tokenized_titles: List[List[int]],
    max_title_len: int,
    tokenized_abstracts: Optional[List[List[int]]] = None,
    max_abstract_len: int = 50,
    categories: Optional[List[int]] = None,
    subcategories: Optional[List[int]] = None,
    sentiments: Optional[List[int]] = None,
    sentiment_scores: Optional[List[float]] = None,
    title_entities: Optional[List[List[int]]] = None,
    abstract_entities: Optional[List[List[int]]] = None,
    max_entities: int = 10,
) -> NewsStore:
    """Assemble a NewsStore with a zero padding row at index 0."""
    n = len(nids)
    nid2row = {nid: i + 1 for i, nid in enumerate(nids)}

    def with_pad_row(arr):
        pad = np.zeros((1,) + arr.shape[1:], dtype=arr.dtype)
        return np.concatenate([pad, arr], axis=0)

    def vec(values, dtype):
        return None if values is None else with_pad_row(np.asarray(values, dtype=dtype))

    store = NewsStore(
        nid2row=nid2row,
        title=with_pad_row(pad_token_lists(tokenized_titles, max_title_len)),
        abstract=(
            None
            if tokenized_abstracts is None
            else with_pad_row(pad_token_lists(tokenized_abstracts, max_abstract_len))
        ),
        category=vec(categories, np.int32),
        subcategory=vec(subcategories, np.int32),
        sentiment=vec(sentiments, np.int32),
        sentiment_score=vec(sentiment_scores, np.float32),
        title_entities=(
            None
            if title_entities is None
            else with_pad_row(pad_token_lists(title_entities, max_entities))
        ),
        abstract_entities=(
            None
            if abstract_entities is None
            else with_pad_row(pad_token_lists(abstract_entities, max_entities))
        ),
    )
    return store
