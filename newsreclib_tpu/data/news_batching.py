"""News-level batching for aspect (A-module) training.

Reference analog: ``newsreclib/data/components/news_dataset.py`` +
``MPerClassSampler`` from pytorch-metric-learning used by
``mind_news_datamodule.py:327-332``: every batch contains m samples from
each of batch_size/m randomly chosen classes — the sampling pattern SupCon
needs to always have positives.
"""

from __future__ import annotations

from typing import Iterator, Optional

import numpy as np

from newsreclib_tpu.data.batch import NewsBatch
from newsreclib_tpu.data.news_store import NewsStore


class MPerClassNewsBatcher:
    """Yields NewsBatch with m samples per class.

    aspect: "category" | "sentiment" — the label field of the store.
    """

    def __init__(
        self,
        store: NewsStore,
        aspect: str = "category",
        batch_size: int = 64,
        m_per_class: int = 4,
        seed: int = 0,
        rows: Optional[np.ndarray] = None,
    ):
        assert batch_size % m_per_class == 0
        self.store = store
        self.aspect = aspect
        self.batch_size = batch_size
        self.m = m_per_class
        self.seed = seed
        labels_all = getattr(store, aspect)
        rows = (
            np.arange(1, store.title.shape[0], dtype=np.int32) if rows is None else rows
        )
        labels = labels_all[rows]
        keep = labels > 0
        self.rows = rows[keep]
        self.labels = labels[keep]
        self.classes = np.unique(self.labels)
        self.by_class = {c: self.rows[self.labels == c] for c in self.classes}

    def __len__(self) -> int:
        return max(1, len(self.rows) // self.batch_size)

    def epoch(self, epoch_idx: int = 0) -> Iterator[NewsBatch]:
        rng = np.random.default_rng((self.seed, epoch_idx))
        classes_per_batch = self.batch_size // self.m
        for _ in range(len(self)):
            cls = rng.choice(
                self.classes,
                size=classes_per_batch,
                replace=len(self.classes) < classes_per_batch,
            )
            rows = np.concatenate(
                [
                    rng.choice(self.by_class[c], size=self.m, replace=len(self.by_class[c]) < self.m)
                    for c in cls
                ]
            ).astype(np.int32)
            news = self.store.features_for(rows)
            labels = getattr(self.store, self.aspect)[rows].astype(np.int32)
            yield NewsBatch(news=news, labels=labels, valid=rows != 0)
