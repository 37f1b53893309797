"""MIND dataset ETL.

Reference analog: ``newsreclib/data/components/mind_dataframe.py:23-662``.
The artifact contract is preserved so caches are verifiable against the
reference (same filenames and TSV layouts):

  * ``<split>/news.tsv`` + ``<split>/behaviors.tsv``  — raw inputs
  * ``MIND<size>_train/word2index.tsv, entity2index.tsv, categ2index.tsv,
    subcateg2index.tsv, sentiment2index.tsv, uid2index.tsv`` — vocab maps
    built on the TRAIN split, loaded by dev/test
  * ``<split>/parsed_news.tsv`` — parsed news table
  * ``<split>/{train_,val_,}parsed_behaviors.tsv`` — parsed behaviors
  * ``<split>/transformed_word_embeddings.npy`` (+ categ/entity) — embedding
    matrices row-indexed by the vocab maps

On top of that contract this implementation adds a dense binary cache
(``news_store.npz`` + CSR behavior arrays) so training never parses TSVs or
literal-evals Python lists in the hot path.

Behavior semantics mirrored (file:line cites in methods): empty-history drop,
time-based train/val split at ``valid_time_split``, uid2index built on train
only, entity filtering by frequency x confidence thresholds, GloVe matrix
with random-normal OOV rows.
"""

from __future__ import annotations

import ast
import os
from dataclasses import dataclass, field
from typing import Dict, List, Optional, Sequence, Tuple

import numpy as np
import pandas as pd

from newsreclib_tpu.data import download as dl
from newsreclib_tpu.data.batching import Impressions
from newsreclib_tpu.data.embeddings import (
    build_embedding_matrix,
    build_entity_embedding_matrix,
)
from newsreclib_tpu.data.news_store import NewsStore, build_news_store
from newsreclib_tpu.data.sentiment import SentimentAnnotator, get_annotator
from newsreclib_tpu.data.tokenize import (
    build_index_map,
    build_vocab,
    tokens_to_ids,
    word_tokenize,
)

MIND_URLS = {
    # official MIND blob storage (reference mind_dataframe.py:137-149)
    "small": {
        "train": "https://mind201910small.blob.core.windows.net/release/MINDsmall_train.zip",
        "dev": "https://mind201910small.blob.core.windows.net/release/MINDsmall_dev.zip",
    },
    "large": {
        "train": "https://mind201910small.blob.core.windows.net/release/MINDlarge_train.zip",
        "dev": "https://mind201910small.blob.core.windows.net/release/MINDlarge_dev.zip",
        "test": "https://mind201910small.blob.core.windows.net/release/MINDlarge_test.zip",
    },
}

ID2INDEX_FILENAMES = {
    "word2index": "word2index.tsv",
    "entity2index": "entity2index.tsv",
    "categ2index": "categ2index.tsv",
    "subcateg2index": "subcateg2index.tsv",
    "sentiment2index": "sentiment2index.tsv",
    "uid2index": "uid2index.tsv",
}


def _to_tsv(df: pd.DataFrame, fpath: str) -> None:
    os.makedirs(os.path.dirname(fpath) or ".", exist_ok=True)
    df.to_csv(fpath, sep="\t", index=False)


def _load_idx_map(fpath: str) -> Dict[str, int]:
    df = pd.read_table(fpath)
    cols = df.columns.tolist()
    return dict(zip(df[cols[0]].astype(str), df[cols[1]].astype(int)))


@dataclass
class MINDConfig:
    data_dir: str
    dataset_size: str = "small"  # small | large
    valid_time_split: str = "2019-11-14 00:00:00"
    max_title_len: int = 30
    max_abstract_len: int = 50
    max_entities: int = 10
    entity_freq_threshold: int = 2
    entity_confidence_threshold: float = 0.5
    word_embeddings_fpath: Optional[str] = None  # glove.840B.300d.txt
    word_embed_dim: int = 300
    entity_embed_dim: int = 100
    categ_embed_dim: int = 300
    use_pretrained_categ_embeddings: bool = False
    sentiment_annotator: str = "lexicon"  # lexicon | vader | bert
    sentiment_annotator_kwargs: dict = field(default_factory=dict)
    download: bool = False
    seed: int = 0
    # PLM mode (reference use_plm: tokenize with a HF tokenizer instead of
    # the word-level vocab; mind_rec_datamodule.py:149-160)
    use_plm: bool = False
    plm_tokenizer: Optional[str] = None  # HF name or local path
    tokenizer_max_len: int = 96


class MINDData:
    """One split of MIND ('train' or 'dev'), with train/val sub-splitting.

    ``split('train')``/``split('val')`` apply the time-based sub-split of the
    raw train set (``mind_dataframe.py:558-582``); ``split('test')`` is the
    raw dev set (the reference's convention).
    """

    def __init__(self, cfg: MINDConfig, annotator: Optional[SentimentAnnotator] = None):
        self.cfg = cfg
        self.annotator = annotator or get_annotator(
            cfg.sentiment_annotator, **cfg.sentiment_annotator_kwargs
        )
        self._stores: Dict[str, NewsStore] = {}

    # ---------- paths ----------

    def split_dir(self, raw_split: str) -> str:
        return os.path.join(
            self.cfg.data_dir, f"MIND{self.cfg.dataset_size}_{raw_split}"
        )

    def map_path(self, name: str) -> str:
        return os.path.join(self.split_dir("train"), ID2INDEX_FILENAMES[name])

    # ---------- download ----------

    def prepare_raw(self, raw_split: str) -> str:
        """Ensure raw news.tsv/behaviors.tsv exist (download+extract if
        allowed)."""
        d = self.split_dir(raw_split)
        news_f = os.path.join(d, "news.tsv")
        if os.path.exists(news_f):
            return d
        if not self.cfg.download:
            raise FileNotFoundError(
                f"{news_f} missing and download disabled (offline?)"
            )
        url = MIND_URLS[self.cfg.dataset_size][raw_split]
        archive = dl.maybe_download(url, os.path.join(self.cfg.data_dir, os.path.basename(url)))
        dl.extract(archive, d)
        return d

    # ---------- news ----------

    def load_news(self, raw_split: str) -> pd.DataFrame:
        """Parse (or load cached) news for a raw split; builds vocab maps on
        the train split (``mind_dataframe.py:200-499``)."""
        d = self.split_dir(raw_split)
        parsed = os.path.join(d, "parsed_news.tsv")
        if os.path.exists(parsed):
            conv = {
                c: ast.literal_eval
                for c in ["tokenized_title", "tokenized_abstract", "title_entities", "abstract_entities"]
            }
            news = pd.read_table(parsed, converters=conv)
            news["abstract"] = news["abstract"].fillna("")
            return news

        self.prepare_raw(raw_split)
        cols = [
            "nid", "category", "subcategory", "title", "abstract", "url",
            "title_entities", "abstract_entities",
        ]
        news = pd.read_table(
            os.path.join(d, "news.tsv"), header=None, names=cols, usecols=range(len(cols))
        ).drop(columns=["url"])
        news["abstract"] = news["abstract"].fillna("")
        news["title_entities"] = news["title_entities"].fillna("[]")
        news["abstract_entities"] = news["abstract_entities"].fillna("[]")

        # sentiment annotation (batched)
        results = self.annotator.annotate_many(news["title"].tolist())
        news["sentiment_label"], news["sentiment_score"] = zip(*results)

        tok_titles = [word_tokenize(t) for t in news["title"]]
        tok_abstracts = [word_tokenize(t) for t in news["abstract"]]

        if raw_split == "train":
            word2index = build_vocab(
                [t for pair in zip(tok_titles, tok_abstracts) for t in pair]
            )
            _to_tsv(
                pd.DataFrame(word2index.items(), columns=["word", "index"]),
                self.map_path("word2index"),
            )
            entity2index = self._build_entity_map(news)
            categ2index = build_index_map(news["category"])
            subcateg2index = build_index_map(news["subcategory"])
            sentiment2index = build_index_map(news["sentiment_label"])
            _to_tsv(pd.DataFrame(entity2index.items(), columns=["entity", "index"]), self.map_path("entity2index"))
            _to_tsv(pd.DataFrame(categ2index.items(), columns=["category", "index"]), self.map_path("categ2index"))
            _to_tsv(pd.DataFrame(subcateg2index.items(), columns=["subcategory", "index"]), self.map_path("subcateg2index"))
            _to_tsv(pd.DataFrame(sentiment2index.items(), columns=["sentiment", "index"]), self.map_path("sentiment2index"))
        else:
            if not os.path.exists(self.map_path("word2index")):
                self.load_news("train")  # dev/test depend on train-built maps
            word2index = _load_idx_map(self.map_path("word2index"))
            entity2index = _load_idx_map(self.map_path("entity2index"))
            categ2index = _load_idx_map(self.map_path("categ2index"))
            subcateg2index = _load_idx_map(self.map_path("subcateg2index"))
            sentiment2index = _load_idx_map(self.map_path("sentiment2index"))

        # embedding matrices (train split only; cached as .npy)
        if raw_split == "train" and self.cfg.word_embeddings_fpath:
            build_embedding_matrix(
                word2index,
                self.cfg.word_embeddings_fpath,
                self.cfg.word_embed_dim,
                seed=self.cfg.seed,
                out_fpath=os.path.join(d, "transformed_word_embeddings.npy"),
            )
            if self.cfg.use_pretrained_categ_embeddings:
                build_embedding_matrix(
                    categ2index,
                    self.cfg.word_embeddings_fpath,
                    self.cfg.categ_embed_dim,
                    seed=self.cfg.seed,
                    out_fpath=os.path.join(d, "transformed_categ_embeddings.npy"),
                )
        entity_vec = os.path.join(d, "entity_embedding.vec")
        if raw_split == "train" and os.path.exists(entity_vec):
            build_entity_embedding_matrix(
                entity2index,
                entity_vec,
                self.cfg.entity_embed_dim,
                seed=self.cfg.seed,
                out_fpath=os.path.join(d, "transformed_entity_embeddings.npy"),
            )

        news["tokenized_title"] = [tokens_to_ids(t, word2index) for t in tok_titles]
        news["tokenized_abstract"] = [tokens_to_ids(t, word2index) for t in tok_abstracts]
        news["category_class"] = [categ2index.get(c, 0) for c in news["category"]]
        news["subcategory_class"] = [subcateg2index.get(c, 0) for c in news["subcategory"]]
        news["sentiment_class"] = [sentiment2index.get(c, 0) for c in news["sentiment_label"]]
        news["title_entities"] = [
            self._filter_entities(e, entity2index) for e in news["title_entities"]
        ]
        news["abstract_entities"] = [
            self._filter_entities(e, entity2index) for e in news["abstract_entities"]
        ]
        _to_tsv(news, parsed)
        return news

    def _build_entity_map(self, news: pd.DataFrame) -> Dict[str, int]:
        """Frequency x confidence filtered entity map
        (``mind_dataframe.py:617-638``)."""
        freq: Dict[str, float] = {}
        for col in ("title_entities", "abstract_entities"):
            for row in news[col]:
                for ent in _parse_entities(row):
                    # weighted count: occurrences x confidence
                    # (mind_dataframe._count_entity_freq semantics)
                    times = len(ent.get("OccurrenceOffsets", []) or []) * float(
                        ent.get("Confidence", 0.0)
                    )
                    wid = ent.get("WikidataId")
                    if wid and times > 0:
                        freq[wid] = freq.get(wid, 0.0) + times
        out: Dict[str, int] = {}
        for wid, f in freq.items():
            if f > self.cfg.entity_freq_threshold:
                out[wid] = len(out) + 1
        return out

    def _filter_entities(self, row, entity2index: Dict[str, int]) -> List[int]:
        """Entity json → filtered index list (``mind_dataframe.py:617-638``
        filter semantics: confidence threshold + known entity)."""
        if isinstance(row, list):  # already parsed (cache reload)
            return row
        out = []
        for ent in _parse_entities(row):
            if float(ent.get("Confidence", 0.0)) > self.cfg.entity_confidence_threshold:
                idx = entity2index.get(ent.get("WikidataId"), 0)
                if idx:
                    out.append(idx)
        return out

    # ---------- behaviors ----------

    def load_behaviors(self, split: str) -> pd.DataFrame:
        """split ∈ {train, val, test}; parses/caches behaviors with the
        reference's semantics (``mind_dataframe.py:501-615``)."""
        raw_split = "dev" if split == "test" else "train"
        d = self.split_dir(raw_split)
        prefix = {"train": "train_", "val": "val_", "test": ""}[split]
        parsed = os.path.join(d, prefix + "parsed_behaviors.tsv")
        if os.path.exists(parsed):
            return pd.read_table(
                parsed,
                converters={
                    "history": _parse_str_list,
                    "candidates": _parse_str_list,
                    "labels": lambda x: list(map(int, x.strip("[]").split(", "))) if x.strip("[]") else [],
                },
            )

        self.prepare_raw(raw_split)
        cols = ["impid", "uid", "time", "history", "impressions"]
        bhv = pd.read_table(
            os.path.join(d, "behaviors.tsv"), header=None, names=cols, usecols=range(len(cols))
        )
        bhv["time"] = pd.to_datetime(bhv["time"], format="%m/%d/%Y %I:%M:%S %p")
        bhv["history"] = bhv["history"].fillna("").str.split()
        bhv["impressions"] = bhv["impressions"].str.split()
        bhv["candidates"] = bhv["impressions"].apply(lambda x: [i.split("-")[0] for i in x])
        bhv["labels"] = bhv["impressions"].apply(lambda x: [int(i.split("-")[1]) for i in x])
        bhv = bhv.drop(columns=["impressions"])
        # drop users without history (mind_dataframe.py:549-554)
        bhv = bhv[bhv["history"].apply(len) > 0].reset_index(drop=True)

        if split == "train":
            bhv = bhv.loc[bhv["time"] < pd.Timestamp(self.cfg.valid_time_split)].reset_index(drop=True)
            uid2index: Dict[str, int] = {}
            for uid in bhv["uid"]:
                if uid not in uid2index:
                    uid2index[uid] = len(uid2index) + 1
            _to_tsv(
                pd.DataFrame(uid2index.items(), columns=["uid", "index"]),
                os.path.join(self.split_dir("train"), ID2INDEX_FILENAMES["uid2index"]),
            )
        else:
            if split == "val":
                bhv = bhv.loc[bhv["time"] >= pd.Timestamp(self.cfg.valid_time_split)].reset_index(drop=True)
            uid_path = os.path.join(self.split_dir("train"), ID2INDEX_FILENAMES["uid2index"])
            if not os.path.exists(uid_path):
                self.load_behaviors("train")  # builds uid2index
            uid2index = _load_idx_map(uid_path)

        bhv["user"] = bhv["uid"].map(lambda u: uid2index.get(u, 0))
        bhv = bhv[["uid", "user", "history", "candidates", "labels"]]
        _to_tsv(bhv, parsed)
        return bhv

    # ---------- dense assembly ----------

    def _plm_tokenize(self, texts, max_len: int):
        """Batch-tokenize with the configured HF tokenizer (PLM mode)."""
        from transformers import AutoTokenizer

        if not hasattr(self, "_hf_tok"):
            self._hf_tok = AutoTokenizer.from_pretrained(self.cfg.plm_tokenizer)
        enc = self._hf_tok(
            [t if isinstance(t, str) else "" for t in texts],
            truncation=True, max_length=max_len, padding=False,
        )
        return enc["input_ids"]

    def news_store(self, split: str) -> NewsStore:
        """Dense tokenized store for the raw split backing ``split``."""
        raw_split = "dev" if split == "test" else "train"
        if raw_split in self._stores:
            return self._stores[raw_split]
        suffix = "_plm" if self.cfg.use_plm else ""
        cache = os.path.join(self.split_dir(raw_split), f"news_store{suffix}.npz")
        if os.path.exists(cache):
            store = NewsStore.load(cache)
        else:
            news = self.load_news(raw_split)
            if self.cfg.use_plm:
                assert self.cfg.plm_tokenizer, "use_plm requires plm_tokenizer"
                titles = self._plm_tokenize(
                    news["title"].tolist(), self.cfg.tokenizer_max_len
                )
                abstracts = self._plm_tokenize(
                    news["abstract"].tolist(), self.cfg.tokenizer_max_len
                )
            else:
                titles = news["tokenized_title"].tolist()
                abstracts = news["tokenized_abstract"].tolist()
            max_title = (
                self.cfg.tokenizer_max_len if self.cfg.use_plm else self.cfg.max_title_len
            )
            max_abs = (
                self.cfg.tokenizer_max_len
                if self.cfg.use_plm
                else self.cfg.max_abstract_len
            )
            store = build_news_store(
                nids=news["nid"].tolist(),
                tokenized_titles=titles,
                max_title_len=max_title,
                tokenized_abstracts=abstracts,
                max_abstract_len=max_abs,
                categories=news["category_class"].tolist(),
                subcategories=news["subcategory_class"].tolist(),
                sentiments=news["sentiment_class"].tolist(),
                sentiment_scores=news["sentiment_score"].tolist(),
                title_entities=news["title_entities"].tolist(),
                abstract_entities=news["abstract_entities"].tolist(),
                max_entities=self.cfg.max_entities,
            )
            store.save(cache)
        self._stores[raw_split] = store
        return store

    def impressions(self, split: str) -> Impressions:
        # dense CSR cache beside the parsed TSV (same existence-based cache
        # validity convention as every other artifact, file_utils.py:9-24
        # semantics): re-parsing 220k behaviors through the TSV converters
        # costs ~28s, the npz loads in well under a second
        raw_split = "dev" if split == "test" else "train"
        prefix = {"train": "train_", "val": "val_", "test": ""}[split]
        cache = os.path.join(self.split_dir(raw_split), prefix + "impressions.npz")
        if os.path.exists(cache):
            z = np.load(cache, allow_pickle=False)
            return Impressions(
                z["hist_flat"], z["hist_offsets"], z["cand_flat"],
                z["cand_offsets"], z["labels_flat"], z["user_idx"], z["user_ids"],
            )
        store = self.news_store(split)
        bhv = self.load_behaviors(split)
        # vectorized nid→row mapping (pandas Index.get_indexer, C path)
        index = pd.Index(list(store.nid2row.keys()))
        row_of = np.concatenate([[0], np.fromiter(store.nid2row.values(), dtype=np.int64)])

        def map_lists(series):
            lens = np.fromiter((len(x) for x in series), dtype=np.int64, count=len(series))
            flat = np.concatenate([np.asarray(x, dtype=object) for x in series]) if lens.sum() else np.asarray([], dtype=object)
            pos = index.get_indexer(flat)  # -1 for unknown
            rows = row_of[pos + 1]
            offsets = np.zeros(len(series) + 1, dtype=np.int64)
            np.cumsum(lens, out=offsets[1:])
            return rows.astype(np.int32), offsets

        hist_flat, hist_off = map_lists(bhv["history"])
        cand_flat, cand_off = map_lists(bhv["candidates"])
        labels_flat = np.concatenate(
            [np.asarray(x, dtype=np.int8) for x in bhv["labels"]]
        ) if len(bhv) else np.zeros(0, np.int8)
        user_ids = np.asarray([int(u.split("U")[-1]) for u in bhv["uid"]])
        imp = Impressions(
            hist_flat, hist_off, cand_flat, cand_off, labels_flat,
            np.asarray(bhv["user"], dtype=np.int32), user_ids,
        )
        np.savez_compressed(
            cache,
            hist_flat=imp.hist_flat, hist_offsets=imp.hist_offsets,
            cand_flat=imp.cand_flat, cand_offsets=imp.cand_offsets,
            labels_flat=imp.labels_flat, user_idx=imp.user_idx,
            user_ids=imp.user_ids,
        )
        return imp

    def num_users(self) -> int:
        fpath = os.path.join(self.split_dir("train"), ID2INDEX_FILENAMES["uid2index"])
        if not os.path.exists(fpath):
            self.load_behaviors("train")  # builds uid2index
        return len(_load_idx_map(fpath)) + 1

    def vocab_size(self) -> int:
        if not os.path.exists(self.map_path("word2index")):
            self.load_news("train")
        return len(_load_idx_map(self.map_path("word2index"))) + 1

    def num_classes(self) -> Dict[str, int]:
        if not os.path.exists(self.map_path("categ2index")):
            self.load_news("train")
        return {
            "category": len(_load_idx_map(self.map_path("categ2index"))) + 1,
            "subcategory": len(_load_idx_map(self.map_path("subcateg2index"))) + 1,
            "sentiment": len(_load_idx_map(self.map_path("sentiment2index"))) + 1,
            "entity": len(_load_idx_map(self.map_path("entity2index"))) + 1,
        }


def _parse_entities(row) -> List[dict]:
    if not isinstance(row, str) or not row.strip():
        return []
    try:
        parsed = ast.literal_eval(
            row.replace("true", "True").replace("false", "False").replace("null", "None")
        )
        return parsed if isinstance(parsed, list) else []
    except (ValueError, SyntaxError):
        import json

        try:
            return json.loads(row)
        except json.JSONDecodeError:
            return []


def _parse_str_list(x: str) -> List[str]:
    x = x.strip("[]")
    if not x:
        return []
    return [s.strip().strip("'\"") for s in x.split(",")]
