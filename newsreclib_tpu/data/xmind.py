"""xMIND dataset ETL — multilingual MIND.

Reference analog: ``newsreclib/data/components/xmind_dataframe.py:22-605``:
reuses MIND behaviors; merges MIND news metadata with target-language
translated ``news.tsv`` from ``data/xMIND/<lang>/`` (nids suffixed
``_<lang>``, ``xmind_dataframe.py:335-352``); **bilingual mixing** replaces
``pct_tgt_lang`` of each impression's history (``:497-510``) and of its
pos/neg candidates separately (``:512-539``) with the target-language
version.  Zero-shot = train EN / test pct 1.0; bilingual = mix both splits.

xMIND is PLM-only in the reference (multilingual text → no GloVe vocab);
this implementation keeps the news store dense either way — target-language
articles become extra rows whose tokenized text comes from the configured
tokenizer (word-level by default so the offline path works end-to-end).
"""

from __future__ import annotations

import math
import os
from dataclasses import dataclass
from typing import Dict, List, Optional

import numpy as np
import pandas as pd

from newsreclib_tpu.data.batching import Impressions
from newsreclib_tpu.data.mind import MINDConfig, MINDData
from newsreclib_tpu.data.news_store import NewsStore, build_news_store
from newsreclib_tpu.data.tokenize import tokens_to_ids, word_tokenize

XMIND_LANGS = [
    "cmn", "fin", "grn", "hat", "ind", "jpn", "kat", "ron", "som", "swh",
    "tam", "tha", "tur", "vie",
]
XMIND_URL = "https://github.com/andreeaiana/xMIND/raw/main/data/{lang}/{split}/news.tsv"


@dataclass
class XMINDConfig:
    tgt_lang: str = "fin"
    bilingual_train: bool = False
    bilingual_test: bool = False
    pct_tgt_lang_train: float = 0.5
    pct_tgt_lang_test: float = 1.0
    seed: int = 42


class XMINDData:
    """Wraps a MINDData, adding translated news rows + bilingual mixing."""

    def __init__(self, mind: MINDData, cfg: XMINDConfig):
        self.mind = mind
        self.cfg = cfg
        self._stores: Dict[str, NewsStore] = {}

    def xmind_news_path(self, raw_split: str) -> str:
        return os.path.join(
            self.mind.cfg.data_dir, "xMIND", self.cfg.tgt_lang, raw_split, "news.tsv"
        )

    def news_store(self, split: str) -> NewsStore:
        """MIND store extended with `<nid>_<lang>` rows for translated news."""
        raw_split = "dev" if split == "test" else "train"
        if raw_split in self._stores:
            return self._stores[raw_split]
        base = self.mind.news_store(split)
        xnews_path = self.xmind_news_path(raw_split)
        if not os.path.exists(xnews_path):
            raise FileNotFoundError(
                f"{xnews_path} missing — download xMIND {self.cfg.tgt_lang} news.tsv"
            )
        xnews = pd.read_table(
            xnews_path, header=None, names=["nid", "title", "abstract"],
            usecols=range(3),
        )
        xnews["abstract"] = xnews["abstract"].fillna("")
        # keep only nids present in the MIND store; inherit their metadata
        keep = xnews["nid"].isin(base.nid2row.keys())
        xnews = xnews[keep].reset_index(drop=True)

        word2index = self._word2index()
        tok_titles = [
            tokens_to_ids(word_tokenize(t), word2index) for t in xnews["title"]
        ]
        tok_abstracts = [
            tokens_to_ids(word_tokenize(t), word2index) for t in xnews["abstract"]
        ]
        base_rows = np.asarray([base.nid2row[n] for n in xnews["nid"]], dtype=np.int64)

        from newsreclib_tpu.data.news_store import pad_token_lists

        lt = base.title.shape[1]
        new_title = pad_token_lists(tok_titles, lt)
        extra = {
            "title": new_title,
            "abstract": (
                None
                if base.abstract is None
                else pad_token_lists(tok_abstracts, base.abstract.shape[1])
            ),
        }
        # metadata inherited from the English article
        inherited = {}
        for fieldname in (
            "category", "subcategory", "sentiment", "sentiment_score",
            "title_entities", "abstract_entities",
        ):
            arr = getattr(base, fieldname)
            inherited[fieldname] = None if arr is None else arr[base_rows]

        nid2row = dict(base.nid2row)
        start = base.title.shape[0]
        for i, nid in enumerate(xnews["nid"]):
            nid2row[f"{nid}_{self.cfg.tgt_lang}"] = start + i

        def cat(a, b):
            if a is None or b is None:
                return a
            return np.concatenate([a, b], axis=0)

        store = NewsStore(
            nid2row=nid2row,
            title=cat(base.title, extra["title"]),
            abstract=cat(base.abstract, extra["abstract"]),
            category=cat(base.category, inherited["category"]),
            subcategory=cat(base.subcategory, inherited["subcategory"]),
            sentiment=cat(base.sentiment, inherited["sentiment"]),
            sentiment_score=cat(base.sentiment_score, inherited["sentiment_score"]),
            title_entities=cat(base.title_entities, inherited["title_entities"]),
            abstract_entities=cat(base.abstract_entities, inherited["abstract_entities"]),
        )
        self._stores[raw_split] = store
        return store

    # ---- extended vocabulary / aligned embeddings --------------------------
    # The reference's xMIND path is PLM-only: a multilingual tokenizer gives
    # target-language text a universal vocab and the pretrained encoder a
    # shared embedding space (``xmind_dataframe.py`` assumes this).  The
    # word-level offline analog: extend the train-built word2index with the
    # target-language words found in the translated news, and extend the
    # embedding matrix with vectors from an ALIGNED embedding file
    # (``xMIND/<lang>/aligned_embeddings.txt``, MUSE-style: translated word →
    # vector in the SOURCE language's space).  Words absent from the aligned
    # file fall back to seeded random-normal rows, mirroring
    # ``build_embedding_matrix`` OOV semantics.

    def lang_dir(self) -> str:
        return os.path.join(self.mind.cfg.data_dir, "xMIND", self.cfg.tgt_lang)

    def _word2index(self):
        return self._ensure_extended_vocab()[0]

    @staticmethod
    def _base_fingerprint(base: dict) -> str:
        """Content fingerprint of the base vocab map: a regenerated base
        with the SAME size but reshuffled word order must invalidate the
        extended-vocab / extended-matrix caches (ADVICE r4 — the old check
        pinned only len(base))."""
        import hashlib

        items = sorted(base.items(), key=lambda kv: kv[1])
        h = hashlib.sha256(str(len(base)).encode())
        for w, i in items[:64] + items[-64:]:
            h.update(f"{w}:{i};".encode())
        return h.hexdigest()[:16]

    def _ensure_extended_vocab(self):
        if getattr(self, "_ext_vocab", None) is not None:
            return self._ext_vocab
        import json

        from newsreclib_tpu.data.mind import _load_idx_map

        base = _load_idx_map(self.mind.map_path("word2index"))
        map_path = os.path.join(self.lang_dir(), "word2index.tsv")
        meta_path = os.path.join(self.lang_dir(), "word2index.meta.json")
        # cache is valid only if it was built over the SAME base vocab (a
        # regenerated fixture shifts n_base and would misalign the extended
        # matrix rows) — the meta sidecar pins that
        base_fp = self._base_fingerprint(base)
        if os.path.exists(map_path) and os.path.exists(meta_path):
            with open(meta_path) as f:
                meta = json.load(f)
            if meta.get("n_base") == len(base) and meta.get("base_fp") == base_fp:
                ext = _load_idx_map(map_path)
                self._ext_vocab = (ext, len(base))
                return self._ext_vocab

        from newsreclib_tpu.data.tokenize import word_tokenize

        ext = dict(base)
        found_any = False
        for raw_split in ("train", "dev"):
            p = self.xmind_news_path(raw_split)
            if not os.path.exists(p):
                continue
            found_any = True
            xnews = pd.read_table(
                p, header=None, names=["nid", "title", "abstract"],
                usecols=range(3),
            )
            xnews["abstract"] = xnews["abstract"].fillna("")
            for col in ("title", "abstract"):
                for text in xnews[col]:
                    for w in word_tokenize(text):
                        if w not in ext:
                            ext[w] = len(ext) + 1
        if found_any:
            # persist only a map that actually saw translated news: caching
            # the base-only map would permanently tokenize later-arriving
            # translations to OOV zeros
            os.makedirs(os.path.dirname(map_path), exist_ok=True)
            pd.DataFrame(ext.items(), columns=["word", "index"]).to_csv(
                map_path, sep="\t", index=False
            )
            with open(meta_path, "w") as f:
                json.dump({"n_base": len(base), "base_fp": base_fp}, f)
        self._ext_vocab = (ext, len(base))
        return self._ext_vocab

    def ensure_word_embeddings(self) -> Optional[str]:
        """Build (or reuse) the EXTENDED embedding matrix .npy; returns its
        directory (``load_data_info`` reads it from there)."""
        base_npy = os.path.join(
            self.mind.split_dir("train"), "transformed_word_embeddings.npy"
        )
        if not os.path.exists(base_npy):
            return None
        out = os.path.join(self.lang_dir(), "transformed_word_embeddings.npy")
        out_meta = out + ".meta.json"
        ext, n_base = self._ensure_extended_vocab()
        from newsreclib_tpu.data.mind import _load_idx_map

        base_fp = self._base_fingerprint(_load_idx_map(self.mind.map_path("word2index")))
        if os.path.exists(out) and os.path.exists(out_meta):
            import json

            with open(out_meta) as f:
                m = json.load(f)
            # same row count is NOT enough: a regenerated base vocab of equal
            # size would silently misalign every row (ADVICE r4)
            if (np.load(out, mmap_mode="r").shape[0] == len(ext) + 1
                    and m.get("base_fp") == base_fp):
                return self.lang_dir()
        base = np.load(base_npy)
        dim = base.shape[1]
        n_new = len(ext) - n_base
        rng = np.random.default_rng(self.cfg.seed)
        rows = rng.normal(size=(n_new, dim)).astype(np.float32)
        aligned = os.path.join(self.lang_dir(), "aligned_embeddings.txt")
        if os.path.exists(aligned):
            import logging

            hit = 0
            with open(aligned, encoding="utf-8") as f:
                for line in f:
                    parts = line.rstrip().split(" ")
                    if len(parts) < dim + 1:
                        continue
                    idx = ext.get(parts[0])
                    if idx is not None and idx > n_base:
                        rows[idx - n_base - 1] = np.asarray(
                            parts[-dim:], dtype=np.float32
                        )
                        hit += 1
            log = logging.getLogger("newsreclib_tpu")
            log.info("xMIND aligned embeddings: %d/%d translated words matched",
                     hit, n_new)
            if n_new and hit == 0:
                log.warning(
                    "aligned_embeddings.txt matched ZERO translated words — "
                    "zero-shot transfer will not work (format drift?)"
                )
        matrix = np.vstack([base, rows])
        np.save(out, matrix)
        import json

        with open(out_meta, "w") as f:
            json.dump({"base_fp": base_fp, "n_rows": matrix.shape[0]}, f)
        return self.lang_dir()

    def impressions(self, split: str) -> Impressions:
        """MIND behaviors with bilingual mixing applied per split config."""
        store = self.news_store(split)
        bhv = self.mind.load_behaviors(split)
        mix = (
            self.cfg.bilingual_train if split in ("train", "val") else True
        )
        pct = (
            self.cfg.pct_tgt_lang_train
            if split in ("train", "val")
            else self.cfg.pct_tgt_lang_test
        )
        if not mix and split in ("train", "val"):
            pct = 0.0
        split_ix = {"train": 0, "val": 1, "test": 2}.get(split, 3)
        rng = np.random.default_rng((self.cfg.seed, split_ix))

        histories, candidates, labels_out, user_idx = [], [], [], []
        for hist, cands, labels, user in zip(
            bhv["history"], bhv["candidates"], bhv["labels"], bhv["user"]
        ):
            if pct > 0:
                hist = self._mix(hist, pct, rng)
                cands = self._mix_candidates(cands, labels, pct, rng)
            histories.append(store.rows(hist))
            candidates.append(store.rows(cands))
            labels_out.append(labels)
            user_idx.append(user)
        user_ids = [int(u.split("U")[-1]) for u in bhv["uid"]]
        return Impressions.from_lists(histories, candidates, labels_out, user_idx, user_ids)

    def _tgt(self, nid: str) -> str:
        return f"{nid}_{self.cfg.tgt_lang}"

    def _mix(self, nids: List[str], pct: float, rng) -> List[str]:
        """Replace ceil(pct*len) random entries with the target-language
        version when available (``xmind_dataframe.py:497-510``)."""
        if not nids:
            return nids
        store = next(iter(self._stores.values()))
        n_replace = math.ceil(pct * len(nids))
        chosen = set(
            rng.choice(np.asarray(nids, dtype=object), size=n_replace, replace=False).tolist()
        )
        return [
            self._tgt(n) if n in chosen and self._tgt(n) in store.nid2row else n
            for n in nids
        ]

    def _mix_candidates(self, cands: List[str], labels: List[int], pct: float, rng) -> List[str]:
        """Positives and negatives sampled separately (``:512-539``)."""
        pos = [c for c, l in zip(cands, labels) if l == 1]
        neg = [c for c, l in zip(cands, labels) if l != 1]
        chosen = set()
        for group in (pos, neg):
            if group:
                k = math.ceil(pct * len(group))
                chosen |= set(
                    rng.choice(np.asarray(group, dtype=object), size=k, replace=False).tolist()
                )
        store = next(iter(self._stores.values()))
        return [
            self._tgt(c) if c in chosen and self._tgt(c) in store.nid2row else c
            for c in cands
        ]

    # passthroughs
    def vocab_size(self) -> int:
        return len(self._ensure_extended_vocab()[0]) + 1

    def num_users(self) -> int:
        return self.mind.num_users()

    def num_classes(self) -> Dict[str, int]:
        return self.mind.num_classes()

    def split_dir(self, raw_split: str) -> str:
        return self.mind.split_dir(raw_split)
