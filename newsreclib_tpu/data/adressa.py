"""Adressa dataset ETL.

Reference analog: ``newsreclib/data/components/adressa_dataframe.py:29-738``
+ ``adressa_user_info.py:8-77``:

  * stream newline-JSON events from the ``one_week``/``three_month`` tar.gz;
  * collect news (id, title, category1 → category|subcategory) with dense
    ``N<i>`` ids (``:571-621``);
  * per-user chronological click timeline split into history / train / test
    by day index (one_week: last char of the member filename; three_month:
    ISO week) at ``train_date_split``/``test_date_split``
    (``adressa_user_info.py:35-54``);
  * **synthesized impressions**: every positive click becomes one impression
    with ``neg_num`` (20) negatives sampled uniformly from the news the user
    never interacted with (``:694-731``); test histories include the train
    clicks;
  * seeded shuffle; the test pool is split into dev/test with
    ``user_dev_size`` (``:489-497``);
  * the remaining pipeline (tokenize, vocab maps, sentiment, category
    classes, caches) matches MIND, reusing the same building blocks.

Artifact contract: ``Adressa_<size>/{train,dev,test}/news.tsv``,
``behaviors_<seed>.tsv``, ``parsed_news.tsv``,
``parsed_behaviors_<seed>.tsv``, vocab maps in the dataset root.
"""

from __future__ import annotations

import json
import os
import tarfile
from collections import defaultdict
from dataclasses import dataclass, field
from datetime import datetime, timezone
from typing import Dict, List, Optional, Tuple

import numpy as np
import pandas as pd

from newsreclib_tpu.data.batching import Impressions
from newsreclib_tpu.data.embeddings import build_embedding_matrix
from newsreclib_tpu.data.news_store import NewsStore, build_news_store
from newsreclib_tpu.data.sentiment import SentimentAnnotator, get_annotator
from newsreclib_tpu.data.tokenize import (
    build_index_map,
    build_vocab,
    tokens_to_ids,
    word_tokenize,
)

ADRESSA_URLS = {
    "one_week": "https://reclab.idi.ntnu.no/dataset/one_week.tar.gz",
    "three_month": "https://reclab.idi.ntnu.no/dataset/three_month.tar.gz",
}


@dataclass
class AdressaConfig:
    data_dir: str
    dataset_size: str = "one_week"
    train_date_split: int = 6
    test_date_split: int = 7
    neg_num: int = 20
    user_dev_size: float = 0.2
    max_title_len: int = 30
    word_embeddings_fpath: Optional[str] = None
    word_embed_dim: int = 300
    categ_embed_dim: int = 300
    use_pretrained_categ_embeddings: bool = True
    sentiment_annotator: str = "lexicon"
    sentiment_annotator_kwargs: dict = field(default_factory=dict)
    download: bool = False
    seed: int = 42
    # PLM mode (reference use_plm + tokenizer_name NbAiLab/nb-bert-base for
    # Norwegian, configs/experiment/nrms_adressaoneweek_plm_celoss_bertsent.yaml)
    use_plm: bool = False
    plm_tokenizer: Optional[str] = None
    tokenizer_max_len: int = 96


class _UserTimeline:
    """Per-user clicks partitioned by date (``adressa_user_info.py:8-77``)."""

    __slots__ = ("hist", "train", "test")

    def __init__(self):
        self.hist: List[Tuple[int, int]] = []  # (time, nindex)
        self.train: List[Tuple[int, int]] = []
        self.test: List[Tuple[int, int]] = []

    def update(self, nindex: int, click_time: int, date: int, train_split: int, test_split: int):
        if train_split <= date < test_split:
            self.train.append((click_time, nindex))
        elif date >= test_split:
            self.test.append((click_time, nindex))
        else:
            self.hist.append((click_time, nindex))

    def sorted(self):
        return (
            [n for _, n in sorted(self.hist)],
            [n for _, n in sorted(self.train)],
            [n for _, n in sorted(self.test)],
        )


class AdressaData:
    """Same interface as MINDData: news_store(split) / impressions(split) /
    vocab_size / num_users / num_classes."""

    def __init__(self, cfg: AdressaConfig, annotator: Optional[SentimentAnnotator] = None):
        self.cfg = cfg
        self.annotator = annotator or get_annotator(
            cfg.sentiment_annotator, **cfg.sentiment_annotator_kwargs
        )
        self.root = os.path.join(cfg.data_dir, f"Adressa_{cfg.dataset_size}")
        self._store: Optional[NewsStore] = None
        self._maps: Optional[Dict[str, Dict[str, int]]] = None

    # ---------- raw processing ----------

    def _tar_path(self) -> str:
        return os.path.join(self.cfg.data_dir, f"{self.cfg.dataset_size}.tar.gz")

    def prepare_raw(self) -> None:
        """tar.gz → news.tsv + behaviors_<seed>.tsv under the dataset root."""
        news_f = os.path.join(self.root, "news.tsv")
        bhv_f = os.path.join(self.root, f"behaviors_{self.cfg.seed}.tsv")
        if os.path.exists(news_f) and os.path.exists(bhv_f):
            return
        tar_path = self._tar_path()
        if not os.path.exists(tar_path):
            if not self.cfg.download:
                raise FileNotFoundError(f"{tar_path} missing and download disabled")
            from newsreclib_tpu.data import download as dl

            dl.maybe_download(ADRESSA_URLS[self.cfg.dataset_size], tar_path)

        news_title: Dict[str, str] = {}
        news_category: Dict[str, str] = {}
        news_subcategory: Dict[str, str] = {}
        uid2index: Dict[str, int] = {}
        timelines: Dict[str, _UserTimeline] = defaultdict(_UserTimeline)

        with tarfile.open(tar_path, "r:gz") as tar:
            members = [m for m in tar.getmembers() if m.isfile()]
            for member in members:
                f = tar.extractfile(member)
                if f is None:
                    continue
                for raw in f:
                    try:
                        ev = json.loads(raw.decode("utf-8").strip())
                    except (json.JSONDecodeError, UnicodeDecodeError):
                        continue
                    if not ("id" in ev and "title" in ev and "category1" in ev):
                        continue
                    nid = ev["id"]
                    if nid not in news_title:
                        news_title[nid] = ev["title"]
                        news_category[nid] = ev["category1"].split("|")[0]
                        news_subcategory[nid] = ev["category1"].split("|")[-1]
            nid2index = {k: f"N{i}" for i, k in enumerate(news_title, start=1)}

            for member in members:
                f = tar.extractfile(member)
                if f is None:
                    continue
                for raw in f:
                    try:
                        ev = json.loads(raw.decode("utf-8").strip())
                    except (json.JSONDecodeError, UnicodeDecodeError):
                        continue
                    if not ("id" in ev and "title" in ev and ev.get("id") in nid2index):
                        continue
                    uid = str(ev.get("userId"))
                    if uid not in uid2index:
                        uid2index[uid] = len(uid2index)
                    click_time = int(ev["time"])
                    if self.cfg.dataset_size == "one_week":
                        date = int(member.name[-1])
                    else:
                        date = datetime.fromtimestamp(
                            click_time, tz=timezone.utc
                        ).isocalendar()[1]
                    nindex = int(nid2index[ev["id"]][1:])
                    timelines[f"U{uid2index[uid]}"].update(
                        nindex, click_time, date,
                        self.cfg.train_date_split, self.cfg.test_date_split,
                    )

        os.makedirs(self.root, exist_ok=True)
        with open(news_f, "w", encoding="utf-8") as f:
            for nid, title in news_title.items():
                f.write(
                    "\t".join(
                        [nid2index[nid], news_category[nid], news_subcategory[nid], title]
                    )
                    + "\n"
                )
        pd.DataFrame(nid2index.items(), columns=["nid", "index"]).to_csv(
            os.path.join(self.root, "nid2index.tsv"), sep="\t", index=False
        )

        # synthesize impressions
        rng = np.random.default_rng(self.cfg.seed)
        n_news = len(news_title)
        train_lines: List[str] = []
        test_lines: List[str] = []
        for uid, tl in timelines.items():
            hist, train, test = tl.sorted()
            interacted = set(hist) | set(train) | set(test)
            pool = np.asarray(
                [i for i in range(1, n_news + 1) if i not in interacted], dtype=np.int64
            )
            if len(pool) == 0:
                continue
            hist_str = " ".join(f"N{n}" for n in hist)
            for pos in train:
                negs = rng.choice(pool, size=min(self.cfg.neg_num, len(pool)), replace=False)
                imp = " ".join([f"N{pos}-1"] + [f"N{n}-0" for n in negs])
                train_lines.append(f"{uid}\t{hist_str}\t{imp}\n")
            test_hist_str = " ".join(f"N{n}" for n in hist + train)
            for pos in test:
                negs = rng.choice(pool, size=min(self.cfg.neg_num, len(pool)), replace=False)
                imp = " ".join([f"N{pos}-1"] + [f"N{n}-0" for n in negs])
                test_lines.append(f"{uid}\t{test_hist_str}\t{imp}\n")

        rng.shuffle(train_lines)
        rng.shuffle(test_lines)
        n_dev = int(len(test_lines) * self.cfg.user_dev_size)
        dev_lines, final_test = test_lines[:n_dev], test_lines[n_dev:]

        with open(bhv_f, "w", encoding="utf-8") as f:
            f.writelines(train_lines)
        for stage, lines in (("dev", dev_lines), ("test", final_test)):
            d = os.path.join(self.root, stage)
            os.makedirs(d, exist_ok=True)
            with open(
                os.path.join(d, f"behaviors_{self.cfg.seed}.tsv"), "w", encoding="utf-8"
            ) as f:
                f.writelines(lines)

    # ---------- parsing ----------

    def _load_maps(self) -> Dict[str, Dict[str, int]]:
        if self._maps is not None:
            return self._maps
        self.prepare_raw()
        news = pd.read_table(
            os.path.join(self.root, "news.tsv"), header=None,
            names=["nid", "category", "subcategory", "title"],
        )
        tok_titles = [word_tokenize(t) for t in news["title"]]
        maps = {
            "word2index": build_vocab(tok_titles),
            "categ2index": build_index_map(news["category"]),
            "subcateg2index": build_index_map(news["subcategory"]),
        }
        results = self.annotator.annotate_many(news["title"].tolist())
        news["sentiment_label"], news["sentiment_score"] = zip(*results)
        maps["sentiment2index"] = build_index_map(news["sentiment_label"])
        for name, m in maps.items():
            pd.DataFrame(m.items(), columns=["key", "index"]).to_csv(
                os.path.join(self.root, f"{name}.tsv"), sep="\t", index=False
            )
        self._news_df = news
        self._tok_titles = tok_titles
        self._maps = maps
        return maps

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

    def news_store(self, split: str = "train") -> NewsStore:
        if self._store is not None:
            return self._store
        suffix = "_plm" if self.cfg.use_plm else ""
        cache = os.path.join(self.root, f"news_store{suffix}.npz")
        if os.path.exists(cache):
            self._store = NewsStore.load(cache)
            return self._store
        maps = self._load_maps()
        news = self._news_df
        if self.cfg.word_embeddings_fpath and os.path.exists(self.cfg.word_embeddings_fpath):
            build_embedding_matrix(
                maps["word2index"], self.cfg.word_embeddings_fpath,
                self.cfg.word_embed_dim, seed=self.cfg.seed,
                out_fpath=os.path.join(self.root, "transformed_word_embeddings.npy"),
            )
            if self.cfg.use_pretrained_categ_embeddings:
                build_embedding_matrix(
                    maps["categ2index"], self.cfg.word_embeddings_fpath,
                    self.cfg.categ_embed_dim, seed=self.cfg.seed,
                    out_fpath=os.path.join(self.root, "transformed_categ_embeddings.npy"),
                )
        if self.cfg.use_plm:
            assert self.cfg.plm_tokenizer, "use_plm requires plm_tokenizer"
            titles = self._plm_tokenize(
                news["title"].tolist(), self.cfg.tokenizer_max_len
            )
            max_title = self.cfg.tokenizer_max_len
        else:
            titles = [tokens_to_ids(t, maps["word2index"]) for t in self._tok_titles]
            max_title = self.cfg.max_title_len
        store = build_news_store(
            nids=news["nid"].tolist(),
            tokenized_titles=titles,
            max_title_len=max_title,
            categories=[maps["categ2index"].get(c, 0) for c in news["category"]],
            subcategories=[maps["subcateg2index"].get(c, 0) for c in news["subcategory"]],
            sentiments=[maps["sentiment2index"].get(c, 0) for c in news["sentiment_label"]],
            sentiment_scores=news["sentiment_score"].tolist(),
        )
        store.save(cache)
        self._store = store
        return store

    def impressions(self, split: str) -> Impressions:
        self.prepare_raw()
        store = self.news_store()
        if split in ("train", "val"):
            # the reference has no val sub-split for Adressa; use dev for val
            path = (
                os.path.join(self.root, f"behaviors_{self.cfg.seed}.tsv")
                if split == "train"
                else os.path.join(self.root, "dev", f"behaviors_{self.cfg.seed}.tsv")
            )
        else:
            path = os.path.join(self.root, "test", f"behaviors_{self.cfg.seed}.tsv")
        # native fast path: parse raw behavior lines in C++ (fastetl), with a
        # transparent pure-Python fallback
        from newsreclib_tpu.data import fastetl

        with open(path, encoding="utf-8") as f:
            lines = f.read().splitlines()
        uids, hists, imps = [], [], []
        for line in lines:
            uid, hist, imp = line.split("\t")
            uids.append(uid)
            hists.append(hist)
            imps.append(imp)
        nidmap = fastetl.StrMap(store.nid2row)
        caph = max((h.count(" ") + 1 for h in hists), default=1)
        capc = max((i.count(" ") + 1 for i in imps), default=1)
        hist_rows, hist_lens = fastetl.parse_id_lists(hists, nidmap, cap=caph)
        cand_rows, cand_labels, cand_lens = fastetl.parse_impressions(
            imps, nidmap, cap=capc
        )
        user_idx = np.asarray([int(u[1:]) + 1 for u in uids], dtype=np.int32)
        return Impressions.from_padded(
            hist_rows, hist_lens, cand_rows, cand_labels, cand_lens,
            user_idx, user_idx,
        )

    def vocab_size(self) -> int:
        return len(self._load_maps()["word2index"]) + 1

    def num_users(self) -> int:
        self.prepare_raw()
        n = 0
        with open(os.path.join(self.root, f"behaviors_{self.cfg.seed}.tsv")) as f:
            for line in f:
                n = max(n, int(line.split("\t", 1)[0][1:]))
        return n + 2

    def num_classes(self) -> Dict[str, int]:
        maps = self._load_maps()
        return {
            "category": len(maps["categ2index"]) + 1,
            "subcategory": len(maps["subcateg2index"]) + 1,
            "sentiment": len(maps["sentiment2index"]) + 1,
            "entity": 1,
        }

    def split_dir(self, raw_split: str) -> str:
        return self.root
