"""Synthetic MIND-shaped data for tests and benchmarks (no network).

Generates batches with the exact schema/shape contract of the real pipeline
(`newsreclib_tpu/data/batching.py`) so models, steps, and benches run without
downloading MIND.  SURVEY.md §4 calls for a synthetic fixture; the reference
has none (its tests download the real dataset).
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np

from newsreclib_tpu.data.batch import NewsFeatures, RecBatch


@dataclass
class SyntheticConfig:
    vocab_size: int = 5000
    num_categories: int = 19  # 18 + pad, MIND (configs/model/nrms.yaml:44)
    num_subcategories: int = 50
    num_sent_classes: int = 4  # 3 + pad
    num_users: int = 1000
    title_len: int = 30
    abstract_len: int = 50
    entity_len: int = 10
    entity_vocab_size: int = 800


def make_batch(
    rng: np.random.Generator,
    batch_size: int = 8,
    hist_len: int = 50,
    num_candidates: int = 5,
    unique_news: int = 64,
    cfg: SyntheticConfig = SyntheticConfig(),
    with_abstract: bool = True,
    with_entities: bool = True,
    planted_signal: bool = False,
) -> RecBatch:
    """Random RecBatch.  With ``planted_signal``, the positive candidate's
    first title token is drawn from a distinct token range so a model can
    overfit it (used by convergence tests)."""
    u, lt, la, le = unique_news, cfg.title_len, cfg.abstract_len, cfg.entity_len

    title_lens = rng.integers(3, lt + 1, size=u)
    title = np.zeros((u, lt), dtype=np.int32)
    for i, n in enumerate(title_lens):
        title[i, :n] = rng.integers(2, cfg.vocab_size // 2, size=n)
    title_mask = title != 0

    abstract = None
    abstract_mask = None
    if with_abstract:
        ab_lens = rng.integers(0, la + 1, size=u)
        abstract = np.zeros((u, la), dtype=np.int32)
        for i, n in enumerate(ab_lens):
            abstract[i, :n] = rng.integers(2, cfg.vocab_size, size=n)
        abstract_mask = abstract != 0

    ents = ents_mask = ab_ents = ab_ents_mask = None
    if with_entities:
        ents = np.where(
            rng.random((u, le)) < 0.3,
            rng.integers(1, cfg.entity_vocab_size, size=(u, le)),
            0,
        ).astype(np.int32)
        ents_mask = ents != 0
        ab_ents = np.where(
            rng.random((u, le)) < 0.3,
            rng.integers(1, cfg.entity_vocab_size, size=(u, le)),
            0,
        ).astype(np.int32)
        ab_ents_mask = ab_ents != 0

    category = rng.integers(1, cfg.num_categories, size=u).astype(np.int32)
    subcategory = rng.integers(1, cfg.num_subcategories, size=u).astype(np.int32)
    sentiment = rng.integers(1, cfg.num_sent_classes, size=u).astype(np.int32)
    sentiment_score = rng.uniform(-1, 1, size=u).astype(np.float32)
    # row 0 is the padding article
    title[0] = 0
    title_mask[0] = False
    category[0] = subcategory[0] = sentiment[0] = 0
    sentiment_score[0] = 0.0
    if with_abstract:
        abstract[0] = 0
        abstract_mask[0] = False
    if with_entities:
        ents[0] = 0
        ents_mask[0] = False
        ab_ents[0] = 0
        ab_ents_mask[0] = False

    b, h, c = batch_size, hist_len, num_candidates
    hist_sizes = rng.integers(1, h + 1, size=b)
    hist_idx = np.zeros((b, h), dtype=np.int32)
    for i, n in enumerate(hist_sizes):
        hist_idx[i, :n] = rng.integers(1, u, size=n)
    hist_mask = hist_idx != 0

    cand_idx = rng.integers(1, u, size=(b, c)).astype(np.int32)
    cand_mask = np.ones((b, c), dtype=bool)
    labels = np.zeros((b, c), dtype=np.float32)
    pos_slot = rng.integers(0, c, size=b)
    labels[np.arange(b), pos_slot] = 1.0

    if planted_signal:
        # positives get titles starting with a "positive" token id
        pos_news = cand_idx[np.arange(b), pos_slot]
        title[pos_news, 0] = rng.integers(
            cfg.vocab_size // 2, cfg.vocab_size, size=b
        )
        title_mask[pos_news, 0] = True

    news = NewsFeatures(
        title=title,
        title_mask=title_mask,
        abstract=abstract,
        abstract_mask=abstract_mask,
        category=category,
        subcategory=subcategory,
        sentiment=sentiment,
        sentiment_score=sentiment_score,
        title_entities=ents,
        title_entities_mask=ents_mask,
        abstract_entities=ab_ents,
        abstract_entities_mask=ab_ents_mask,
    )
    return RecBatch(
        news=news,
        hist_idx=hist_idx,
        hist_mask=hist_mask,
        cand_idx=cand_idx,
        cand_mask=cand_mask,
        labels=labels,
        user_idx=rng.integers(1, cfg.num_users, size=b).astype(np.int32),
        impression_valid=np.ones(b, dtype=bool),
    )
