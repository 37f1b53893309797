"""Batch schemas — JAX pytrees with static shapes.

Reference analog: ``newsreclib/data/components/batch.py:6-51`` defines ragged
``RecommendationBatch`` / ``NewsBatch`` TypedDicts built around PyG-style
assignee vectors (``batch_hist`` / ``batch_cand``).  On TPU, ragged shapes
defeat XLA compilation, so the TPU-native schema is *dense + masked* and
*deduplicated*:

  * ``NewsFeatures`` holds the features of each **unique** news article in the
    batch (row 0 is a reserved all-zero padding article).  Encoding runs once
    per unique article instead of once per occurrence — the reference
    re-encodes every history/candidate occurrence every step
    (``nrms_module.py:231-237``), which our design strictly improves on.
  * ``RecBatch`` indexes into those unique rows with fixed-size
    ``hist_idx (B, H)`` and ``cand_idx (B, C)`` index matrices plus boolean
    masks.  Training batches use C = K+1 (neg_sampling_ratio K, one positive
    slot — matching ``rec_dataset.py:60-95`` semantics); eval batches bucket
    impressions by candidate count.
"""

from __future__ import annotations

from typing import NamedTuple, Optional

import jax.numpy as jnp


class NewsFeatures(NamedTuple):
    """Features for U unique news articles (row 0 = padding article).

    All fields are optional except ``title``; absent attributes are ``None``
    (models only touch the attributes they were configured with, mirroring
    ``dataset_attributes`` in the reference configs).
    """

    title: jnp.ndarray  # (U, L_t) int32 token ids, 0 = pad
    title_mask: jnp.ndarray  # (U, L_t) bool
    abstract: Optional[jnp.ndarray] = None  # (U, L_a) int32
    abstract_mask: Optional[jnp.ndarray] = None  # (U, L_a) bool
    category: Optional[jnp.ndarray] = None  # (U,) int32, 0 = pad class
    subcategory: Optional[jnp.ndarray] = None  # (U,) int32
    sentiment: Optional[jnp.ndarray] = None  # (U,) int32 (0 pad, 1..S classes)
    sentiment_score: Optional[jnp.ndarray] = None  # (U,) float32 in [-1, 1]
    title_entities: Optional[jnp.ndarray] = None  # (U, L_te) int32
    title_entities_mask: Optional[jnp.ndarray] = None  # (U, L_te) bool
    abstract_entities: Optional[jnp.ndarray] = None  # (U, L_ae) int32
    abstract_entities_mask: Optional[jnp.ndarray] = None  # (U, L_ae) bool


class RecBatch(NamedTuple):
    """A dense, masked recommendation batch.

    Reference analog: ``RecommendationBatch`` (``batch.py:6-32``) — but dense
    and with per-batch news dedup.
    """

    news: NewsFeatures
    hist_idx: jnp.ndarray  # (B, H) int32 rows into news.*; 0 for padding
    hist_mask: jnp.ndarray  # (B, H) bool
    cand_idx: jnp.ndarray  # (B, C) int32
    cand_mask: jnp.ndarray  # (B, C) bool
    labels: jnp.ndarray  # (B, C) float32 {0, 1}; 0 on padded slots
    user_idx: jnp.ndarray  # (B,) int32 — index into user table (LSTUR/NPA)
    impression_valid: Optional[jnp.ndarray] = None  # (B,) bool — row is real


class NewsBatch(NamedTuple):
    """A batch of news articles with aspect labels for A-module training.

    Reference analog: ``NewsBatch`` (``batch.py:35-51``).
    """

    news: NewsFeatures
    labels: jnp.ndarray  # (U,) int32 aspect class labels
    valid: jnp.ndarray  # (U,) bool


def batch_sizes(batch: RecBatch) -> tuple:
    """(B, H, C, U) static sizes of a RecBatch."""
    b, h = batch.hist_idx.shape
    c = batch.cand_idx.shape[1]
    u = batch.news.title.shape[0]
    return b, h, c, u
