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

    **Length-bucketed news (round 3):** when ``news2`` is not None, the
    unique-news table is SPLIT into two row segments sorted by title length:
    ``news`` holds the short-title rows with the title columns sliced to the
    split width, ``news2`` holds the long-title tail at full width.  The
    logical table is ``concat(rows(news), rows(news2))`` and
    ``hist_idx``/``cand_idx`` address that concatenated space.  Encoding the
    short majority at the narrow width reclaims the ~2.5× attention/CNN work
    the reference wastes padding every title to ``max_title_len``
    (``rec_dataset.py:170-178`` pads everything to 30; real MIND titles
    average ~11 tokens).  Models consume this via
    ``models/base.py::encode_all_news`` — numerically exact because padding
    token embeddings are hard zeros (``components/embedding.py``).
    """

    news: NewsFeatures
    hist_idx: jnp.ndarray  # (B, H) int32 rows into news.*; 0 for padding
    hist_mask: jnp.ndarray  # (B, H) bool
    cand_idx: jnp.ndarray  # (B, C) int32
    cand_mask: jnp.ndarray  # (B, C) bool
    labels: jnp.ndarray  # (B, C) float32 {0, 1}; 0 on padded slots
    user_idx: jnp.ndarray  # (B,) int32 — index into user table (LSTUR/NPA)
    impression_valid: Optional[jnp.ndarray] = None  # (B,) bool — row is real
    news2: Optional[NewsFeatures] = None  # long-title tail segment (see above)


class NewsBatch(NamedTuple):
    """A batch of news articles with aspect labels for A-module training.

    Reference analog: ``NewsBatch`` (``batch.py:35-51``).
    """

    news: NewsFeatures
    labels: jnp.ndarray  # (U,) int32 aspect class labels
    valid: jnp.ndarray  # (U,) bool


def densify(
    batch: RecBatch, corpus: NewsFeatures, u_bucket: int
) -> "tuple[RecBatch, jnp.ndarray]":
    """On-device dedup of a GLOBAL-ROW batch (traced; jit-safe).

    A global-row batch carries ``news=None`` and corpus row ids in
    ``hist_idx``/``cand_idx`` — the layout used for multi-host training,
    where a host-side per-batch dedup table would be process-local and could
    not be assembled into one global array (the round-2 limitation at
    ``parallel/mesh.py``).  Instead the dedup runs *inside* the jitted step:
    ``jnp.unique(..., size=u_bucket)`` (static shape) maps the batch's rows
    to a unique table, corpus features are gathered for it, and the indices
    are remapped — producing exactly the per-batch-dedup ``RecBatch`` the
    models consume.  Row 0 stays the padding article (0 is prepended, and
    ``jnp.unique`` sorts ascending).

    ``u_bucket`` must be ≥ the true unique count; the safe bound is
    ``min(B*(H+C)+1, N+1)`` (see ``TrainBatcher.global_u_bucket``).  Returns
    ``(batch, overflow)`` where ``overflow`` is a scalar bool flagging a
    too-small bucket — callers poison the loss with NaN so the trainer's
    finite-check surfaces it instead of training on silently dropped
    articles.
    """
    import jax

    hist = batch.hist_idx.astype(jnp.int32)
    cand = batch.cand_idx.astype(jnp.int32)
    b, h = hist.shape
    c = cand.shape[1]
    rows = jnp.concatenate(
        [jnp.zeros((1,), jnp.int32), hist.reshape(-1), cand.reshape(-1)]
    )
    unique, inv = jnp.unique(rows, return_inverse=True, size=u_bucket, fill_value=0)
    srt = jnp.sort(rows)
    n_unique = jnp.sum(srt[1:] != srt[:-1]) + 1
    overflow = n_unique > u_bucket
    news = jax.tree.map(lambda t: jnp.take(t, unique, axis=0), corpus)
    hist_local = inv[1 : 1 + b * h].reshape(b, h).astype(jnp.int32)
    cand_local = inv[1 + b * h :].reshape(b, c).astype(jnp.int32)
    return (
        batch._replace(
            news=news,
            hist_idx=hist_local,
            cand_idx=cand_local,
            hist_mask=batch.hist_mask if batch.hist_mask is not None else hist != 0,
            cand_mask=batch.cand_mask if batch.cand_mask is not None else cand != 0,
            labels=None if batch.labels is None else batch.labels.astype(jnp.float32),
        ),
        overflow,
    )


def batch_sizes(batch: RecBatch) -> tuple:
    """(B, H, C, U) static sizes of a RecBatch (U spans both news segments)."""
    b, h = batch.hist_idx.shape
    c = batch.cand_idx.shape[1]
    u = batch.news.title.shape[0]
    if batch.news2 is not None:
        u += batch.news2.title.shape[0]
    return b, h, c, u
