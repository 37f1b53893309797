"""Recommender model protocol + shared glue.

Reference analog: ``newsreclib/models/abstract_recommender.py:14-193`` — but
there is no Lightning here.  A recommender is a flax module mapping a dense
``RecBatch`` to ``(scores, aux)`` where:

  * ``scores``: (B, C) float32 click scores, and
  * ``aux``: dict of *already-weighted* auxiliary loss terms (topic
    classification for TANR, sentiment regression/diversity for SentiRec,
    disagreement for MINER, ...) added to the main slate loss by the trainer.

Shared glue implemented here: gathering per-article vectors from the unique
news table into history/candidate slots (the dense replacement of
``to_dense_batch``, ``nrms_module.py:233-237``) and late-fusion mean-pooled
users (``nrms_module.py:239-248``).
"""

from __future__ import annotations

from typing import Dict, Tuple

import jax.numpy as jnp

from newsreclib_tpu.data.batch import RecBatch

ModelOutput = Tuple[jnp.ndarray, Dict[str, jnp.ndarray]]


def gather_news(news_vecs: jnp.ndarray, idx: jnp.ndarray) -> jnp.ndarray:
    """Gather unique-news vectors (U, D) into slots (B, X) → (B, X, D)."""
    return jnp.take(news_vecs, idx, axis=0)


def encode_all_news(encode_fn, batch: RecBatch, deterministic: bool = True) -> jnp.ndarray:
    """Encode the batch's unique news table → (U_total, D) vectors.

    Length-bucketed batches (``RecBatch.news2``) carry the table as two row
    segments — the short-title majority at the narrow padded width and the
    long tail at full width (``data/batching.py::split_news_by_length``).
    Each segment is a complete ``NewsFeatures``, so the model's
    ``encode_news`` runs unchanged per segment (flax reuses the same
    parameters across both calls); concatenating rows reconstitutes the table
    in the order ``hist_idx``/``cand_idx`` address.
    """
    vecs = encode_fn(batch.news, deterministic)
    if batch.news2 is not None:
        vecs = jnp.concatenate(
            [vecs, encode_fn(batch.news2, deterministic)], axis=0
        )
    return vecs


def news_field(batch: RecBatch, name: str) -> jnp.ndarray:
    """A per-row news feature over the FULL unique table (both segments)."""
    v = getattr(batch.news, name)
    if batch.news2 is None:
        return v
    return jnp.concatenate([v, getattr(batch.news2, name)], axis=0)


def news_valid(batch: RecBatch) -> jnp.ndarray:
    """(U_total,) bool — row holds a real article (any title token)."""
    v = jnp.any(batch.news.title_mask, axis=-1)
    if batch.news2 is not None:
        v = jnp.concatenate([v, jnp.any(batch.news2.title_mask, axis=-1)], axis=0)
    return v


def full_title_tokens(batch: RecBatch) -> tuple:
    """(U_total, L_full) title tokens + mask — for per-occurrence encoders
    (NPA gathers raw tokens per history/candidate slot, so it needs one
    full-width view; the short segment is re-padded with zero columns, which
    is exactly what the store held before slicing)."""
    t, m = batch.news.title, batch.news.title_mask
    if batch.news2 is None:
        return t, m
    l_full = batch.news2.title.shape[1]
    pad = ((0, 0), (0, l_full - t.shape[1]))
    return (
        jnp.concatenate([jnp.pad(t, pad), batch.news2.title], axis=0),
        jnp.concatenate([jnp.pad(m, pad), batch.news2.title_mask], axis=0),
    )


def late_fusion_user(hist_vecs: jnp.ndarray, hist_mask: jnp.ndarray) -> jnp.ndarray:
    """Mean over valid clicked-news vectors (``nrms_module.py:239-248``)."""
    m = hist_mask.astype(hist_vecs.dtype)
    total = jnp.sum(hist_vecs * m[..., None], axis=1)
    count = jnp.maximum(jnp.sum(m, axis=1, keepdims=True), 1.0)
    return total / count


def mask_scores(scores: jnp.ndarray, cand_mask: jnp.ndarray) -> jnp.ndarray:
    """Push padded candidate scores to -inf-ish so they never rank."""
    return jnp.where(cand_mask, scores, -1e30)
