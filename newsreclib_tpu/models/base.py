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


def late_fusion_user(hist_vecs: jnp.ndarray, hist_mask: jnp.ndarray) -> jnp.ndarray:
    """Mean over valid clicked-news vectors (``nrms_module.py:239-248``)."""
    m = hist_mask.astype(hist_vecs.dtype)
    total = jnp.sum(hist_vecs * m[..., None], axis=1)
    count = jnp.maximum(jnp.sum(m, axis=1, keepdims=True), 1.0)
    return total / count


def mask_scores(scores: jnp.ndarray, cand_mask: jnp.ndarray) -> jnp.ndarray:
    """Push padded candidate scores to -inf-ish so they never rank."""
    return jnp.where(cand_mask, scores, -1e30)
