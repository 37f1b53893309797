"""Jitted train / eval steps.

Reference analog: Lightning's ``training_step`` / ``model_step`` per module
(e.g. ``nrms_module.py:260-378``).  Here: ONE jitted, donated train step per
model covering forward + loss + backward + optimizer update; an eval step
computing scores AND per-impression metrics on device.  Compiled once per
(batch-shape, mesh) pair — batching is static/bucketed to keep recompiles
bounded.
"""

from __future__ import annotations

from functools import partial
from typing import Callable, Dict, Optional, Tuple

import jax
import jax.numpy as jnp

from newsreclib_tpu.data.batch import NewsFeatures, RecBatch, densify
from newsreclib_tpu.models.base import mask_scores, news_field
from newsreclib_tpu.metrics.collector import RankingMetrics
from newsreclib_tpu.training.state import TrainState


def _cast_floats(tree, dtype):
    """Cast float leaves (params) to the compute dtype; ints/bools untouched."""
    return jax.tree.map(
        lambda x: x.astype(dtype) if jnp.issubdtype(x.dtype, jnp.floating) else x,
        tree,
    )


def make_train_step(loss_fn: Callable, donate: bool = True,
                    compute_dtype: Optional[str] = None,
                    u_bucket: Optional[int] = None):
    """Build a jitted train step.

    ``loss_fn(scores, labels, cand_mask, valid) -> scalar``; model aux losses
    (already weighted) are added on top.

    ``compute_dtype="bfloat16"``: mixed precision (reference
    ``configs/trainer/default.yaml:12`` precision-16 analog, TPU-native) —
    master params and optimizer state stay f32, the forward/backward runs
    with bf16-cast params (the cast is differentiable, so gradients emerge
    f32).  bf16 needs no loss scaling (same exponent range as f32).

    ``u_bucket``: enables the GLOBAL-ROW mode (multi-host training) — the
    returned step takes a third argument ``corpus`` (device-resident
    ``NewsFeatures`` for the whole store) and batches must carry
    ``news=None`` with global store rows; dedup happens on device
    (``data/batch.py::densify``).  An overflowing bucket poisons the loss
    with NaN so the trainer's finite-check raises.
    """
    cdtype = jnp.dtype(compute_dtype) if compute_dtype else None

    def train_step(state: TrainState, batch: RecBatch,
                   corpus: Optional[NewsFeatures] = None) -> Tuple[TrainState, Dict]:
        dropout_rng = jax.random.fold_in(state.dropout_rng, state.step)
        overflow = None
        if corpus is not None:
            batch, overflow = densify(batch, corpus, u_bucket)

        def loss_of(params):
            p = _cast_floats(params, cdtype) if cdtype is not None else params
            scores, aux = state.apply_fn(
                {"params": p},
                batch,
                deterministic=False,
                rngs={"dropout": dropout_rng},
            )
            scores = scores.astype(jnp.float32)
            loss = loss_fn(scores, batch.labels, batch.cand_mask, batch.impression_valid)
            for v in aux.values():
                loss = loss + v.astype(jnp.float32)
            if overflow is not None:
                loss = loss + jnp.where(overflow, jnp.nan, 0.0)
            return loss, (scores, aux)

        (loss, (_, aux)), grads = jax.value_and_grad(loss_of, has_aux=True)(state.params)
        new_state = state.apply_gradients(grads=grads)
        metrics = {"loss": loss, **{f"aux/{k}": v for k, v in aux.items()}}
        return new_state, metrics

    return jax.jit(train_step, donate_argnums=(0,) if donate else ())


def make_eval_step(
    loss_fn: Optional[Callable] = None,
    ranking: Optional[RankingMetrics] = None,
    with_aspects: bool = True,
    compute_dtype: Optional[str] = None,
    u_bucket: Optional[int] = None,
):
    """Build a jitted eval step → (scores, per-impression metrics, loss).

    ``u_bucket``: global-row mode — see ``make_train_step``; the step takes
    a third ``corpus`` argument and dedups on device.
    """
    ranking = ranking or RankingMetrics()
    cdtype = jnp.dtype(compute_dtype) if compute_dtype else None

    def eval_step(state: TrainState, batch: RecBatch,
                  corpus: Optional[NewsFeatures] = None):
        if corpus is not None:
            batch, _ = densify(batch, corpus, u_bucket)
        p = _cast_floats(state.params, cdtype) if cdtype is not None else state.params
        scores, _ = state.apply_fn({"params": p}, batch, deterministic=True)
        scores = scores.astype(jnp.float32)
        scores = mask_scores(scores, batch.cand_mask)
        valid = (
            batch.impression_valid
            if batch.impression_valid is not None
            else jnp.ones(scores.shape[0], dtype=bool)
        )
        kwargs = {}
        if with_aspects and batch.news.category is not None:
            categ = news_field(batch, "category")
            kwargs["cand_categories"] = jnp.take(categ, batch.cand_idx, axis=0)
            kwargs["hist_categories"] = jnp.take(categ, batch.hist_idx, axis=0)
        if with_aspects and batch.news.sentiment is not None:
            sent = news_field(batch, "sentiment")
            kwargs["cand_sentiments"] = jnp.take(sent, batch.cand_idx, axis=0)
            kwargs["hist_sentiments"] = jnp.take(sent, batch.hist_idx, axis=0)
        if kwargs:
            kwargs["hist_mask"] = batch.hist_mask
        per_imp = ranking.per_impression(scores, batch.labels, batch.cand_mask, **kwargs)
        loss = None
        if loss_fn is not None:
            loss = loss_fn(scores, batch.labels, batch.cand_mask, valid)
        return scores, per_imp, valid, loss

    return jax.jit(eval_step)
