"""Train state: params + optimizer + RNG.

Reference analog: Lightning's optimizer wiring
(``abstract_recommender.py:89-108``) — here a plain flax TrainState with
optax, plus a dropout PRNG key folded per step.
"""

from __future__ import annotations

from typing import Any, Callable, Optional

import jax
import jax.numpy as jnp
import optax
from flax.training import train_state


class TrainState(train_state.TrainState):
    dropout_rng: jax.Array = None


def make_optimizer(
    learning_rate: float = 1e-4,
    weight_decay: float = 0.0,
    scheduler: Optional[str] = None,
    warmup_steps: int = 0,
    total_steps: int = 0,
    grad_clip_norm: Optional[float] = None,
    freeze_labels: Optional[Any] = None,
) -> optax.GradientTransformation:
    """Adam (reference default, ``configs/model/nrms.yaml``) with optional
    cosine/warmup schedule, gradient clipping, and parameter freezing.

    ``freeze_labels``: a pytree of 'train'/'freeze' labels (see
    ``plm.plm_freeze_labels``) — 'freeze' params get zero updates, the optax
    equivalent of ``requires_grad=False`` (reference ``text.py:70-73``).
    """
    if scheduler == "cosine":
        lr = optax.warmup_cosine_decay_schedule(
            0.0, learning_rate, warmup_steps, max(total_steps, warmup_steps + 1)
        )
    elif scheduler == "linear_warmup":
        lr = optax.linear_schedule(0.0, learning_rate, max(warmup_steps, 1))
    else:
        lr = learning_rate
    opt = (
        optax.adamw(lr, weight_decay=weight_decay)
        if weight_decay
        else optax.adam(lr)
    )
    if grad_clip_norm:
        opt = optax.chain(optax.clip_by_global_norm(grad_clip_norm), opt)
    if freeze_labels is not None:
        opt = optax.multi_transform(
            {"train": opt, "freeze": optax.set_to_zero()}, freeze_labels
        )
    return opt


def create_train_state(
    model,
    example_batch,
    rng: jax.Array,
    optimizer,
    dropout_rng_impl: "str | None" = None,
) -> TrainState:
    """``optimizer``: a GradientTransformation, or a callable
    ``params -> GradientTransformation`` for optimizers that need the
    initialized param tree (e.g. ``freeze_labels`` from
    ``plm_freeze_labels`` — reference ``text.py:70-73``).

    ``dropout_rng_impl="rbg"``: use the TPU hardware RNG for dropout masks.
    Threefry random-bit generation is a measured 36% of the 12-layer PLM
    train step (54 ms of 148; benchmarks/plm_mfu_probe.py round 5) — rbg
    cuts the full step to 103 ms (54.9% MFU).  Param init stays on threefry
    (same init for either choice); only the dropout stream changes, which
    is seed-like noise (measured band: PARITY.md round-5 section).
    """
    params_rng, dropout_rng = jax.random.split(rng)
    if dropout_rng_impl and dropout_rng_impl != "threefry":
        dropout_rng = jax.random.wrap_key_data(
            jax.random.bits(dropout_rng, (4,), "uint32"), impl=dropout_rng_impl
        )
    variables = model.init(
        {"params": params_rng, "dropout": dropout_rng}, example_batch, deterministic=True
    )
    params = variables["params"]
    if callable(optimizer) and not isinstance(optimizer, optax.GradientTransformation):
        optimizer = optimizer(params)
    return TrainState.create(
        apply_fn=model.apply,
        params=params,
        tx=optimizer,
        dropout_rng=dropout_rng,
    )


def param_count(params) -> int:
    return sum(int(x.size) for x in jax.tree.leaves(params))
