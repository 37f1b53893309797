"""Losses: masked cross-entropy and supervised contrastive on score slates.

Reference analogs:
  * CE — ``torch.nn.CrossEntropyLoss()(scores, y_true)`` with dense {0,1}
    probability targets (``nrms_module.py:287-289``,
    ``abstract_recommender.py:113-124``).
  * SupCon — ``components/losses.py:6-40``: temperature-scaled,
    max-subtracted logsumexp **directly on the score matrix**, positives
    averaged per anchor, AvgNonZero reduction over anchors.

The reference builds ragged pos/neg index tuples per impression in Python
(``nrms_module.py:290-316``); here both losses are dense masked reductions
over fixed-shape ``(B, C)`` slates — jit/TPU friendly, no host round trips.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

_MASK_MIN = -1e30
_EPS = 1e-8


def _masked_logsumexp(x: jnp.ndarray, mask: jnp.ndarray, axis: int = -1) -> jnp.ndarray:
    x = jnp.where(mask, x, _MASK_MIN)
    m = jax.lax.stop_gradient(jnp.max(x, axis=axis, keepdims=True))
    return jnp.squeeze(m, axis) + jnp.log(
        jnp.sum(jnp.where(mask, jnp.exp(x - m), 0.0), axis=axis)
    )


def cross_entropy_loss(
    scores: jnp.ndarray,
    labels: jnp.ndarray,
    mask: Optional[jnp.ndarray] = None,
    valid: Optional[jnp.ndarray] = None,
) -> jnp.ndarray:
    """Soft-target CE over candidate slates, mean over (valid) impressions.

    Matches ``CrossEntropyLoss`` with probability targets: the target vector
    is NOT renormalized (training slates have exactly one positive).
    """
    scores = scores.astype(jnp.float32)
    if mask is None:
        mask = jnp.ones_like(scores, dtype=bool)
    lse = _masked_logsumexp(scores, mask)
    log_prob = jnp.where(mask, scores, 0.0) - lse[..., None]
    per_row = -jnp.sum(labels * log_prob * mask, axis=-1)
    if valid is None:
        return jnp.mean(per_row)
    v = valid.astype(jnp.float32)
    return jnp.sum(per_row * v) / jnp.maximum(jnp.sum(v), 1.0)


def supcon_loss(
    scores: jnp.ndarray,
    labels: jnp.ndarray,
    mask: Optional[jnp.ndarray] = None,
    valid: Optional[jnp.ndarray] = None,
    temperature: float = 0.1,
) -> jnp.ndarray:
    """Supervised contrastive loss on the score matrix.

    Per impression: -mean_{p in pos} log( exp(s_p/T) / sum_{j in pos∪neg}
    exp(s_j/T) ); averaged over impressions with nonzero loss (AvgNonZero
    reduction), requiring ≥1 positive and ≥1 negative.
    """
    scores = scores.astype(jnp.float32) / temperature
    if mask is None:
        mask = jnp.ones_like(scores, dtype=bool)
    pos = (labels > 0) & mask
    neg = (labels <= 0) & mask
    lse = _masked_logsumexp(scores, mask)
    log_prob = scores - lse[..., None]
    n_pos = jnp.sum(pos, axis=-1).astype(jnp.float32)
    n_neg = jnp.sum(neg, axis=-1).astype(jnp.float32)
    mean_log_prob_pos = jnp.sum(jnp.where(pos, log_prob, 0.0), axis=-1) / (n_pos + _EPS)
    per_row = jnp.where((n_pos > 0) & (n_neg > 0), -mean_log_prob_pos, 0.0)
    if valid is not None:
        per_row = per_row * valid.astype(jnp.float32)
    nonzero = (per_row != 0.0).astype(jnp.float32)
    return jnp.sum(per_row) / jnp.maximum(jnp.sum(nonzero), 1.0)


def dual_loss(
    scores: jnp.ndarray,
    labels: jnp.ndarray,
    mask: Optional[jnp.ndarray] = None,
    valid: Optional[jnp.ndarray] = None,
    temperature: float = 0.1,
    dual_loss_coef: float = 0.5,
) -> jnp.ndarray:
    """(1-c)·CE + c·SupCon (``nrms_module.py:317-328``)."""
    ce = cross_entropy_loss(scores, labels, mask, valid)
    scl = supcon_loss(scores, labels, mask, valid, temperature)
    return (1.0 - dual_loss_coef) * ce + dual_loss_coef * scl


def get_loss_fn(name: str, **kwargs):
    """Loss factory mirroring ``abstract_recommender.py:113-124``."""
    if name == "cross_entropy_loss":
        return cross_entropy_loss
    if name == "sup_con_loss":
        t = kwargs.get("temperature", 0.1)
        return lambda s, l, m=None, v=None: supcon_loss(s, l, m, v, t)
    if name == "dual_loss":
        t = kwargs.get("temperature", 0.1)
        c = kwargs.get("dual_loss_coef", 0.5)
        return lambda s, l, m=None, v=None: dual_loss(s, l, m, v, t, c)
    raise ValueError(f"Loss not defined: {name}")
