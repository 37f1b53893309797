"""Click predictors: (user vector, candidate vectors) → scores.

Reference analogs: ``layers/click_predictor.py:5-44``.  The dot-product
scoring op is the per-step hot op; ``newsreclib_tpu/ops/scoring.py`` provides
a Pallas-fused variant used by the benchmark path — this module is the plain
XLA form (a single batched matmul, already MXU-friendly).
"""

from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp


def dot_product_scores(user_vec: jnp.ndarray, cand_vecs: jnp.ndarray) -> jnp.ndarray:
    """user (B, D) × candidates (B, C, D) → scores (B, C)."""
    return jnp.einsum("bd,bcd->bc", user_vec, cand_vecs)


class DNNPredictor(nn.Module):
    """DKN's MLP click predictor: concat(cand, user) → Linear→ReLU→Linear.

    user_vecs (..., C, D) per-candidate user vectors, cand_vecs (..., C, D)
    → scores (..., C) — matching ``click_predictor.py:40-44``.
    """

    hidden_dim: int

    @nn.compact
    def __call__(self, user_vecs: jnp.ndarray, cand_vecs: jnp.ndarray) -> jnp.ndarray:
        x = jnp.concatenate([cand_vecs, user_vecs], axis=-1)
        h = nn.relu(nn.Dense(self.hidden_dim, name="fc1")(x))
        return nn.Dense(1, name="fc2")(h)[..., 0]
