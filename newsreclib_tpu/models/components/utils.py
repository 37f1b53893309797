"""Small math utilities shared by model components.

Reference analog: ``newsreclib/models/components/utils.py:4-39``.
"""

from __future__ import annotations

import jax.numpy as jnp


def pairwise_cosine_similarity(
    x: jnp.ndarray, y: jnp.ndarray, zero_diagonal: bool = False
) -> jnp.ndarray:
    """Batched pairwise cosine-similarity matrix.

    x (B, M, D), y (B, N, D) → (B, M, N); optionally zero the diagonal
    (MINER disagreement regularization + category bias).
    """
    # max-guarded sqrt: zero vectors (padded articles) normalize to zero with
    # zero gradient instead of NaN (d/dx sqrt at 0)
    def _normalize(v):
        sq = jnp.sum(v * v, axis=-1, keepdims=True)
        return v / jnp.sqrt(jnp.maximum(sq, 1e-16))

    xn = _normalize(x)
    yn = _normalize(y)
    sim = jnp.einsum("bmd,bnd->bmn", xn, yn)
    if zero_diagonal:
        assert x.shape[-2] == y.shape[-2]
        eye = jnp.eye(x.shape[-2], dtype=bool)
        sim = jnp.where(eye[None, :, :], 0.0, sim)
    return sim
