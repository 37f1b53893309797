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
    xn = x / (1e-8 + jnp.linalg.norm(x, axis=-1, keepdims=True))
    yn = y / (1e-8 + jnp.linalg.norm(y, axis=-1, keepdims=True))
    sim = jnp.einsum("bmd,bnd->bmn", xn, yn)
    if zero_diagonal:
        assert x.shape[-2] == y.shape[-2]
        eye = jnp.eye(x.shape[-2], dtype=bool)
        sim = jnp.where(eye[None, :, :], 0.0, sim)
    return sim
