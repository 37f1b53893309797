"""Embedding layers: pretrained word embeddings, category/user tables.

Reference analogs: ``nn.Embedding.from_pretrained(freeze=False,
padding_idx=0)`` call sites in ``encoders/news/text.py:151-153,215-217`` and
``encoders/news/category.py:8-83``.

TPU notes: lookups are plain gathers (XLA lowers to efficient dynamic-gather
on TPU); padding semantics are enforced by multiplying the output with an
``id != 0`` mask, which both zeroes the padding vector and blocks its
gradient — the functional equivalent of torch's ``padding_idx``.  A
row-sharded variant for host-spanning vocabularies lives in
``newsreclib_tpu/parallel/embedding.py``.
"""

from __future__ import annotations

from typing import Callable, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np


def pretrained_init(matrix: np.ndarray) -> Callable:
    """Returns a flax initializer yielding the given (numpy) matrix."""
    arr = np.asarray(matrix, dtype=np.float32)

    def init(key, shape, dtype=jnp.float32):
        assert tuple(shape) == arr.shape, (shape, arr.shape)
        return jnp.asarray(arr, dtype=dtype)

    return init


class TokenEmbedding(nn.Module):
    """Trainable token-embedding table, optionally from a pretrained matrix,
    with torch-``padding_idx=0`` semantics (zero vector + zero grad)."""

    vocab_size: int
    embed_dim: int
    pretrained: Optional[np.ndarray] = None  # (vocab_size, embed_dim)
    frozen: bool = False

    @nn.compact
    def __call__(self, ids: jnp.ndarray) -> jnp.ndarray:
        init = (
            pretrained_init(self.pretrained)
            if self.pretrained is not None
            else nn.initializers.normal(stddev=0.02)
        )
        table = self.param("embedding", init, (self.vocab_size, self.embed_dim))
        if self.frozen:
            table = jax.lax.stop_gradient(table)
        out = jnp.take(table, ids, axis=0)
        return out * (ids != 0)[..., None].astype(out.dtype)
