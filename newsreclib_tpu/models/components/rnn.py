"""Masked GRU over padded sequences via ``lax.scan``.

TPU-native replacement for torch ``pack_padded_sequence`` + ``nn.GRU``
(reference ``encoders/user/lstur.py:75-86``, ``mins.py:60-74``,
``cen_news_rec.py:78-84``): sequences are left-aligned with a boolean mask;
the carry only advances on valid steps, so the final carry equals the packed
GRU's last hidden state — with fully static shapes and no host-side length
sorting.
"""

from __future__ import annotations

from typing import Optional

import flax.linen as nn
import jax
import jax.numpy as jnp


class MaskedGRU(nn.Module):
    """GRU returning the last valid hidden state.

    x (B, T, D), mask (B, T) [True = valid, left-aligned],
    init_h optional (B, H) → (B, H).
    """

    hidden_dim: int

    @nn.compact
    def __call__(
        self,
        x: jnp.ndarray,
        mask: Optional[jnp.ndarray] = None,
        init_h: Optional[jnp.ndarray] = None,
    ) -> jnp.ndarray:
        b = x.shape[0]
        cell = nn.GRUCell(features=self.hidden_dim)
        if init_h is None:
            h0 = jnp.zeros((b, self.hidden_dim), dtype=x.dtype)
        else:
            h0 = init_h
        if mask is None:
            mask = jnp.ones(x.shape[:2], dtype=bool)

        scan = nn.scan(
            lambda c, carry, inp: _masked_step(c, carry, inp),
            variable_broadcast="params",
            split_rngs={"params": False},
            in_axes=1,
            out_axes=1,
        )
        carry, _ = scan(cell, h0, (x, mask))
        return carry


def _masked_step(cell, carry, inp):
    x_t, m_t = inp
    new_carry, y = cell(carry, x_t)
    keep = m_t[:, None]
    carry = jnp.where(keep, new_carry, carry)
    return carry, y
