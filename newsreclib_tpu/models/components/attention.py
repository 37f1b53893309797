"""Attention building blocks (flax.linen), masked and batch-first.

Reference analogs: ``newsreclib/models/components/layers/attention.py:6-259``.
Behavioral notes vs the reference:

  * All softmaxes here support an explicit boolean mask with true -inf
    masking.  The reference runs softmax over padded positions unmasked
    (``attention.py:36-38``) or fills masked logits with ``1e-30`` — i.e. a
    *zero* logit, not -inf (``attention.py:118``, a known quirk).  Because our
    padding geometry is static (fixed H/L per bucket rather than
    batch-max-length), unmasked softmax would make outputs depend on bucket
    size, so correct masking is required — and strictly better modeling.
  * Everything is batch-first and vectorized over arbitrary leading dims; no
    per-candidate Python loops (the reference CAUM hot loop is replaced by a
    vmapped dense path).
"""

from __future__ import annotations

from typing import Optional

import flax.linen as nn
import jax.numpy as jnp

_MASK_MIN = -1e30


def masked_softmax(logits: jnp.ndarray, mask: Optional[jnp.ndarray], axis: int = -1) -> jnp.ndarray:
    """Softmax with optional boolean mask (True = keep)."""
    if mask is not None:
        logits = jnp.where(mask, logits, _MASK_MIN)
    out = nn.softmax(logits, axis=axis)
    if mask is not None:
        # rows that are fully masked produce uniform garbage; zero them.
        out = jnp.where(mask, out, 0.0)
    return out


class AdditiveAttention(nn.Module):
    """tanh(Linear(x)) · query → softmax → weighted sum.

    THE core pooling op of the library (reference ``attention.py:6-42``).
    Input ``(..., L, D)`` + mask ``(..., L)`` → ``(..., D)``.
    """

    query_dim: int

    @nn.compact
    def __call__(self, x: jnp.ndarray, mask: Optional[jnp.ndarray] = None) -> jnp.ndarray:
        proj = jnp.tanh(nn.Dense(self.query_dim, name="proj")(x))  # (..., L, Q)
        query = self.param(
            "query",
            lambda key, shape: jnp.asarray(
                nn.initializers.uniform(scale=0.2)(key, shape) - 0.1
            ),
            (self.query_dim,),
        )
        logits = jnp.einsum("...lq,q->...l", proj, query)
        weights = masked_softmax(logits, mask)  # (..., L)
        return jnp.einsum("...l,...ld->...d", weights, x)


class MultiHeadSelfAttention(nn.Module):
    """Standard MHSA (torch ``nn.MultiheadAttention`` analog: in/out
    projections with bias, scaled dot-product, Q=K=V).

    Input ``(..., L, D)``, key mask ``(..., L)`` → ``(..., L, D)``.
    """

    num_heads: int
    out_dim: Optional[int] = None  # defaults to input dim
    use_pallas: bool = False  # fused small-seq kernel (3-D inputs only)

    @nn.compact
    def __call__(
        self,
        x: jnp.ndarray,
        mask: Optional[jnp.ndarray] = None,
        pair_mask: Optional[jnp.ndarray] = None,
    ) -> jnp.ndarray:
        """``pair_mask (..., L, L)``: position i may attend to j only where
        True — block-diagonal for article packing (``MHSAAddAtt.pack_to``),
        combined with the key-validity ``mask``."""
        d = self.out_dim or x.shape[-1]
        assert d % self.num_heads == 0, (d, self.num_heads)
        head_dim = d // self.num_heads
        qkv = nn.Dense(3 * d, name="qkv")(x)  # fused in-projection

        if self.use_pallas and x.ndim == 3:
            # the fused kernel has no block-mask input — silently dropping
            # pair_mask would leak cross-article attention (packing)
            assert pair_mask is None, "use_pallas does not support pair_mask"
            from newsreclib_tpu.ops.mhsa import fused_small_mhsa

            m = mask if mask is not None else jnp.ones(x.shape[:2], dtype=bool)
            ctx = fused_small_mhsa(qkv, m, self.num_heads)
            out = nn.Dense(d, name="out")(ctx)
            if mask is not None:
                out = out * mask[..., None].astype(out.dtype)
            return out

        q, k, v = jnp.split(qkv, 3, axis=-1)

        def split_heads(t):  # (..., L, D) -> (..., H, L, hd)
            t = t.reshape(t.shape[:-1] + (self.num_heads, head_dim))
            return jnp.swapaxes(t, -2, -3)

        q, k, v = split_heads(q), split_heads(k), split_heads(v)
        logits = jnp.einsum("...ld,...md->...lm", q, k) / jnp.sqrt(
            jnp.asarray(head_dim, dtype=x.dtype)
        )
        if mask is not None:
            key_mask = mask[..., None, None, :]  # broadcast over heads+queries
            logits = jnp.where(key_mask, logits, _MASK_MIN)
        if pair_mask is not None:
            logits = jnp.where(pair_mask[..., None, :, :], logits, _MASK_MIN)
        weights = nn.softmax(logits, axis=-1)
        out = jnp.einsum("...lm,...md->...ld", weights, v)
        out = jnp.swapaxes(out, -2, -3)
        out = out.reshape(out.shape[:-2] + (d,))
        out = nn.Dense(d, name="out")(out)
        if mask is not None:
            out = out * mask[..., None].astype(out.dtype)
        return out


class PolyAttention(nn.Module):
    """K context codes → K interest vectors (MINER; reference
    ``attention.py:45-122``).  ``(B, L, D)`` → ``(B, K, D)``."""

    num_context_codes: int
    context_code_dim: int

    @nn.compact
    def __call__(
        self,
        x: jnp.ndarray,
        mask: Optional[jnp.ndarray] = None,
        bias: Optional[jnp.ndarray] = None,
    ) -> jnp.ndarray:
        proj = jnp.tanh(
            nn.Dense(self.context_code_dim, use_bias=False, name="proj")(x)
        )  # (B, L, Cc)
        codes = self.param(
            "context_codes",
            nn.initializers.xavier_uniform(),
            (self.num_context_codes, self.context_code_dim),
        )
        logits = jnp.einsum("blc,kc->bkl", proj, codes)
        if bias is not None:
            # reference: bias (B, L, C) → mean over candidates → added per
            # history position (attention.py:113-115)
            logits = logits + jnp.mean(bias, axis=-1)[:, None, :]
        weights = masked_softmax(logits, None if mask is None else mask[:, None, :])
        return jnp.einsum("bkl,bld->bkd", weights, x)


class TargetAwareAttention(nn.Module):
    """MINER's target-aware score aggregation (reference
    ``attention.py:125-166``).

    query ``(B, K, D)``, key ``(B, C, D)``, value ``(B, C, K)`` → ``(B, C)``.
    """

    @nn.compact
    def __call__(self, query: jnp.ndarray, key: jnp.ndarray, value: jnp.ndarray) -> jnp.ndarray:
        d = query.shape[-1]
        proj = nn.gelu(nn.Dense(d, use_bias=False, name="proj")(query))  # (B, K, D)
        weights = nn.softmax(jnp.einsum("bcd,bkd->bck", key, proj), axis=-1)
        return jnp.sum(weights * value, axis=-1)


class DenseAttention(nn.Module):
    """3-layer tanh MLP scorer (CAUM; reference ``attention.py:169-209``).
    ``(..., D)`` → ``(..., 1)``."""

    hidden_dim1: int
    hidden_dim2: int

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        h = jnp.tanh(nn.Dense(self.hidden_dim1, name="fc1")(x))
        h = jnp.tanh(nn.Dense(self.hidden_dim2, name="fc2")(h))
        return nn.Dense(1, name="fc3")(h)


class PersonalizedAttention(nn.Module):
    """NPA's user-preference-query attention (reference
    ``attention.py:212-259``).

    query ``(B, Dq)``, keys ``(B, L, F)`` + mask ``(B, L)`` → ``(B, F)``.
    (Reference passes keys as ``(B, F, L)``; we keep seq-axis-first-of-last
    for consistency with the other blocks.)
    """

    num_filters: int

    @nn.compact
    def __call__(
        self, query: jnp.ndarray, keys: jnp.ndarray, mask: Optional[jnp.ndarray] = None
    ) -> jnp.ndarray:
        q = jnp.tanh(nn.Dense(self.num_filters, name="query_proj")(query))  # (B, F)
        logits = jnp.einsum("bf,blf->bl", q, keys)
        weights = masked_softmax(logits, mask)
        return jnp.einsum("bl,blf->bf", weights, keys)
