"""Pallas fused multi-head self-attention for many tiny sequences.

The news-encoder workload is thousands of independent short sequences
(L≈30) with small head dim (hd=20).  XLA lowers per-head attention to
U×H tiny (30×20)@(20×30) batched matmuls — ~1-2% MXU utilization; measured
16ms of the 15.6ms NRMS eval step at U=4096 (see bench notes).

This kernel reformulates the per-head contractions via a **head-indicator
matmul**: with E[d, h] = 1 iff feature d belongs to head h,

    logits[u, l, m, h] = sum_d q[u,l,d] * k[u,m,d] * E[d,h]
                       = ((q ⊙ broadcast(k_m)) @ E)[u*l, h]

so each key position m costs one VPU elementwise multiply over (BU·L, Daug)
plus one deep MXU matmul (BU·L, Daug) @ (Daug, H); the output pass uses the
transpose ((p_m @ Eᵀ) ⊙ v_m, accumulated).  All intermediates stay in VMEM;
the only HBM traffic is q/k/v in / context out.

Mosaic-shaped design notes (each of these failed a naive formulation):
  * The key loop is a ``fori_loop`` with an **online softmax**
    (flash-attention style running max/denominator/accumulator): a fully
    unrolled L=30 ×2-pass version produced a program big enough that the
    remote-compile helper was OOM-killed.
  * k/v are passed TRANSPOSED (L, U, D) so the loop's dynamic slice lands
    on the LEADING (untiled) dim — Mosaic cannot dynamically index a tiled
    sublane/lane dim.
  * The key-validity mask is folded into an EXTRA FEATURE COLUMN of
    k (additive-bias trick: q gets a 1, masked keys get ``_MASK_MIN``, the
    indicator matrix routes the bias row to every head) — a separate
    (L, block_u) mask ref cannot satisfy Mosaic's last-two-dims tiling rule
    at useful block sizes.  Features are padded to a multiple of 128 lanes.

Caller contract: rows whose QUERY position is masked return garbage (never
NaN) — callers multiply the output by the query mask, as the torch
``key_padding_mask`` path would.

**Measured on TPU v5e (round 2, U=4096 L=30 D=300 H=15, f32):**
XLA reference 14.9 ms; this kernel 21.5 ms (default precision, 2.4e-2 max
abs err from bf16 MXU passes) / 49.2 ms (HIGHEST).  The kernel LOSES on
v5e, so ``use_pallas`` stays off in every production config.  Analysis: the
per-key online-softmax update touches the full (BU·L, Daug) accumulator
(3 VPU ops/key), giving O(L·N·Daug) serial VPU work ≈ 22 ms at v5e VPU
rates — the MXU indicator matmuls overlap but cannot shrink that chain.
Beating XLA here needs a per-ARTICLE (L, Daug) @ (Daug, L·H) layout whose
per-(l,h) softmax runs over strided lane groups, which Mosaic's reshape
rules currently make impractical.  Kept as a correct, tested reference
kernel (interpret-mode tests + on-chip validation) and a base for a future
layout rework.

**Round-3 per-article layout study (closing the thread).**  The strided-
lane-group obstacle CAN be sidestepped with an all-matmul formulation that
never reshapes: per article, build K_exp (Daug, H·L) = (kᵀ @ T) ⊙ M with a
static tile-indicator T (L, H·L) and head mask M (Daug, H·L); then
logits = q @ K_exp, per-group softmax sums via exp(logits) @ T2 (H·L, H)
and renormalization via @ T2ᵀ, context = p @ ((Tᵀ @ v) ⊙ Mᵀ) — six MXU
matmuls per article, zero Mosaic reshapes/relayouts.  The bound, however,
is the M-dim: every matmul has one operand dim pinned at L≈30 rows (padded
to 32 of the MXU's 128), capping utilization at ~25%.  Total padded work
is ~51 MFLOP/article → 105 GMAC at U=4096; at 25% of v5e's 98.5 TMAC/s
that is ≥4.3 ms vs XLA's measured 8.1 ms bf16 — a ≤1.9× ceiling BEFORE
Mosaic grid overheads (4096 grid steps; the round-2 kernel measured ~7 ms
of pure per-step overhead at this grid size), which erase the margin.
Packing multiple articles into the M dim needs block-diagonal K_exp, which
reintroduces the lane-group problem.  Conclusion: at L≈30/hd=20 shapes no
Pallas formulation clears the XLA baseline by a useful factor; the round-3
win came from shrinking L itself (length-bucketed tables,
``data/batching.py::split_news_by_length`` — the same 25%-utilization
math scales DOWN the per-article work by L_short/L).
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_MASK_MIN = -1e30


def head_indicator(d: int, num_heads: int, dtype=jnp.float32) -> jnp.ndarray:
    """E (D, H): E[i, h] = 1 iff feature i belongs to head h."""
    hd = d // num_heads
    e = np.zeros((d, num_heads), dtype=np.float32)
    for h in range(num_heads):
        e[h * hd : (h + 1) * hd, h] = 1.0
    return jnp.asarray(e, dtype=dtype)


def _aug_indicator(d: int, daug: int, num_heads: int) -> jnp.ndarray:
    """E_aug (Daug, H): head indicator for rows < d, all-ones bias row at d,
    zeros beyond."""
    e = np.zeros((daug, num_heads), dtype=np.float32)
    hd = d // num_heads
    for h in range(num_heads):
        e[h * hd : (h + 1) * hd, h] = 1.0
    e[d, :] = 1.0
    return jnp.asarray(e)


def _attention_kernel(q_ref, k_ref, v_ref, e_ref, o_ref, *, num_heads, scale,
                      seq_len, precision):
    bu, l, daug = q_ref.shape
    h = num_heads
    n = bu * l
    q2d = q_ref[:].reshape(n, daug).astype(jnp.float32)
    e = e_ref[:].astype(jnp.float32)  # (Daug, H)

    def body(m, carry):
        m_run, l_run, acc = carry
        k_m = k_ref[pl.ds(m, 1), :, :].astype(jnp.float32)  # (1, BU, Daug)
        k_b = jnp.broadcast_to(k_m.reshape(bu, 1, daug), (bu, l, daug)).reshape(n, daug)
        # logits + (routed) mask bias, one deep MXU matmul.  `precision`
        # controls MXU input truncation: default = bf16 passes (fast,
        # ~2e-2 abs err vs f32), HIGHEST = 3-pass f32 emulation.
        lg = jax.lax.dot_general(
            q2d * k_b, e, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32, precision=precision,
        ) * scale  # (N, H)

        m_new = jnp.maximum(m_run, lg)
        alpha = jnp.exp(m_run - m_new)  # correction for the old state
        p = jnp.exp(lg - m_new)
        l_new = l_run * alpha + p
        # expand per-head scalars onto their feature slots (E is an
        # indicator, so X @ Eᵀ broadcasts head h's value over its features;
        # the bias row's column lands on padded features ⊙ v=0).  Each
        # output feature receives exactly ONE nonzero term, so the only
        # precision cost is the bf16 rounding of p/alpha themselves.
        alpha_full = jax.lax.dot_general(
            alpha, e, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32, precision=precision,
        )  # (N, Daug)
        p_full = jax.lax.dot_general(
            p, e, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32, precision=precision,
        )
        v_m = v_ref[pl.ds(m, 1), :, :].astype(jnp.float32)
        v_b = jnp.broadcast_to(v_m.reshape(bu, 1, daug), (bu, l, daug)).reshape(n, daug)
        acc_new = acc * alpha_full + p_full * v_b
        return m_new, l_new, acc_new

    init = (
        jnp.full((n, h), _MASK_MIN, jnp.float32),
        jnp.zeros((n, h), jnp.float32),
        jnp.zeros((n, daug), jnp.float32),
    )
    _, l_run, acc = jax.lax.fori_loop(0, seq_len, body, init)
    denom = jax.lax.dot_general(
        l_run, e, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    )  # (N, Daug)
    out = acc / jnp.maximum(denom, 1e-30)
    o_ref[:] = out.reshape(bu, l, daug).astype(o_ref.dtype)


def fused_small_mhsa(
    qkv: jnp.ndarray,  # (U, L, 3D) — fused projection output
    mask: jnp.ndarray,  # (U, L) bool
    num_heads: int,
    block_u: int = 16,  # 32 exceeds the 16MB scoped-VMEM limit at D=300,L=30
    interpret: bool = False,
    precision=None,  # None → MXU default (bf16 passes); Precision.HIGHEST → f32
) -> jnp.ndarray:
    """(U, L, 3D) qkv + mask → (U, L, D) attention context.

    Rows at masked QUERY positions contain garbage — callers zero them
    (see module docstring).
    """
    u, l, d3 = qkv.shape
    d = d3 // 3
    assert d % num_heads == 0
    pad_u = (-u) % block_u
    if pad_u:
        qkv = jnp.pad(qkv, ((0, pad_u), (0, 0), (0, 0)))
        mask = jnp.pad(mask, ((0, pad_u), (0, 0)))
    up = qkv.shape[0]
    daug = -(-(d + 1) // 128) * 128  # bias column + lane padding
    scale = 1.0 / float(np.sqrt(d // num_heads))

    q, k, v = jnp.split(qkv, 3, axis=-1)
    pad_feat = ((0, 0), (0, 0), (0, daug - d))
    # q: bias column = 1 (picks up k's bias); k: bias column = mask bias
    q_aug = jnp.pad(q.astype(jnp.float32), pad_feat).at[:, :, d].set(1.0)
    bias = jnp.where(mask, 0.0, _MASK_MIN).astype(jnp.float32)
    k_aug = jnp.pad(k.astype(jnp.float32), pad_feat).at[:, :, d].set(bias)
    v_aug = jnp.pad(v.astype(jnp.float32), pad_feat)
    k_t = jnp.swapaxes(k_aug, 0, 1)  # (L, U, Daug)
    v_t = jnp.swapaxes(v_aug, 0, 1)
    e_aug = _aug_indicator(d, daug, num_heads)

    grid = (up // block_u,)
    q_spec = pl.BlockSpec((block_u, l, daug), lambda i: (i, 0, 0), memory_space=pltpu.VMEM)
    kv_spec = pl.BlockSpec((l, block_u, daug), lambda i: (0, i, 0), memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        functools.partial(
            _attention_kernel, num_heads=num_heads, scale=scale, seq_len=l,
            precision=precision,
        ),
        grid=grid,
        in_specs=[
            q_spec,
            kv_spec,
            kv_spec,
            pl.BlockSpec((daug, num_heads), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (block_u, l, daug), lambda i: (i, 0, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((up, l, daug), jnp.float32),
        interpret=interpret,
    )(q_aug, k_t, v_t, e_aug)
    return out[:u, :, :d].astype(qkv.dtype)


def mhsa_reference(qkv: jnp.ndarray, mask: jnp.ndarray, num_heads: int) -> jnp.ndarray:
    """Plain-XLA reference for numerics tests."""
    u, l, d3 = qkv.shape
    d = d3 // 3
    hd = d // num_heads
    q, k, v = jnp.split(qkv, 3, axis=-1)
    sp = lambda t: jnp.swapaxes(t.reshape(u, l, num_heads, hd), 1, 2)
    logits = jnp.einsum("uhld,uhmd->uhlm", sp(q), sp(k)) / np.sqrt(hd)
    logits = jnp.where(mask[:, None, None, :], logits, _MASK_MIN)
    w = jax.nn.softmax(logits, axis=-1)
    o = jnp.einsum("uhlm,uhmd->uhld", w, sp(v))
    return jnp.swapaxes(o, 1, 2).reshape(u, l, d)
