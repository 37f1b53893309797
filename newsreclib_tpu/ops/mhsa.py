"""Pallas fused multi-head self-attention for many tiny sequences.

The news-encoder workload is thousands of independent short sequences
(L≈30) with small head dim (hd=20).  XLA lowers per-head attention to
U×H tiny (30×20)@(20×30) batched matmuls — ~1-2% MXU utilization; measured
16ms of the 15.6ms NRMS eval step at U=4096 (see bench notes).

This kernel reformulates the per-head contractions via a **head-indicator
matmul**: with E[d, h] = 1 iff feature d belongs to head h,

    logits[u, l, m, h] = sum_d q[u,l,d] * k[u,m,d] * E[d,h]
                       = ((q ⊙ broadcast(k_m)) @ E)[u*l, h]

so each key position m costs one VPU elementwise multiply over (BU·L, D)
plus one deep MXU matmul (BU·L, D) @ (D, H); the output pass uses the
transpose ((p_m @ Eᵀ) ⊙ v_m, accumulated).  All intermediates stay in VMEM;
the only HBM traffic is q/k/v in / context out.

The key loop is a ``fori_loop`` with an **online softmax** (flash-attention
style running max/denominator/accumulator): the round-1 version unrolled
L=30 iterations twice, and the resulting Mosaic program was large enough
that the remote-compile helper OOM-killed — the rolled loop compiles.

Layout: qkv (U, L, 3D) from one fused input projection is split into
separate q/k/v arrays OUTSIDE the kernel (a block whose last dim is a
D-wide column window of the 3D-wide array cannot lower — Mosaic requires
the last block dims to be 8/128-multiples or the full array dims); grid
over article blocks of BU.
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


def _attention_kernel(q_ref, k_ref, v_ref, mask_ref, e_ref, o_ref, *, num_heads, scale):
    bu, l, d = q_ref.shape
    h = num_heads
    n = bu * l
    q2d = q_ref[:].reshape(n, d).astype(jnp.float32)
    e = e_ref[:].astype(jnp.float32)  # (D, H)

    def body(m, carry):
        m_run, l_run, acc = carry
        # ref-level dynamic slices (loaded-array dynamic_slice doesn't lower)
        k_m = k_ref[:, pl.ds(m, 1), :].astype(jnp.float32)  # (BU, 1, D)
        k_b = jnp.broadcast_to(k_m, (bu, l, d)).reshape(n, d)
        lg = jax.lax.dot_general(
            q2d * k_b, e, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) * scale  # (N, H)
        kv = mask_ref[:, pl.ds(m, 1)]  # (BU, 1)
        kvb = jnp.broadcast_to(kv[:, :, None], (bu, l, h)).reshape(n, h)
        lg = jnp.where(kvb != 0, lg, _MASK_MIN)

        m_new = jnp.maximum(m_run, lg)
        alpha = jnp.exp(m_run - m_new)  # (N, H) correction for old state
        p = jnp.exp(lg - m_new)  # (N, H)
        l_new = l_run * alpha + p
        # expand per-head scalars onto their feature slots (E is an
        # indicator, so X @ E^T broadcasts head h's value over its features)
        alpha_full = jax.lax.dot_general(
            alpha, e, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        )  # (N, D)
        p_full = jax.lax.dot_general(
            p, e, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        )
        v_m = v_ref[:, pl.ds(m, 1), :].astype(jnp.float32)
        v_b = jnp.broadcast_to(v_m, (bu, l, d)).reshape(n, d)
        acc_new = acc * alpha_full + p_full * v_b
        return m_new, l_new, acc_new

    init = (
        jnp.full((n, h), _MASK_MIN, jnp.float32),
        jnp.zeros((n, h), jnp.float32),
        jnp.zeros((n, d), jnp.float32),
    )
    _, l_run, acc = jax.lax.fori_loop(0, l, body, init)
    denom = jax.lax.dot_general(
        l_run, e, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    )  # (N, D)
    out = acc / jnp.maximum(denom, 1e-30)
    o_ref[:] = out.reshape(bu, l, d).astype(o_ref.dtype)


def fused_small_mhsa(
    qkv: jnp.ndarray,  # (U, L, 3D) — fused projection output
    mask: jnp.ndarray,  # (U, L) bool
    num_heads: int,
    block_u: int = 32,
    interpret: bool = False,
) -> jnp.ndarray:
    """(U, L, 3D) qkv + mask → (U, L, D) attention context."""
    u, l, d3 = qkv.shape
    d = d3 // 3
    assert d % num_heads == 0
    pad_u = (-u) % block_u
    if pad_u:
        qkv = jnp.pad(qkv, ((0, pad_u), (0, 0), (0, 0)))
        mask = jnp.pad(mask, ((0, pad_u), (0, 0)))
    up = qkv.shape[0]
    e = head_indicator(d, num_heads, jnp.float32)
    maskf = mask.astype(jnp.float32)
    scale = 1.0 / float(np.sqrt(d // num_heads))

    grid = (up // block_u,)
    # q/k/v split OUTSIDE the kernel: a block whose last dim is a D-wide
    # column window of the 3D-wide qkv array cannot lower (Mosaic requires
    # the last two block dims to be 8/128-multiples or the full array dims)
    q, k, v = jnp.split(qkv, 3, axis=-1)
    spec = pl.BlockSpec((block_u, l, d), lambda i: (i, 0, 0), memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        functools.partial(_attention_kernel, num_heads=num_heads, scale=scale),
        grid=grid,
        in_specs=[
            spec,
            spec,
            spec,
            pl.BlockSpec((block_u, l), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((d, num_heads), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (block_u, l, d), lambda i: (i, 0, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((up, l, d), qkv.dtype),
        interpret=interpret,
    )(q, k, v, maskf, e)
    return out[:u]


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
