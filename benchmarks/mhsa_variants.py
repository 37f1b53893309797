"""Microbenchmark: XLA formulations of the small-sequence MHSA core.

The news-encoder MHSA (U=4096 articles, L=30 tokens, D=300, H=15 heads,
head_dim=20) is the hot op of every path (train step, uncached eval, corpus
encode).  The standard per-head batched-matmul lowering runs at ~5% MFU on
v5e because each (30x20)@(20x30) matmul occupies a sliver of the 128x128 MXU.

Variants measured here (all numerically equivalent up to dtype):
  current   - reshape+swapaxes per-head einsum (what components/attention.py does)
  folded    - heads folded into the batch dim: (U*H, L, hd)
  headexp   - block-diagonal head expansion: K/V expanded to (U, H*L, D) with
              per-head masking so logits/AV become TWO full-D batched matmuls
              at near-full MXU utilization (15x logical FLOPs, zeros padded).
  qknorm    - dot_general with explicit batch dims (U, H), no swapaxes

Run on the real chip: python benchmarks/mhsa_variants.py

**Measured on TPU v5e (round 2):**

    float32  current/folded/dg: 13.6 ms     headexp: 35.0 ms
    bfloat16 current/folded/dg:  8.1 ms     headexp: 24.4 ms

Conclusion: XLA's lowering is formulation-invariant at these shapes — the
per-head einsum, the head-folded batch layout, and the explicit dot_general
all compile to the same schedule, so there is no reformulation win to wire
into ``components/attention.py``.  The block-diagonal head expansion pays
15x logical FLOPs plus ~2 GB of expanded K/V HBM traffic and loses 3x.  The
remaining levers are dtype (bf16 is 1.7x f32 and is the production default)
and a future Pallas per-article layout (see ``ops/mhsa.py`` — the round-2
kernel's online-softmax chain loses to XLA; analysis in its docstring).
"""

from __future__ import annotations

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, __file__.rsplit("/", 2)[0])
from newsreclib_tpu.utils.timing import timeit_pipelined  # noqa: E402

U, L, D, H = 4096, 30, 300, 15
HD = D // H


def attn_current(q, k, v, mask):
    def split_heads(t):
        t = t.reshape(t.shape[:-1] + (H, HD))
        return jnp.swapaxes(t, -2, -3)

    qh, kh, vh = split_heads(q), split_heads(k), split_heads(v)
    logits = jnp.einsum("...ld,...md->...lm", qh, kh) / jnp.sqrt(
        jnp.asarray(HD, dtype=q.dtype)
    )
    logits = jnp.where(mask[:, None, None, :], logits, -1e30)
    w = jax.nn.softmax(logits, axis=-1)
    out = jnp.einsum("...lm,...md->...ld", w, vh)
    out = jnp.swapaxes(out, -2, -3)
    return out.reshape(out.shape[:-2] + (D,))


def attn_folded(q, k, v, mask):
    def fold(t):
        t = t.reshape(U, L, H, HD)
        return jnp.swapaxes(t, 1, 2).reshape(U * H, L, HD)

    qh, kh, vh = fold(q), fold(k), fold(v)
    logits = jnp.einsum("bld,bmd->blm", qh, kh) / jnp.sqrt(jnp.asarray(HD, q.dtype))
    m = jnp.repeat(mask, H, axis=0)  # (U*H, L)
    logits = jnp.where(m[:, None, :], logits, -1e30)
    w = jax.nn.softmax(logits, axis=-1)
    out = jnp.einsum("blm,bmd->bld", w, vh)
    out = out.reshape(U, H, L, HD)
    return jnp.swapaxes(out, 1, 2).reshape(U, L, D)


def _head_indicator(dtype):
    ind = np.zeros((H, D), dtype=np.float32)
    for h in range(H):
        ind[h, h * HD : (h + 1) * HD] = 1.0
    return jnp.asarray(ind, dtype=dtype)


def _group_sum_matrix(dtype):
    """(H*L, H*L) block-diagonal ones: column j's group-sum via one matmul."""
    b = np.kron(np.eye(H, dtype=np.float32), np.ones((L, L), dtype=np.float32))
    return jnp.asarray(b, dtype=dtype)


def attn_headexp(q, k, v, mask):
    ind = _head_indicator(q.dtype)  # (H, D)
    # K_exp[u, h*L+m, d] = k[u,m,d] * ind[h,d]
    k_exp = (k[:, None, :, :] * ind[None, :, None, :]).reshape(U, H * L, D)
    v_exp = (v[:, None, :, :] * ind[None, :, None, :]).reshape(U, H * L, D)
    logits = jnp.einsum("uld,umd->ulm", q, k_exp) / jnp.sqrt(
        jnp.asarray(HD, q.dtype)
    )  # (U, L, H*L)
    m = jnp.tile(mask, (1, H))  # (U, H*L)
    logits = jnp.where(m[:, None, :], logits, -1e30)
    # softmax within each head's L-group: subtract the row max (constant per
    # row => constant within each group => valid), then group-sum via the
    # block-diagonal ones matmul
    mx = jnp.max(logits, axis=-1, keepdims=True)
    e = jnp.exp(logits - mx)
    denom = jnp.einsum("ulm,mn->uln", e, _group_sum_matrix(q.dtype))
    w = e / jnp.maximum(denom, 1e-9)
    return jnp.einsum("ulm,umd->uld", w, v_exp)


def attn_dg(q, k, v, mask):
    qh = q.reshape(U, L, H, HD)
    kh = k.reshape(U, L, H, HD)
    vh = v.reshape(U, L, H, HD)
    # dot_general with batch dims (U, H) directly on the (U, L, H, HD) layout
    logits = jax.lax.dot_general(
        qh, kh, (((3,), (3,)), ((0, 2), (0, 2)))
    ) / jnp.sqrt(jnp.asarray(HD, q.dtype))  # (U, H, L, M)
    logits = jnp.where(mask[:, None, None, :], logits, -1e30)
    w = jax.nn.softmax(logits, axis=-1)
    out = jax.lax.dot_general(w, vh, (((3,), (1,)), ((0, 1), (0, 2))))  # (U,H,L,HD)
    return jnp.swapaxes(out, 1, 2).reshape(U, L, D)


def main():
    rng = np.random.default_rng(0)
    mask_np = np.zeros((U, L), dtype=bool)
    lens = rng.integers(5, L + 1, size=U)
    for i in range(U):
        mask_np[i, : lens[i]] = True

    for dtype in (jnp.float32, jnp.bfloat16):
        q = jnp.asarray(rng.standard_normal((U, L, D)), dtype=dtype)
        k = jnp.asarray(rng.standard_normal((U, L, D)), dtype=dtype)
        v = jnp.asarray(rng.standard_normal((U, L, D)), dtype=dtype)
        mask = jnp.asarray(mask_np)
        q, k, v, mask = jax.device_put((q, k, v, mask))

        ref = None
        for name, fn in [
            ("current", attn_current),
            ("folded", attn_folded),
            ("dg", attn_dg),
            ("headexp", attn_headexp),
        ]:
            jfn = jax.jit(fn)
            out = jax.block_until_ready(jfn(q, k, v, mask))
            outm = np.asarray(out, dtype=np.float32) * mask_np[:, :, None]
            if ref is None:
                ref = outm
                err = 0.0
            else:
                err = float(np.max(np.abs(outm - ref)))
            dt = timeit_pipelined(jfn, q, k, v, mask, steps=20)
            print(
                f"{str(dtype.__name__ if hasattr(dtype,'__name__') else dtype):>9} "
                f"{name:>8}: {dt*1e3:7.2f} ms   maxerr={err:.2e}",
                flush=True,
            )


if __name__ == "__main__":
    main()
