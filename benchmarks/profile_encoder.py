"""Fine-grained timing of the MHSAAddAtt news-encoder internals (round 3).

Isolates embed-gather / QKV dense / attention core / out dense / additive
attention at the bench encode shape (U=4096, L=30, D=300, H=15), plus
alternative attention-core formulations, to find where the 10.5 ms encode
forward (of the 37 ms train step) goes.  Feeds docs/architecture.md.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main() -> None:
    import jax
    import jax.numpy as jnp

    from newsreclib_tpu.utils.timing import timeit_pipelined

    U, L, D, H, VOCAB = 4096, 30, 300, 15, 60000
    hd = D // H
    rng = np.random.default_rng(0)
    key = jax.random.key(0)

    tok = jnp.asarray(rng.integers(0, VOCAB, size=(U, L)), jnp.int32)
    mask = jnp.asarray(rng.random((U, L)) < 0.8)
    table = jax.device_put(jnp.asarray(rng.standard_normal((VOCAB, D)), jnp.bfloat16))
    x = jax.device_put(jnp.asarray(rng.standard_normal((U, L, D)), jnp.bfloat16))
    wqkv = jax.device_put(jnp.asarray(rng.standard_normal((D, 3 * D)) * 0.05, jnp.bfloat16))
    wout = jax.device_put(jnp.asarray(rng.standard_normal((D, D)) * 0.05, jnp.bfloat16))
    qkv = jax.device_put(jnp.asarray(rng.standard_normal((U, L, 3 * D)), jnp.bfloat16))

    def t(name, fn, *args, steps=20):
        f = jax.jit(fn)
        jax.block_until_ready(f(*args))
        dt = timeit_pipelined(f, *args, steps=steps, warmup=2)
        print(f"{name:<52s} {dt*1e3:8.3f} ms", flush=True)
        return dt

    t("embed gather (U,L) from (60k,300)", lambda tb, tk: jnp.take(tb, tk, axis=0), table, tok)
    t("qkv dense (U,L,300)@(300,900)", lambda a, w: a @ w, x, wqkv)

    def split_heads(v):
        v = v.reshape(U, L, H, hd)
        return jnp.swapaxes(v, 1, 2)  # (U,H,L,hd)

    def attn_core(qkv, mask):
        q, k, v = jnp.split(qkv, 3, axis=-1)
        q, k, v = split_heads(q), split_heads(k), split_heads(v)
        logits = jnp.einsum("uhld,uhmd->uhlm", q, k) / np.sqrt(hd)
        logits = jnp.where(mask[:, None, None, :], logits, -1e30)
        w = jax.nn.softmax(logits, axis=-1)
        o = jnp.einsum("uhlm,uhmd->uhld", w, v)
        return jnp.swapaxes(o, 1, 2).reshape(U, L, D)

    t("attention core (split-head einsum)", attn_core, qkv, mask)

    def attn_core_noswap(qkv, mask):
        q, k, v = jnp.split(qkv, 3, axis=-1)
        r = lambda t_: t_.reshape(U, L, H, hd)
        logits = jnp.einsum("ulhd,umhd->uhlm", r(q), r(k)) / np.sqrt(hd)
        logits = jnp.where(mask[:, None, None, :], logits, -1e30)
        w = jax.nn.softmax(logits, axis=-1)
        o = jnp.einsum("uhlm,umhd->ulhd", w, r(v))
        return o.reshape(U, L, D)

    t("attention core (no-swap einsum)", attn_core_noswap, qkv, mask)

    def attn_core_f32logits(qkv, mask):
        q, k, v = jnp.split(qkv, 3, axis=-1)
        q, k, v = split_heads(q), split_heads(k), split_heads(v)
        logits = jnp.einsum("uhld,uhmd->uhlm", q, k,
                            preferred_element_type=jnp.float32) / np.sqrt(hd)
        big = jnp.asarray(-1e30, jnp.float32)
        logits = jnp.where(mask[:, None, None, :], logits, big)
        w = jax.nn.softmax(logits, axis=-1).astype(qkv.dtype)
        o = jnp.einsum("uhlm,uhmd->uhld", w, v)
        return jnp.swapaxes(o, 1, 2).reshape(U, L, D)

    t("attention core (f32 logits/softmax)", attn_core_f32logits, qkv, mask)

    def attn_merged_batch(qkv, mask):
        # fold heads into the batch dim → (U*H, L, hd) batched matmuls
        q, k, v = jnp.split(qkv, 3, axis=-1)
        m = lambda t_: jnp.swapaxes(t_.reshape(U, L, H, hd), 1, 2).reshape(U * H, L, hd)
        qm, km, vm = m(q), m(k), m(v)
        logits = jnp.einsum("bld,bmd->blm", qm, km) / np.sqrt(hd)
        mk = jnp.broadcast_to(mask[:, None, None, :], (U, H, 1, L)).reshape(U * H, 1, L)
        logits = jnp.where(mk, logits, -1e30)
        w = jax.nn.softmax(logits, axis=-1)
        o = jnp.einsum("blm,bmd->bld", w, vm)
        return jnp.swapaxes(o.reshape(U, H, L, hd), 1, 2).reshape(U, L, D)

    t("attention core (heads folded into batch)", attn_merged_batch, qkv, mask)

    t("out dense + mask", lambda c, w, m: (c @ w) * m[..., None].astype(c.dtype),
      x, wout, mask)

    wproj = jax.device_put(jnp.asarray(rng.standard_normal((D, 200)) * 0.05, jnp.bfloat16))
    qv = jax.device_put(jnp.asarray(rng.standard_normal((200,)) * 0.1, jnp.bfloat16))

    def addatt(ctx, wp, q, m):
        proj = jnp.tanh(ctx @ wp)
        logits = jnp.einsum("ulq,q->ul", proj, q)
        logits = jnp.where(m, logits, -1e30)
        w = jax.nn.softmax(logits, axis=-1)
        w = jnp.where(m, w, 0.0)
        return jnp.einsum("ul,uld->ud", w, ctx)

    t("additive attention (U,L,300)->(U,300)", addatt, x, wproj, qv, mask)

    # dropout rng cost at this shape
    t("dropout mask gen+apply (U,L,300)",
      lambda a, k2: a * jax.random.bernoulli(k2, 0.8, a.shape), x, key)

    # L sensitivity of the attention core
    for Lp in (8, 16, 32):
        qkv_p = jax.device_put(jnp.asarray(rng.standard_normal((U, Lp, 3 * D)), jnp.bfloat16))
        mask_p = jnp.asarray(rng.random((U, Lp)) < 0.8)

        def core_L(qkv, mask, Lp=Lp):
            q, k, v = jnp.split(qkv, 3, axis=-1)
            sh = lambda t_: jnp.swapaxes(t_.reshape(U, Lp, H, hd), 1, 2)
            q, k, v = sh(q), sh(k), sh(v)
            logits = jnp.einsum("uhld,uhmd->uhlm", q, k) / np.sqrt(hd)
            logits = jnp.where(mask[:, None, None, :], logits, -1e30)
            w = jax.nn.softmax(logits, axis=-1)
            o = jnp.einsum("uhlm,uhmd->uhld", w, v)
            return jnp.swapaxes(o, 1, 2).reshape(U, Lp, D)

        t(f"attention core at L={Lp}", core_L, qkv_p, mask_p)


if __name__ == "__main__":
    main()
