"""Decomposed timing of the NRMS train step at bench shapes.

VERDICT r2 asked for a profile-backed breakdown of the 37 ms train step
(bench.py: B=256, H=50, C=5, U=4096, L=30, bf16 compute).  jax.profiler
device traces are not reliably available through the axon tunnel, so this
script decomposes the step into independently-jitted pieces and times each
with the pipelined timer (tunnel-latency corrected).  Results feed
docs/architecture.md and the round's optimization work.

Run: python benchmarks/profile_breakdown.py
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def log(*a):
    print(*a, flush=True)


def main() -> None:
    import jax
    import jax.numpy as jnp

    from newsreclib_tpu.data.synthetic import SyntheticConfig, make_batch
    from newsreclib_tpu.models.components.losses import get_loss_fn
    from newsreclib_tpu.models.general_rec import NRMS
    from newsreclib_tpu.training.state import create_train_state, make_optimizer
    from newsreclib_tpu.training.steps import make_train_step, _cast_floats
    from newsreclib_tpu.utils.timing import timeit_pipelined

    VOCAB, TITLE, HIST, CANDS, B, U = 60000, 30, 50, 5, 256, 4096
    rng = np.random.default_rng(0)
    model = NRMS(vocab_size=VOCAB)
    cfg = SyntheticConfig(vocab_size=VOCAB, title_len=TITLE)
    batch = make_batch(rng, batch_size=B, hist_len=HIST, num_candidates=CANDS,
                       unique_news=U, cfg=cfg, with_abstract=False,
                       with_entities=False)
    state = create_train_state(model, batch, jax.random.key(0), make_optimizer())
    batch = jax.device_put(batch)
    loss_fn = get_loss_fn("cross_entropy_loss")

    def time_fn(name, fn, *args, steps=10):
        jax.block_until_ready(fn(*args))
        dt = timeit_pipelined(fn, *args, steps=steps, warmup=2)
        log(f"{name:<44s} {dt*1e3:8.2f} ms")
        return dt

    # ---- full train step (the 37ms reference point) ----
    tstep = make_train_step(loss_fn, donate=False, compute_dtype="bfloat16")
    t_full = time_fn("train step (full, bf16)", lambda s, b: tstep(s, b)[1]["loss"],
                     state, batch)

    # ---- forward-only loss ----
    @jax.jit
    def fwd(params, b, key):
        p = _cast_floats(params, jnp.bfloat16)
        scores, aux = model.apply({"params": p}, b, deterministic=False,
                                  rngs={"dropout": key})
        return loss_fn(scores.astype(jnp.float32), b.labels, b.cand_mask,
                       b.impression_valid)

    key = jax.random.key(1)
    t_fwd = time_fn("forward only (loss, dropout on)", fwd, state.params, batch, key)

    @jax.jit
    def fwd_det(params, b):
        p = _cast_floats(params, jnp.bfloat16)
        scores, _ = model.apply({"params": p}, b, deterministic=True)
        return loss_fn(scores.astype(jnp.float32), b.labels, b.cand_mask,
                       b.impression_valid)

    t_fwd_det = time_fn("forward only (no dropout)", fwd_det, state.params, batch)

    # ---- forward+backward (grads, no optimizer) ----
    @jax.jit
    def fwd_bwd(params, b, key):
        # return the grads too — returning only the value lets XLA dead-code
        # eliminate the whole backward pass (round-3 first attempt did)
        return jax.value_and_grad(
            lambda p: fwd.__wrapped__(p, b, key)  # un-jitted inner
        )(params)

    t_fb = time_fn("forward+backward (no optimizer)", fwd_bwd, state.params, batch, key)

    # ---- optimizer update alone (zero grads) ----
    zgrads = jax.tree.map(jnp.zeros_like, state.params)
    zgrads = jax.device_put(zgrads)

    @jax.jit
    def opt_only(s, g):
        return s.apply_gradients(grads=g).step

    t_opt = time_fn("optimizer update only", opt_only, state, zgrads)

    # ---- news encode alone (U, L) fwd / fwd+bwd ----
    @jax.jit
    def enc(params, news):
        p = _cast_floats(params, jnp.bfloat16)
        return jnp.sum(model.apply({"params": p}, news, deterministic=True,
                                   method="encode_news"))

    t_enc = time_fn("news encode fwd (U=4096, L=30)", enc, state.params, batch.news)

    @jax.jit
    def enc_bwd(params, news):
        return jax.value_and_grad(
            lambda p: enc.__wrapped__(p, news)
        )(params)

    t_enc_bwd = time_fn("news encode fwd+bwd", enc_bwd, state.params, batch.news)

    # ---- user+score given vectors, fwd+bwd ----
    @jax.jit
    def score_bwd(params, b):
        def f(p):
            pc = _cast_floats(p, jnp.bfloat16)
            nv = jnp.ones((U, 300), jnp.bfloat16)
            s = model.apply({"params": pc}, b, nv, deterministic=True,
                            method="score_with_vectors")
            return loss_fn(s.astype(jnp.float32), b.labels, b.cand_mask,
                           b.impression_valid)
        return jax.value_and_grad(f)(params)

    t_score = time_fn("user+score fwd+bwd (vecs given)", score_bwd, state.params, batch)

    # ---- embedding gather+scatter isolated ----
    table = jnp.zeros((VOCAB, 300), jnp.float32)
    tok = batch.news.title

    @jax.jit
    def embed_bwd(tbl, t):
        def f(x):
            e = jnp.take(x.astype(jnp.bfloat16), t, axis=0)
            return jnp.sum(e.astype(jnp.float32) * 1e-6)
        return jax.value_and_grad(f)(tbl)

    t_emb = time_fn("embed gather+scatter-grad only", embed_bwd, table, tok)

    # ---- shorter titles: L=16 (length-bucketing headroom probe) ----
    cfg16 = SyntheticConfig(vocab_size=VOCAB, title_len=16)
    batch16 = make_batch(rng, batch_size=B, hist_len=HIST, num_candidates=CANDS,
                         unique_news=U, cfg=cfg16, with_abstract=False,
                         with_entities=False)
    state16 = create_train_state(model, batch16, jax.random.key(0), make_optimizer())
    batch16 = jax.device_put(batch16)
    t16 = time_fn("train step, L=16 titles", lambda s, b: tstep(s, b)[1]["loss"],
                  state16, batch16)

    # ---- smaller unique table: U=2048 ----
    batch2k = make_batch(rng, batch_size=B, hist_len=HIST, num_candidates=CANDS,
                         unique_news=2048, cfg=cfg, with_abstract=False,
                         with_entities=False)
    batch2k = jax.device_put(batch2k)
    t2k = time_fn("train step, U=2048", lambda s, b: tstep(s, b)[1]["loss"],
                  state, batch2k)

    log("")
    log(f"derived: backward-only ≈ {1e3*(t_fb - t_fwd):.2f} ms; "
        f"optimizer ≈ {1e3*t_opt:.2f} ms; "
        f"dropout cost ≈ {1e3*(t_fwd - t_fwd_det):.2f} ms")
    log(f"encode share (fwd+bwd) ≈ {1e3*t_enc_bwd:.2f} ms of {1e3*t_full:.2f} ms")


if __name__ == "__main__":
    main()
