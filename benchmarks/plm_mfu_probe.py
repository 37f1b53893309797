"""PLM train-step MFU breakdown + saturation probe (VERDICT r4 task 3).

Closes the PLM thread the way round 4 closed the GloVe one: measure where
the train step's time goes (fwd / fwd+bwd / +optimizer / dropout RNG) and
how MFU responds to batch geometry (B, U), then evaluate the packing lever.

Run on the real chip:  python benchmarks/plm_mfu_probe.py [--pack 128]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402


def timeit(fn, *args, steps=10, warmup=2):
    # axon tunnel: block_until_ready acks early — use the pipelined
    # scalar-fetch timer (newsreclib_tpu/utils/timing.py)
    from newsreclib_tpu.utils.timing import timeit_pipelined

    return timeit_pipelined(fn, *args, steps=steps, warmup=warmup)


def flops_of(fn, *args):
    """fn must already be jitted — .lower() then hits the compile cache."""
    try:
        c = fn.lower(*args).compile().cost_analysis()
        if isinstance(c, list):
            c = c[0]
        return float(c.get("flops", 0.0))
    except Exception:
        return 0.0


PEAK = 197e12  # v5e bf16... but these runs are f32 -> use 98.5e12? keep 197 to
# match bench.py's convention so numbers are comparable across rounds.


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--pack", type=int, default=0,
                    help="PLMTextEncoder.pack_to (0 = off)")
    ap.add_argument("--rng", choices=["threefry", "rbg"], default="threefry",
                    help="dropout PRNG impl (rbg = TPU hardware RNG)")
    ap.add_argument("--quick", action="store_true")
    args = ap.parse_args()

    from train import _setup_compile_cache

    _setup_compile_cache()
    from newsreclib_tpu.data.batching import split_news_by_length
    from newsreclib_tpu.data.synthetic import SyntheticConfig, make_batch
    from newsreclib_tpu.models.components.losses import cross_entropy_loss
    from newsreclib_tpu.models.components.plm import PLMTextEncoder, TransformerEncoder
    from newsreclib_tpu.models.general_rec import NRMS
    from newsreclib_tpu.training.state import create_train_state, make_optimizer
    from newsreclib_tpu.training.steps import make_train_step

    rng = np.random.default_rng(0)
    PLM_LEN, PLM_SPLIT, HIST = 96, 32, 50
    tower_kwargs = dict(use_mhsa=True, num_heads=16, query_dim=200)
    if args.pack:
        tower_kwargs["pack_to"] = args.pack
    plm_tower = PLMTextEncoder(encoder=TransformerEncoder(vocab_size=30522),
                               **tower_kwargs)
    model = NRMS(vocab_size=30000, num_heads=16, text_encoder_module=plm_tower)
    cfg = SyntheticConfig(vocab_size=30000, title_len=PLM_LEN)

    def plm_batch(batch_size, num_candidates, unique_news):
        b = make_batch(rng, batch_size=batch_size, hist_len=HIST,
                       num_candidates=num_candidates, unique_news=unique_news,
                       cfg=cfg, with_abstract=False, with_entities=False)
        title = np.asarray(b.news.title).copy()
        lens = np.clip(rng.poisson(24.0, size=title.shape[0]), 8, PLM_LEN)
        col = np.arange(PLM_LEN)[None, :]
        title = np.where(col < lens[:, None], np.maximum(title, 2), 0)
        title[0] = 0
        b = b._replace(news=b.news._replace(title=title, title_mask=title != 0))
        news, news2, h, c = split_news_by_length(b.news, b.hist_idx, b.cand_idx,
                                                 PLM_SPLIT)
        return jax.device_put(b._replace(news=news, news2=news2,
                                         hist_idx=h, cand_idx=c))

    base = plm_batch(64, 5, 512)
    state = create_train_state(model, base, jax.random.key(1), make_optimizer())
    # bf16 compute matches the BENCH_r04 plm_train_mfu measurement exactly
    tstep = make_train_step(cross_entropy_loss, donate=False,
                            compute_dtype="bfloat16")

    def cast(params):
        return jax.tree.map(
            lambda x: x.astype(jnp.bfloat16)
            if jnp.issubdtype(x.dtype, jnp.floating) else x, params)

    # ---- phase breakdown at the bench geometry (B=64, U=512) ----
    def fwd_loss(params, batch, key):
        scores, _ = model.apply({"params": cast(params)}, batch,
                                deterministic=False, rngs={"dropout": key})
        return cross_entropy_loss(scores.astype(jnp.float32), batch.labels,
                                  batch.cand_mask, batch.impression_valid)

    def fwd_loss_det(params, batch):
        scores, _ = model.apply({"params": cast(params)}, batch,
                                deterministic=True)
        return cross_entropy_loss(scores.astype(jnp.float32), batch.labels,
                                  batch.cand_mask, batch.impression_valid)

    key = jax.random.key(0)
    if args.rng == "rbg":
        key = jax.random.wrap_key_data(
            jax.random.bits(key, (4,), "uint32"), impl="rbg")
        state = state.replace(dropout_rng=key)
    fwd = jax.jit(fwd_loss)
    fwd_det = jax.jit(fwd_loss_det)
    grad = jax.jit(lambda p, b, k: jax.grad(fwd_loss)(p, b, k))
    grad_det = jax.jit(lambda p, b: jax.grad(fwd_loss_det)(p, b))

    rows = []
    for name, fn, fargs in [
        ("fwd (dropout on)", fwd, (state.params, base, key)),
        ("fwd (deterministic)", fwd_det, (state.params, base)),
        ("fwd+bwd (dropout on)", grad, (state.params, base, key)),
        ("fwd+bwd (deterministic)", grad_det, (state.params, base)),
        ("full train step", tstep, (state, base)),
    ]:
        dt = timeit(fn, *fargs, steps=6 if args.quick else 10)
        fl = flops_of(fn, *fargs)
        rows.append((name, dt, fl))
        print(f"{name:28s}: {dt*1e3:8.2f} ms   graph {fl/1e12:6.2f} TFLOP   "
              f"'MFU' {fl/dt/PEAK*100:5.1f}%", flush=True)

    # ---- B/U saturation probe (full train step) ----
    print("\nsaturation probe (full step):", flush=True)
    for B, U in ([(64, 512), (128, 1024), (256, 2048)] if not args.quick
                 else [(64, 512), (256, 2048)]):
        try:
            b = plm_batch(B, 5, U)
            st = create_train_state(model, b, jax.random.key(1), make_optimizer())
            dt = timeit(tstep, st, b, steps=5, warmup=2)
            fl = flops_of(tstep, st, b)
            del st
            per_art = dt / U * 1e6
            print(f"B={B:4d} U={U:5d}: {dt*1e3:8.2f} ms  ({per_art:6.1f} us/article)"
                  f"  graph {fl/1e12:6.2f} TFLOP  'MFU' {fl/dt/PEAK*100:5.1f}%",
                  flush=True)
        except Exception as e:  # noqa: BLE001 — keep probing after an OOM
            print(f"B={B:4d} U={U:5d}: FAILED ({type(e).__name__}: "
                  f"{str(e).splitlines()[0][:120]})", flush=True)


if __name__ == "__main__":
    main()
