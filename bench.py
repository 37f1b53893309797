"""Benchmark: per-chip candidate-scoring throughput (headline metric).

Measures the NRMS eval/scoring path at canonical MIND shapes
(BASELINE.md: embed 300, heads 15, title 30, hist 50) on the available
accelerator: impressions scored per second per chip, end-to-end through the
jitted eval step (news encoding over the deduplicated batch news table, user
encoding, dot-product scoring, per-impression ranking metrics on device).

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}

``vs_baseline`` divides by PYTORCH_GPU_BASELINE_IPS — an *estimate* of the
reference's per-GPU NRMS full-impression scoring throughput (the reference
publishes no numbers, BASELINE.md §"Published"). The estimate assumes a
V100-class GPU scoring ~2k impressions/s with per-occurrence news re-encoding
(the reference encodes every history+candidate article of every impression,
``nrms_module.py:231-237``). Revisit when a measured baseline exists.
"""

from __future__ import annotations

import json
import sys
import time

import numpy as np

PYTORCH_GPU_BASELINE_IPS = 2000.0

BATCH = 256
HIST = 50
CANDS = 32
UNIQUE = 4096
TITLE = 30
STEPS = 30
WARMUP = 3


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def main() -> None:
    import jax

    from newsreclib_tpu.data.synthetic import SyntheticConfig, make_batch
    from newsreclib_tpu.models.components.losses import get_loss_fn
    from newsreclib_tpu.models.general_rec.nrms import NRMS
    from newsreclib_tpu.training.state import create_train_state, make_optimizer
    from newsreclib_tpu.training.steps import make_eval_step, make_train_step

    dev = jax.devices()[0]
    log(f"device: {dev.platform} {dev.device_kind}")

    cfg = SyntheticConfig(vocab_size=40000, title_len=TITLE)
    rng = np.random.default_rng(0)
    batch = make_batch(
        rng,
        batch_size=BATCH,
        hist_len=HIST,
        num_candidates=CANDS,
        unique_news=UNIQUE,
        cfg=cfg,
        with_abstract=False,
        with_entities=False,
    )
    model = NRMS(vocab_size=cfg.vocab_size)  # canonical dims
    state = create_train_state(model, batch, jax.random.key(0), make_optimizer())

    from newsreclib_tpu.utils.timing import timeit_pipelined

    batch = jax.device_put(batch)
    eval_step = make_eval_step()

    t0 = time.time()
    jax.block_until_ready(eval_step(state, batch))
    log(f"compile: {time.time() - t0:.1f}s")

    dt = timeit_pipelined(eval_step, state, batch, steps=STEPS, warmup=WARMUP)
    ips = BATCH / dt
    log(f"eval step: {dt*1e3:.2f} ms  ({ips:.0f} impressions/s/chip)")

    # secondary: train-step throughput (K+1 = 5 sampled slate)
    train_batch = make_batch(
        rng, batch_size=BATCH, hist_len=HIST, num_candidates=5, unique_news=UNIQUE,
        cfg=cfg, with_abstract=False, with_entities=False,
    )
    train_batch = jax.device_put(train_batch)
    tstep = make_train_step(get_loss_fn("cross_entropy_loss"), donate=False)
    tdt = timeit_pipelined(
        lambda s, b: tstep(s, b)[1]["loss"], state, train_batch, steps=10, warmup=2
    )
    log(f"train step: {tdt*1e3:.2f} ms  ({BATCH/tdt:.0f} impressions/s/chip)")

    print(
        json.dumps(
            {
                "metric": "impressions_scored_per_sec_per_chip",
                "value": round(ips, 1),
                "unit": "impressions/s",
                "vs_baseline": round(ips / PYTORCH_GPU_BASELINE_IPS, 2),
            }
        )
    )


if __name__ == "__main__":
    main()
