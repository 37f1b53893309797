"""Benchmark: per-chip impression-scoring throughput (headline metric).

Workload: NRMS at canonical MIND shapes (embed 300, heads 15, title 30,
hist 50; BASELINE.md) scoring full eval impressions (C=32 candidates) on one
chip.  Headline = the **cached serving path** (`newsreclib_tpu/serving.py`):
every article of the corpus is encoded exactly once per parameter version
into a device table, then impressions are scored via gathers + user encoding
+ dot products + on-device ranking metrics — the production-serving
structure.  The reference instead re-encodes every history+candidate article
of every impression (``nrms_module.py:231-237``), which is why its GPU
throughput is bounded by news encoding.

Also reported (stderr): uncached per-batch eval (fresh articles every batch)
and the training-step throughput.  Both run bf16 compute / f32 master params,
the production default matching the reference trainer's ``precision: 16``
(``configs/trainer/default.yaml:12``); measured f32 variants are ~30% slower
(eval 15.6ms vs 11.9ms, train 53.9ms vs 37.3ms at these shapes).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

``vs_baseline`` divides by PYTORCH_GPU_BASELINE_IPS — an *estimate* of the
reference's per-GPU NRMS full-impression scoring throughput (the reference
publishes no numbers; BASELINE.md).  Estimate: V100-class GPU, per-occurrence
news re-encoding, ~2k impressions/s.  A MEASURED anchor exists:
``benchmarks/torch_reference_baseline.py`` runs the reference torch modules
(imported from /root/reference) in the reference's eval-loop structure on
CPU and writes BASELINE_MEASURED.json; its numbers are attached to the
output JSON as ``torch_cpu_measured_ips`` (17.7 imp/s on the sandbox's
2 CPU threads — the 2k GPU estimate assumes ~100x one CPU socket, which the
measurement makes plausible but cannot confirm without a GPU).

Timing note: on the axon-tunneled TPU, completion must be forced by fetching
result bytes (see newsreclib_tpu/utils/timing.py); epoch times below fetch
the final metric scalars.
"""

from __future__ import annotations

import json
import sys
import time

import numpy as np

PYTORCH_GPU_BASELINE_IPS = 2000.0

CORPUS = 32768  # articles in the serving corpus
N_IMP = 16384  # impressions scored per epoch
HIST = 50
CANDS = 32
TITLE = 30
VOCAB = 60000
SPLIT_TITLE = 16  # length-bucket split width (data/batching.py)


def realistic_title_lens(rng, n):
    """Title token counts ~ Poisson(11) clipped to [4, TITLE] — matching the
    real MIND corpus (mean ~11 tokens; the reference pads everything to 30,
    ``configs/data/mind_rec.yaml:56``).  Round 2 benched uniform(5, 30)
    lengths (mean 17.5), which overstates real title lengths; BENCH notes
    record both distributions for round-over-round comparability."""
    return np.clip(rng.poisson(11.0, size=n), 4, TITLE)


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def build_eval_workload(rng):
    """Synthetic corpus + impressions in the framework's native structures."""
    from newsreclib_tpu.data.batching import Impressions
    from newsreclib_tpu.data.news_store import NewsStore

    title = np.zeros((CORPUS + 1, TITLE), dtype=np.int32)
    lens = realistic_title_lens(rng, CORPUS)
    for i in range(CORPUS):
        title[i + 1, : lens[i]] = rng.integers(2, VOCAB, size=lens[i])
    store = NewsStore(
        nid2row={f"N{i}": i for i in range(1, CORPUS + 1)},
        title=title,
        category=rng.integers(1, 19, size=CORPUS + 1).astype(np.int32),
        sentiment=rng.integers(1, 4, size=CORPUS + 1).astype(np.int32),
    )
    store.category[0] = 0
    store.sentiment[0] = 0

    hists = [rng.integers(1, CORPUS + 1, size=int(rng.integers(5, HIST + 1))) for _ in range(N_IMP)]
    cands = [rng.integers(1, CORPUS + 1, size=CANDS) for _ in range(N_IMP)]
    labels = []
    for c in cands:
        l = np.zeros(CANDS, dtype=np.int8)
        l[rng.integers(0, CANDS)] = 1
        labels.append(l)
    imp = Impressions.from_lists(hists, cands, labels, np.ones(N_IMP, dtype=np.int32))
    return store, imp


def preflight(timeout_s: int = 180, attempts: int = 3) -> bool:
    """Verify the device can compile+execute before the heavy benchmark.

    The axon remote-compile service can wedge (stale grants / stuck compile
    queue); without this check a wedged device would hang the whole bench.
    A slow-but-healthy tunnel is NOT a wedge: a trivial first compile has
    been observed to take >130s under contention, so one 180s strike must
    not zero the bench — retry before giving up (later attempts reuse the
    warm compile cache and return in milliseconds if the tunnel recovered).
    """
    import signal

    # imports hoisted ABOVE the alarm loop: interrupting `import jax` mid-
    # initialization would leave a partially-initialized module for the next
    # attempt (ADVICE r2); jax is pre-imported by sitecustomize anyway, so
    # this cannot hang
    import jax
    import jax.numpy as jnp

    # one shared jitted fn so retries genuinely hit the in-process jit cache
    fn = jax.jit(lambda x: jnp.sum(x * 2))

    def _handler(signum, frame):
        raise TimeoutError

    old = signal.signal(signal.SIGALRM, _handler)
    try:
        for attempt in range(attempts):
            signal.alarm(timeout_s)
            try:
                val = float(fn(jnp.ones((128, 128))))
                assert abs(val - 2 * 128 * 128) < 1
                return True
            except TimeoutError:
                log(
                    f"preflight attempt {attempt + 1}/{attempts} timed out "
                    f"after {timeout_s}s (tunnel slow or wedged)"
                )
            except Exception as e:  # a wedged tunnel can surface as RPC errors
                log(f"preflight attempt {attempt + 1}/{attempts} failed: {e!r}")
            finally:
                signal.alarm(0)
        log("preflight TIMEOUT: device cannot compile/execute (tunnel wedged?)")
        return False
    finally:
        signal.alarm(0)
        signal.signal(signal.SIGALRM, old)


def main() -> None:
    t_start = time.time()
    if not preflight():
        print(
            json.dumps(
                {
                    "metric": "impressions_scored_per_sec_per_chip",
                    "value": 0.0,
                    "unit": "impressions/s",
                    "vs_baseline": 0.0,
                }
            )
        )
        sys.exit(0)

    import jax
    import jax.numpy as jnp

    from newsreclib_tpu.data.synthetic import SyntheticConfig, make_batch
    from newsreclib_tpu.models.components.losses import get_loss_fn
    from newsreclib_tpu.models.general_rec import NRMS
    from newsreclib_tpu.serving import CachedScorer
    from newsreclib_tpu.training.state import create_train_state, make_optimizer
    from newsreclib_tpu.training.steps import make_eval_step, make_train_step
    from newsreclib_tpu.utils.timing import timeit_pipelined

    dev = jax.devices()[0]
    log(f"device: {dev.platform} {dev.device_kind}")
    rng = np.random.default_rng(0)

    # canonical dims; pack_titles=128 is the production default (factory) —
    # segment-ID packing, numerically exact (test_mhsa_packing_exact)
    model = NRMS(vocab_size=VOCAB, pack_titles=128)
    cfg = SyntheticConfig(vocab_size=VOCAB, title_len=TITLE)
    init_batch = make_batch(
        rng, batch_size=64, hist_len=HIST, num_candidates=5, unique_news=256,
        cfg=cfg, with_abstract=False, with_entities=False,
    )
    state = create_train_state(model, init_batch, jax.random.key(0), make_optimizer())

    # ---- headline: cached serving epoch (encode corpus once, score all) ----
    store, imp = build_eval_workload(rng)
    scorer = CachedScorer(model)
    params_bf16 = jax.tree.map(
        lambda x: x.astype(jnp.bfloat16) if x.dtype == jnp.float32 else x, state.params
    )
    # warm-up/compile pass
    scorer.evaluate(params_bf16, store, imp, max_history_len=HIST,
                    target_cells=16384, encode_batch=4096, collect_auc=False)
    # best-of-3: a single epoch is one ~0.2s wall sample and the tunnel
    # occasionally injects 100-200ms of jitter (a post-probe-traffic r5 run
    # read 41.8k where clean runs read ~95k) — min over 3 is the throughput
    epoch_s = float("inf")
    for _ in range(3):
        t0 = time.time()
        metrics = scorer.evaluate(
            params_bf16, store, imp, max_history_len=HIST,
            target_cells=16384, encode_batch=4096, collect_auc=False,
        )
        epoch_s = min(epoch_s, time.time() - t0)
    cached_ips = N_IMP / epoch_s
    log(
        f"cached serving epoch: {epoch_s:.3f}s for {N_IMP} impressions "
        f"({CORPUS} article corpus) -> {cached_ips:.0f} impressions/s/chip; "
        f"sample metric mrr={metrics.get('mrr', float('nan')):.4f}"
    )
    # provisional headline to stderr: if a driver-side timeout kills the
    # process mid-way through the (longer) secondary sections, the tail
    # still carries a parseable result; the final stdout line supersedes it
    log(json.dumps({
        "metric": "impressions_scored_per_sec_per_chip",
        "value": round(cached_ips, 1),
        "unit": "impressions/s",
        "vs_baseline": round(cached_ips / PYTORCH_GPU_BASELINE_IPS, 2),
        "provisional": True,
    }))

    # ---- secondary: uncached per-batch eval (fresh unique news each batch) ----
    from newsreclib_tpu.data.batching import split_news_by_length

    def realistic_batch(batch_size, num_candidates):
        """make_batch with realistic title lengths (see realistic_title_lens)
        and the production length-bucketed split applied (train.py default
        ``data.split_title_len: 16``)."""
        b = make_batch(
            rng, batch_size=batch_size, hist_len=HIST,
            num_candidates=num_candidates, unique_news=4096,
            cfg=cfg, with_abstract=False, with_entities=False,
        )
        title = np.asarray(b.news.title).copy()
        lens = realistic_title_lens(rng, title.shape[0])
        col = np.arange(TITLE)[None, :]
        title = np.where(col < lens[:, None], np.maximum(title, 2), 0)
        title[0] = 0
        b = b._replace(news=b.news._replace(title=title, title_mask=title != 0))
        news, news2, h, c = split_news_by_length(
            b.news, b.hist_idx, b.cand_idx, SPLIT_TITLE
        )
        split = b._replace(news=news, news2=news2, hist_idx=h, cand_idx=c)
        return b, split

    eval_unsplit, eval_batch = realistic_batch(256, CANDS)
    eval_batch = jax.device_put(eval_batch)
    eval_unsplit = jax.device_put(eval_unsplit)
    eval_step = make_eval_step(compute_dtype="bfloat16")
    jax.block_until_ready(eval_step(state, eval_batch))
    dt = timeit_pipelined(eval_step, state, eval_batch, steps=20)

    # MFU: compiled-graph FLOPs / wall / peak (v5e ≈ 197 TFLOP/s bf16,
    # ≈ 98.5 TFLOP/s f32 inputs on the MXU).
    #
    # fn must be the ALREADY-JITTED step whose wall time dt_s measures.
    # Rounds 2-4 analyzed `jax.jit(lambda s,b: tstep(s,b)[1]["loss"])` — XLA
    # dead-code-eliminates the entire backward pass + optimizer from that
    # loss-only graph, so train_mfu was undercounted ~3x (BENCH_r04
    # plm_train_mfu 12.8% was really 38.3%; benchmarks/plm_mfu_probe.py
    # round 5 closed this).
    def mfu_of(fn, args, dt_s, peak=98.5e12):
        try:
            assert hasattr(fn, "lower"), "pass the jitted step itself"
            cost = fn.lower(*args).compile().cost_analysis()
            if isinstance(cost, list):
                cost = cost[0]
            return float(cost.get("flops", 0.0)) / dt_s / peak
        except Exception:
            return float("nan")

    eval_mfu = mfu_of(eval_step, (state, eval_batch), dt, peak=197e12)
    jax.block_until_ready(eval_step(state, eval_unsplit))
    dt_u = timeit_pipelined(eval_step, state, eval_unsplit, steps=20)
    log(f"uncached eval step: {dt*1e3:.2f} ms ({256/dt:.0f} impressions/s/chip, "
        f"MFU {eval_mfu*100:.1f}%); unsplit L=30: {dt_u*1e3:.2f} ms")

    # ---- secondary: train step ----
    train_unsplit, train_batch = realistic_batch(256, 5)
    train_batch = jax.device_put(train_batch)
    train_unsplit = jax.device_put(train_unsplit)
    tstep = make_train_step(
        get_loss_fn("cross_entropy_loss"), donate=False, compute_dtype="bfloat16"
    )
    tdt = timeit_pipelined(
        lambda s, b: tstep(s, b)[1]["loss"], state, train_batch, steps=10, warmup=2
    )
    train_mfu = mfu_of(tstep, (state, train_batch), tdt, peak=197e12)
    tdt_u = timeit_pipelined(
        lambda s, b: tstep(s, b)[1]["loss"], state, train_unsplit, steps=10, warmup=2
    )
    log(f"train step: {tdt*1e3:.2f} ms ({256/tdt:.0f} impressions/s/chip, "
        f"MFU {train_mfu*100:.1f}%); unsplit L=30: {tdt_u*1e3:.2f} ms")

    extra: dict = {}

    def optional(name, budget_s, fn):
        """Optional sections must never zero the headline: skip when the
        wall budget is spent (slow preflight/tunnel), swallow-and-log
        failures."""
        if time.time() - t_start > budget_s:
            log(f"skipping {name}: wall budget spent "
                f"({time.time() - t_start:.0f}s elapsed)")
            return
        try:
            fn()
        except Exception as e:  # noqa: BLE001 — diagnostics only
            log(f"{name} FAILED (continuing): {e!r}")

    # ---- round 4: unpacked comparison (VERDICT r3 #5) ----
    # The primary rows above run the PRODUCTION default: P=pack_to//L short
    # titles share one attention sequence behind a block-diagonal mask
    # (segment-ID packing; exactness pinned by
    # tests/test_components.py::test_mhsa_packing_exact).  This section
    # re-measures the same params through the unpacked layout for the
    # round-over-round delta (BENCH_r03's numbers were unpacked).
    def run_unpacked():
        model_unpacked = NRMS(vocab_size=VOCAB, pack_titles=0)
        state_unpacked = state.replace(apply_fn=model_unpacked.apply)
        jax.block_until_ready(eval_step(state_unpacked, eval_batch))
        dt_p = timeit_pipelined(eval_step, state_unpacked, eval_batch, steps=20)
        tdt_p = timeit_pipelined(
            lambda s, b: tstep(s, b)[1]["loss"], state_unpacked, train_batch,
            steps=10, warmup=2,
        )
        train_mfu_p = mfu_of(tstep, (state_unpacked, train_batch),
                             tdt_p, peak=197e12)
        log(f"unpacked comparison: train {tdt_p*1e3:.2f} ms "
            f"(MFU {train_mfu_p*100:.1f}%), eval {dt_p*1e3:.2f} ms")
        extra.update(
            train_ms_unpacked=round(tdt_p * 1e3, 2),
            eval_ms_unpacked=round(dt_p * 1e3, 2),
            train_mfu_unpacked=round(train_mfu_p, 4),
        )

    optional("unpacked comparison", 900, run_unpacked)

    # ---- round 4: PLM tower (VERDICT r3 #4 — the reference's #1 hot loop,
    # text.py:15-109).  12-layer random-init BERT-base-shaped transformer
    # (offline: no HF weights reachable; shapes/MFU are init-independent). ----
    def run_plm():
        from newsreclib_tpu.models.components.plm import (
            PLMTextEncoder,
            TransformerEncoder,
        )

        PLM_LEN, PLM_SPLIT = 96, 32
        plm_tower = PLMTextEncoder(
            encoder=TransformerEncoder(vocab_size=30522),
            use_mhsa=True, num_heads=16, query_dim=200,
            pack_to=128,  # production default (factory plm_pack_titles)
        )
        plm_model = NRMS(vocab_size=VOCAB, num_heads=16,
                         text_encoder_module=plm_tower)
        plm_cfg = SyntheticConfig(vocab_size=30000, title_len=PLM_LEN)

        def plm_batch(batch_size, num_candidates, unique_news):
            b = make_batch(
                rng, batch_size=batch_size, hist_len=HIST,
                num_candidates=num_candidates, unique_news=unique_news,
                cfg=plm_cfg, with_abstract=False, with_entities=False,
            )
            title = np.asarray(b.news.title).copy()
            lens = np.clip(rng.poisson(24.0, size=title.shape[0]), 8, PLM_LEN)
            col = np.arange(PLM_LEN)[None, :]
            title = np.where(col < lens[:, None], np.maximum(title, 2), 0)
            title[0] = 0
            b = b._replace(news=b.news._replace(title=title, title_mask=title != 0))
            news, news2, h, c = split_news_by_length(
                b.news, b.hist_idx, b.cand_idx, PLM_SPLIT
            )
            return jax.device_put(
                b._replace(news=news, news2=news2, hist_idx=h, cand_idx=c)
            )

        plm_train_b = plm_batch(64, 5, 512)
        plm_state = create_train_state(
            plm_model, plm_train_b, jax.random.key(1), make_optimizer()
        )
        jax.block_until_ready(tstep(plm_state, plm_train_b)[1]["loss"])
        plm_tdt = timeit_pipelined(
            lambda s, b: tstep(s, b)[1]["loss"], plm_state, plm_train_b,
            steps=10, warmup=2,
        )
        plm_train_mfu = mfu_of(tstep, (plm_state, plm_train_b),
                               plm_tdt, peak=197e12)
        # rbg dropout variant (trainer.dropout_rng_impl: rbg) — threefry
        # bit generation is ~36% of this step (plm_mfu_probe r5)
        plm_state_rbg = plm_state.replace(dropout_rng=jax.random.wrap_key_data(
            jax.random.bits(jax.random.key(7), (4,), "uint32"), impl="rbg"))
        jax.block_until_ready(tstep(plm_state_rbg, plm_train_b)[1]["loss"])
        plm_tdt_rbg = timeit_pipelined(
            lambda s, b: tstep(s, b)[1]["loss"], plm_state_rbg, plm_train_b,
            steps=10, warmup=2,
        )
        plm_train_mfu_rbg = mfu_of(tstep, (plm_state_rbg, plm_train_b),
                                   plm_tdt_rbg, peak=197e12)
        plm_eval_b = plm_batch(64, CANDS, 1024)
        jax.block_until_ready(eval_step(plm_state, plm_eval_b))
        plm_dt = timeit_pipelined(eval_step, plm_state, plm_eval_b, steps=10)
        plm_eval_mfu = mfu_of(eval_step, (plm_state, plm_eval_b), plm_dt,
                              peak=197e12)
        log(f"PLM tower (12-layer, L={PLM_LEN}, packed): train "
            f"{plm_tdt*1e3:.1f} ms (B=64, MFU {plm_train_mfu*100:.1f}%), "
            f"rbg-dropout {plm_tdt_rbg*1e3:.1f} ms "
            f"(MFU {plm_train_mfu_rbg*100:.1f}%), uncached eval "
            f"{plm_dt*1e3:.1f} ms (MFU {plm_eval_mfu*100:.1f}%)")
        extra.update(
            plm_train_ms=round(plm_tdt * 1e3, 2),
            plm_train_mfu=round(plm_train_mfu, 4),
            plm_train_ms_rbg=round(plm_tdt_rbg * 1e3, 2),
            plm_train_mfu_rbg=round(plm_train_mfu_rbg, 4),
            plm_eval_ms=round(plm_dt * 1e3, 2),
            plm_eval_mfu=round(plm_eval_mfu, 4),
        )

        # PLM cached serving: smaller corpus (encode is ~3.5 GFLOP/article)
        PLM_CORPUS, PLM_NIMP = 8192, 4096
        plm_title = np.zeros((PLM_CORPUS + 1, PLM_LEN), dtype=np.int32)
        plens = np.clip(rng.poisson(24.0, size=PLM_CORPUS), 8, PLM_LEN)
        for i in range(PLM_CORPUS):
            plm_title[i + 1, : plens[i]] = rng.integers(2, 30000, size=plens[i])
        from newsreclib_tpu.data.batching import Impressions
        from newsreclib_tpu.data.news_store import NewsStore

        plm_store = NewsStore(
            nid2row={f"N{i}": i for i in range(1, PLM_CORPUS + 1)},
            title=plm_title,
        )
        ph = [rng.integers(1, PLM_CORPUS + 1, size=int(rng.integers(5, HIST + 1)))
              for _ in range(PLM_NIMP)]
        pc = [rng.integers(1, PLM_CORPUS + 1, size=CANDS) for _ in range(PLM_NIMP)]
        plbl = []
        for c in pc:
            l = np.zeros(CANDS, dtype=np.int8)
            l[rng.integers(0, CANDS)] = 1
            plbl.append(l)
        plm_imp = Impressions.from_lists(ph, pc, plbl,
                                         np.ones(PLM_NIMP, dtype=np.int32))
        plm_params_bf16 = jax.tree.map(
            lambda x: x.astype(jnp.bfloat16) if x.dtype == jnp.float32 else x,
            plm_state.params,
        )
        plm_scorer = CachedScorer(plm_model, split_title_len=PLM_SPLIT)
        plm_scorer.evaluate(plm_params_bf16, plm_store, plm_imp,
                            max_history_len=HIST, target_cells=16384,
                            encode_batch=1024, collect_auc=False)
        t0 = time.time()
        plm_scorer.evaluate(plm_params_bf16, plm_store, plm_imp,
                            max_history_len=HIST, target_cells=16384,
                            encode_batch=1024, collect_auc=False)
        plm_epoch_s = time.time() - t0
        plm_ips = PLM_NIMP / plm_epoch_s
        log(f"PLM cached serving epoch: {plm_epoch_s:.3f}s for {PLM_NIMP} "
            f"impressions ({PLM_CORPUS} article corpus) -> "
            f"{plm_ips:.0f} impressions/s/chip")
        extra["plm_serving_ips"] = round(plm_ips, 1)

    optional("PLM tower bench", 900, run_plm)

    out = {
        "metric": "impressions_scored_per_sec_per_chip",
        "value": round(cached_ips, 1),
        "unit": "impressions/s",
        "vs_baseline": round(cached_ips / PYTORCH_GPU_BASELINE_IPS, 2),
        "vs_baseline_basis": "estimated 2000 imp/s PyTorch GPU (see docstring)",
        "uncached_eval_ips": round(256 / dt, 1),
        "train_ips": round(256 / tdt, 1),
        "uncached_eval_mfu": round(eval_mfu, 4),
        "train_mfu": round(train_mfu, 4),
        # production length-bucketed batches vs round-2's always-L=30 layout
        "train_ms": round(tdt * 1e3, 2),
        "train_ms_unsplit_L30": round(tdt_u * 1e3, 2),
        "eval_ms": round(dt * 1e3, 2),
        "eval_ms_unsplit_L30": round(dt_u * 1e3, 2),
        "title_len_dist": "poisson(11) clipped [4,30] (r02: uniform[5,30])",
        # round 4 optional sections: unpacked comparison + PLM tower rows
        # (absent if the wall budget was spent — see `optional`)
        **extra,
    }
    try:
        import os

        with open(os.path.join(os.path.dirname(os.path.abspath(__file__)),
                               "BASELINE_MEASURED.json")) as f:
            measured = json.load(f)
        out["torch_cpu_measured_ips"] = measured["torch_cpu_measured_ips"]
        out["vs_torch_cpu_measured"] = round(
            cached_ips / measured["torch_cpu_measured_ips"], 1
        )
    except Exception:
        pass
    print(json.dumps(out))


if __name__ == "__main__":
    main()
