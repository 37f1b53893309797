"""Worker process for the 2-process multi-host training test.

Launched by ``tests/test_multihost.py`` as ``python mp_worker.py --process-id
{0,1} ...``.  Each worker owns 4 virtual CPU devices, joins a 2-process
``jax.distributed`` cluster (8-device global mesh), trains NRMS for N steps
on its impression shard through the PRODUCTION path (``TrainBatcher
global_rows=True`` → ``Trainer(corpus=..., u_bucket=...)`` → on-device
densify → SPMD train step), and rank 0 writes per-step losses + a params
checksum to JSON.  The parent compares against a single-process run over the
identically-assembled global batches.

Reference analog: Lightning DDP multi-node fit
(``configs/trainer/ddp.yaml:1-9``).
"""

from __future__ import annotations

import argparse
import json
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, REPO)

SEED = 11
VOCAB = 300
TITLE = 12
NUM_NEWS = 120
NUM_IMP = 200
HIST = 6
NEG_K = 4
GLOBAL_BATCH = 16
EMBED, HEADS, QUERY = 48, 4, 24


def build_data():
    """Deterministic synthetic store + impressions (no files, no network)."""
    import numpy as np

    from newsreclib_tpu.data.batching import Impressions
    from newsreclib_tpu.data.news_store import NewsStore

    rng = np.random.default_rng(SEED)
    title = np.zeros((NUM_NEWS + 1, TITLE), dtype=np.int32)
    lens = rng.integers(3, TITLE + 1, size=NUM_NEWS)
    for i in range(NUM_NEWS):
        title[i + 1, : lens[i]] = rng.integers(2, VOCAB, size=lens[i])
    store = NewsStore(
        nid2row={f"N{i}": i for i in range(1, NUM_NEWS + 1)},
        title=title,
        category=np.concatenate([[0], rng.integers(1, 10, NUM_NEWS)]).astype(np.int32),
        sentiment=np.concatenate([[0], rng.integers(1, 4, NUM_NEWS)]).astype(np.int32),
    )
    hists = [rng.integers(1, NUM_NEWS + 1, size=int(rng.integers(2, HIST + 1)))
             for _ in range(NUM_IMP)]
    cands, labels = [], []
    for _ in range(NUM_IMP):
        c = rng.integers(1, NUM_NEWS + 1, size=int(rng.integers(6, 12)))
        l = np.zeros(len(c), dtype=np.int8)
        l[rng.integers(0, len(c))] = 1
        cands.append(c)
        labels.append(l)
    imp = Impressions.from_lists(hists, cands, labels,
                                 rng.integers(0, 50, NUM_IMP).astype(np.int32))
    return store, imp


def build_model_state(example):
    import jax

    from newsreclib_tpu.models.general_rec import NRMS
    from newsreclib_tpu.training.state import create_train_state, make_optimizer

    model = NRMS(vocab_size=VOCAB, embed_dim=EMBED, num_heads=HEADS,
                 query_dim=QUERY)
    state = create_train_state(model, example, jax.random.key(SEED),
                               make_optimizer(1e-3))
    return model, state


class CaptureLogger:
    def __init__(self):
        self.rows = []

    def log_metrics(self, metrics, step):
        if "train/loss" in metrics:
            self.rows.append((step, metrics["train/loss"]))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--process-id", type=int, required=True)
    ap.add_argument("--num-processes", type=int, default=2)
    ap.add_argument("--port", type=int, required=True)
    ap.add_argument("--steps", type=int, default=5)
    ap.add_argument("--model-axis", type=int, default=1)
    ap.add_argument("--eval", action="store_true",
                    help="run a rank-0 eval epoch after training (exercises "
                         "the model-axis>1 gather path)")
    ap.add_argument("--out", required=True)
    args = ap.parse_args()

    os.environ["JAX_PLATFORMS"] = "cpu"
    os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"
    import jax

    jax.config.update("jax_platforms", "cpu")
    cache_dir = os.path.join(REPO, ".cache", "jax_tests")
    os.makedirs(cache_dir, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    jax.distributed.initialize(
        coordinator_address=f"localhost:{args.port}",
        num_processes=args.num_processes,
        process_id=args.process_id,
    )
    assert jax.process_count() == args.num_processes
    import numpy as np

    from newsreclib_tpu.data.batching import TrainBatcher
    from newsreclib_tpu.models.components.losses import cross_entropy_loss
    from newsreclib_tpu.parallel.data import shard_impressions
    from newsreclib_tpu.parallel.mesh import make_mesh
    from newsreclib_tpu.training.trainer import Trainer, TrainerConfig

    store, imp_full = build_data()
    imp = shard_impressions(imp_full, args.process_id, args.num_processes)
    local_batch = GLOBAL_BATCH // args.num_processes
    batcher = TrainBatcher(
        store, imp, batch_size=local_batch, max_history_len=HIST,
        neg_sampling_ratio=NEG_K, seed=SEED + 7919 * args.process_id,
        global_rows=True, num_steps=args.steps, u_bucket_min=64,
    )
    # init example must be a densified batch; use a host-dedup batcher
    example = next(iter(TrainBatcher(
        store, imp, batch_size=local_batch, max_history_len=HIST,
        neg_sampling_ratio=NEG_K, seed=SEED, u_bucket_min=64,
    ).epoch(0)))
    model, state = build_model_state(example)
    corpus = store.features_for(np.arange(store.title.shape[0]))
    mesh = make_mesh(jax.devices(), model_axis=args.model_axis)
    logger = CaptureLogger()
    trainer = Trainer(
        state, cross_entropy_loss,
        TrainerConfig(max_epochs=1, log_every_n_steps=1, ckpt_dir=None),
        loggers=[logger] if args.process_id == 0 else [],
        mesh=mesh, model=model, corpus=corpus,
        u_bucket=batcher.global_u_bucket(GLOBAL_BATCH),
    )
    out = trainer.train_epoch(batcher, 0)

    eval_metrics = {}
    if args.eval:
        from newsreclib_tpu.data.batching import EvalBatcher

        val_batcher = EvalBatcher(
            store, imp_full, max_history_len=HIST, target_cells=256,
            u_bucket_min=64,
        )
        # all ranks call evaluate (the model-axis>1 gather is a collective);
        # only rank 0 gets metrics back
        eval_metrics = trainer.evaluate(val_batcher, "val")

    # _gather_global is a COLLECTIVE (its contract: every process calls it)
    # — run it on all ranks before the rank gate, like trainer.fit does
    full_params = (
        trainer._gather_global(trainer.state.params)
        if args.model_axis > 1 else trainer.state.params
    )
    if args.process_id == 0:
        # full-table gather parity: with a model axis the local copy must
        # hold the FULL params, not rank 0's row shard
        gathered = trainer._to_local(full_params)
        param_abssum = float(sum(
            np.sum(np.abs(np.asarray(leaf)))
            for leaf in jax.tree.leaves(gathered)
        ))
        with open(args.out, "w") as f:
            json.dump({
                "losses": [l for _, l in sorted(logger.rows)],
                "mean_loss": out["train/loss"],
                "param_abssum": param_abssum,
                "eval": {k: float(v) for k, v in eval_metrics.items()},
            }, f)
    # all processes exit together
    jax.distributed.shutdown()


if __name__ == "__main__":
    main()
