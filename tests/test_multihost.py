"""Multi-host training tests (VERDICT r2 item 1).

1. Global-row batches + on-device densify reproduce the host-dedup path
   bit-for-bit single-process (same bucket size → identical dedup tables →
   identical dropout masks → identical losses).
2. TWO REAL PROCESSES (``jax.distributed.initialize`` over a local TCP
   coordinator, 4 virtual CPU devices each) train NRMS through the
   production path and match the single-process trajectory on the same
   global batches.

Reference analog: Lightning DDP (``configs/trainer/ddp.yaml:1-9``) /
``ddp_sim`` (``configs/trainer/ddp_sim.yaml``).
"""

import json
import os
import socket
import subprocess
import sys

import jax
import numpy as np
import pytest

HELPERS = os.path.join(os.path.dirname(os.path.abspath(__file__)), "helpers")
sys.path.insert(0, HELPERS)

import mp_worker  # noqa: E402  (the worker doubles as the data/model builder)


class _FixedBatcher:
    def __init__(self, batches):
        self._batches = batches
        self.batch_size = batches[0].labels.shape[0]

    def epoch(self, _i):
        return iter(self._batches)


def _trainer_cfg():
    from newsreclib_tpu.training.trainer import TrainerConfig

    return TrainerConfig(max_epochs=1, log_every_n_steps=1, ckpt_dir=None)


def test_global_rows_match_host_dedup():
    """TrainBatcher(global_rows=True) + densify == host-dedup path, exactly,
    when the dedup bucket sizes agree."""
    from newsreclib_tpu.data.batching import TrainBatcher
    from newsreclib_tpu.models.components.losses import cross_entropy_loss
    from newsreclib_tpu.training.trainer import Trainer

    store, imp = mp_worker.build_data()
    kw = dict(batch_size=8, max_history_len=mp_worker.HIST,
              neg_sampling_ratio=mp_worker.NEG_K, seed=3)
    b_host = TrainBatcher(store, imp, u_bucket_min=64, **kw)
    b_glob = TrainBatcher(store, imp, global_rows=True, u_bucket_min=64, **kw)
    u_bucket = b_glob.global_u_bucket()
    # force the host path onto the same bucket so dropout shapes align
    b_host.u_bucket_min = u_bucket

    example = next(iter(b_host.epoch(0)))
    model, s1 = mp_worker.build_model_state(example)
    _, s2 = mp_worker.build_model_state(example)
    corpus = store.features_for(np.arange(store.title.shape[0]))

    class Cap:
        def __init__(self):
            self.losses = []

        def log_metrics(self, m, step):
            if "train/loss" in m:
                self.losses.append(m["train/loss"])

    c1, c2 = Cap(), Cap()
    t_host = Trainer(s1, cross_entropy_loss, _trainer_cfg(), loggers=[c1])
    t_glob = Trainer(s2, cross_entropy_loss, _trainer_cfg(), loggers=[c2],
                     corpus=corpus, u_bucket=u_bucket)
    limit = 5
    t_host.cfg.limit_train_batches = limit
    t_glob.cfg.limit_train_batches = limit
    t_host.train_epoch(b_host, 0)
    t_glob.train_epoch(b_glob, 0)
    assert len(c1.losses) == len(c2.losses) == limit
    np.testing.assert_allclose(c1.losses, c2.losses, rtol=1e-6)
    for a, b in zip(jax.tree.leaves(t_host.state.params),
                    jax.tree.leaves(t_glob.state.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)


def test_densify_overflow_poisons_loss():
    """A too-small u_bucket must surface as a finite-check failure, never as
    silently dropped articles."""
    from newsreclib_tpu.data.batching import TrainBatcher
    from newsreclib_tpu.models.components.losses import cross_entropy_loss
    from newsreclib_tpu.training.trainer import Trainer

    store, imp = mp_worker.build_data()
    kw = dict(batch_size=8, max_history_len=mp_worker.HIST,
              neg_sampling_ratio=mp_worker.NEG_K, seed=3, u_bucket_min=64)
    b_glob = TrainBatcher(store, imp, global_rows=True, **kw)
    example = next(iter(TrainBatcher(store, imp, **kw).epoch(0)))
    model, state = mp_worker.build_model_state(example)
    corpus = store.features_for(np.arange(store.title.shape[0]))
    trainer = Trainer(state, cross_entropy_loss, _trainer_cfg(),
                      corpus=corpus, u_bucket=8)  # way below the unique count
    trainer.cfg.limit_train_batches = 2
    with pytest.raises(FloatingPointError):
        trainer.train_epoch(b_glob, 0)


def _free_port() -> int:
    s = socket.socket()
    s.bind(("localhost", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def test_two_process_training_matches_single(tmp_path):
    """Launch 2 real processes (4 virtual CPU devices each) training NRMS
    over an 8-device global mesh; rank 0's per-step losses must match a
    single-process run over the identically-assembled global batches."""
    steps = 5
    port = _free_port()
    out = tmp_path / "rank0.json"
    env = dict(os.environ)
    env.pop("XLA_FLAGS", None)  # worker sets its own 4-device flag
    env["JAX_PLATFORMS"] = "cpu"
    procs = [
        subprocess.Popen(
            [sys.executable, os.path.join(HELPERS, "mp_worker.py"),
             "--process-id", str(i), "--num-processes", "2",
             "--port", str(port), "--steps", str(steps), "--out", str(out)],
            env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
        )
        for i in range(2)
    ]
    logs = []
    for p in procs:
        try:
            stdout, _ = p.communicate(timeout=420)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            raise
        logs.append(stdout.decode(errors="replace"))
    assert all(p.returncode == 0 for p in procs), "\n".join(logs)
    got = json.loads(out.read_text())
    assert len(got["losses"]) == steps

    # ---- single-process reference over the same GLOBAL batches ----
    from newsreclib_tpu.data.batching import TrainBatcher
    from newsreclib_tpu.models.components.losses import cross_entropy_loss
    from newsreclib_tpu.parallel.data import shard_impressions
    from newsreclib_tpu.training.trainer import Trainer

    store, imp_full = mp_worker.build_data()
    local_b = mp_worker.GLOBAL_BATCH // 2
    shards = [
        TrainBatcher(
            store, shard_impressions(imp_full, p, 2), batch_size=local_b,
            max_history_len=mp_worker.HIST, neg_sampling_ratio=mp_worker.NEG_K,
            seed=mp_worker.SEED + 7919 * p, global_rows=True, num_steps=steps,
            u_bucket_min=64,
        )
        for p in range(2)
    ]
    u_bucket = shards[0].global_u_bucket(mp_worker.GLOBAL_BATCH)
    # global batch = process-order concatenation (the mesh's data axis lays
    # process 0's devices first — make_array_from_process_local_data)
    global_batches = [
        jax.tree.map(lambda *xs: np.concatenate(xs, axis=0), b0, b1)
        for b0, b1 in zip(shards[0].epoch(0), shards[1].epoch(0))
    ]
    example = next(iter(TrainBatcher(
        store, shard_impressions(imp_full, 0, 2), batch_size=local_b,
        max_history_len=mp_worker.HIST, neg_sampling_ratio=mp_worker.NEG_K,
        seed=mp_worker.SEED, u_bucket_min=64,
    ).epoch(0)))
    model, state = mp_worker.build_model_state(example)
    corpus = store.features_for(np.arange(store.title.shape[0]))

    class Cap:
        def __init__(self):
            self.losses = []

        def log_metrics(self, m, step):
            if "train/loss" in m:
                self.losses.append(m["train/loss"])

    cap = Cap()
    trainer = Trainer(state, cross_entropy_loss, _trainer_cfg(), loggers=[cap],
                      corpus=corpus, u_bucket=u_bucket)
    trainer.cfg.limit_train_batches = steps
    trainer.train_epoch(_FixedBatcher(global_batches), 0)

    np.testing.assert_allclose(got["losses"], cap.losses, atol=2e-5)
    ref_abssum = float(sum(
        np.sum(np.abs(np.asarray(leaf)))
        for leaf in jax.tree.leaves(trainer.state.params)
    ))
    assert abs(got["param_abssum"] - ref_abssum) / max(ref_abssum, 1) < 1e-5


def test_two_process_model_axis_eval(tmp_path):
    """2 real processes × (data 4 / model 2... actually data 2 × model 2 per
    4-device proc -> global mesh data 4 × model 2): train with ROW-SHARDED
    embeddings, then run the rank-0 eval that round 3 left as
    NotImplementedError.  The worker's val metrics must match a
    single-process reference trained on the same global batches.
    (VERDICT r3 item 8.)"""
    steps = 4
    port = _free_port()
    out = tmp_path / "rank0.json"
    env = dict(os.environ)
    env.pop("XLA_FLAGS", None)
    env["JAX_PLATFORMS"] = "cpu"
    procs = [
        subprocess.Popen(
            [sys.executable, os.path.join(HELPERS, "mp_worker.py"),
             "--process-id", str(i), "--num-processes", "2",
             "--port", str(port), "--steps", str(steps),
             "--model-axis", "2", "--eval", "--out", str(out)],
            env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
        )
        for i in range(2)
    ]
    logs = []
    for p in procs:
        try:
            stdout, _ = p.communicate(timeout=420)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            raise
        logs.append(stdout.decode(errors="replace"))
    assert all(p.returncode == 0 for p in procs), "\n".join(logs)
    got = json.loads(out.read_text())
    assert len(got["losses"]) == steps
    assert got["eval"], "rank 0 must produce eval metrics"
    assert np.isfinite(got["eval"]["val/auc"])

    # ---- single-process reference over the same GLOBAL batches ----
    from newsreclib_tpu.data.batching import EvalBatcher, TrainBatcher
    from newsreclib_tpu.models.components.losses import cross_entropy_loss
    from newsreclib_tpu.parallel.data import shard_impressions
    from newsreclib_tpu.training.trainer import Trainer

    store, imp_full = mp_worker.build_data()
    local_b = mp_worker.GLOBAL_BATCH // 2
    shards = [
        TrainBatcher(
            store, shard_impressions(imp_full, p, 2), batch_size=local_b,
            max_history_len=mp_worker.HIST, neg_sampling_ratio=mp_worker.NEG_K,
            seed=mp_worker.SEED + 7919 * p, global_rows=True, num_steps=steps,
            u_bucket_min=64,
        )
        for p in range(2)
    ]
    u_bucket = shards[0].global_u_bucket(mp_worker.GLOBAL_BATCH)
    global_batches = [
        jax.tree.map(lambda *xs: np.concatenate(xs, axis=0), b0, b1)
        for b0, b1 in zip(shards[0].epoch(0), shards[1].epoch(0))
    ]
    example = next(iter(TrainBatcher(
        store, shard_impressions(imp_full, 0, 2), batch_size=local_b,
        max_history_len=mp_worker.HIST, neg_sampling_ratio=mp_worker.NEG_K,
        seed=mp_worker.SEED, u_bucket_min=64,
    ).epoch(0)))
    model, state = mp_worker.build_model_state(example)
    corpus = store.features_for(np.arange(store.title.shape[0]))
    trainer = Trainer(state, cross_entropy_loss, _trainer_cfg(),
                      model=model, corpus=corpus, u_bucket=u_bucket)
    trainer.cfg.limit_train_batches = steps
    trainer.train_epoch(_FixedBatcher(global_batches), 0)
    ref_abssum = float(sum(
        np.sum(np.abs(np.asarray(leaf)))
        for leaf in jax.tree.leaves(trainer.state.params)
    ))
    # row-sharded training must land on the same params (lookup psum order
    # gives tiny float drift)
    assert abs(got["param_abssum"] - ref_abssum) / max(ref_abssum, 1) < 1e-4
    ref_eval = trainer.evaluate(
        EvalBatcher(store, imp_full, max_history_len=mp_worker.HIST,
                    target_cells=256, u_bucket_min=64),
        "val",
    )
    for k in ("val/auc", "val/mrr", "val/ndcg@10"):
        assert abs(got["eval"][k] - ref_eval[k]) < 1e-3, (k, got["eval"][k], ref_eval[k])
