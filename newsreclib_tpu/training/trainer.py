"""Training orchestration: epochs, validation, early stopping, checkpoints.

Reference analog: Lightning ``Trainer.fit``/``test`` plus the callbacks the
reference composes (early stopping on ``val/loss`` with patience 5 +
``check_finite``, best-checkpoint tracking — ``configs/callbacks/``).  Here
it is a compact loop over jitted steps with streaming metric collection; no
framework magic.
"""

from __future__ import annotations

import logging
import time
from dataclasses import dataclass, field
from typing import Callable, Dict, Iterable, Optional

import jax
import numpy as np

from newsreclib_tpu.data.batching import EvalBatcher, TrainBatcher
from newsreclib_tpu.metrics.collector import RankingMetrics, StreamingEval
from newsreclib_tpu.training.checkpoint import Checkpointer
from newsreclib_tpu.training.state import TrainState
from newsreclib_tpu.training.steps import make_eval_step, make_train_step

log = logging.getLogger("newsreclib_tpu")


@dataclass
class TrainerConfig:
    max_epochs: int = 20
    patience: int = 5  # early stopping on monitor
    monitor: str = "loss"  # metric from the val collector
    mode: str = "min"
    log_every_n_steps: int = 50
    check_finite: bool = True
    ckpt_dir: Optional[str] = None
    limit_train_batches: Optional[int] = None
    limit_eval_batches: Optional[int] = None


class Trainer:
    def __init__(
        self,
        state: TrainState,
        loss_fn: Callable,
        cfg: TrainerConfig,
        ranking: Optional[RankingMetrics] = None,
        loggers: Iterable = (),
        collect_auc_inputs: bool = True,
    ):
        self.state = state
        self.cfg = cfg
        self.loggers = list(loggers)
        self.ranking = ranking or RankingMetrics()
        self.train_step = make_train_step(loss_fn)
        self.eval_step = make_eval_step(loss_fn=loss_fn, ranking=self.ranking)
        self.collect_auc_inputs = collect_auc_inputs
        self.ckpt = Checkpointer(cfg.ckpt_dir, mode=cfg.mode) if cfg.ckpt_dir else None
        self.global_step = 0

    # ---------- loops ----------

    def _log(self, metrics: Dict[str, float], step: int) -> None:
        for lg in self.loggers:
            lg.log_metrics(metrics, step)

    def train_epoch(self, batcher: TrainBatcher, epoch: int) -> Dict[str, float]:
        losses = []
        t0 = time.time()
        n = 0
        for i, batch in enumerate(batcher.epoch(epoch)):
            if self.cfg.limit_train_batches and i >= self.cfg.limit_train_batches:
                break
            self.state, metrics = self.train_step(self.state, batch)
            n += 1
            if (i + 1) % self.cfg.log_every_n_steps == 0 or i == 0:
                loss = float(metrics["loss"])
                losses.append(loss)
                if self.cfg.check_finite and not np.isfinite(loss):
                    raise FloatingPointError(f"non-finite train loss at step {i}")
                self._log({"train/loss": loss, "epoch": epoch}, self.global_step + i)
        self.global_step += n
        dt = time.time() - t0
        out = {
            "train/loss": float(np.mean(losses)) if losses else float("nan"),
            "train/steps_per_sec": n / max(dt, 1e-9),
            "train/impressions_per_sec": n * batcher.batch_size / max(dt, 1e-9),
        }
        return out

    def evaluate(self, batcher: EvalBatcher, prefix: str = "val") -> Dict[str, float]:
        # device-side streaming accumulation: one host sync per epoch (the
        # axon tunnel charges ~30ms per fetch; see StreamingEval)
        stream = StreamingEval(collect_auc=self.collect_auc_inputs)
        for i, batch in enumerate(batcher):
            if self.cfg.limit_eval_batches and i >= self.cfg.limit_eval_batches:
                break
            scores, per_imp, valid, loss = self.eval_step(self.state, batch)
            stream.update(
                scores, per_imp, valid,
                batch.labels if self.collect_auc_inputs else None,
                batch.cand_mask if self.collect_auc_inputs else None,
                loss,
            )
        metrics = stream.finalize()
        return {f"{prefix}/{k}": v for k, v in metrics.items()}

    def fit(
        self,
        train_batcher: TrainBatcher,
        val_batcher: Optional[EvalBatcher] = None,
        resume: bool = False,
    ) -> Dict[str, float]:
        """With ``resume=True``, restores the 'last' checkpoint (params,
        optimizer state, epoch counter, best metric) and continues — the
        reference's ``trainer.fit(ckpt_path=...)`` (``train.py:91``)."""
        best = None
        bad_epochs = 0
        start_epoch = 0
        if resume and self.ckpt and self.ckpt.has("last"):
            self.state = self.ckpt.restore(self.state, "last")
            meta = self.ckpt.meta("last")
            start_epoch = int(meta.get("epoch", -1)) + 1
            self.global_step = int(meta.get("step", 0))
            best = self.ckpt.best_metric
            log.info("resumed from last checkpoint: epoch %d, step %d, best %s",
                     start_epoch, self.global_step, best)
        history: Dict[str, float] = {}
        for epoch in range(start_epoch, self.cfg.max_epochs):
            train_metrics = self.train_epoch(train_batcher, epoch)
            metrics = dict(train_metrics)
            if val_batcher is not None:
                val_metrics = self.evaluate(val_batcher, "val")
                metrics.update(val_metrics)
                monitored = val_metrics.get(f"val/{self.cfg.monitor}")
            else:
                monitored = train_metrics["train/loss"]
            self._log(metrics, self.global_step)
            history = metrics
            improved = best is None or (
                monitored < best if self.cfg.mode == "min" else monitored > best
            )
            if self.ckpt:
                self.ckpt.save(self.state, self.global_step, metric=monitored,
                               extra={"epoch": epoch})
            if improved:
                best = monitored
                bad_epochs = 0
            else:
                bad_epochs += 1
                if bad_epochs >= self.cfg.patience:
                    log.info("early stopping at epoch %d (best %s=%.5f)", epoch,
                             self.cfg.monitor, best)
                    break
        history["best_" + self.cfg.monitor] = best if best is not None else float("nan")
        return history

    def test(self, test_batcher: EvalBatcher, restore_best: bool = True) -> Dict[str, float]:
        if restore_best and self.ckpt and self.ckpt.has("best"):
            self.state = self.ckpt.restore(self.state, "best")
        metrics = self.evaluate(test_batcher, "test")
        self._log(metrics, self.global_step)
        return metrics
