"""Evaluation entry point: restore a checkpoint, run the test split.

Reference analog: ``newsreclib/eval.py:32-80`` (``ckpt_path`` required,
``trainer.test``).

Usage:
    python eval.py experiment=nrms_demo ckpt_path=outputs/.../checkpoints
"""

from __future__ import annotations

import logging
import os
import sys

import jax

REPO_ROOT = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, REPO_ROOT)

from newsreclib_tpu.config.compose import compose
from newsreclib_tpu.data.batching import EvalBatcher, TrainBatcher
from newsreclib_tpu.metrics.collector import RankingMetrics
from newsreclib_tpu.models.factory import build_loss, build_model, load_data_info
from newsreclib_tpu.training.checkpoint import Checkpointer
from newsreclib_tpu.training.loggers import make_loggers
from newsreclib_tpu.training.state import create_train_state, make_optimizer
from newsreclib_tpu.training.trainer import Trainer, TrainerConfig
from train import _maybe_force_platform, _setup_logging, setup_data

log = logging.getLogger("newsreclib_tpu")


def run(cfg: dict) -> dict:
    _setup_logging()
    _maybe_force_platform(cfg)
    ckpt_path = cfg.get("ckpt_path")
    assert ckpt_path and ckpt_path != "???", "ckpt_path is required for eval"
    out_dir = cfg["output_dir"]
    os.makedirs(out_dir, exist_ok=True)

    mind = setup_data(cfg)
    info = load_data_info(mind, cfg["model"])
    model = build_model(cfg["model"], info)
    loss_fn = build_loss(cfg["model"])
    dc = cfg["data"]

    store = mind.news_store("train")
    example = next(
        iter(
            TrainBatcher(
                store, mind.impressions("train"), batch_size=dc["batch_size"],
                max_history_len=dc["max_history_len"],
                neg_sampling_ratio=dc["neg_sampling_ratio"],
                u_bucket_min=dc.get("u_bucket_min", 512),
            ).epoch(0)
        )
    )
    state = create_train_state(model, example, jax.random.key(0), make_optimizer())
    state = Checkpointer(ckpt_path).restore(state, "best")

    test_batcher = EvalBatcher(
        mind.news_store("test"), mind.impressions("test"),
        max_history_len=dc["max_history_len"],
        target_cells=dc.get("eval_target_cells", 8192),
        u_bucket_min=dc.get("u_bucket_min", 512),
    )
    tc = cfg.get("trainer", {})
    trainer = Trainer(
        state, loss_fn,
        TrainerConfig(ckpt_dir=None, limit_eval_batches=tc.get("limit_eval_batches")),
        ranking=RankingMetrics(
            top_k_list=tuple(cfg["model"].get("top_k_list", (5, 10))),
            num_categ_classes=info.num_categories,
            num_sent_classes=info.num_sent_classes,
        ),
        loggers=make_loggers(out_dir, cfg.get("loggers", ["stdout", "csv"])),
    )
    metrics = trainer.test(test_batcher, restore_best=False)
    log.info("test metrics: %s", {k: round(v, 4) for k, v in metrics.items()})
    return metrics


def main() -> None:
    cfg = compose(os.path.join(REPO_ROOT, "newsreclib_tpu", "configs"), "eval", sys.argv[1:])
    run(cfg)


if __name__ == "__main__":
    main()
