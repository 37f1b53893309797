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
from train import (_maybe_force_platform, _setup_compile_cache,
                   _setup_logging, setup_data)

log = logging.getLogger("newsreclib_tpu")


def _ranking(cfg: dict, info) -> RankingMetrics:
    return RankingMetrics(
        top_k_list=tuple(cfg["model"].get("top_k_list", (5, 10))),
        num_categ_classes=info.num_categories,
        num_sent_classes=info.num_sent_classes,
    )


def _test_batcher(cfg: dict, mind) -> EvalBatcher:
    from newsreclib_tpu.models.factory import title_split_margin

    dc = cfg["data"]
    margin = title_split_margin(cfg["model"].get("name", ""), cfg["model"])
    return EvalBatcher(
        mind.news_store("test").trim_titles(margin=margin),
        mind.impressions("test"),
        max_history_len=dc["max_history_len"],
        target_cells=dc.get("eval_target_cells", 8192),
        u_bucket_min=dc.get("u_bucket_min", 512),
        split_title_len=dc.get("split_title_len", 16),
        split_margin=margin,
    )


def run_manner_ensemble(cfg: dict, mind, info, out_dir: str) -> dict:
    """MANNeR test-only ensemble: load CR + A-module checkpoints, fuse
    per-impression z-scored module scores (reference
    ``manner_module.py:83-96,174-204``; ``configs/model/manner_module.yaml``).

    Config shape (model node): ``cr`` (a manner_cr model node) + ``cr_ckpt``;
    ``aspects: {<name>: {<manner_a model node>, ckpt, weight}}``.
    """
    from newsreclib_tpu.models.factory import build_manner_a
    from newsreclib_tpu.models.fair_rec.manner import evaluate_ensemble

    import dataclasses

    def info_for(node):
        # per-submodule pretrained-embedding gating (the top-level `manner`
        # node has no embedding dims of its own)
        if node.get("use_pretrained_embeddings", True):
            return info
        return dataclasses.replace(info, pretrained_embeddings=None)

    mc = cfg["model"]
    cr_model = build_model(mc["cr"], info_for(mc["cr"]))
    cr_params = Checkpointer(mc["cr_ckpt"]).restore_params("best")
    aspect_modules = {}
    for aname, node in (mc.get("aspects") or {}).items():
        if not node or node.get("ckpt") in (None, "???"):
            continue  # aspect disabled (e.g. sent: null in the demo overlay)
        a_model = build_manner_a(node, info_for(node))
        a_params = Checkpointer(node["ckpt"]).restore_params("best")
        aspect_modules[aname] = (a_model, a_params, node.get("weight", 0.0))
    log.info("ensemble: CR + %d aspect modules (%s)", len(aspect_modules),
             {k: v[2] for k, v in aspect_modules.items()})

    dc = cfg["data"]
    metrics = evaluate_ensemble(
        cr_model, cr_params, aspect_modules,
        mind.news_store("test"), mind.impressions("test"),
        _ranking(cfg, info),
        max_history_len=dc["max_history_len"],
        target_cells=dc.get("eval_target_cells", 8192),
    )
    metrics = {f"test/{k}": v for k, v in metrics.items()}
    loggers = make_loggers(out_dir, cfg.get("loggers", ["stdout", "csv"]))
    for lg in loggers:
        lg.log_metrics(metrics, 0)
    log.info("ensemble test metrics: %s", {k: round(v, 4) for k, v in metrics.items()})
    return metrics


def run(cfg: dict) -> dict:
    _setup_logging()
    _maybe_force_platform(cfg)
    _setup_compile_cache()
    out_dir = cfg["output_dir"]
    os.makedirs(out_dir, exist_ok=True)

    mind = setup_data(cfg)
    info = load_data_info(mind, cfg["model"])

    if cfg["model"]["name"] == "manner":
        return run_manner_ensemble(cfg, mind, info, out_dir)

    ckpt_path = cfg.get("ckpt_path")
    assert ckpt_path and ckpt_path != "???", "ckpt_path is required for eval"
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
    # template-free params restore: the training-time optimizer (scheduler /
    # clipping / freeze chain) need not match eval's placeholder optimizer
    state = state.replace(params=Checkpointer(ckpt_path).restore_params("best"))

    tc = cfg.get("trainer", {})
    trainer = Trainer(
        state, loss_fn,
        TrainerConfig(ckpt_dir=None, limit_eval_batches=tc.get("limit_eval_batches")),
        ranking=_ranking(cfg, info),
        loggers=make_loggers(out_dir, cfg.get("loggers", ["stdout", "csv"])),
        model=model,
    )
    metrics = trainer.test(_test_batcher(cfg, mind), restore_best=False)
    log.info("test metrics: %s", {k: round(v, 4) for k, v in metrics.items()})
    return metrics


def main() -> None:
    from train import task_wrapper

    cfg = compose(os.path.join(REPO_ROOT, "newsreclib_tpu", "configs"), "eval", sys.argv[1:])
    task_wrapper(run, cfg)


if __name__ == "__main__":
    main()
