"""AOT compile-memory probe: lower + compile an experiment's train/eval steps
and print XLA's HBM memory analysis WITHOUT running a single step.

This is how the round-4 MANNeR CR OOM (19.78G demanded vs 15.75G v5e HBM,
VERDICT.md round 3) was diagnosed and the remat fix verified: the probe
reports ``temp_size`` (activation working set) per compiled program, so a
memory regression is visible in seconds instead of OOMing minutes into a run.

Usage:
    python benchmarks/hbm_probe.py manner_cr_statfix_supconloss
    python benchmarks/hbm_probe.py nrms_statfix_celoss --eval
"""

from __future__ import annotations

import argparse
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import jax  # noqa: E402
import numpy as np  # noqa: E402


def gib(n: int) -> str:
    return f"{n / 2**30:.2f}G"


def report(label: str, compiled) -> None:
    m = compiled.memory_analysis()
    if m is None:
        print(f"{label}: no memory analysis available on this backend")
        return
    total = (
        m.argument_size_in_bytes
        + m.output_size_in_bytes
        - m.alias_size_in_bytes
        + m.temp_size_in_bytes
    )
    print(
        f"{label}: args {gib(m.argument_size_in_bytes)} "
        f"out {gib(m.output_size_in_bytes)} "
        f"aliased {gib(m.alias_size_in_bytes)} "
        f"temp {gib(m.temp_size_in_bytes)} "
        f"-> peak ~{gib(total)}"
    )


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("experiment")
    ap.add_argument("overrides", nargs="*", help="extra config overrides (k=v)")
    ap.add_argument("--eval", action="store_true", help="also probe the eval step")
    args = ap.parse_args()

    from newsreclib_tpu.config.compose import compose
    from newsreclib_tpu.data.batching import EvalBatcher, TrainBatcher
    from newsreclib_tpu.models.factory import (
        build_loss,
        build_model,
        load_data_info,
        title_split_margin,
    )
    from newsreclib_tpu.training.state import create_train_state, make_optimizer
    from newsreclib_tpu.training.steps import make_eval_step, make_train_step
    from train import setup_data

    cfg = compose(
        os.path.join(REPO, "newsreclib_tpu", "configs"),
        overrides=[f"experiment={args.experiment}", *args.overrides],
    )
    dc = cfg["data"]
    mind = setup_data(cfg)
    margin = title_split_margin(cfg["model"]["name"], cfg["model"])
    store = mind.news_store("train").trim_titles(margin=margin)
    info = load_data_info(mind, cfg["model"])
    model = build_model(cfg["model"], info)
    loss_fn = build_loss(cfg["model"])
    split_len = dc.get("split_title_len", 16)
    batcher = TrainBatcher(
        store,
        mind.impressions("train"),
        batch_size=dc["batch_size"],
        max_history_len=dc["max_history_len"],
        neg_sampling_ratio=dc["neg_sampling_ratio"],
        u_bucket_min=dc.get("u_bucket_min", 512),
        split_title_len=split_len,
        split_margin=margin,
        seed=cfg.get("seed", 0),
    )
    example = next(iter(batcher.epoch(0)))
    state = create_train_state(
        model, example, jax.random.key(0),
        make_optimizer(),
    )
    tc = cfg.get("trainer", {})
    precision = tc.get("precision")
    cdtype = "bfloat16" if precision in (16, "16", "bf16", "bfloat16") else None
    step = make_train_step(loss_fn, donate=False, compute_dtype=cdtype)

    def shape_key(b):
        return (
            b.hist_idx.shape, b.cand_idx.shape, b.news.title.shape,
            None if b.news2 is None else b.news2.title.shape,
        )

    # scan one epoch for DISTINCT batch shapes (u-bucket x length-split
    # combinations) — the OOM shape is rarely batch 0's
    seen = {}
    for b in batcher.epoch(0):
        k = shape_key(b)
        if k not in seen:
            seen[k] = b
        if len(seen) >= 8:
            break
    for k, b in seen.items():
        u = b.news.title.shape[0] + (
            b.news2.title.shape[0] if b.news2 is not None else 0
        )
        label = (
            f"train_step B={b.hist_idx.shape[0]} H={b.hist_idx.shape[1]} "
            f"C={b.cand_idx.shape[1]} U={u} L1={b.news.title.shape[1]}"
            + (f" L2={b.news2.title.shape[1]}" if b.news2 is not None else "")
        )
        report(label, step.lower(state, b).compile())

    if args.eval:
        from newsreclib_tpu.metrics.collector import RankingMetrics

        ranking = RankingMetrics(
            top_k_list=tuple(cfg["model"].get("top_k_list", (5, 10))),
            num_categ_classes=info.num_categories,
            num_sent_classes=info.num_sent_classes,
        )
        ev = EvalBatcher(
            store, mind.impressions("val"),
            max_history_len=dc["max_history_len"],
            target_cells=dc.get("eval_target_cells", 8192),
            u_bucket_min=dc.get("u_bucket_min", 512),
            split_title_len=split_len,
            split_margin=margin,
        )
        estep = make_eval_step(loss_fn=loss_fn, ranking=ranking, compute_dtype=cdtype)
        seen = set()
        for b in ev:
            key = (b.hist_idx.shape, b.cand_idx.shape, b.news.title.shape,
                   None if b.news2 is None else b.news2.title.shape)
            if key in seen:
                continue
            seen.add(key)
            report(f"eval_step {key}", estep.lower(state, b).compile())
            if len(seen) >= 6:
                break


if __name__ == "__main__":
    main()
