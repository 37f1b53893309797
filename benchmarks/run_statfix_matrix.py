"""Run the full model-family accuracy matrix on the statfix fixture (r3).

Sequentially trains every ``*_statfix*`` experiment on the attached TPU
(canonical hparams, 5 epochs) and appends one JSON line per run to
``outputs/statfix_matrix.jsonl``.  Resumable: runs whose output dir already
holds a ``final_metrics.json`` are skipped, so the queue can be re-launched
after interruptions.

Usage: python benchmarks/run_statfix_matrix.py [--only exp1,exp2]
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

EXPERIMENTS = [
    # (experiment config, short model name)
    ("nrms_statfix_celoss", "nrms"),
    ("naml_statfix_celoss", "naml"),
    ("lstur_statfix_celoss", "lstur"),
    ("npa_statfix_celoss", "npa"),
    ("tanr_statfix_celoss", "tanr"),
    ("caum_statfix_celoss", "caum"),
    ("mins_statfix_celoss", "mins"),
    ("cen_news_rec_statfix_celoss", "cen_news_rec"),
    ("dkn_statfix_celoss", "dkn"),
    ("miner_statfix_celoss", "miner"),
    ("sentirec_statfix_celoss", "sentirec"),
    ("senti_debias_statfix", "senti_debias"),
    ("manner_cr_statfix_supconloss", "manner_cr"),
    # A-modules + ckpt-loading ensemble eval (must follow manner_cr)
    ("manner_a_categ_statfix", "manner_a_categ"),
    ("manner_a_sent_statfix", "manner_a_sent"),
    ("manner_ensemble_statfix", "manner_ensemble", "eval.py"),
    ("nrms_adressafix_celoss", "nrms_adressa"),
]

TIMEOUT_S = 3600


def run_one(exp: str, name: str, script: str = "train.py") -> dict:
    out_dir = os.path.join("outputs", f"statfix_{name}")
    marker = os.path.join(REPO, out_dir, "final_metrics.json")
    if os.path.exists(marker):
        with open(marker) as f:
            return {"experiment": exp, "skipped": True, **json.load(f)}
    t0 = time.time()
    cmd = [sys.executable, script, f"experiment={exp}", f"output_dir={out_dir}"]
    print(f"=== {exp} -> {out_dir}", flush=True)
    proc = subprocess.run(
        cmd, cwd=REPO, capture_output=True, text=True, timeout=TIMEOUT_S
    )
    tail = (proc.stdout + proc.stderr)[-4000:]
    if proc.returncode != 0:
        print(tail, flush=True)
        return {"experiment": exp, "error": f"rc={proc.returncode}", "tail": tail[-800:]}
    # the final-metrics dict is logged as "final metrics: {...}"
    metrics = {}
    for line in (proc.stdout + proc.stderr).splitlines():
        # train.py logs "final metrics: {...}"; eval.py (ensemble) logs
        # "ensemble test metrics: {...}"
        if "final metrics:" in line or "test metrics:" in line:
            line = line.replace("ensemble test metrics:", "final metrics:")
            line = line.replace("test metrics:", "final metrics:")
        if "final metrics:" in line:
            try:
                metrics = json.loads(
                    line.split("final metrics:", 1)[1].strip().replace("'", '"')
                )
            except json.JSONDecodeError:
                pass
    row = {
        "experiment": exp,
        "wall_s": round(time.time() - t0, 1),
        "test_auc": metrics.get("test/auc"),
        "test_mrr": metrics.get("test/mrr"),
        "test_ndcg10": metrics.get("test/ndcg@10"),
        "val_auc_best_epoch": metrics.get("val/auc"),
        "metrics": metrics,
    }
    os.makedirs(os.path.join(REPO, out_dir), exist_ok=True)
    with open(marker, "w") as f:
        json.dump(row, f)
    return row


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--only", default=None)
    args = ap.parse_args()
    only = set(args.only.split(",")) if args.only else None
    log_path = os.path.join(REPO, "outputs", "statfix_matrix.jsonl")
    os.makedirs(os.path.dirname(log_path), exist_ok=True)
    for entry in EXPERIMENTS:
        exp, name = entry[0], entry[1]
        script = entry[2] if len(entry) > 2 else "train.py"
        if only and exp not in only and name not in only:
            continue
        try:
            row = run_one(exp, name, script)
        except subprocess.TimeoutExpired:
            row = {"experiment": exp, "error": f"timeout>{TIMEOUT_S}s"}
        print(json.dumps(row)[:400], flush=True)
        with open(log_path, "a") as f:
            f.write(json.dumps(row) + "\n")


if __name__ == "__main__":
    main()
