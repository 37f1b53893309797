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


STALL_S = 720  # no new output for this long -> axon tunnel wedge, kill+retry
# (the remote compile queue has been observed to sit ~10min; with the
# persistent compile cache a retry resumes where the last attempt died)
ATTEMPTS = 3


def _run_watched(cmd: str, log_path: str) -> int:
    """Run ``cmd`` streaming to ``log_path``; kill -9 it if the log goes
    quiet for STALL_S (the axon remote TPU tunnel is known to wedge
    mid-run — stale grants / stuck compile queue; see bench.py preflight).
    Returns the exit code, or -99 on a stall kill."""
    with open(log_path, "ab") as out:
        proc = subprocess.Popen(cmd, cwd=REPO, stdout=out, stderr=out)
    # appending to a previous attempt's log leaves a STALE mtime; without
    # this touch the stall check fires instantly
    os.utime(log_path, None)
    t0 = time.time()
    while True:
        rc = proc.poll()
        if rc is not None:
            return rc
        if time.time() - t0 > TIMEOUT_S or (
            time.time() - os.path.getmtime(log_path) > STALL_S
        ):
            proc.kill()
            proc.wait()
            return -99
        time.sleep(10)


def run_one(exp: str, name: str, script: str = "train.py") -> dict:
    out_dir = os.path.join("outputs", f"statfix_{name}")
    marker = os.path.join(REPO, out_dir, "final_metrics.json")
    if os.path.exists(marker):
        with open(marker) as f:
            return {"experiment": exp, "skipped": True, **json.load(f)}
    t0 = time.time()
    cmd = [sys.executable, "-u", script, f"experiment={exp}", f"output_dir={out_dir}"]
    print(f"=== {exp} -> {out_dir}", flush=True)
    os.makedirs(os.path.join(REPO, out_dir), exist_ok=True)
    log_path = os.path.join(REPO, out_dir, "run.log")
    rc = -99
    for attempt in range(ATTEMPTS):
        rc = _run_watched(cmd, log_path)
        if rc == 0:
            break
        print(f"attempt {attempt + 1}/{ATTEMPTS}: rc={rc} "
              f"({'stalled' if rc == -99 else 'failed'})", flush=True)
        if rc != -99:
            break  # real failure: retrying won't help
    with open(log_path, errors="replace") as f:
        full = f.read()
    tail = full[-4000:]
    if rc != 0:
        print(tail, flush=True)
        return {"experiment": exp, "error": f"rc={rc}", "tail": tail[-800:]}

    class proc:  # minimal shim for the parsing code below
        stdout, stderr, returncode = full, "", rc
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
