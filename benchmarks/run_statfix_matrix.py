"""Run the full model-family accuracy matrix on the statfix fixture.

Sequentially trains every ``*_statfix*`` experiment on the attached TPU
(canonical hparams, 5 epochs) and appends one JSON line per run to
``outputs/statfix_matrix.jsonl``.

Retry-safe layout (round 4): every attempt runs in its OWN directory
``outputs/statfix_<name>/attempt_<k>/`` so a dead retry can never clobber a
completed attempt's metrics/checkpoints (round 3 lost LSTUR's completed
metrics.csv this way).  On success the runner symlinks
``outputs/statfix_<name>/checkpoints -> attempt_<k>/checkpoints`` (dependent
configs, e.g. the MANNeR ensemble, address checkpoints via the stable path)
and writes the top-level ``final_metrics.json`` marker that makes the queue
resumable.

Exit-code discipline: a stall kill (no log output for STALL_S — the known
axon-tunnel wedge) returns -99 and is retried with the persistent compile
cache; a wall-clock TIMEOUT_S expiry returns -98 and is NOT retried (a
genuinely slow run would just burn 3x the budget, ADVICE r3).

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
    ("nrms_xmindfix_zeroshot", "nrms_xmind_zeroshot"),
    ("nrms_xmindfix_bilingual", "nrms_xmind_bilingual"),
    # statfix v2: planted sentiment-bias + entity-topic signals (round 5)
    ("nrms_statfix2_celoss", "nrms2"),
    ("sentirec_statfix2_celoss", "sentirec2"),
    ("sentirec_statfix2_nodiv", "sentirec2_nodiv"),
    ("dkn_statfix2_celoss", "dkn2"),
    ("dkn_statfix2_noent", "dkn2_noent"),
    ("senti_debias_statfix2", "senti_debias2"),
    ("caum_statfix2_celoss", "caum2"),
    ("caum_statfix2_noent", "caum2_noent"),
]

TIMEOUT_S = 3600
STALL_S = 720  # no new output for this long -> axon tunnel wedge, kill+retry
# (the remote compile queue has been observed to sit ~10min; with the
# persistent compile cache a retry resumes where the last attempt died)
ATTEMPTS = 3

RC_STALL = -99
RC_TIMEOUT = -98


def _run_watched(cmd: list, log_path: str) -> int:
    """Run ``cmd`` streaming to ``log_path``; kill it if the log goes quiet
    for STALL_S (axon tunnel wedge) or TIMEOUT_S expires.  Returns the exit
    code, RC_STALL on a stall kill, RC_TIMEOUT on timeout."""
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
        if time.time() - t0 > TIMEOUT_S:
            proc.kill()
            proc.wait()
            return RC_TIMEOUT
        if time.time() - os.path.getmtime(log_path) > STALL_S:
            proc.kill()
            proc.wait()
            return RC_STALL
        time.sleep(10)


def _relink(link: str, target_rel: str) -> None:
    if os.path.islink(link):
        os.unlink(link)
    elif os.path.isdir(link):
        # pre-round-4 layout left a REAL checkpoints dir here; keep it as
        # evidence but move it aside — dependent configs (MANNeR ensemble)
        # must resolve the stable path to the attempt that just SUCCEEDED,
        # not to stale weights
        k = 0
        while os.path.exists(f"{link}.pre_attempt_{k}"):
            k += 1
        os.rename(link, f"{link}.pre_attempt_{k}")
        print(f"moved stale real dir {link} -> {link}.pre_attempt_{k}", flush=True)
    if not os.path.exists(link):
        os.symlink(target_rel, link)


def run_one(exp: str, name: str, script: str = "train.py",
            overrides: "list[str] | tuple" = ()) -> dict:
    base_dir = os.path.join("outputs", f"statfix_{name}")
    abs_base = os.path.join(REPO, base_dir)
    marker = os.path.join(abs_base, "final_metrics.json")
    if os.path.exists(marker):
        with open(marker) as f:
            return {"experiment": exp, "skipped": True, **json.load(f)}
    os.makedirs(abs_base, exist_ok=True)
    print(f"=== {exp} -> {base_dir}", flush=True)
    t0 = time.time()
    rc, out_dir, log_path = RC_STALL, None, None
    for attempt in range(ATTEMPTS):
        # fresh dir per attempt: completed evidence is never overwritten
        k = 0
        while os.path.exists(os.path.join(abs_base, f"attempt_{k}")):
            k += 1
        out_dir = os.path.join(base_dir, f"attempt_{k}")
        os.makedirs(os.path.join(REPO, out_dir))
        log_path = os.path.join(REPO, out_dir, "run.log")
        cmd = [sys.executable, "-u", script, f"experiment={exp}",
               f"output_dir={out_dir}", *overrides]
        rc = _run_watched(cmd, log_path)
        if rc == 0:
            break
        print(f"attempt {attempt + 1}/{ATTEMPTS}: rc={rc} "
              f"({'stalled' if rc == RC_STALL else 'timeout' if rc == RC_TIMEOUT else 'failed'})",
              flush=True)
        if rc != RC_STALL:
            break  # real failure or timeout: retrying won't help (ADVICE r3)
    with open(log_path, errors="replace") as f:
        full = f.read()
    tail = full[-4000:]
    if rc != 0:
        print(tail, flush=True)
        return {"experiment": exp, "error": f"rc={rc}", "out_dir": out_dir,
                "tail": tail[-800:]}
    # the final-metrics dict is logged as "final metrics: {...}" by train.py;
    # eval.py (ensemble) logs "ensemble test metrics: {...}"
    metrics = {}
    for line in full.splitlines():
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
        "out_dir": out_dir,
        "test_auc": metrics.get("test/auc"),
        "test_mrr": metrics.get("test/mrr"),
        "test_ndcg10": metrics.get("test/ndcg@10"),
        "val_auc_best_epoch": metrics.get("val/auc"),
        "metrics": metrics,
    }
    # stable alias for dependent configs (manner ensemble ckpt paths)
    att_ckpt = os.path.join(REPO, out_dir, "checkpoints")
    if os.path.isdir(att_ckpt):
        _relink(os.path.join(abs_base, "checkpoints"),
                os.path.join(os.path.basename(out_dir), "checkpoints"))
    with open(marker, "w") as f:
        json.dump(row, f)
    return row


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--only", default=None)
    ap.add_argument("--seeds", default=None,
                    help="comma list; with --exp runs seed replicates into "
                         "outputs/statfix_seeds/<name>_s<seed>/ (VERDICT r4 "
                         "task 2: measure run-to-run variance)")
    ap.add_argument("--exp", default=None, help="experiment config for --seeds")
    ap.add_argument("--name", default=None, help="short name for --seeds dirs")
    ap.add_argument("--override", action="append", default=[],
                    help="extra key=value overrides passed to every run")
    args = ap.parse_args()
    if args.seeds:
        assert args.exp, "--seeds requires --exp"
        name = args.name or args.exp.split("_")[0]
        log_path = os.path.join(REPO, "outputs", "seed_band.jsonl")
        os.makedirs(os.path.dirname(log_path), exist_ok=True)
        for s in args.seeds.split(","):
            row = run_one(args.exp, f"seeds/{name}_s{s}",
                          overrides=[f"seed={s}", *args.override])
            row["seed"] = int(s)
            print(json.dumps(row)[:400], flush=True)
            with open(log_path, "a") as f:
                f.write(json.dumps(row) + "\n")
        return
    only = set(args.only.split(",")) if args.only else None
    log_path = os.path.join(REPO, "outputs", "statfix_matrix.jsonl")
    os.makedirs(os.path.dirname(log_path), exist_ok=True)
    for entry in EXPERIMENTS:
        exp, name = entry[0], entry[1]
        script = entry[2] if len(entry) > 2 else "train.py"
        if only and exp not in only and name not in only:
            continue
        row = run_one(exp, name, script)
        print(json.dumps(row)[:400], flush=True)
        with open(log_path, "a") as f:
            f.write(json.dumps(row) + "\n")


if __name__ == "__main__":
    main()
