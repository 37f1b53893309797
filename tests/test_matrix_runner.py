"""Retry-safety of the accuracy-matrix runner (benchmarks/run_statfix_matrix):
round 3 lost completed evidence to an in-place retry; these pin the round-4
per-attempt layout helpers without touching the TPU."""

import importlib.util
import json
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
spec = importlib.util.spec_from_file_location(
    "run_statfix_matrix", os.path.join(REPO, "benchmarks", "run_statfix_matrix.py")
)
runner = importlib.util.module_from_spec(spec)
spec.loader.exec_module(runner)


def test_relink_replaces_symlink(tmp_path):
    base = tmp_path / "statfix_m"
    (base / "attempt_0" / "checkpoints").mkdir(parents=True)
    (base / "attempt_1" / "checkpoints").mkdir(parents=True)
    link = str(base / "checkpoints")
    runner._relink(link, "attempt_0/checkpoints")
    assert os.readlink(link) == "attempt_0/checkpoints"
    # a later successful attempt retargets the stable path
    runner._relink(link, "attempt_1/checkpoints")
    assert os.readlink(link) == "attempt_1/checkpoints"


def test_relink_moves_stale_real_dir(tmp_path):
    """A pre-round-4 REAL checkpoints dir must be moved aside, never left
    shadowing the fresh attempt (the MANNeR ensemble resolves this path)."""
    base = tmp_path / "statfix_m"
    stale = base / "checkpoints"
    stale.mkdir(parents=True)
    (stale / "old_weights").write_text("stale")
    (base / "attempt_0" / "checkpoints").mkdir(parents=True)
    runner._relink(str(stale), "attempt_0/checkpoints")
    assert os.path.islink(str(stale))
    assert os.readlink(str(stale)) == "attempt_0/checkpoints"
    moved = base / "checkpoints.pre_attempt_0"
    assert (moved / "old_weights").read_text() == "stale"


def test_completed_run_is_skipped_not_rerun(tmp_path, monkeypatch):
    """final_metrics.json marks completion; run_one must return the recorded
    row without launching anything."""
    monkeypatch.setattr(runner, "REPO", str(tmp_path))
    out = tmp_path / "outputs" / "statfix_demo"
    out.mkdir(parents=True)
    row = {"experiment": "demo_exp", "test_auc": 0.7, "wall_s": 1.0}
    (out / "final_metrics.json").write_text(json.dumps(row))

    def boom(*a, **k):  # any attempt to run would be evidence-destroying
        raise AssertionError("must not launch a process for a completed run")

    monkeypatch.setattr(runner, "_run_watched", boom)
    got = runner.run_one("demo_exp", "demo")
    assert got["skipped"] is True and got["test_auc"] == 0.7
