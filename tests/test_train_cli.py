"""End-to-end CLI pipeline test: compose config → train → checkpoint →
eval restore, on the synthetic demo fixture (fast-dev-run limits)."""

import os
import sys

import pytest

REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO_ROOT)

from newsreclib_tpu.config.compose import compose

CONFIG_DIR = os.path.join(REPO_ROOT, "newsreclib_tpu", "configs")


def test_compose_defaults_and_overrides():
    cfg = compose(CONFIG_DIR, "train", ["model=naml", "data.batch_size=16", "trainer=fdr"])
    assert cfg["model"]["name"] == "naml"
    assert cfg["data"]["batch_size"] == 16
    assert cfg["trainer"]["limit_train_batches"] == 2
    assert cfg["output_dir"] == "outputs/naml_mind_small"  # interpolation


def test_compose_experiment_overlay():
    cfg = compose(CONFIG_DIR, "train", ["experiment=nrms_demo"])
    assert cfg["data"]["name"] == "mind_demo"
    assert cfg["model"]["embed_dim"] == 60
    assert cfg["trainer"]["max_epochs"] == 2
    # group default not touched by the overlay survives
    assert cfg["trainer"]["patience"] == 5


def test_train_eval_roundtrip(tmp_path):
    import numpy as np

    import train as train_mod
    import eval as eval_mod

    overrides = [
        "experiment=nrms_demo",
        f"data.data_dir={tmp_path}/demo/",
        f"data.word_embeddings_fpath={tmp_path}/demo/glove_demo.txt",
        f"output_dir={tmp_path}/out",
        "trainer.max_epochs=1",
        "trainer.limit_train_batches=3",
        "trainer.limit_eval_batches=2",
        "data.eval_target_cells=64",
        "data.u_bucket_min=64",
    ]
    cfg = compose(CONFIG_DIR, "train", overrides)
    metrics = train_mod.run(cfg)
    assert np.isfinite(metrics["train/loss"])
    assert "test/auc" in metrics
    assert os.path.exists(f"{tmp_path}/out/checkpoints/best")
    assert os.path.exists(f"{tmp_path}/out/metrics.csv")

    ecfg = compose(
        CONFIG_DIR, "eval", overrides + [f"ckpt_path={tmp_path}/out/checkpoints"]
    )
    emetrics = eval_mod.run(ecfg)
    assert abs(emetrics["test/auc"] - metrics["test/auc"]) < 1e-6
