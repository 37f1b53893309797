"""Hyperparameter search entry point.

Reference analog: Hydra + Optuna TPE sweeps
(``configs/hparams_search/nrms_optuna_tpe.yaml``, objective wired through
``train.py:119-127``).  Optuna isn't in this environment; this implements
random + grid search over a sweep spec with the same workflow: each trial
composes the config with trial overrides, runs training, and the sweep
reports the best ``optimized_metric``.

Sweep spec (``newsreclib_tpu/configs/hparams_search/*.yaml``):

    optimized_metric: val/auc
    mode: max
    n_trials: 20
    sampler: random            # random | grid
    params:
      model.optimizer.lr: {low: 1e-5, high: 1e-3, log: true}
      model.dropout_probability: {choices: [0.1, 0.2, 0.3]}
      data.batch_size: {choices: [32, 64, 128]}

Usage:
    python sweep.py hparams_search=nrms_random experiment=nrms_demo
"""

from __future__ import annotations

import itertools
import json
import logging
import os
import sys
from typing import Any, Dict, List

import numpy as np
import yaml

REPO_ROOT = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, REPO_ROOT)

from newsreclib_tpu.config.compose import compose
import train as train_mod

log = logging.getLogger("newsreclib_tpu")


def sample_params(spec: Dict[str, Any], rng: np.random.Generator) -> Dict[str, Any]:
    out = {}
    for key, s in spec.items():
        if "choices" in s:
            out[key] = s["choices"][int(rng.integers(0, len(s["choices"])))]
        elif s.get("log"):
            out[key] = float(np.exp(rng.uniform(np.log(s["low"]), np.log(s["high"]))))
        elif isinstance(s.get("low"), int) and isinstance(s.get("high"), int) and not s.get("float"):
            out[key] = int(rng.integers(s["low"], s["high"] + 1))
        else:
            out[key] = float(rng.uniform(s["low"], s["high"]))
    return out


def grid_params(spec: Dict[str, Any]) -> List[Dict[str, Any]]:
    keys = list(spec)
    choice_lists = []
    for k in keys:
        s = spec[k]
        assert "choices" in s, f"grid sampler requires 'choices' for {k}"
        choice_lists.append(s["choices"])
    return [dict(zip(keys, combo)) for combo in itertools.product(*choice_lists)]


def main() -> None:
    overrides = sys.argv[1:]
    sweep_name = "default"
    rest = []
    for ov in overrides:
        if ov.startswith("hparams_search="):
            sweep_name = ov.split("=", 1)[1]
        else:
            rest.append(ov)
    spec_path = os.path.join(
        REPO_ROOT, "newsreclib_tpu", "configs", "hparams_search", f"{sweep_name}.yaml"
    )
    with open(spec_path) as f:
        sweep = yaml.safe_load(f)

    metric = sweep["optimized_metric"]
    mode = sweep.get("mode", "max")
    rng = np.random.default_rng(sweep.get("seed", 0))

    if sweep.get("sampler", "random") == "grid":
        trials = grid_params(sweep["params"])
    else:
        trials = [sample_params(sweep["params"], rng) for _ in range(sweep.get("n_trials", 10))]

    results = []
    best = None
    for t, params in enumerate(trials):
        trial_overrides = rest + [f"{k}={v}" for k, v in params.items()]
        cfg = compose(os.path.join(REPO_ROOT, "newsreclib_tpu", "configs"), "train", trial_overrides)
        cfg["output_dir"] = os.path.join(cfg["output_dir"], f"trial_{t}")
        try:
            metrics = train_mod.run(cfg)
            value = metrics.get(metric)
        except Exception as e:  # noqa: BLE001 — a failed trial must not kill the sweep
            log.exception("trial %d failed", t)
            value = None
        results.append({"trial": t, "params": params, "value": value})
        if value is not None and (
            best is None
            or (value > best["value"] if mode == "max" else value < best["value"])
        ):
            best = results[-1]
        log.info("trial %d: %s -> %s=%s (best=%s)", t, params, metric, value,
                 best["value"] if best else None)

    out = {"metric": metric, "mode": mode, "best": best, "trials": results}
    out_path = sweep.get("output", "outputs/sweep_results.json")
    os.makedirs(os.path.dirname(out_path) or ".", exist_ok=True)
    with open(out_path, "w") as f:
        json.dump(out, f, indent=2)
    log.info("sweep done: best %s", best)


if __name__ == "__main__":
    main()
