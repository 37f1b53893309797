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


def tpe_sample(
    spec: Dict[str, Any],
    history: List[Dict[str, Any]],
    mode: str,
    rng: np.random.Generator,
    n_startup: int = 5,
    gamma: float = 0.25,
    n_candidates: int = 24,
) -> Dict[str, Any]:
    """Tree-structured Parzen Estimator step (Optuna-TPE analog, pure numpy;
    reference ``configs/hparams_search/nrms_optuna_tpe.yaml`` — optuna isn't
    in this environment).

    Completed trials are split at the gamma-quantile into good/bad sets;
    numeric params sample candidates from a Parzen (Gaussian-mixture) fit of
    the GOOD set and keep the candidate maximizing l(x)/g(x); categoricals
    use smoothed good/bad frequency ratios.
    """
    done = [h for h in history if h["value"] is not None]
    if len(done) < n_startup:
        return sample_params(spec, rng)
    vals = np.asarray([h["value"] for h in done], dtype=np.float64)
    order = np.argsort(vals)
    if mode == "max":
        order = order[::-1]
    n_good = max(1, int(np.ceil(gamma * len(done))))
    good = [done[i] for i in order[:n_good]]
    bad = [done[i] for i in order[n_good:]] or good

    def parzen_logpdf(x, pts, low, high):
        pts = np.asarray(pts, dtype=np.float64)
        sigma = max((high - low) / max(len(pts), 1), 1e-12)
        comp = -0.5 * ((x[:, None] - pts[None, :]) / sigma) ** 2 - np.log(sigma)
        m = comp.max(axis=1)
        return m + np.log(np.exp(comp - m[:, None]).mean(axis=1) + 1e-300)

    out: Dict[str, Any] = {}
    for key, s in spec.items():
        g_vals = [h["params"][key] for h in good]
        b_vals = [h["params"][key] for h in bad]
        if "choices" in s:
            choices = s["choices"]
            gc = np.asarray([1.0 + sum(v == c for v in g_vals) for c in choices])
            bc = np.asarray([1.0 + sum(v == c for v in b_vals) for c in choices])
            score = (gc / gc.sum()) / (bc / bc.sum())
            p = score / score.sum()
            out[key] = choices[int(rng.choice(len(choices), p=p))]
            continue
        log_space = bool(s.get("log"))
        low, high = float(s["low"]), float(s["high"])
        tf = np.log if log_space else (lambda x: np.asarray(x, dtype=np.float64))
        lo, hi = float(tf(low)), float(tf(high))
        g_pts, b_pts = tf(g_vals), tf(b_vals)
        sigma = max((hi - lo) / max(len(g_pts), 1), 1e-12)
        cand = np.clip(
            g_pts[rng.integers(0, len(g_pts), size=n_candidates)]
            + rng.normal(0, sigma, size=n_candidates),
            lo, hi,
        )
        ei = parzen_logpdf(cand, g_pts, lo, hi) - parzen_logpdf(cand, b_pts, lo, hi)
        x = float(cand[int(np.argmax(ei))])
        x = float(np.exp(x)) if log_space else x
        x = min(max(x, low), high)  # exp(log(low)) can round just below low
        if isinstance(s.get("low"), int) and isinstance(s.get("high"), int) and not s.get("float"):
            x = int(round(x))
        out[key] = x
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

    sampler = sweep.get("sampler", "random")
    n_trials = sweep.get("n_trials", 10)
    if sampler == "grid":
        trials: List = grid_params(sweep["params"])
    elif sampler == "tpe":
        trials = [None] * n_trials  # sampled adaptively from the history
    else:
        trials = [sample_params(sweep["params"], rng) for _ in range(n_trials)]

    results = []
    best = None
    for t, params in enumerate(trials):
        if params is None:  # TPE: condition on completed trials
            params = tpe_sample(
                sweep["params"], results, sweep.get("mode", "max"), rng,
                n_startup=sweep.get("n_startup_trials", 5),
            )
        # spec-level fixed overrides (e.g. a reduced per-trial epoch budget)
        # compose before CLI overrides so the CLI still wins
        fixed = [f"{k}={v}" for k, v in (sweep.get("overrides") or {}).items()]
        trial_overrides = fixed + rest + [f"{k}={v}" for k, v in params.items()]
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
        # flush after EVERY trial so an interrupted sweep keeps its history
        out = {"metric": metric, "mode": mode, "best": best, "trials": results}
        out_path = sweep.get("output", "outputs/sweep_results.json")
        os.makedirs(os.path.dirname(out_path) or ".", exist_ok=True)
        with open(out_path, "w") as f:
            json.dump(out, f, indent=2)
    log.info("sweep done: best %s", best)


if __name__ == "__main__":
    main()
