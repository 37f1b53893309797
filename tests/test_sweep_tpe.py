"""TPE sampler sanity: adapts toward the optimum on a toy objective."""

import numpy as np

from sweep import sample_params, tpe_sample

SPEC = {
    "lr": {"low": 1e-5, "high": 1e-1, "log": True},
    "dropout": {"choices": [0.1, 0.2, 0.3, 0.5]},
    "width": {"low": 8, "high": 64},
}


def objective(p):
    # optimum near lr=1e-3, dropout=0.2, width=32
    return -(
        (np.log10(p["lr"]) + 3.0) ** 2
        + (0.0 if p["dropout"] == 0.2 else 1.0)
        + ((p["width"] - 32.0) / 16.0) ** 2
    )


def run(sampler, n=40, seed=0):
    rng = np.random.default_rng(seed)
    hist = []
    for _ in range(n):
        p = sampler(hist, rng)
        hist.append({"params": p, "value": objective(p)})
    return hist


def test_tpe_beats_random():
    rand_best, tpe_best = [], []
    for seed in range(5):
        r = run(lambda h, rng: sample_params(SPEC, rng), seed=seed)
        t = run(lambda h, rng: tpe_sample(SPEC, h, "max", rng), seed=seed)
        rand_best.append(max(x["value"] for x in r))
        tpe_best.append(max(x["value"] for x in t))
    # TPE should be at least as good on average over seeds
    assert np.mean(tpe_best) >= np.mean(rand_best) - 1e-9


def test_tpe_respects_bounds_and_types():
    rng = np.random.default_rng(1)
    hist = run(lambda h, rng: tpe_sample(SPEC, h, "max", rng), n=25, seed=3)
    for h in hist:
        p = h["params"]
        assert 1e-5 <= p["lr"] <= 1e-1
        assert p["dropout"] in SPEC["dropout"]["choices"]
        assert isinstance(p["width"], int) and 8 <= p["width"] <= 64
