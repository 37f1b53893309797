"""Unit tests for the statfix-v2 sentiment-bias probe metrics
(benchmarks/sentiment_bias_probe.py — VERDICT r4 task 1 evidence tool)."""

import sys
import os

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__)))))

from benchmarks.sentiment_bias_probe import head_metrics  # noqa: E402


def test_head_metrics_biased_vs_neutral():
    rng = np.random.default_rng(0)
    n_rows = 300
    row_pol = rng.choice([1.0, -1.0, 0.0], size=n_rows, p=[0.3, 0.3, 0.4])
    row_pol[0] = 0.0

    imps, hists, counts = [], [], []
    upols = []
    for i in range(50):
        rows = rng.choice(np.arange(1, n_rows), size=30, replace=False)
        upol = 0.9 if i % 2 == 0 else -0.9
        upols.append(upol)
        hists.append(rows[:5])
        counts.append(30)
        imps.append(rows)
    upols = np.asarray(upols)

    # biased head: rank matching-polarity articles first
    biased = [rows[np.argsort(-(row_pol[rows] * np.sign(u)), kind="stable")]
              for rows, u in zip(imps, upols)]
    # neutral head: random order
    neutral = [rng.permutation(rows) for rows in imps]

    m_b = head_metrics(biased, counts, hists, row_pol, upols)
    m_n = head_metrics(neutral, counts, hists, row_pol, upols)

    assert m_b["skew"] > 0.5            # top-10 all matching polarity
    assert abs(m_n["skew"]) < 0.15      # random ~ slate base
    assert m_b["sent_div@10"] < m_n["sent_div@10"]  # biased top-k is pure
    assert 0.0 <= m_n["sent_div@10"] <= 1.0
    assert m_b["n_imps"] == 50


def test_head_metrics_skips_small_impressions():
    row_pol = np.zeros(20)
    rows = np.arange(1, 6)  # only 5 candidates < k=10
    m = head_metrics([rows], [5], [rows[:2]], row_pol, np.asarray([0.9]))
    assert m["n_imps"] == 0
