"""Summarize outputs/seed_band.jsonl as mean ± sd per experiment.

The run-to-run noise band these replicates establish is the yardstick every
"parity within noise" claim in PARITY.md is restated against (VERDICT r4
task 2; reference north star "within run-to-run variance", BASELINE.md).
"""

from __future__ import annotations

import json
import os
from collections import defaultdict

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

KEYS = [
    "test/auc", "test/mrr", "test/ndcg@10",
    "test/categ_div@10", "test/sent_div@10",
    "test/categ_pers@10", "test/sent_pers@10",
]


def main() -> None:
    groups: dict = defaultdict(list)
    with open(os.path.join(REPO, "outputs", "seed_band.jsonl")) as f:
        for line in f:
            r = json.loads(line)
            if r.get("error"):
                continue
            groups[r["experiment"]].append(r)
    for exp, rows in groups.items():
        # latest row per seed wins (reruns append)
        by_seed = {r.get("seed"): r for r in rows}
        rows = list(by_seed.values())
        print(f"\n{exp}  (n={len(rows)} seeds: "
              f"{sorted(by_seed)})")
        print("| metric | mean | sd | min | max |")
        print("|---|---|---|---|---|")
        for k in KEYS:
            vals = np.asarray([
                r["metrics"].get(k) for r in rows
                if r.get("metrics", {}).get(k) is not None
            ], dtype=np.float64)
            if not len(vals):
                continue
            print(f"| {k} | {vals.mean():.4f} | {vals.std(ddof=1):.4f} "
                  f"| {vals.min():.4f} | {vals.max():.4f} |")


if __name__ == "__main__":
    main()
