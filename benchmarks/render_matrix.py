"""Render outputs/statfix_matrix.jsonl as the PARITY.md accuracy table."""

from __future__ import annotations

import json
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

LABELS = {
    "nrms_statfix_celoss": "NRMS",
    "naml_statfix_celoss": "NAML",
    "lstur_statfix_celoss": "LSTUR",
    "npa_statfix_celoss": "NPA",
    "tanr_statfix_celoss": "TANR",
    "caum_statfix_celoss": "CAUM",
    "mins_statfix_celoss": "MINS",
    "cen_news_rec_statfix_celoss": "CenNewsRec",
    "dkn_statfix_celoss": "DKN",
    "miner_statfix_celoss": "MINER",
    "sentirec_statfix_celoss": "SentiRec",
    "senti_debias_statfix": "SentiDebias",
    "manner_cr_statfix_supconloss": "MANNeR-CR (SupCon)",
    "manner_a_categ_statfix": "MANNeR A-module (category)",
    "manner_a_sent_statfix": "MANNeR A-module (sentiment)",
    "manner_ensemble_statfix": "MANNeR ensemble",
    "nrms_adressafix_celoss": "NRMS (Adressa fixture)",
    "nrms_xmindfix_zeroshot": "NRMS (xMIND zero-shot fin)",
    "nrms_xmindfix_bilingual": "NRMS (xMIND bilingual fin)",
}


def main() -> None:
    rows = {}
    with open(os.path.join(REPO, "outputs", "statfix_matrix.jsonl")) as f:
        for line in f:
            r = json.loads(line)
            rows[r["experiment"]] = r  # last occurrence wins (resume reruns)
    print("| Model | test AUC | test MRR | test nDCG@10 | wall (s) |")
    print("|---|---|---|---|---|")
    for exp, label in LABELS.items():
        r = rows.get(exp)
        if r is None:
            print(f"| {label} | — | — | — | not run |")
            continue
        if r.get("error"):
            print(f"| {label} | ERROR | | | {r['error']} |")
            continue

        def fmt(key):
            v = r.get(key)
            return f"{v:.4f}" if isinstance(v, (int, float)) else "—"

        print(
            f"| {label} | {fmt('test_auc')} | {fmt('test_mrr')} | "
            f"{fmt('test_ndcg10')} | {r.get('wall_s', '—')} |"
        )


if __name__ == "__main__":
    main()
