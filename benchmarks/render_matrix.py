"""Render outputs/statfix_matrix.jsonl as the PARITY.md accuracy table.

Round 5 (VERDICT r4 weak #2): the beyond-accuracy columns (categ/sent
diversity + personalization @10, reference ``nrms_module.py:197-228``) are
first-class — they are the metrics that distinguish the fairness family.
``--beyond`` renders that table; the default renders the accuracy table.
"""

from __future__ import annotations

import argparse
import json
import os

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
    # statfix v2 (planted sentiment-bias + entity-topic signals)
    "nrms_statfix2_celoss": "NRMS (v2)",
    "sentirec_statfix2_celoss": "SentiRec (v2, div coef 10)",
    "sentirec_statfix2_nodiv": "SentiRec (v2, div coef 0)",
    "dkn_statfix2_celoss": "DKN (v2)",
    "dkn_statfix2_noent": "DKN (v2, entity-ablated)",
    "senti_debias_statfix2": "SentiDebias (v2)",
    "caum_statfix2_celoss": "CAUM (v2)",
    "caum_statfix2_noent": "CAUM (v2, entity-ablated)",
}


def load_rows(path: str) -> dict:
    rows = {}
    with open(path) as f:
        for line in f:
            r = json.loads(line)
            rows[r["experiment"]] = r  # last occurrence wins (resume reruns)
    return rows


def fmt(r, key, metrics_key=None):
    v = r.get(key)
    if v is None and metrics_key:
        v = (r.get("metrics") or {}).get(metrics_key)
    return f"{v:.4f}" if isinstance(v, (int, float)) else "—"


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--beyond", action="store_true",
                    help="render the diversity/personalization table")
    ap.add_argument("--jsonl", default=os.path.join(REPO, "outputs", "statfix_matrix.jsonl"))
    args = ap.parse_args()
    rows = load_rows(args.jsonl)

    if args.beyond:
        print("| Model | categ_div@10 | sent_div@10 | categ_pers@10 | sent_pers@10 |")
        print("|---|---|---|---|---|")
        for exp, label in LABELS.items():
            r = rows.get(exp)
            if r is None or r.get("error") or not (r.get("metrics") or {}):
                continue
            print(
                f"| {label} | {fmt(r, '_', 'test/categ_div@10')} | "
                f"{fmt(r, '_', 'test/sent_div@10')} | "
                f"{fmt(r, '_', 'test/categ_pers@10')} | "
                f"{fmt(r, '_', 'test/sent_pers@10')} |"
            )
        return

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
        print(
            f"| {label} | {fmt(r, 'test_auc')} | {fmt(r, 'test_mrr')} | "
            f"{fmt(r, 'test_ndcg10')} | {r.get('wall_s', '—')} |"
        )


if __name__ == "__main__":
    main()
