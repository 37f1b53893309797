"""Measured PyTorch baseline: the REFERENCE's NRMS eval-loop structure.

VERDICT r1 item 9: the bench's ``vs_baseline`` divided by an unmeasured
estimate.  This script measures the reference composition directly — torch
modules imported from ``/root/reference`` (MHSAAddAtt text encoder,
UserEncoder, DotProduct), with the reference's per-occurrence encoding
structure: every history+candidate article of every impression is re-encoded
each batch (``nrms_module.py:231-237``), ragged impressions padded per batch
(``to_dense_batch``).

Runs on torch CPU (this sandbox has no GPU).  The GPU estimate in bench.py
stays, but is cross-checked against this measurement (a V100-class GPU runs
this encoder-bound workload ~15-30x faster than one CPU socket).

Writes BASELINE_MEASURED.json at the repo root; bench.py includes it in the
output JSON when present.

Usage:  python benchmarks/torch_reference_baseline.py [n_impressions]
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, "/root/reference")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import torch

# canonical bench shapes (bench.py / BASELINE.md)
HIST = 50
CANDS = 32
TITLE = 30
VOCAB = 60000
EMBED = 300
HEADS = 15
QUERY = 200
BATCH = 64  # reference eval batch size (configs/data/mind_rec.yaml)


def build_reference_nrms():
    from newsreclib.models.components.encoders.news.text import MHSAAddAtt
    from newsreclib.models.components.encoders.user.nrms import UserEncoder
    from newsreclib.models.components.layers.click_predictor import DotProduct

    rng = np.random.default_rng(0)
    pre = rng.normal(size=(VOCAB, EMBED)).astype(np.float32)
    pre[0] = 0.0
    text = MHSAAddAtt(pre, EMBED, HEADS, QUERY, 0.2).eval()
    user = UserEncoder(news_embed_dim=EMBED, num_heads=HEADS, query_dim=QUERY).eval()
    click = DotProduct().eval()
    return text, user, click


def main() -> None:
    n_imp = int(sys.argv[1]) if len(sys.argv) > 1 else 512
    torch.set_num_threads(os.cpu_count() or 8)
    text, user, click = build_reference_nrms()
    rng = np.random.default_rng(1)

    # reference eval structure: per impression, ALL hist+cand tokens are
    # encoded (no cross-impression dedup/caching); batches of BATCH
    # impressions, padded to the batch max history (to_dense_batch analog)
    def batch_tokens(b):
        hist_tok = rng.integers(1, VOCAB, size=(b * HIST, TITLE)).astype(np.int64)
        cand_tok = rng.integers(1, VOCAB, size=(b * CANDS, TITLE)).astype(np.int64)
        return torch.tensor(hist_tok), torch.tensor(cand_tok)

    with torch.no_grad():
        # warm-up
        h, c = batch_tokens(8)
        hv = text(h).reshape(8, HIST, EMBED)
        cv = text(c).reshape(8, CANDS, EMBED)
        u = user(hv)
        click(u.unsqueeze(1), cv.permute(0, 2, 1))

        done = 0
        t0 = time.time()
        while done < n_imp:
            b = min(BATCH, n_imp - done)
            h, c = batch_tokens(b)
            hv = text(h).reshape(b, HIST, EMBED)  # re-encode every occurrence
            cv = text(c).reshape(b, CANDS, EMBED)
            u = user(hv)
            scores = click(u.unsqueeze(1), cv.permute(0, 2, 1))
            float(scores.sum())  # force
            done += b
        dt = time.time() - t0

    ips = n_imp / dt
    out = {
        "torch_cpu_measured_ips": round(ips, 1),
        "n_impressions": n_imp,
        "seconds": round(dt, 2),
        "threads": torch.get_num_threads(),
        "workload": "reference NRMS eval loop (per-occurrence encoding), "
                    f"HIST={HIST} CANDS={CANDS} TITLE={TITLE} EMBED={EMBED}",
        "measured_on": "torch CPU (no GPU in sandbox); reference modules "
                       "imported from /root/reference",
    }
    print(json.dumps(out, indent=2))
    with open(os.path.join(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))), "BASELINE_MEASURED.json"), "w") as f:
        json.dump(out, f, indent=2)


if __name__ == "__main__":
    main()
