"""Production-corpus-scale cached serving measurement (SCALING.md rows).

Round 4 measured the GloVe tower at a 500k-article corpus; round 5 adds the
PLM tower at production corpus sizes (VERDICT r4 task 4): for the
reference's #1 hot loop (``text.py:15-109``) the production question is the
re-encode cost per parameter version + the post-encode scoring throughput.

  python benchmarks/serving_scale.py --tower plm --corpus 100000
  python benchmarks/serving_scale.py --tower glove --corpus 500000
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--tower", choices=["glove", "plm"], default="plm")
    ap.add_argument("--corpus", type=int, default=100_000)
    ap.add_argument("--imps", type=int, default=16_384)
    ap.add_argument("--cands", type=int, default=32)
    ap.add_argument("--hist", type=int, default=50)
    ap.add_argument("--encode-batch", type=int, default=2048)
    args = ap.parse_args()

    from train import _setup_compile_cache

    _setup_compile_cache()
    from newsreclib_tpu.data.batching import Impressions
    from newsreclib_tpu.data.news_store import NewsStore
    from newsreclib_tpu.data.synthetic import SyntheticConfig, make_batch
    from newsreclib_tpu.models.general_rec import NRMS
    from newsreclib_tpu.serving import CachedScorer, build_news_vector_table
    from newsreclib_tpu.training.state import create_train_state, make_optimizer

    rng = np.random.default_rng(0)
    N, L = args.corpus, (96 if args.tower == "plm" else 30)
    split = 32 if args.tower == "plm" else 16
    mean_len = 24.0 if args.tower == "plm" else 11.0

    print(f"building {N}-article corpus (L={L})...", flush=True)
    title = np.zeros((N + 1, L), dtype=np.int32)
    lens = np.clip(rng.poisson(mean_len, size=N), 4, L)
    cols = np.arange(L)[None, :]
    title[1:] = np.where(cols < lens[:, None],
                         rng.integers(2, 30000, size=(N, L)), 0)
    store = NewsStore(nid2row={f"N{i}": i for i in range(1, N + 1)}, title=title)

    hist_lens = rng.integers(5, args.hist + 1, size=args.imps)
    hists = [rng.integers(1, N + 1, size=int(h)) for h in hist_lens]
    cands = [rng.integers(1, N + 1, size=args.cands) for _ in range(args.imps)]
    labels = []
    for _ in range(args.imps):
        l = np.zeros(args.cands, dtype=np.int8)
        l[rng.integers(0, args.cands)] = 1
        labels.append(l)
    imp = Impressions.from_lists(hists, cands, labels,
                                 np.ones(args.imps, dtype=np.int32))

    if args.tower == "plm":
        from newsreclib_tpu.models.components.plm import (
            PLMTextEncoder,
            TransformerEncoder,
        )

        tower = PLMTextEncoder(encoder=TransformerEncoder(vocab_size=30522),
                               use_mhsa=True, num_heads=16, query_dim=200,
                               pack_to=128)
        model = NRMS(vocab_size=30000, num_heads=16, text_encoder_module=tower)
    else:
        model = NRMS(vocab_size=30000, embed_dim=300, num_heads=15,
                     query_dim=200)

    cfg = SyntheticConfig(vocab_size=30000, title_len=L)
    example = make_batch(rng, batch_size=8, hist_len=args.hist,
                         num_candidates=5, unique_news=128, cfg=cfg,
                         with_abstract=False, with_entities=False)
    state = create_train_state(model, example, jax.random.key(0), make_optimizer())
    params = jax.tree.map(
        lambda x: x.astype(jnp.bfloat16) if x.dtype == jnp.float32 else x,
        state.params)

    # re-encode cost per parameter version (first call includes the one-time
    # token transfer over the tunnel + compile; steady state is the metric)
    for trial in range(3):
        t0 = time.time()
        table = build_news_vector_table(model, params, store, args.encode_batch,
                                        dtype=jnp.bfloat16, split_title_len=split)
        # axon tunnel: force completion by fetching a scalar (block_until_
        # ready acks early; newsreclib_tpu/utils/timing.py)
        float(jnp.sum(table[-1].astype(jnp.float32)))
        dt = time.time() - t0
        print(f"re-encode trial {trial}: {dt:.3f}s "
              f"({N/dt:,.0f} articles/s)", flush=True)
    encode_s = dt

    scorer = CachedScorer(model, split_title_len=split)
    for trial in range(3):
        t0 = time.time()
        out = scorer.evaluate(params, store, imp, max_history_len=args.hist,
                              target_cells=16384,
                              encode_batch=args.encode_batch,
                              collect_auc=False)
        dt = time.time() - t0
        print(f"serving epoch trial {trial}: {dt:.3f}s "
              f"({args.imps/dt:,.0f} imp/s, includes re-encode)", flush=True)
    print(json.dumps({
        "tower": args.tower, "corpus": N, "imps": args.imps,
        "cands": args.cands,
        "reencode_s": round(encode_s, 3),
        "articles_per_s": round(N / encode_s, 1),
        "epoch_s": round(dt, 3),
        "imp_per_s": round(args.imps / dt, 1),
        "sample_metrics": {k: round(v, 4) for k, v in out.items()},
    }))


if __name__ == "__main__":
    main()
