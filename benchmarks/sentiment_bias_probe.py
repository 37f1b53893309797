"""Measure sentiment-bias amplification / removal on statfix v2.

The v2 fixture plants a user-polarity click preference (data/statfix.py).
This probe scores the TEST split with a trained checkpoint and reports, per
scoring head:

  * skew        — mean over polar users of mean(top-10 article polarity) x
                  sign(user polarity): how much the head over-serves the
                  user's preferred sentiment (0 = unbiased; slate base rate
                  printed for reference)
  * sent_div@10 — entropy of the top-10 polarity-class histogram / log 3
  * sent_pers@10— generalized Jaccard between top-10 and history class
                  histograms (reference metrics/functional.py:51-127
                  semantics, computed host-side from ground truth polarity)

Heads: standard models expose one head; SentiDebias exposes bias_free /
bias_aware / combined (reference senti_debias_module.py:431 evaluates
bias_free) — comparing them demonstrates the adversarial debiasing did its
job (VERDICT r4 task 1).

Usage:
  python benchmarks/sentiment_bias_probe.py --exp nrms_statfix2_celoss \
      --ckpt outputs/statfix_nrms2/attempt_0/checkpoints [--out probe.json]
"""

from __future__ import annotations

import argparse
import json
import os
import sys

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402


def polarity_tables(data_dir: str, store, impressions):
    truth = np.load(os.path.join(data_dir, "statfix_v2_truth.npz"))
    news_pol, user_pol = truth["news_pol"], truth["user_pol"]
    row_pol = np.zeros(store.title.shape[0], dtype=np.float64)
    row_topic = np.full(store.title.shape[0], -1, dtype=np.int64)
    for nid, row in store.nid2row.items():
        row_pol[row] = news_pol[int(nid[1:]) - 1]
        row_topic[row] = truth["news_topic"][int(nid[1:]) - 1]
    uids = impressions.user_ids
    uid_int = np.asarray(
        [int(str(u).lstrip("U")) for u in uids]
        if uids is not None and not np.issubdtype(np.asarray(uids).dtype, np.integer)
        else uids
    )
    imp_user_pol = user_pol[uid_int - 1]
    return row_pol, imp_user_pol, row_topic


def head_metrics(order_rows, valid_counts, hists, row_pol, imp_user_pol, k=10,
                 row_topic=None, n_topics=20):
    """order_rows: list per impression of candidate store rows sorted by
    descending score; hists: list of history store rows.

    When ``row_topic`` is given, also reports topic_pers@10 — generalized
    Jaccard between top-10 and history TOPIC histograms.  The v2 topic
    signal is carried ONLY by entities, so topic_pers above the random-
    ranking base demonstrates the entity channel at work behaviorally."""
    skews, bases, divs, perss, tperss = [], [], [], [], []
    log3 = np.log(3.0)
    for rows, n, hist, upol in zip(order_rows, valid_counts, hists, imp_user_pol):
        if n < k:
            continue
        top = rows[:k]
        top_pol = row_pol[top]
        if upol != 0:
            skews.append(top_pol.mean() * np.sign(upol))
            bases.append(row_pol[rows[:n]].mean() * np.sign(upol))
        cls = (top_pol + 1).astype(np.int64)  # {0,1,2}
        h = np.bincount(cls, minlength=3).astype(np.float64)
        p = h / h.sum()
        nz = p[p > 0]
        divs.append(float(-(nz * np.log(nz)).sum() / log3))
        if len(hist):
            hh = np.bincount((row_pol[hist] + 1).astype(np.int64), minlength=3
                             ).astype(np.float64)
            hp = hh / hh.sum()
            num = np.minimum(p, hp).sum()
            den = np.maximum(p, hp).sum()
            perss.append(float(num / den))
            if row_topic is not None:
                tp = np.bincount(row_topic[top].clip(0), minlength=n_topics
                                 ).astype(np.float64)
                th = np.bincount(row_topic[hist].clip(0), minlength=n_topics
                                 ).astype(np.float64)
                tp, th = tp / tp.sum(), th / th.sum()
                tperss.append(float(np.minimum(tp, th).sum()
                                    / np.maximum(tp, th).sum()))
    def m(x):
        return float(np.mean(x)) if len(x) else float("nan")

    out = {
        "n_imps": len(divs),
        "skew": m(skews),
        "skew_base": m(bases),
        "sent_div@10": m(divs),
        "sent_pers@10": m(perss),
    }
    if row_topic is not None:
        out["topic_pers@10"] = m(tperss)
    return out


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--exp", required=True)
    ap.add_argument("--ckpt", required=True)
    ap.add_argument("--out", default=None)
    ap.add_argument("--which", default="best")
    ap.add_argument("--limit-batches", type=int, default=None,
                    help="smoke-test cap on scored eval batches")
    args = ap.parse_args()

    from newsreclib_tpu.config.compose import compose
    from newsreclib_tpu.data.batching import EvalBatcher, _dedup
    from newsreclib_tpu.models.factory import build_model, load_data_info, title_split_margin
    from newsreclib_tpu.training.checkpoint import Checkpointer
    from train import _setup_compile_cache, _setup_logging, setup_data

    _setup_logging()
    _setup_compile_cache()
    cfg = compose(os.path.join(REPO, "newsreclib_tpu", "configs"), "train",
                  [f"experiment={args.exp}", "output_dir=outputs/tmp_bias_probe"])
    mind = setup_data(cfg)
    dc, mc = cfg["data"], cfg["model"]
    margin = title_split_margin(mc["name"], mc)
    store = mind.news_store("test").trim_titles(margin=margin)
    imp = mind.impressions("test")
    info = load_data_info(mind, mc)
    row_pol, imp_user_pol, row_topic = polarity_tables(dc["data_dir"], store, imp)

    params = Checkpointer(args.ckpt).restore_params(args.which)
    adversarial = bool(mc.get("adversarial"))
    if adversarial:
        from newsreclib_tpu.models.factory import build_senti_debias
        from newsreclib_tpu.models.fair_rec.senti_debias import SentiDebiasGenerator

        gen, _ = build_senti_debias(mc, info)

        @jax.jit
        def score_heads(p, batch):
            out = gen.apply({"params": p}, batch, deterministic=True,
                            method=SentiDebiasGenerator.full_output)
            return {
                "bias_free": out["bias_free_scores"],
                "bias_aware": out["combined_scores"] - out["bias_free_scores"],
                "combined": out["combined_scores"],
            }
    else:
        model = build_model(mc, info)

        @jax.jit
        def score_heads(p, batch):
            scores, _ = model.apply({"params": p}, batch, deterministic=True)
            return {"scores": scores}

    batcher = EvalBatcher(
        store, imp, max_history_len=dc["max_history_len"],
        target_cells=dc.get("eval_target_cells", 8192),
        u_bucket_min=dc.get("u_bucket_min", 512),
        split_title_len=dc.get("split_title_len", 16), split_margin=margin,
    )
    # impression ids in assembler bucket order (export_recommendations recipe)
    order = np.asarray(
        [i for _, idxs in sorted(batcher._assembler.buckets.items()) for i in idxs]
    )
    per_head_rows: dict = {}
    valid_counts, hist_rows, imp_ids = [], [], []
    cursor = 0
    for bi, raw in enumerate(batcher._assembler):
        if args.limit_batches and bi >= args.limit_batches:
            break
        news, news2, hist_local, cand_local = _dedup(
            store, raw.hist_idx, raw.cand_idx, dc.get("u_bucket_min", 512),
            dc.get("split_title_len", 16), margin,
        )
        batch = raw._replace(news=news, hist_idx=hist_local,
                             cand_idx=cand_local, news2=news2)
        heads = {k: np.asarray(v) for k, v in score_heads(params, batch).items()}
        n_valid = int(np.sum(raw.impression_valid))
        g_cand = np.asarray(raw.cand_idx[:n_valid])      # GLOBAL store rows
        g_mask = np.asarray(raw.cand_mask[:n_valid])
        g_hist = np.asarray(raw.hist_idx[:n_valid])
        g_hmask = np.asarray(raw.hist_mask[:n_valid])
        for b in range(n_valid):
            rows = g_cand[b][g_mask[b]]
            valid_counts.append(len(rows))
            hist_rows.append(g_hist[b][g_hmask[b]])
            imp_ids.append(order[cursor + b])
            for hname, s in heads.items():
                sc = s[b][g_mask[b]]
                per_head_rows.setdefault(hname, []).append(
                    rows[np.argsort(-sc, kind="stable")]
                )
        cursor += n_valid

    report = {"experiment": args.exp, "ckpt": args.ckpt}
    # random-ranking control: the base rate every head is compared against
    ctrl_rng = np.random.default_rng(0)
    any_head = next(iter(per_head_rows.values()))
    per_head_rows["random_ranking"] = [
        ctrl_rng.permutation(rows) for rows in any_head
    ]
    for hname, ordered in per_head_rows.items():
        report[hname] = head_metrics(
            ordered, valid_counts, hist_rows,
            row_pol, imp_user_pol[np.asarray(imp_ids)], row_topic=row_topic,
        )
        print(hname, json.dumps(report[hname]))
    if args.out:
        with open(args.out, "w") as f:
            json.dump(report, f, indent=2)
        print("written to", args.out)


if __name__ == "__main__":
    main()
