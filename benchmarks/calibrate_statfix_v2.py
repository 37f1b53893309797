"""Oracle-AUC calibration for the statfix v2 click model (no TPU needed).

Simulates the exact v2 generative process (newsreclib_tpu/data/statfix.py::
write_mind_small_statfix_v2) at reduced scale and scores the impressions
with oracle predictors that see different signal subsets:

  full        : the true click logits (cat + topic + sentiment)
  text        : cat + sentiment      — what a text-only model (NRMS) can see
  cat         : category preference only
  cat+topic   : no sentiment term    — entity-aware model ignoring sentiment

The (full - text) gap bounds the DKN entity-channel gain; the (text - cat)
gap is the sentiment bias a fairness model can act on.  Pooled tie-corrected
Mann-Whitney AUC, matching metrics/functional.py semantics.
"""

from __future__ import annotations

import numpy as np

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from newsreclib_tpu.data.statfix import (  # noqa: E402
    N_CATEGORIES,
    N_TOPICS,
    V2_P_RANDOM_CLICK,
    V2_P_SENT,
    V2_S_SENT,
    V2_SHARP_CAT,
    V2_SHARP_TOPIC,
    V2_USER_POLARITY,
)


def pooled_auc(scores: np.ndarray, labels: np.ndarray) -> float:
    order = np.argsort(scores, kind="stable")
    ranks = np.empty(len(scores))
    # average ranks for ties
    s_sorted = scores[order]
    r = np.arange(1, len(scores) + 1, dtype=np.float64)
    # group ties
    uniq, inv = np.unique(s_sorted, return_inverse=True)
    sums = np.bincount(inv, weights=r)
    cnts = np.bincount(inv)
    avg = sums / cnts
    ranks[order] = avg[inv]
    n_pos = labels.sum()
    n_neg = len(labels) - n_pos
    return float((ranks[labels == 1].sum() - n_pos * (n_pos + 1) / 2) / (n_pos * n_neg))


def simulate(n_news=20000, n_users=8000, n_imps=40000, seed=0):
    rng = np.random.default_rng(seed)
    news_cat = rng.integers(0, N_CATEGORIES, size=n_news)
    news_topic = rng.integers(0, N_TOPICS, size=n_news)
    news_pol = rng.choice([1, -1, 0], size=n_news, p=V2_P_SENT)
    user_pref = rng.dirichlet(np.full(N_CATEGORIES, 0.15), size=n_users)
    user_topic_pref = rng.dirichlet(np.full(N_TOPICS, 0.2), size=n_users)
    pol_vals, pol_probs = V2_USER_POLARITY
    user_pol = rng.choice(pol_vals, size=n_users, p=pol_probs)

    all_scores = {k: [] for k in ("full", "text", "cat", "cat+topic")}
    all_labels = []
    cand_sizes = np.clip(
        np.round(rng.lognormal(mean=3.4, sigma=0.55, size=n_imps)), 2, 300
    ).astype(np.int64)
    uids = rng.integers(0, n_users, size=n_imps)
    for i in range(n_imps):
        u, ncand = int(uids[i]), int(cand_sizes[i])
        cand = rng.integers(0, n_news, size=ncand)
        term_cat = V2_SHARP_CAT * np.log(user_pref[u][news_cat[cand]] + 1e-4)
        term_topic = V2_SHARP_TOPIC * np.log(user_topic_pref[u][news_topic[cand]] + 1e-4)
        term_sent = V2_S_SENT * user_pol[u] * news_pol[cand]
        logits = term_cat + term_topic + term_sent
        n_pos = min(int(1 + (rng.random() < 0.25) + (rng.random() < 0.08)), ncand - 1) \
            if ncand > 1 else 1
        if rng.random() < V2_P_RANDOM_CLICK:
            pos_idx = rng.choice(ncand, size=n_pos, replace=False)
        else:
            p = np.exp(logits - logits.max())
            p /= p.sum()
            pos_idx = rng.choice(ncand, size=n_pos, replace=False, p=p)
        labels = np.zeros(ncand, dtype=np.int64)
        labels[pos_idx] = 1
        all_labels.append(labels)
        all_scores["full"].append(logits)
        all_scores["text"].append(term_cat + term_sent)
        all_scores["cat"].append(term_cat)
        all_scores["cat+topic"].append(term_cat + term_topic)

    labels = np.concatenate(all_labels)
    print(f"simulated {n_imps} impressions, {labels.sum()} positives, "
          f"pos-rate {labels.mean():.4f}")

    # behavioral sentiment skew: over impressions of POLAR users with >=10
    # candidates, the mean polarity-match of the oracle's top-10 vs the
    # slate base rate.  This is what sent_div/sent_pers react to; pooled AUC
    # barely sees it (category dominates cross-impression ordering).
    for k in ("cat", "text", "full"):
        matches, base = [], []
        for i in range(n_imps):
            u = int(uids[i])
            if user_pol[u] == 0 or len(all_labels[i]) < 10:
                continue
            cand_pol = all_scores["full"][i] - all_scores["cat+topic"][i]
            cand_pol = cand_pol / (V2_S_SENT * user_pol[u])  # recover pol
            top = np.argsort(-all_scores[k][i])[:10]
            matches.append((cand_pol[top] * np.sign(user_pol[u])).mean())
            base.append((cand_pol * np.sign(user_pol[u])).mean())
        print(f"top10 polarity-match[{k:>5}] = {np.mean(matches):+.4f} "
              f"(slate base {np.mean(base):+.4f})")

    out = {}
    for k, v in all_scores.items():
        out[k] = pooled_auc(np.concatenate(v), labels)
        print(f"oracle[{k:>9}] AUC = {out[k]:.4f}")
    print(f"entity-channel headroom (full - text)      = {out['full'] - out['text']:+.4f}")
    print(f"sentiment contribution  (text - cat)       = {out['text'] - out['cat']:+.4f}")
    print(f"topic contribution      (cat+topic - cat)  = {out['cat+topic'] - out['cat']:+.4f}")
    return out


if __name__ == "__main__":
    simulate()
