"""Streaming eval-metric accumulation.

The reference holds every prediction/target/aspect of the epoch in Python
lists and concatenates at epoch end (``nrms_module.py:474-535``,
"memory hot spot" in SURVEY.md §3.3).  Here, per-impression metrics (MRR,
nDCG@k, diversity@k, personalization@k) are computed **inside the jitted eval
step** on dense masked buckets and reduced to running (sum, count) pairs, so
device→host traffic per batch is a handful of scalars.  Only the pooled
(pred, target) pairs needed for the reference's global binary AUROC are
spilled to host memory as compact float32/int8 numpy arrays.
"""

from __future__ import annotations

from typing import Dict, List, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from newsreclib_tpu.metrics import functional as F


class RankingMetrics:
    """Computes the reference metric suite on a dense masked batch.

    Metric names mirror the reference exactly: ``auc`` (pooled, computed by
    the collector), ``mrr``, ``ndcg@k``, ``categ_div@k``, ``sent_div@k``,
    ``categ_pers@k``, ``sent_pers@k`` (``nrms_module.py:182-228``).
    """

    def __init__(
        self,
        top_k_list: Sequence[int] = (5, 10),
        num_categ_classes: int = 19,
        num_sent_classes: int = 4,
    ):
        self.top_k_list = tuple(top_k_list)
        self.num_categ_classes = num_categ_classes
        self.num_sent_classes = num_sent_classes

    def metric_names(self, with_categ: bool = True, with_sent: bool = True,
                     with_hist: bool = True) -> list:
        """Static key list matching ``per_impression``'s output dict — needed
        to build a ``lax.scan`` carry before tracing (serving.py)."""
        names = ["mrr"] + [f"ndcg@{k}" for k in self.top_k_list]
        if with_categ:
            names += [f"categ_div@{k}" for k in self.top_k_list]
        if with_sent:
            names += [f"sent_div@{k}" for k in self.top_k_list]
        if with_categ and with_hist:
            names += [f"categ_pers@{k}" for k in self.top_k_list]
        if with_sent and with_hist:
            names += [f"sent_pers@{k}" for k in self.top_k_list]
        return names

    def per_impression(
        self,
        scores: jnp.ndarray,  # (B, C)
        labels: jnp.ndarray,  # (B, C)
        cand_mask: jnp.ndarray,  # (B, C) bool
        cand_categories: Optional[jnp.ndarray] = None,  # (B, C) int32
        cand_sentiments: Optional[jnp.ndarray] = None,  # (B, C) int32
        hist_categories: Optional[jnp.ndarray] = None,  # (B, H) int32
        hist_sentiments: Optional[jnp.ndarray] = None,  # (B, H) int32
        hist_mask: Optional[jnp.ndarray] = None,  # (B, H) bool
    ) -> Dict[str, jnp.ndarray]:
        """Returns {name: (B,) float32} per-impression metric values.

        Jit-safe; call inside the eval step. The caller masks out invalid
        (padding) impressions via the accompanying validity vector.
        """
        out: Dict[str, jnp.ndarray] = {"mrr": F.mrr(scores, labels, cand_mask)}
        for k in self.top_k_list:
            out[f"ndcg@{k}"] = F.ndcg_at_k(scores, labels, cand_mask, k)
        if cand_categories is not None:
            for k in self.top_k_list:
                out[f"categ_div@{k}"] = F.diversity_at_k(
                    scores, cand_categories, cand_mask, k, self.num_categ_classes
                )
        if cand_sentiments is not None:
            for k in self.top_k_list:
                out[f"sent_div@{k}"] = F.diversity_at_k(
                    scores, cand_sentiments, cand_mask, k, self.num_sent_classes
                )
        if cand_categories is not None and hist_categories is not None:
            for k in self.top_k_list:
                out[f"categ_pers@{k}"] = F.personalization_at_k(
                    scores, cand_categories, cand_mask,
                    hist_categories, hist_mask, k, self.num_categ_classes,
                )
        if cand_sentiments is not None and hist_sentiments is not None:
            for k in self.top_k_list:
                out[f"sent_pers@{k}"] = F.personalization_at_k(
                    scores, cand_sentiments, cand_mask,
                    hist_sentiments, hist_mask, k, self.num_sent_classes,
                )
        return out


class StreamingEval:
    """Device-side streaming evaluation: accumulate metric sums and pooled
    AUC inputs on device, fetch scalars ONCE at epoch end.

    On the axon-tunneled TPU every host fetch costs a ~30ms round trip;
    fetching a dozen arrays per batch made eval epochs latency-bound.  This
    wrapper keeps the whole epoch async: per batch it dispatches the jitted
    eval step plus one tiny accumulation step, holding AUC inputs as device
    arrays, and synchronizes only in ``finalize``.
    """

    def __init__(self, collect_auc: bool = True):
        self.collect_auc = collect_auc
        self._sums = None
        self._count = None
        self._loss_sum = None
        self._loss_w = None
        self._loss_n = 0
        self._parts: List = []

        @jax.jit
        def _accum(sums, count, per_imp, valid):
            v = valid.astype(jnp.float32)
            new_sums = {k: sums[k] + jnp.sum(per_imp[k] * v) for k in per_imp}
            return new_sums, count + jnp.sum(v)

        self._accum_fn = _accum

        @jax.jit
        def _flat(scores, labels, cand_mask, valid):
            w = (cand_mask & valid[:, None]).astype(jnp.float32)
            return scores.ravel(), (labels * w).ravel(), w.ravel()

        self._flat_fn = _flat

    def update(self, scores, per_imp, valid, labels=None, cand_mask=None, loss=None):
        if self._sums is None:
            self._sums = {k: jnp.zeros((), jnp.float32) for k in per_imp}
            self._count = jnp.zeros((), jnp.float32)
        self._sums, self._count = self._accum_fn(self._sums, self._count, per_imp, valid)
        if self.collect_auc and labels is not None:
            self._parts.append(
                self._flat_fn(scores, jnp.asarray(labels), jnp.asarray(cand_mask), valid)
            )
        if loss is not None:
            # impression-weighted so the epoch loss is invariant to how the
            # impressions were partitioned into buckets/batches (matches the
            # cached serving path's accumulation)
            nv = jnp.sum(valid.astype(jnp.float32))
            contrib = loss * nv
            if self._loss_sum is None:
                self._loss_sum, self._loss_w = contrib, nv
            else:
                self._loss_sum = self._loss_sum + contrib
                self._loss_w = self._loss_w + nv
            self._loss_n += 1

    def finalize(self) -> Dict[str, float]:
        if self._sums is None:
            return {}
        # stack → ONE host fetch (per-scalar float() is one tunnel RTT each)
        keys = sorted(self._sums)
        fetch = [self._count] + [self._sums[k] for k in keys]
        if self._parts:
            preds = jnp.concatenate([p[0] for p in self._parts])
            targets = jnp.concatenate([p[1] for p in self._parts])
            weights = jnp.concatenate([p[2] for p in self._parts])
            fetch.append(F.binary_auc_weighted(preds, targets, weights))
        if self._loss_n:
            fetch.append(self._loss_sum)
            fetch.append(self._loss_w)
        vals = np.asarray(jnp.stack([jnp.asarray(x, jnp.float32) for x in fetch]))
        count = max(float(vals[0]), 1.0)
        out = {k: float(vals[1 + i]) / count for i, k in enumerate(keys)}
        cursor = 1 + len(keys)
        if self._parts:
            out["auc"] = float(vals[cursor])
            cursor += 1
        if self._loss_n:
            out["loss"] = float(vals[cursor]) / max(float(vals[cursor + 1]), 1.0)
        return out


# (the host-side EvalCollector duplicate was removed in round 3 — the
# device-side StreamingEval above is the single accumulation path)
