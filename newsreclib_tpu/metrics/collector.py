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


class EvalCollector:
    """Accumulates per-impression metric sums + pooled AUC inputs."""

    def __init__(self):
        self._sums: Dict[str, float] = {}
        self._count: float = 0.0
        self._preds: List[np.ndarray] = []
        self._targets: List[np.ndarray] = []
        self._loss_sum: float = 0.0
        self._loss_count: float = 0.0

    def update(
        self,
        per_impression: Dict[str, jnp.ndarray],
        valid: jnp.ndarray,  # (B,) bool — real (non-padding) impressions
        scores: Optional[np.ndarray] = None,  # (B, C)
        labels: Optional[np.ndarray] = None,
        cand_mask: Optional[np.ndarray] = None,
        loss: Optional[float] = None,
    ) -> None:
        v = np.asarray(valid).astype(np.float32)
        self._count += float(v.sum())
        for name, vals in per_impression.items():
            self._sums[name] = self._sums.get(name, 0.0) + float(
                np.sum(np.asarray(vals, dtype=np.float32) * v)
            )
        if scores is not None:
            m = np.asarray(cand_mask).astype(bool) & np.asarray(v, dtype=bool)[:, None]
            self._preds.append(np.asarray(scores, dtype=np.float32)[m])
            self._targets.append(np.asarray(labels, dtype=np.int8)[m])
        if loss is not None:
            self._loss_sum += float(loss)
            self._loss_count += 1.0

    def compute(self) -> Dict[str, float]:
        out = {
            name: (s / self._count if self._count else 0.0)
            for name, s in self._sums.items()
        }
        if self._preds:
            preds = np.concatenate(self._preds)
            targets = np.concatenate(self._targets)
            out["auc"] = float(F.binary_auc(jnp.asarray(preds), jnp.asarray(targets)))
        if self._loss_count:
            out["loss"] = self._loss_sum / self._loss_count
        return out

    def reset(self) -> None:
        self.__init__()
