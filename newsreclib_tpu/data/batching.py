"""TPU-friendly batching: static shapes, bucketing, per-batch news dedup.

Replaces the reference's ragged PyG-style collate
(``rec_dataset.py:124-293`` + ``to_dense_batch``) with:

  * **Training**: one sample per positive (1 positive + K sampled negatives,
    ``neg_sampling_ratio`` K as in ``rec_dataset.py:60-95``; the reference
    instead emits one variable-length slate with ALL positives — exploding
    per positive keeps C = K+1 static and weights multi-positive impressions
    identically under CE).  Histories are truncated to the FIRST
    ``max_history_len`` clicks, matching ``rec_dataset.py:46``.
  * **Eval**: impressions bucketed by candidate count into powers of two
    with masks; partial batches padded with invalid rows.
  * **Dedup**: each batch carries a unique-news table (row 0 = padding) and
    index matrices into it, so encoders run once per unique article.  The
    unique-table size is rounded up to a bucket (power of two) to bound XLA
    recompiles.

Impression lists are stored CSR-style (flat array + offsets) — no pandas in
the hot path.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Iterator, List, Optional, Sequence, Tuple

import numpy as np

from newsreclib_tpu.data.batch import RecBatch
from newsreclib_tpu.data.news_store import NewsStore


def next_bucket(n: int, minimum: int = 128) -> int:
    b = minimum
    while b < n:
        b *= 2
    return b


@dataclass
class Impressions:
    """CSR impression storage (news referenced by store row id)."""

    hist_flat: np.ndarray  # int32
    hist_offsets: np.ndarray  # (N+1,) int64
    cand_flat: np.ndarray  # int32
    cand_offsets: np.ndarray  # (N+1,)
    labels_flat: np.ndarray  # int8
    user_idx: np.ndarray  # (N,) int32
    user_ids: Optional[np.ndarray] = None  # raw uid strings/ints for exports

    def __len__(self) -> int:
        return len(self.user_idx)

    def hist(self, i: int) -> np.ndarray:
        return self.hist_flat[self.hist_offsets[i] : self.hist_offsets[i + 1]]

    def cands(self, i: int) -> Tuple[np.ndarray, np.ndarray]:
        s, e = self.cand_offsets[i], self.cand_offsets[i + 1]
        return self.cand_flat[s:e], self.labels_flat[s:e]

    @classmethod
    def from_lists(
        cls,
        histories: Sequence[Sequence[int]],
        candidates: Sequence[Sequence[int]],
        labels: Sequence[Sequence[int]],
        user_idx: Sequence[int],
        user_ids=None,
    ) -> "Impressions":
        def csr(lists, dtype):
            offsets = np.zeros(len(lists) + 1, dtype=np.int64)
            np.cumsum([len(x) for x in lists], out=offsets[1:])
            flat = np.concatenate([np.asarray(x, dtype=dtype) for x in lists]) if len(lists) else np.zeros(0, dtype=dtype)
            return flat.astype(dtype), offsets

        hist_flat, hist_off = csr(histories, np.int32)
        cand_flat, cand_off = csr(candidates, np.int32)
        labels_flat, _ = csr(labels, np.int8)
        return cls(
            hist_flat, hist_off, cand_flat, cand_off, labels_flat,
            np.asarray(user_idx, dtype=np.int32),
            None if user_ids is None else np.asarray(user_ids),
        )


def _dedup(
    store: NewsStore,
    hist_idx: np.ndarray,  # (B, H) store rows
    cand_idx: np.ndarray,  # (B, C) store rows
    u_bucket_min: int = 128,
) -> Tuple:
    """Map store-row indices to a per-batch unique table (row 0 = pad)."""
    all_rows = np.concatenate([hist_idx.ravel(), cand_idx.ravel()])
    unique = np.unique(all_rows)
    if unique.size == 0 or unique[0] != 0:
        unique = np.concatenate([[0], unique])
    u = next_bucket(len(unique), u_bucket_min)
    padded_unique = np.zeros(u, dtype=np.int32)
    padded_unique[: len(unique)] = unique
    hist_local = np.searchsorted(unique, hist_idx).astype(np.int32)
    cand_local = np.searchsorted(unique, cand_idx).astype(np.int32)
    news = store.features_for(padded_unique)
    return news, hist_local, cand_local


class TrainBatcher:
    """Per-epoch shuffled K+1-slate training batches."""

    def __init__(
        self,
        store: NewsStore,
        impressions: Impressions,
        batch_size: int = 64,
        max_history_len: int = 50,
        neg_sampling_ratio: int = 4,
        seed: int = 0,
        u_bucket_min: int = 512,
        drop_last: bool = True,
    ):
        self.store = store
        self.imp = impressions
        self.batch_size = batch_size
        self.max_history_len = max_history_len
        self.k = int(neg_sampling_ratio)
        self.seed = seed
        self.u_bucket_min = u_bucket_min
        self.drop_last = drop_last
        # explode: one training sample per positive
        pos_imp: List[int] = []
        pos_cand: List[int] = []
        for i in range(len(impressions)):
            s, e = impressions.cand_offsets[i], impressions.cand_offsets[i + 1]
            for j in np.nonzero(impressions.labels_flat[s:e])[0]:
                pos_imp.append(i)
                pos_cand.append(int(impressions.cand_flat[s + j]))
        self.sample_imp = np.asarray(pos_imp, dtype=np.int64)
        self.sample_pos = np.asarray(pos_cand, dtype=np.int32)

    def __len__(self) -> int:
        n = len(self.sample_imp)
        return n // self.batch_size if self.drop_last else -(-n // self.batch_size)

    def num_samples(self) -> int:
        return len(self.sample_imp)

    def epoch(self, epoch_idx: int = 0) -> Iterator[RecBatch]:
        rng = np.random.default_rng((self.seed, epoch_idx))
        order = rng.permutation(len(self.sample_imp))
        b, h, c = self.batch_size, self.max_history_len, self.k + 1
        n_batches = len(self)
        for bi in range(n_batches):
            sel = order[bi * b : (bi + 1) * b]
            if len(sel) < b and self.drop_last:
                break
            hist_idx = np.zeros((b, h), dtype=np.int32)
            cand_idx = np.zeros((b, c), dtype=np.int32)
            labels = np.zeros((b, c), dtype=np.float32)
            user_idx = np.zeros(b, dtype=np.int32)
            valid = np.zeros(b, dtype=bool)
            for row, s in enumerate(sel):
                i = self.sample_imp[s]
                hist = self.imp.hist(i)[:h]
                hist_idx[row, : len(hist)] = hist
                cands, labs = self.imp.cands(i)
                negs = cands[labs == 0]
                if len(negs) >= self.k:
                    neg_sample = rng.choice(negs, self.k, replace=False)
                else:
                    neg_sample = (
                        rng.choice(negs, self.k, replace=True)
                        if len(negs)
                        else np.zeros(self.k, dtype=np.int32)
                    )
                slate = np.concatenate([[self.sample_pos[s]], neg_sample])
                lab = np.zeros(c, dtype=np.float32)
                lab[0] = 1.0
                perm = rng.permutation(c)
                cand_idx[row] = slate[perm]
                labels[row] = lab[perm]
                user_idx[row] = self.imp.user_idx[i]
                valid[row] = True
            news, hist_local, cand_local = _dedup(
                self.store, hist_idx, cand_idx, self.u_bucket_min
            )
            yield RecBatch(
                news=news,
                hist_idx=hist_local,
                hist_mask=hist_idx != 0,
                cand_idx=cand_local,
                cand_mask=cand_idx != 0,
                labels=labels,
                user_idx=user_idx,
                impression_valid=valid,
            )


class EvalBatcher:
    """Full-impression eval batches, bucketed by candidate count."""

    def __init__(
        self,
        store: NewsStore,
        impressions: Impressions,
        max_history_len: int = 50,
        target_cells: int = 8192,
        min_cand_bucket: int = 8,
        max_cand_bucket: int = 512,
        u_bucket_min: int = 512,
    ):
        self.store = store
        self.imp = impressions
        self.max_history_len = max_history_len
        self.target_cells = target_cells
        self.u_bucket_min = u_bucket_min
        sizes = np.diff(impressions.cand_offsets)
        self.buckets: dict = {}
        for i, size in enumerate(sizes):
            cb = next_bucket(int(size), min_cand_bucket)
            cb = min(cb, max_cand_bucket)
            self.buckets.setdefault(cb, []).append(i)

    def __iter__(self) -> Iterator[RecBatch]:
        h = self.max_history_len
        for c, idxs in sorted(self.buckets.items()):
            b = max(1, self.target_cells // c)
            for start in range(0, len(idxs), b):
                chunk = idxs[start : start + b]
                hist_idx = np.zeros((b, h), dtype=np.int32)
                cand_idx = np.zeros((b, c), dtype=np.int32)
                labels = np.zeros((b, c), dtype=np.float32)
                user_idx = np.zeros(b, dtype=np.int32)
                valid = np.zeros(b, dtype=bool)
                for row, i in enumerate(chunk):
                    hist = self.imp.hist(i)[:h]
                    hist_idx[row, : len(hist)] = hist
                    cands, labs = self.imp.cands(i)
                    cands, labs = cands[:c], labs[:c]
                    cand_idx[row, : len(cands)] = cands
                    labels[row, : len(labs)] = labs
                    user_idx[row] = self.imp.user_idx[i]
                    valid[row] = True
                news, hist_local, cand_local = _dedup(
                    self.store, hist_idx, cand_idx, self.u_bucket_min
                )
                cand_mask = cand_idx != 0
                yield RecBatch(
                    news=news,
                    hist_idx=hist_local,
                    hist_mask=hist_idx != 0,
                    cand_idx=cand_local,
                    cand_mask=cand_mask,
                    labels=labels,
                    user_idx=user_idx,
                    impression_valid=valid,
                )

    def num_impressions(self) -> int:
        return len(self.imp)
