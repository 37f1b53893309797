"""Serving / cached-evaluation path: per-epoch news-vector cache.

The reference re-encodes every history+candidate article of every impression
at every step — SURVEY.md §3 lists this as its top hot loop.  The training
path here already deduplicates per batch; this module takes the idea to its
limit for inference/eval: encode EVERY article of the corpus exactly once
per parameter version into an ``(N+1, D)`` device table, then score
impressions with pure gathers + user encoding + dot products.  This is the
production-serving structure (news vectors are precomputed; only user state
and scoring run per request).

Requires the model to expose ``encode_news(news, deterministic)`` and
``score_with_vectors(batch, news_vecs, deterministic)`` (NRMS does; models
with user-conditioned news encoders, e.g. NPA, cannot use this path).
"""

from __future__ import annotations

from functools import partial
from typing import Dict, Iterator, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from newsreclib_tpu.data.batch import NewsFeatures, RecBatch
from newsreclib_tpu.data.batching import Impressions, next_bucket
from newsreclib_tpu.data.news_store import NewsStore
from newsreclib_tpu.metrics.collector import RankingMetrics, StreamingEval
from newsreclib_tpu.models.base import mask_scores


def build_news_vector_table(
    model,
    params,
    store: NewsStore,
    batch_size: int = 4096,
    dtype=jnp.float32,
) -> jnp.ndarray:
    """Encode the whole corpus once → (N+1, D) device table (row 0 zero)."""
    n = store.title.shape[0]

    encode = jax.jit(
        lambda p, news: model.apply(
            {"params": p}, news, deterministic=True, method="encode_news"
        )
    )
    chunks = []
    for start in range(0, n, batch_size):
        rows = np.arange(start, min(start + batch_size, n))
        if len(rows) < batch_size:  # pad to keep one compiled shape
            rows = np.concatenate([rows, np.zeros(batch_size - len(rows), np.int64)])
        feats = store.features_for(rows)
        vecs = encode(params, feats)
        chunks.append(np.asarray(vecs[: min(batch_size, n - start)], dtype=np.float32))
    table = np.concatenate(chunks, axis=0)
    table[0] = 0.0
    return jnp.asarray(table, dtype=dtype)


class GlobalEvalBatcher:
    """Eval batches whose hist/cand indices are GLOBAL store rows (no
    per-batch dedup / news table) — for the cached scoring path.  Assembly is
    the shared vectorized bucketed assembler."""

    def __init__(
        self,
        impressions: Impressions,
        max_history_len: int = 50,
        target_cells: int = 16384,
        min_cand_bucket: int = 8,
        max_cand_bucket: int = 512,
    ):
        from newsreclib_tpu.data.batching import _BucketedAssembler

        self._assembler = _BucketedAssembler(
            impressions, max_history_len, target_cells, min_cand_bucket, max_cand_bucket
        )

    def __iter__(self) -> Iterator[RecBatch]:
        return iter(self._assembler)


class CachedScorer:
    """Epoch-level cached evaluation: build the vector table once, then
    stream global-row batches through a jitted gather+score+metrics step."""

    def __init__(self, model, ranking: Optional[RankingMetrics] = None):
        self.model = model
        self.ranking = ranking or RankingMetrics()

        def step(params, batch: RecBatch, news_table, categ_table, sent_table):
            scores = self.model.apply(
                {"params": params}, batch, news_table, deterministic=True,
                method="score_with_vectors",
            )
            scores = mask_scores(scores, batch.cand_mask)
            kwargs = {}
            if categ_table is not None:
                kwargs["cand_categories"] = jnp.take(categ_table, batch.cand_idx, axis=0)
                kwargs["hist_categories"] = jnp.take(categ_table, batch.hist_idx, axis=0)
            if sent_table is not None:
                kwargs["cand_sentiments"] = jnp.take(sent_table, batch.cand_idx, axis=0)
                kwargs["hist_sentiments"] = jnp.take(sent_table, batch.hist_idx, axis=0)
            if kwargs:
                kwargs["hist_mask"] = batch.hist_mask
            per_imp = self.ranking.per_impression(
                scores, batch.labels, batch.cand_mask, **kwargs
            )
            return scores, per_imp

        self._step = jax.jit(step)

    def evaluate(
        self,
        params,
        store: NewsStore,
        impressions: Impressions,
        max_history_len: int = 50,
        target_cells: int = 16384,
        encode_batch: int = 4096,
        collect_auc: bool = True,
    ) -> Dict[str, float]:
        table = build_news_vector_table(self.model, params, store, encode_batch)
        categ = None if store.category is None else jnp.asarray(store.category)
        sent = None if store.sentiment is None else jnp.asarray(store.sentiment)
        stream = StreamingEval(collect_auc=collect_auc)
        return self._run(params, store, impressions, table, categ, sent, stream,
                         max_history_len, target_cells)

    def _run(self, params, store, impressions, table, categ, sent, stream,
             max_history_len, target_cells):
        batcher = GlobalEvalBatcher(impressions, max_history_len, target_cells)
        for batch in batcher:
            scores, per_imp = self._step(params, batch, table, categ, sent)
            stream.update(
                scores, per_imp, jnp.asarray(batch.impression_valid),
                batch.labels if stream.collect_auc else None,
                batch.cand_mask if stream.collect_auc else None,
            )
        return stream.finalize()

    def export_recommendations(
        self,
        params,
        store: NewsStore,
        impressions: Impressions,
        fpath: str,
        max_history_len: int = 50,
        encode_batch: int = 4096,
    ) -> Dict[str, Dict[str, float]]:
        """Per-user candidate scores as JSON: {"U<id>": {"N<id>": score}}.

        Reference analog: ``save_recs`` / ``_get_recommendations`` /
        ``_save_recommendations`` (``abstract_recommender.py:159-193``).
        """
        import json

        table = build_news_vector_table(self.model, params, store, encode_batch)
        score_fn = jax.jit(
            lambda p, b, t: self.model.apply(
                {"params": p}, b, t, deterministic=True, method="score_with_vectors"
            )
        )
        row2nid = {v: k for k, v in store.nid2row.items()}
        recs: Dict[str, Dict[str, float]] = {}
        batcher = GlobalEvalBatcher(impressions, max_history_len)
        # recover which impression each batch row holds: iterate in the same
        # bucket order the assembler uses
        order = [
            i for _, idxs in sorted(batcher._assembler.buckets.items()) for i in idxs
        ]
        cursor = 0
        for batch in batcher:
            scores = np.asarray(score_fn(params, batch, table))
            n_valid = int(np.sum(batch.impression_valid))
            for row in range(n_valid):
                imp_i = order[cursor]
                cursor += 1
                uid = (
                    impressions.user_ids[imp_i]
                    if impressions.user_ids is not None
                    else impressions.user_idx[imp_i]
                )
                user_key = f"U{uid}"
                d = recs.setdefault(user_key, {})
                for c in range(batch.cand_idx.shape[1]):
                    r = int(batch.cand_idx[row, c])
                    if r:
                        d[str(row2nid.get(r, r))] = float(scores[row, c])
        with open(fpath, "w") as f:
            json.dump(recs, f)
        return recs
