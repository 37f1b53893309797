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
        batcher = GlobalEvalBatcher(impressions, max_history_len, target_cells)
        for batch in batcher:
            scores, per_imp = self._step(params, batch, table, categ, sent)
            stream.update(
                scores, per_imp, jnp.asarray(batch.impression_valid),
                batch.labels if collect_auc else None,
                batch.cand_mask if collect_auc else None,
            )
        return stream.finalize()
