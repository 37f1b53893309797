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
from typing import Callable, Dict, Iterator, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from newsreclib_tpu.data.batch import NewsFeatures, RecBatch
from newsreclib_tpu.data.batching import Impressions, next_bucket
from newsreclib_tpu.data.news_store import NewsStore
from newsreclib_tpu.metrics.collector import RankingMetrics, StreamingEval
from newsreclib_tpu.models.base import mask_scores


# ---- lean host→device transfers -------------------------------------------
# The axon-tunneled TPU moves host arrays at ~10MB/s, so serving epochs are
# transfer-bound, not compute-bound (measured: 3.2ms device compute vs 33ms
# wall per 512-impression batch).  "Lean" batches narrow index dtypes to
# uint16 when the id space fits, drop masks (reconstructed on device as
# ``!= 0``), and ship labels as int8 — roughly 3× fewer bytes on the wire.


def lean_news(feats: NewsFeatures) -> NewsFeatures:
    """Narrow a host-side NewsFeatures for transfer (see hydrate_news)."""
    repl = {}
    for f, v in feats._asdict().items():
        if v is None:
            continue
        if f.endswith("_mask"):
            repl[f] = None
        elif v.dtype == np.int32 and v.size and 0 <= v.min() and v.max() < 65536:
            repl[f] = v.astype(np.uint16)
    return feats._replace(**repl)


def hydrate_news(feats: NewsFeatures) -> NewsFeatures:
    """Device-side (traced) inverse of lean_news: widen ints, rebuild masks."""
    d = feats._asdict()
    for f, v in list(d.items()):
        if v is not None and not f.endswith("_mask") and v.dtype == jnp.uint16:
            d[f] = v.astype(jnp.int32)
    for f, v in list(d.items()):
        if f.endswith("_mask") and v is None:
            src = d[f[: -len("_mask")]]
            if src is not None:
                d[f] = src != 0
    return NewsFeatures(**d)


def hydrate_batch(batch: RecBatch) -> RecBatch:
    """Device-side (traced) inverse of the assembler's lean mode."""
    hist_idx = batch.hist_idx.astype(jnp.int32)
    cand_idx = batch.cand_idx.astype(jnp.int32)
    return batch._replace(
        hist_idx=hist_idx,
        cand_idx=cand_idx,
        hist_mask=batch.hist_mask if batch.hist_mask is not None else hist_idx != 0,
        cand_mask=batch.cand_mask if batch.cand_mask is not None else cand_idx != 0,
        labels=None if batch.labels is None else batch.labels.astype(jnp.float32),
    )


# jitted scan-encode per live model instance: a fresh jax.jit per call would
# recompile the encoder EVERY epoch (measured 4.1s of a 5.5s serving epoch).
# Single-entry caches (last model / last corpus wins): an id()-keyed dict
# never evicts and would pin every store + device-resident token array for
# the process lifetime when evaluating multiple corpora or models.
_SCAN_ENCODE_JIT_CACHE: Dict[int, Callable] = {}
_CORPUS_FEATS_CACHE: Dict[tuple, tuple] = {}
_CACHE_MAX_ENTRIES = 2  # val + test stores of the current run


def _cache_put(cache: dict, key, value) -> None:
    while len(cache) >= _CACHE_MAX_ENTRIES:
        cache.pop(next(iter(cache)))
    cache[key] = value


def _scan_encode_fn(model):
    """Encode (n_chunks, chunk, ...) stacked features in ONE dispatch."""
    fn = _SCAN_ENCODE_JIT_CACHE.get(id(model))
    if fn is None:

        @jax.jit
        def scan_encode(params, stacked):
            def body(_, news):
                vecs = model.apply(
                    {"params": params}, hydrate_news(news), deterministic=True,
                    method="encode_news",
                )
                return None, vecs

            _, out = jax.lax.scan(body, None, stacked)
            return out

        fn = scan_encode
        # the closure keeps the model alive, so id() stays valid while cached
        _cache_put(_SCAN_ENCODE_JIT_CACHE, id(model), fn)
    return fn


def build_news_vector_table(
    model,
    params,
    store: NewsStore,
    batch_size: int = 4096,
    dtype=jnp.float32,
    mesh=None,
    split_title_len: Optional[int] = 16,
) -> jnp.ndarray:
    """Encode the whole corpus once → (N+1, D) device table (row 0 zero).

    Chunks stay on device (no host round-trip: the table never leaves HBM —
    a 500k-article f32 table is ~600MB of tunnel traffic if it does), and the
    whole corpus is encoded in ONE dispatch (lax.scan over chunks: per-chunk
    dispatch costs ~30ms RTT each on the tunnel-attached TPU).

    ``split_title_len``: length-bucketed corpus encode — short-title rows
    (the large majority on MIND-like corpora; avg ~11 of the padded 30) are
    encoded in chunks whose title columns are sliced to this width, long
    rows at full width, and the results scattered back into row order.
    Numerically exact for the same reason as
    ``data/batching.py::split_news_by_length`` (hard-zero pad embeddings);
    models declaring ``TITLE_SPLIT_MARGIN`` (DKN/KCNN) get their headroom.

    The corpus token arrays are static across parameter versions, so the
    device copy is cached per (store, batch_size); only the encode re-runs
    when params change."""
    n = store.title.shape[0]
    if mesh is not None:
        # encode chunks shard over the data axis → chunk must divide it
        mult = int(mesh.shape.get("data", 1))
        batch_size = -(-batch_size // mult) * mult
    margin = getattr(model, "TITLE_SPLIT_MARGIN", 0)
    l_full = store.title.shape[1]
    split = (
        split_title_len
        if split_title_len is not None and l_full > split_title_len
        else None
    )
    key = (id(store), batch_size, None if mesh is None else id(mesh), split)
    hit = _CORPUS_FEATS_CACHE.get(key)
    if hit is None:

        def stack_rows(rows, title_width):
            n_chunks = max(1, -(-len(rows) // batch_size))
            padded = np.zeros(n_chunks * batch_size, dtype=np.int64)
            padded[: len(rows)] = rows
            feats = store.features_for(padded)
            if title_width < l_full:
                feats = feats._replace(
                    title=feats.title[:, :title_width],
                    title_mask=feats.title_mask[:, :title_width],
                )
            feats = lean_news(feats)
            return jax.tree.map(
                lambda x: x.reshape(n_chunks, batch_size, *x.shape[1:]), feats
            )

        parts = []  # [(row_ids, stacked_features), ...]
        if split is not None:
            lens = (store.title != 0).sum(axis=1)
            short_rows = np.nonzero(lens <= split - margin)[0]
            long_rows = np.nonzero(lens > split - margin)[0]
            if len(short_rows) >= batch_size and len(short_rows) >= n // 4:
                parts.append((short_rows, stack_rows(short_rows, split)))
                if len(long_rows):
                    parts.append((long_rows, stack_rows(long_rows, l_full)))
        if not parts:
            parts.append((np.arange(n), stack_rows(np.arange(n), l_full)))
        if mesh is not None:
            # data-parallel encode: shard the chunk dim over the data axis
            from jax.sharding import NamedSharding, PartitionSpec as P

            sh = NamedSharding(mesh, P(None, "data"))
            parts = [
                (r, jax.tree.map(lambda x: jax.device_put(x, sh), st))
                for r, st in parts
            ]
        else:
            parts = [(r, jax.device_put(st)) for r, st in parts]
        # the store reference pins id(store) while cached
        hit = (store, parts)
        _cache_put(_CORPUS_FEATS_CACHE, key, hit)
    encode = _scan_encode_fn(model)
    if len(hit[1]) == 1:
        out = encode(params, hit[1][0][1])  # (n_chunks, chunk, D)
        table = out.reshape(-1, out.shape[-1])[:n].astype(dtype)
    else:
        outs = []
        for rows, st in hit[1]:
            out = encode(params, st)  # (n_chunks, chunk, D)
            outs.append((rows, out.reshape(-1, out.shape[-1])[: len(rows)]))
        d = outs[0][1].shape[-1]
        table = jnp.zeros((n, d), dtype)
        for rows, vecs in outs:
            table = table.at[jnp.asarray(rows)].set(vecs.astype(dtype))
    table = table.at[0].set(0.0)
    if mesh is not None:
        # re-replicate (one all-gather): downstream scoring gathers arbitrary
        # rows from every data shard
        from jax.sharding import NamedSharding, PartitionSpec as P

        table = jax.device_put(table, NamedSharding(mesh, P()))
    return table


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
        lean: bool = False,
        batch_multiple: int = 1,
    ):
        from newsreclib_tpu.data.batching import _BucketedAssembler

        self._assembler = _BucketedAssembler(
            impressions, max_history_len, target_cells, min_cand_bucket,
            max_cand_bucket, lean=lean, batch_multiple=batch_multiple,
        )

    def __iter__(self) -> Iterator[RecBatch]:
        return iter(self._assembler)


class CachedScorer:
    """Epoch-level cached evaluation: build the vector table once, then
    stream global-row batches through a jitted gather+score+metrics step."""

    def __init__(
        self,
        model,
        ranking: Optional[RankingMetrics] = None,
        loss_fn: Optional[Callable] = None,
        mesh=None,
        compute_dtype: Optional[str] = None,
        split_title_len: Optional[int] = 16,
    ):
        self.model = model
        self.ranking = ranking or RankingMetrics()
        self.loss_fn = loss_fn
        self.mesh = mesh
        self.split_title_len = split_title_len
        # bf16 serving: params + news-vector table in bf16, metrics f32
        self.compute_dtype = jnp.dtype(compute_dtype) if compute_dtype else None
        self._group_cache: Dict[tuple, tuple] = {}

        def step_body(params, batch: RecBatch, news_table, categ_table, sent_table):
            batch = hydrate_batch(batch)  # lean wire format → full batch
            scores = self.model.apply(
                {"params": params}, batch, news_table, deterministic=True,
                method="score_with_vectors",
            )
            scores = mask_scores(scores.astype(jnp.float32), batch.cand_mask)
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
            return scores, per_imp, batch

        self._step = jax.jit(
            lambda p, b, nt, ct, st: step_body(p, b, nt, ct, st)[:2]
        )

        # one dispatch per shape-group: scan over stacked batches with the
        # metric sums in the carry.  Dispatching batch-by-batch costs ~30ms
        # per call on the tunnel-attached TPU (measured) even with
        # device-resident args — 32 batches made a 0.1s epoch take 1s.
        @partial(jax.jit, static_argnames=("collect_auc",))
        def scan_epoch(params, stacked, news_table, categ_table, sent_table,
                       sums, count, loss_acc, collect_auc=False):
            def body(carry, batch):
                sums, count, loss_acc = carry
                scores, per_imp, b = step_body(
                    params, batch, news_table, categ_table, sent_table
                )
                v = b.impression_valid.astype(jnp.float32)
                new_sums = {k: sums[k] + jnp.sum(per_imp[k] * v) for k in sums}
                if self.loss_fn is not None:
                    # impression-weighted (batch-partitioning-invariant):
                    # loss_fn returns a mean over valid impressions
                    batch_loss = self.loss_fn(
                        scores, b.labels, b.cand_mask, b.impression_valid
                    )
                    nv = jnp.sum(v)
                    loss_acc = (loss_acc[0] + batch_loss * nv, loss_acc[1] + nv)
                ys = None
                if collect_auc:
                    w = (b.cand_mask & b.impression_valid[:, None]).astype(jnp.float32)
                    ys = (scores.ravel(), (b.labels * w).ravel(), w.ravel())
                return (new_sums, count + jnp.sum(v), loss_acc), ys

            (sums, count, loss_acc), ys = jax.lax.scan(
                body, (sums, count, loss_acc), stacked
            )
            return sums, count, loss_acc, ys

        self._scan_epoch = scan_epoch

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
        if self.compute_dtype is not None:
            params = jax.tree.map(
                lambda x: x.astype(self.compute_dtype)
                if jnp.issubdtype(x.dtype, jnp.floating) else x,
                params,
            )
        table = build_news_vector_table(
            self.model, params, store, encode_batch, mesh=self.mesh,
            dtype=self.compute_dtype or jnp.float32,
            split_title_len=self.split_title_len,
        )
        categ = None if store.category is None else jnp.asarray(store.category)
        sent = None if store.sentiment is None else jnp.asarray(store.sentiment)
        if self.mesh is not None:
            from jax.sharding import NamedSharding, PartitionSpec as P

            repl = NamedSharding(self.mesh, P())
            categ = None if categ is None else jax.device_put(categ, repl)
            sent = None if sent is None else jax.device_put(sent, repl)
        return self._run(params, impressions, table, categ, sent,
                         max_history_len, target_cells, collect_auc)

    def _run(self, params, impressions, table, categ, sent,
             max_history_len, target_cells, collect_auc):
        import newsreclib_tpu.metrics.functional as F

        # impression index arrays are static across parameter versions
        # (training-loop eval re-runs the same val/test set every epoch):
        # cache the stacked device-resident groups
        mult = 1 if self.mesh is None else int(self.mesh.shape.get("data", 1))
        ckey = (id(impressions), max_history_len, target_cells, mult)
        hit = self._group_cache.get(ckey)
        if hit is None:
            groups: Dict[tuple, list] = {}
            batcher = GlobalEvalBatcher(
                impressions, max_history_len, target_cells, lean=True,
                batch_multiple=mult,
            )
            for b in batcher:
                groups.setdefault((b.hist_idx.shape, b.cand_idx.shape), []).append(b)
            if self.mesh is None:
                place = jax.device_put
            else:
                # data-parallel scoring: shard the batch (axis 1 of the
                # stacked (n_batches, B, ...) arrays) over the data axis
                from jax.sharding import NamedSharding, PartitionSpec as P

                sh = NamedSharding(self.mesh, P(None, "data"))
                place = lambda t: jax.tree.map(lambda x: jax.device_put(x, sh), t)
            stacked_groups = [
                place(jax.tree.map(lambda *xs: np.stack(xs), *groups[key]))
                for key in sorted(groups)
            ]
            # the impressions reference pins id(impressions) while cached
            hit = (impressions, stacked_groups)
            _cache_put(self._group_cache, ckey, hit)

        names = self.ranking.metric_names(categ is not None, sent is not None)
        sums = {n: jnp.zeros((), jnp.float32) for n in names}
        count = jnp.zeros((), jnp.float32)
        loss_acc = (jnp.zeros((), jnp.float32), jnp.zeros((), jnp.float32))
        parts = []
        for stacked in hit[1]:
            sums, count, loss_acc, ys = self._scan_epoch(
                params, stacked, table, categ, sent, sums, count, loss_acc,
                collect_auc=collect_auc,
            )
            if ys is not None:
                parts.append(ys)
        # single host fetch: per-scalar float() costs one ~30ms RTT each on
        # the tunnel-attached TPU
        fetch = [count] + [sums[k] for k in names] + list(loss_acc)
        if parts:
            fetch.append(F.binary_auc_weighted(
                jnp.concatenate([p[0].ravel() for p in parts]),
                jnp.concatenate([p[1].ravel() for p in parts]),
                jnp.concatenate([p[2].ravel() for p in parts]),
            ))
        vals = np.asarray(jnp.stack(fetch))
        n = max(float(vals[0]), 1.0)
        out = {k: float(vals[1 + i]) / n for i, k in enumerate(names)}
        if self.loss_fn is not None and float(vals[2 + len(names)]) > 0:
            out["loss"] = float(vals[1 + len(names)]) / float(vals[2 + len(names)])
        if parts:
            out["auc"] = float(vals[-1])
        return out

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

        Honors the scorer's ``mesh`` (data-sharded scoring) and
        ``compute_dtype`` (bf16 serving) like ``evaluate``.

        Reference analog: ``save_recs`` / ``_get_recommendations`` /
        ``_save_recommendations`` (``abstract_recommender.py:159-193``).
        """
        import json

        if self.compute_dtype is not None:
            params = jax.tree.map(
                lambda x: x.astype(self.compute_dtype)
                if jnp.issubdtype(x.dtype, jnp.floating) else x,
                params,
            )
        table = build_news_vector_table(
            self.model, params, store, encode_batch, mesh=self.mesh,
            dtype=self.compute_dtype or jnp.float32,
            split_title_len=self.split_title_len,
        )
        score_fn = jax.jit(
            lambda p, b, t: self.model.apply(
                {"params": p}, b, t, deterministic=True, method="score_with_vectors"
            ).astype(jnp.float32)
        )
        mult = 1 if self.mesh is None else int(self.mesh.shape.get("data", 1))
        batch_sharding = None
        if self.mesh is not None:
            from jax.sharding import NamedSharding, PartitionSpec as P

            batch_sharding = NamedSharding(self.mesh, P("data"))
        # vectorized assembly: one numpy pass over all (impression, candidate)
        # pairs instead of a per-row/per-candidate Python loop (quadratic pain
        # at MINDlarge scale)
        row2nid = {v: k for k, v in store.nid2row.items()}
        recs: Dict[str, Dict[str, float]] = {}
        batcher = GlobalEvalBatcher(impressions, max_history_len, batch_multiple=mult)
        # recover which impression each batch row holds: iterate in the same
        # bucket order the assembler uses
        order = np.asarray(
            [i for _, idxs in sorted(batcher._assembler.buckets.items()) for i in idxs]
        )
        all_rows, all_scores, all_imp = [], [], []
        cursor = 0
        for batch in batcher:
            if batch_sharding is not None:
                batch = jax.tree.map(
                    lambda x: jax.device_put(x, batch_sharding), batch
                )
            scores = np.asarray(score_fn(params, batch, table))
            n_valid = int(np.sum(batch.impression_valid))
            cand = np.asarray(batch.cand_idx[:n_valid])
            valid = cand != 0  # (n_valid, C)
            imp_ids = np.repeat(order[cursor : cursor + n_valid], valid.sum(axis=1))
            all_rows.append(cand[valid])
            all_scores.append(scores[:n_valid][valid])
            all_imp.append(imp_ids)
            cursor += n_valid
        rows = np.concatenate(all_rows) if all_rows else np.zeros(0, np.int32)
        svals = np.concatenate(all_scores) if all_scores else np.zeros(0)
        imps = np.concatenate(all_imp) if all_imp else np.zeros(0, np.int64)
        uids = (
            impressions.user_ids[imps]
            if impressions.user_ids is not None
            else impressions.user_idx[imps]
        )
        for uid, r, s in zip(uids.tolist(), rows.tolist(), svals.tolist()):
            recs.setdefault(f"U{uid}", {})[str(row2nid.get(r, r))] = float(s)
        with open(fpath, "w") as f:
            json.dump(recs, f)
        return recs
