"""Length-bucketed unique-news tables (round-3 train-step optimization).

The per-batch unique table is sorted by title length and split into a short
segment (titles sliced to the split width) plus a full-width tail
(``data/batching.py::split_news_by_length``); models encode both segments
with shared parameters (``models/base.py::encode_all_news``).  Because
padding-token embeddings are hard zeros, every model's forward must be
numerically identical on split and unsplit views of the same batch.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from newsreclib_tpu.data.batch import RecBatch, batch_sizes
from newsreclib_tpu.data.batching import (
    EvalBatcher,
    Impressions,
    TrainBatcher,
    split_news_by_length,
)
from newsreclib_tpu.data.news_store import build_news_store
from newsreclib_tpu.data.synthetic import SyntheticConfig, make_batch
from newsreclib_tpu.training.state import create_train_state, make_optimizer
from newsreclib_tpu.training.steps import make_eval_step

from tests.test_model_zoo import CFG, MODELS


def split_batch(batch: RecBatch, split_len: int, margin: int = 0) -> RecBatch:
    news, news2, hist, cand = split_news_by_length(
        batch.news, batch.hist_idx, batch.cand_idx, split_len, min_tail=8,
        margin=margin,
    )
    return batch._replace(news=news, news2=news2, hist_idx=hist, cand_idx=cand)


def _gathered_tokens(batch: RecBatch):
    """Title tokens per hist/cand slot, padded to a common width."""
    titles = np.asarray(batch.news.title)
    if batch.news2 is not None:
        l_full = batch.news2.title.shape[1]
        titles = np.concatenate(
            [
                np.pad(titles, ((0, 0), (0, l_full - titles.shape[1]))),
                np.asarray(batch.news2.title),
            ],
            axis=0,
        )
    return titles[np.asarray(batch.hist_idx)], titles[np.asarray(batch.cand_idx)]


def test_split_preserves_gathered_features():
    rng = np.random.default_rng(0)
    batch = make_batch(rng, batch_size=16, hist_len=10, num_candidates=5,
                       unique_news=64, cfg=CFG)
    sp = split_batch(batch, 8)
    assert sp.news.title.shape[1] == 8
    # tail exists (uniform lens 3..12 -> some rows are long) and is bucketed
    assert sp.news2 is not None and sp.news2.title.shape[1] == CFG.title_len
    assert batch_sizes(sp)[3] == batch_sizes(batch)[3]
    ref_h, ref_c = _gathered_tokens(batch)
    sp_h, sp_c = _gathered_tokens(sp)
    w = ref_h.shape[-1]
    np.testing.assert_array_equal(ref_h, sp_h[..., :w])
    np.testing.assert_array_equal(ref_c, sp_c[..., :w])
    # all other per-row features survive the permutation
    for name in ("category", "sentiment", "sentiment_score"):
        ref = np.asarray(getattr(batch.news, name))
        got = np.concatenate(
            [np.asarray(getattr(sp.news, name)), np.asarray(getattr(sp.news2, name))]
        )
        np.testing.assert_array_equal(
            ref[np.asarray(batch.hist_idx)], got[np.asarray(sp.hist_idx)]
        )
    # short segment really is all-short; row 0 is still the pad article
    assert np.all(np.asarray(sp.news.title_mask).sum(1) <= 8)
    assert not np.asarray(sp.news.title_mask)[0].any()


def test_split_all_short_slices_single_table():
    rng = np.random.default_rng(1)
    batch = make_batch(rng, batch_size=8, hist_len=6, num_candidates=5,
                       unique_news=32, cfg=CFG)
    sp = split_batch(batch, CFG.title_len)  # L_full <= split -> no-op
    assert sp.news2 is None and sp.news.title.shape[1] == CFG.title_len
    # force all-short: lens in make_batch are 3..12; split at 12 is no-op,
    # so shrink the titles to <=6 tokens and split at 8
    title = np.asarray(batch.news.title).copy()
    title[:, 6:] = 0
    batch = batch._replace(news=batch.news._replace(title=title, title_mask=title != 0))
    sp = split_batch(batch, 8)
    assert sp.news2 is None
    assert sp.news.title.shape[1] == 8


@pytest.mark.parametrize("name", sorted(MODELS))
def test_forward_parity_split_vs_unsplit(name):
    import dataclasses

    rng = np.random.default_rng(7)
    cfg16 = dataclasses.replace(CFG, title_len=16)
    batch = make_batch(rng, batch_size=6, hist_len=8, num_candidates=5,
                       unique_news=64, cfg=cfg16)
    # skew lengths short (80% <= 8 tokens) so both margin-0 and margin-4
    # splits produce a genuine short/long partition
    title = np.zeros((64, 16), dtype=np.int32)
    for i in range(1, 64):
        n = int(rng.integers(3, 9)) if rng.random() < 0.8 else int(rng.integers(9, 17))
        title[i, :n] = rng.integers(2, CFG.vocab_size // 2, size=n)
    batch = batch._replace(news=batch.news._replace(title=title, title_mask=title != 0))
    model = MODELS[name]()
    margin = getattr(model, "TITLE_SPLIT_MARGIN", 0)
    state = create_train_state(model, batch, jax.random.key(0), make_optimizer())
    ref_scores, ref_aux = model.apply({"params": state.params}, batch, deterministic=True)
    sp = split_batch(batch, 8 + margin, margin=margin)
    assert sp.news2 is not None
    got_scores, got_aux = model.apply({"params": state.params}, sp, deterministic=True)
    np.testing.assert_allclose(
        np.asarray(ref_scores), np.asarray(got_scores), rtol=1e-5, atol=1e-5
    )
    assert set(ref_aux) == set(got_aux)
    for k in ref_aux:
        np.testing.assert_allclose(
            np.asarray(ref_aux[k]), np.asarray(got_aux[k]), rtol=1e-5, atol=1e-5
        )


def _toy_store_and_imps(rng, n_news=60, n_imp=40, max_len=12):
    lens = rng.integers(2, max_len + 1, size=n_news)
    titles = [list(rng.integers(2, 140, size=n)) for n in lens]
    store = build_news_store(
        nids=[f"N{i}" for i in range(n_news)],
        tokenized_titles=titles,
        max_title_len=max_len,
        categories=list(rng.integers(1, 8, size=n_news)),
        sentiments=list(rng.integers(1, 4, size=n_news)),
    )
    hists = [rng.integers(1, n_news + 1, size=int(rng.integers(1, 9))) for _ in range(n_imp)]
    cands = [rng.integers(1, n_news + 1, size=int(rng.integers(2, 9))) for _ in range(n_imp)]
    labels = []
    for c in cands:
        l = np.zeros(len(c), dtype=np.int8)
        l[rng.integers(0, len(c))] = 1
        labels.append(l)
    imp = Impressions.from_lists(hists, cands, labels, rng.integers(1, 20, size=n_imp))
    return store, imp


def test_eval_batcher_split_metric_parity():
    from newsreclib_tpu.models.general_rec import NRMS

    rng = np.random.default_rng(3)
    store, imp = _toy_store_and_imps(rng)
    model = NRMS(vocab_size=150, embed_dim=60, num_heads=6, query_dim=32)
    init = next(iter(EvalBatcher(store, imp, max_history_len=8, u_bucket_min=64)))
    state = create_train_state(model, init, jax.random.key(0), make_optimizer())
    step = make_eval_step()

    def run(split):
        batcher = EvalBatcher(
            store, imp, max_history_len=8, u_bucket_min=64, split_title_len=split
        )
        out = []
        for b in batcher:
            if split is not None and b.news2 is not None:
                assert b.news.title.shape[1] == split
            scores, per_imp, valid, _ = step(state, b)
            out.append((np.asarray(per_imp["mrr"]), np.asarray(valid)))
        return out

    ref, got = run(None), run(8)
    assert any(np.any(v) for _, v in got)
    for (rm, rv), (gm, gv) in zip(ref, got):
        np.testing.assert_array_equal(rv, gv)
        np.testing.assert_allclose(rm[rv], gm[gv], rtol=1e-5, atol=1e-6)


def test_train_batcher_split_loss_parity():
    """Same seed, dropout off: per-batch CE losses match unsplit exactly."""
    from newsreclib_tpu.models.components.losses import cross_entropy_loss
    from newsreclib_tpu.models.general_rec import NRMS

    rng = np.random.default_rng(4)
    store, imp = _toy_store_and_imps(rng)
    model = NRMS(vocab_size=150, embed_dim=60, num_heads=6, query_dim=32, dropout=0.0)

    def losses(split):
        batcher = TrainBatcher(
            store, imp, batch_size=8, max_history_len=8, neg_sampling_ratio=2,
            seed=11, u_bucket_min=64, split_title_len=split,
        )
        init = next(iter(batcher.epoch(0)))
        state = create_train_state(model, init, jax.random.key(0), make_optimizer())
        out = []
        for b in batcher.epoch(0):
            scores, _ = model.apply({"params": state.params}, b, deterministic=True)
            out.append(float(cross_entropy_loss(
                scores, b.labels, b.cand_mask, b.impression_valid)))
        return out

    np.testing.assert_allclose(losses(None), losses(8), rtol=1e-5)


def test_override_scientific_notation_parses_as_float():
    """pyyaml (YAML 1.1) parses dotless scientific notation as a string;
    compose must coerce it (a TPE sweep at its lr bound emits lr=1e-05)."""
    import os
    from newsreclib_tpu.config.compose import compose

    root = os.path.join(os.path.dirname(__file__), "..", "newsreclib_tpu", "configs")
    cfg = compose(root, "train", ["model.optimizer.lr=1e-05", "seed=7",
                                  "trainer.monitor=loss"])
    assert cfg["model"]["optimizer"]["lr"] == 1e-05
    assert isinstance(cfg["model"]["optimizer"]["lr"], float)
    assert cfg["trainer"]["monitor"] == "loss"
