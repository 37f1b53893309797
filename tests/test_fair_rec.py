"""FairRec family tests: SentiRec aux losses, SentiDebias adversarial step,
MANNeR CR/A training + ensemble score fusion."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from newsreclib_tpu.data.synthetic import SyntheticConfig, make_batch
from newsreclib_tpu.models import fair_rec
from newsreclib_tpu.models.components.losses import cross_entropy_loss, get_loss_fn
from newsreclib_tpu.training.state import create_train_state, make_optimizer
from newsreclib_tpu.training.steps import make_train_step

VOCAB = 150
CFG = SyntheticConfig(vocab_size=VOCAB, title_len=10, abstract_len=8, entity_len=4,
                      entity_vocab_size=60)


def _batch(seed=0, b=6):
    rng = np.random.default_rng(seed)
    return make_batch(rng, batch_size=b, hist_len=6, num_candidates=5, unique_news=24, cfg=CFG)


def test_sentirec_aux_losses():
    batch = _batch()
    model = fair_rec.SentiRec(vocab_size=VOCAB, embed_dim=60, num_heads=6, query_dim=32)
    state = create_train_state(model, batch, jax.random.key(0), make_optimizer(1e-3))
    scores, aux = model.apply({"params": state.params}, batch, deterministic=True)
    assert scores.shape == (6, 5)
    assert set(aux) == {"sent_pred_loss", "sent_div_loss"}
    assert float(aux["sent_pred_loss"]) > 0  # L1 vs targets is nonzero
    step = make_train_step(cross_entropy_loss, donate=False)
    state, metrics = step(state, batch)
    assert np.isfinite(float(metrics["loss"]))
    assert "aux/sent_pred_loss" in metrics


def test_sentidebias_adversarial_training():
    batch = _batch(b=8)
    gen = fair_rec.SentiDebiasGenerator(
        vocab_size=VOCAB, embed_dim=60, num_heads=6, query_dim=32, sent_embed_dim=16
    )
    disc = fair_rec.SentiDebiasDiscriminator(hidden_dim=32)
    state = fair_rec.create_sentidebias_state(
        gen, disc, batch, jax.random.key(0), g_lr=1e-3, d_lr=2e-3
    )
    # alpha=0: no adversarial pressure on G, so D must learn on a fixed batch
    step = fair_rec.make_sentidebias_train_step(alpha=0.0, beta=10.0)
    d_losses = []
    for _ in range(15):
        state, metrics = step(state, batch)
        d_losses.append(float(metrics["d_loss"]))
        assert np.isfinite(float(metrics["g_loss"]))
    assert d_losses[-1] < d_losses[0]
    # full adversarial step (alpha>0) stays finite
    adv_step = fair_rec.make_sentidebias_train_step(alpha=0.15, beta=10.0)
    state, metrics = adv_step(state, batch)
    assert np.isfinite(float(metrics["g_loss"])) and np.isfinite(float(metrics["d_loss"]))
    # eval protocol: generator returns bias-free scores
    scores, aux = state.g.apply_fn({"params": state.g.params}, batch, deterministic=True)
    assert scores.shape == (8, 5)
    assert aux == {}


def test_manner_cr_supcon_training():
    batch = _batch()
    model = fair_rec.MANNeRCR(
        vocab_size=VOCAB, entity_vocab_size=60, text_embed_dim=60, entity_embed_dim=16,
        num_heads=6, query_dim=32,
    )
    state = create_train_state(model, batch, jax.random.key(0), make_optimizer(1e-3))
    step = make_train_step(get_loss_fn("sup_con_loss", temperature=0.1), donate=False)
    state, metrics = step(state, batch)
    assert np.isfinite(float(metrics["loss"]))


def test_manner_a_supcon_embedding_space():
    from newsreclib_tpu.data.news_batching import MPerClassNewsBatcher
    from newsreclib_tpu.data.news_store import build_news_store

    rng = np.random.default_rng(0)
    n = 60
    titles = [list(rng.integers(2, VOCAB, size=6)) for _ in range(n)]
    cats = rng.integers(1, 5, size=n).tolist()
    store = build_news_store(
        nids=[f"N{i}" for i in range(n)],
        tokenized_titles=titles,
        max_title_len=10,
        categories=cats,
    )
    batcher = MPerClassNewsBatcher(store, aspect="category", batch_size=16, m_per_class=4)
    news_batch = next(iter(batcher.epoch(0)))
    # m-per-class structure: every present class has exactly m samples
    vals, counts = np.unique(np.asarray(news_batch.labels), return_counts=True)
    assert all(c % 4 == 0 for c in counts)

    model = fair_rec.MANNeRA(
        vocab_size=VOCAB, use_entities=False, text_embed_dim=32, num_heads=4, query_dim=16
    )
    variables = model.init(jax.random.key(0), news_batch.news, deterministic=True)
    emb = model.apply(variables, news_batch.news, deterministic=True)
    assert emb.shape == (16, 32)
    loss = fair_rec.supcon_embedding_loss(
        emb, jnp.asarray(news_batch.labels), jnp.asarray(news_batch.valid)
    )
    assert np.isfinite(float(loss)) and float(loss) > 0


def test_supcon_embedding_loss_prefers_clustered():
    # well-separated same-label clusters → lower loss than mixed labels
    emb = jnp.asarray([[10.0, 0], [9.0, 0.5], [0, 10.0], [0.2, 9.0]])
    clustered = fair_rec.supcon_embedding_loss(emb, jnp.asarray([1, 1, 2, 2]))
    mixed = fair_rec.supcon_embedding_loss(emb, jnp.asarray([1, 2, 1, 2]))
    assert float(clustered) < float(mixed)


def test_manner_ensemble_zscore_fusion():
    batch = _batch()
    cand_mask = jnp.asarray(batch.cand_mask)
    rng = np.random.default_rng(1)
    cr = jnp.asarray(rng.normal(size=(6, 5)).astype(np.float32))
    categ = jnp.asarray(rng.normal(size=(6, 5)).astype(np.float32))
    z = fair_rec.zscore_per_impression(cr, cand_mask)
    np.testing.assert_allclose(np.asarray(z).mean(axis=1), 0.0, atol=1e-5)
    np.testing.assert_allclose(np.asarray(z).std(axis=1), 1.0, atol=1e-3)
    fused = fair_rec.manner_ensemble_scores(cr, {"categ": categ}, {"categ": 0.5}, cand_mask)
    expected = z + 0.5 * fair_rec.zscore_per_impression(categ, cand_mask)
    np.testing.assert_allclose(np.asarray(fused), np.asarray(expected), atol=1e-6)

    # A-module scores path runs through a real module
    model = fair_rec.MANNeRA(
        vocab_size=VOCAB, use_entities=False, text_embed_dim=32, num_heads=4, query_dim=16
    )
    variables = model.init(jax.random.key(0), batch.news, deterministic=True)
    s = fair_rec.aspect_module_scores(model.apply, variables["params"], batch)
    assert s.shape == (6, 5)
