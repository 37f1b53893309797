"""Full MANNeR flow: train CR (SupCon slates) + A-module (SupCon on news),
then fuse z-scored module scores at test time — the reference's test-only
ensemble (``manner_module.py``)."""

import jax
import numpy as np
import optax

from newsreclib_tpu.data.news_batching import MPerClassNewsBatcher
from newsreclib_tpu.data.synthetic import SyntheticConfig, make_batch
from newsreclib_tpu.models import fair_rec
from newsreclib_tpu.models.components.losses import get_loss_fn
from newsreclib_tpu.training.aspect import make_aspect_train_step
from newsreclib_tpu.training.state import TrainState, create_train_state, make_optimizer
from newsreclib_tpu.training.steps import make_train_step

VOCAB = 150
CFG = SyntheticConfig(vocab_size=VOCAB, title_len=10, abstract_len=8,
                      entity_len=4, entity_vocab_size=60)


def test_manner_end_to_end():
    rng = np.random.default_rng(0)
    batch = make_batch(rng, batch_size=8, hist_len=6, num_candidates=5,
                       unique_news=32, cfg=CFG)

    # 1) CR module with SupCon
    cr = fair_rec.MANNeRCR(
        vocab_size=VOCAB, entity_vocab_size=60, text_embed_dim=48,
        entity_embed_dim=16, num_heads=4, query_dim=16,
    )
    cr_state = create_train_state(cr, batch, jax.random.key(0), make_optimizer(1e-3))
    step = make_train_step(get_loss_fn("sup_con_loss", temperature=0.1), donate=False)
    for _ in range(3):
        cr_state, m = step(cr_state, batch)
    assert np.isfinite(float(m["loss"]))

    # 2) A-module on category aspect
    a = fair_rec.MANNeRA(
        vocab_size=VOCAB, use_entities=False, text_embed_dim=32,
        num_heads=4, query_dim=16,
    )
    from newsreclib_tpu.data.news_store import build_news_store

    titles = [list(rng.integers(2, VOCAB, size=6)) for _ in range(40)]
    store = build_news_store(
        nids=[f"N{i}" for i in range(40)], tokenized_titles=titles,
        max_title_len=10, categories=rng.integers(1, 5, size=40).tolist(),
    )
    batcher = MPerClassNewsBatcher(store, "category", batch_size=16, m_per_class=4)
    nb = next(iter(batcher.epoch(0)))
    a_vars = a.init({"params": jax.random.key(1), "dropout": jax.random.key(2)},
                    nb.news, deterministic=True)
    a_state = TrainState.create(apply_fn=a.apply, params=a_vars["params"],
                                tx=optax.adam(1e-3), dropout_rng=jax.random.key(3))
    astep = make_aspect_train_step()
    a_state, am = astep(a_state, nb)
    assert np.isfinite(float(am["loss"]))

    # 3) ensemble: z-scored CR scores + weighted aspect scores
    cr_scores, _ = cr.apply({"params": cr_state.params}, batch, deterministic=True)
    categ_scores = fair_rec.aspect_module_scores(a.apply, a_state.params, batch)
    import jax.numpy as jnp

    fused = fair_rec.manner_ensemble_scores(
        cr_scores, {"categ": categ_scores}, {"categ": 0.5}, jnp.asarray(batch.cand_mask)
    )
    assert fused.shape == (8, 5)
    assert np.all(np.isfinite(np.asarray(fused)))
    # with weight 0 the ensemble reduces to z-scored CR alone
    alone = fair_rec.manner_ensemble_scores(
        cr_scores, {"categ": categ_scores}, {"categ": 0.0}, jnp.asarray(batch.cand_mask)
    )
    np.testing.assert_allclose(
        np.asarray(alone),
        np.asarray(fair_rec.zscore_per_impression(cr_scores, jnp.asarray(batch.cand_mask))),
        atol=1e-6,
    )


def test_manner_ensemble_module_matches_functional_fusion():
    """MANNeREnsemble (the servable single-table module driving the cached
    ensemble eval, ``manner_module.py:174-204`` analog) must reproduce the
    functional z-score fusion exactly when fed the submodules' params."""
    import jax.numpy as jnp

    rng = np.random.default_rng(1)
    batch = make_batch(rng, batch_size=6, hist_len=5, num_candidates=5,
                       unique_news=24, cfg=CFG)
    cr = fair_rec.MANNeRCR(
        vocab_size=VOCAB, entity_vocab_size=60, text_embed_dim=48,
        entity_embed_dim=16, num_heads=4, query_dim=16,
    )
    cr_params = cr.init({"params": jax.random.key(0)}, batch,
                        deterministic=True)["params"]
    a = fair_rec.MANNeRA(
        vocab_size=VOCAB, use_entities=False, text_embed_dim=32,
        num_heads=4, query_dim=16,
    )
    a_params = a.init({"params": jax.random.key(1)}, batch.news,
                      deterministic=True)["params"]
    ens = fair_rec.MANNeREnsemble(
        cr=cr, aspect_names=("categ",), aspect_towers=(a,),
        aspect_weights=(0.3,), cr_dim=48, aspect_dims=(32,),
    )
    # params spliced by field name — the layout evaluate_ensemble assembles
    # from restored checkpoints
    params = {"cr": cr_params, "aspect_towers_0": a_params}
    fused, _ = ens.apply({"params": params}, batch, deterministic=True)

    cr_scores, _ = cr.apply({"params": cr_params}, batch, deterministic=True)
    categ_scores = fair_rec.aspect_module_scores(a.apply, a_params, batch)
    ref = fair_rec.manner_ensemble_scores(
        cr_scores, {"categ": categ_scores}, {"categ": 0.3},
        jnp.asarray(batch.cand_mask),
    )
    np.testing.assert_allclose(np.asarray(fused), np.asarray(ref), atol=1e-5)
