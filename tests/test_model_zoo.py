"""Every general_rec model: forward shape, finiteness, gradient flow, and a
short training-loss decrease on synthetic data."""

import jax
import numpy as np
import pytest

from newsreclib_tpu.data.synthetic import SyntheticConfig, make_batch
from newsreclib_tpu.models.components.losses import cross_entropy_loss
from newsreclib_tpu.models import general_rec as zoo
from newsreclib_tpu.training.state import create_train_state, make_optimizer
from newsreclib_tpu.training.steps import make_train_step

VOCAB = 150
ENT_VOCAB = 60
USERS = 40
CFG = SyntheticConfig(
    vocab_size=VOCAB, title_len=12, abstract_len=10, entity_len=4,
    entity_vocab_size=ENT_VOCAB, num_users=USERS,
)

MODELS = {
    "nrms": lambda: zoo.NRMS(vocab_size=VOCAB, embed_dim=60, num_heads=6, query_dim=32),
    "naml": lambda: zoo.NAML(
        vocab_size=VOCAB, text_embed_dim=60, categ_embed_dim=20, num_filters=48, query_dim=32
    ),
    "lstur": lambda: zoo.LSTUR(
        vocab_size=VOCAB, num_users=USERS, text_embed_dim=60, categ_embed_dim=20,
        num_filters=48, query_dim=32,
    ),
    "lstur_con": lambda: zoo.LSTUR(
        vocab_size=VOCAB, num_users=USERS, text_embed_dim=60, categ_embed_dim=20,
        num_filters=48, query_dim=32, long_short_term_method="con",
    ),
    "npa": lambda: zoo.NPA(
        vocab_size=VOCAB, num_users=USERS, text_embed_dim=60, user_embed_dim=16,
        num_filters=48, word_pref_query_dim=24, news_pref_query_dim=24,
    ),
    "tanr": lambda: zoo.TANR(
        vocab_size=VOCAB, embed_dim=60, num_heads=6, num_filters=48, query_dim=32
    ),
    "caum": lambda: zoo.CAUM(
        vocab_size=VOCAB, entity_vocab_size=ENT_VOCAB, text_embed_dim=60, text_num_heads=6,
        categ_embed_dim=20, news_embed_dim=48, entity_embed_dim=16, query_dim=32,
        user_vector_dim=48, num_filters=48, dense_att_hidden_dim1=32, dense_att_hidden_dim2=16,
    ),
    # num_filters must equal the news dim (= text_embed_dim under add_att
    # combine), as in the reference canonical config (300/300)
    "mins": lambda: zoo.MINS(
        vocab_size=VOCAB, text_embed_dim=60, categ_embed_dim=20, num_heads=6,
        query_dim=32, num_filters=60, num_gru_channels=4,
    ),
    "cen_news_rec": lambda: zoo.CenNewsRec(
        vocab_size=VOCAB, embed_dim=60, num_heads=6, num_filters=48, query_dim=32,
        gru_hidden_dim=48, num_recent_news=4,
    ),
    "dkn": lambda: zoo.DKN(
        vocab_size=VOCAB, entity_vocab_size=ENT_VOCAB, text_embed_dim=32,
        entity_embed_dim=16, num_filters=16, window_sizes=(2, 3), hidden_dim_dnn=8,
    ),
    # entity-ablated control for the statfix-v2 entity-channel demonstration
    "dkn_noent": lambda: zoo.DKN(
        vocab_size=VOCAB, entity_vocab_size=ENT_VOCAB, text_embed_dim=32,
        entity_embed_dim=16, num_filters=16, window_sizes=(2, 3), hidden_dim_dnn=8,
        use_entities=False,
    ),
    "miner": lambda: zoo.MINER(
        vocab_size=VOCAB, text_embed_dim=60, news_embed_dim=32, num_heads=6,
        query_dim=32, categ_embed_dim=16, num_context_codes=4, context_code_dim=24,
    ),
    "miner_mean": lambda: zoo.MINER(
        vocab_size=VOCAB, text_embed_dim=60, news_embed_dim=32, num_heads=6, query_dim=32,
        categ_embed_dim=16, num_context_codes=4, context_code_dim=24,
        score_type="mean", use_categ_bias=False,
    ),
    "nrms_late": lambda: zoo.NRMS(
        vocab_size=VOCAB, embed_dim=60, num_heads=6, query_dim=32, late_fusion=True
    ),
    "caum_late": lambda: zoo.CAUM(
        vocab_size=VOCAB, entity_vocab_size=ENT_VOCAB, text_embed_dim=60, text_num_heads=6,
        categ_embed_dim=20, news_embed_dim=48, entity_embed_dim=16, query_dim=32,
        user_vector_dim=48, num_filters=48, dense_att_hidden_dim1=32, dense_att_hidden_dim2=16,
        late_fusion=True,
    ),
    "dkn_late": lambda: zoo.DKN(
        vocab_size=VOCAB, entity_vocab_size=ENT_VOCAB, text_embed_dim=32,
        entity_embed_dim=16, num_filters=16, window_sizes=(2, 3), hidden_dim_dnn=8,
        late_fusion=True,
    ),
}


def _batch(seed=0, planted=False, b=6):
    rng = np.random.default_rng(seed)
    return make_batch(
        rng, batch_size=b, hist_len=6, num_candidates=5, unique_news=24, cfg=CFG,
        planted_signal=planted,
    )


@pytest.mark.parametrize("name", sorted(MODELS))
def test_forward_and_train_step(name):
    batch = _batch()
    model = MODELS[name]()
    state = create_train_state(model, batch, jax.random.key(0), make_optimizer(1e-3))
    scores, aux = model.apply({"params": state.params}, batch, deterministic=True)
    assert scores.shape == (6, 5)
    assert np.all(np.isfinite(np.asarray(scores)))
    for k, v in aux.items():
        assert np.isfinite(float(v)), k

    step = make_train_step(cross_entropy_loss, donate=False)
    state, metrics = step(state, batch)
    assert np.isfinite(float(metrics["loss"]))
    # gradients actually flowed: params changed
    before = jax.tree.leaves(state.params)
    state2, _ = step(state, batch)
    after = jax.tree.leaves(state2.params)
    changed = any(
        not np.allclose(np.asarray(a), np.asarray(b)) for a, b in zip(before, after)
    )
    assert changed


@pytest.mark.parametrize("name", ["naml", "lstur", "caum", "miner"])
def test_loss_decreases(name):
    batch = _batch(seed=7, planted=True, b=12)
    model = MODELS[name]()
    state = create_train_state(model, batch, jax.random.key(1), make_optimizer(3e-3))
    step = make_train_step(cross_entropy_loss, donate=False)
    first = last = None
    for i in range(25):
        state, metrics = step(state, batch)
        if first is None:
            first = float(metrics["loss"])
        last = float(metrics["loss"])
    assert last < first, (first, last)


def test_packed_models_match_unpacked():
    """pack_titles must be score-identical (deterministic) across the
    MHSA-text zoo — insurance that the packed layout stays exact as models
    evolve.  Uses pack_to=48 so P=4 divides the test's U=32 (the production
    128 falls back untriggered at title_len 12)."""
    import dataclasses

    rng = np.random.default_rng(3)
    batch = make_batch(rng, batch_size=8, hist_len=6, num_candidates=5,
                       unique_news=32, cfg=CFG)
    for name in ("nrms", "mins", "caum", "miner"):
        m_plain = MODELS[name]()
        m_packed = dataclasses.replace(m_plain, pack_titles=48)
        params = m_plain.init({"params": jax.random.key(0)}, batch,
                              deterministic=True)["params"]
        s0, _ = m_plain.apply({"params": params}, batch, deterministic=True)
        s1, _ = m_packed.apply({"params": params}, batch, deterministic=True)
        np.testing.assert_allclose(np.asarray(s0), np.asarray(s1), atol=3e-5,
                                   err_msg=name)
    # the factory default IS packed
    from newsreclib_tpu.models.factory import DataInfo, build_model

    m = build_model({"name": "nrms"}, DataInfo(vocab_size=VOCAB))
    assert m.pack_titles == 128
