"""use_plm wiring across the model zoo: every factory-buildable model that
supports a PLM text tower (reference ``use_plm`` flag in each
``*_module.py``) must init, splice ported HF weights, run forward, and take
one finite train step."""

import jax
import numpy as np
import pytest

from newsreclib_tpu.data.synthetic import SyntheticConfig, make_batch
from newsreclib_tpu.models.components.losses import cross_entropy_loss
from newsreclib_tpu.models.factory import (
    DataInfo,
    build_model,
    build_senti_debias,
    splice_plm_params,
    take_pending_plm_params,
)
from newsreclib_tpu.training.state import create_train_state, make_optimizer
from newsreclib_tpu.training.steps import make_train_step

VOCAB = 120  # == tiny bert vocab: synthetic tokens double as tokenizer ids


@pytest.fixture(scope="module")
def tiny_bert_dir(tmp_path_factory):
    import torch
    from transformers import BertConfig, BertModel

    torch.manual_seed(0)
    cfg = BertConfig(
        vocab_size=VOCAB, hidden_size=32, num_hidden_layers=2,
        num_attention_heads=4, intermediate_size=64,
        max_position_embeddings=80,
    )
    model = BertModel(cfg)
    d = str(tmp_path_factory.mktemp("tiny_bert_zoo"))
    model.save_pretrained(d, safe_serialization=False)
    return d


SYN = SyntheticConfig(vocab_size=VOCAB, title_len=10, abstract_len=8,
                      entity_len=3, entity_vocab_size=40, num_users=20)

# small-dim overrides per model; every cfg gets use_plm/plm_model on top
PLM_MODELS = {
    "nrms": dict(embed_dim=32, num_heads=4, query_dim=16),
    "naml": dict(text_embed_dim=32, categ_embed_dim=12, num_filters=24,
                 query_dim=16),
    "lstur": dict(text_embed_dim=32, categ_embed_dim=12, num_filters=24,
                  query_dim=16),
    "tanr": dict(embed_dim=32, num_heads=4, num_filters=24, query_dim=16),
    "caum": dict(text_embed_dim=32, text_num_heads=4, categ_embed_dim=12,
                 news_embed_dim=24, entity_embed_dim=8, query_dim=16,
                 user_vector_dim=24, num_filters=24,
                 dense_att_hidden_dim1=16, dense_att_hidden_dim2=8),
    "mins": dict(text_embed_dim=32, categ_embed_dim=12, num_heads=4,
                 query_dim=16, num_gru_channels=2),
    "cen_news_rec": dict(embed_dim=32, num_heads=4, num_filters=24,
                         query_dim=16, num_recent_news=3),
    "miner": dict(text_embed_dim=32, news_embed_dim=16, num_heads=4,
                  query_dim=16, categ_embed_dim=8, num_context_codes=3,
                  context_code_dim=12),
    "sentirec": dict(embed_dim=32, num_heads=4, query_dim=16),
    "manner_cr": dict(text_embed_dim=32, entity_embed_dim=8, num_heads=4,
                      query_dim=16),
}


def _info():
    return DataInfo(
        vocab_size=VOCAB, num_users=SYN.num_users,
        num_categories=SYN.num_categories,
        num_sent_classes=SYN.num_sent_classes,
        entity_vocab_size=SYN.entity_vocab_size,
    )


@pytest.mark.parametrize("name", sorted(PLM_MODELS))
def test_factory_plm_model(name, tiny_bert_dir):
    cfg = dict(PLM_MODELS[name], name=name, use_plm=True,
               plm_model=tiny_bert_dir, plm_use_mhsa=False,
               dropout_probability=0.1)
    model = build_model(cfg, _info())
    ported = take_pending_plm_params()
    assert ported is not None, "factory must stash ported HF weights"

    batch = make_batch(np.random.default_rng(0), batch_size=4, hist_len=5,
                       num_candidates=5, unique_news=16, cfg=SYN)
    state = create_train_state(model, batch, jax.random.key(0),
                               make_optimizer(1e-3))
    n = splice_plm_params(state.params, ported)
    assert n >= 1, "no transformer-encoder subtree found to splice into"

    scores, _aux = model.apply({"params": state.params}, batch,
                               deterministic=True)
    assert scores.shape == (4, 5)
    assert np.all(np.isfinite(np.asarray(scores)))

    step = make_train_step(cross_entropy_loss, donate=False)
    state, metrics = step(state, batch)
    assert np.isfinite(float(metrics["loss"]))


def test_senti_debias_plm(tiny_bert_dir):
    from newsreclib_tpu.models.fair_rec import create_sentidebias_state

    cfg = dict(name="senti_debias", use_plm=True, plm_model=tiny_bert_dir,
               plm_use_mhsa=False, embed_dim=32, num_heads=4, query_dim=16,
               sent_embed_dim=8, discriminator_hidden_dim=16,
               dropout_probability=0.1)
    gen, disc = build_senti_debias(cfg, _info())
    ported = take_pending_plm_params()
    assert ported is not None

    batch = make_batch(np.random.default_rng(1), batch_size=4, hist_len=5,
                       num_candidates=5, unique_news=16, cfg=SYN)
    sd = create_sentidebias_state(gen, disc, batch, jax.random.key(0),
                                  g_lr=1e-3, d_lr=1e-3)
    n = splice_plm_params(sd.g.params, ported)
    assert n >= 1

    out = gen.apply({"params": sd.g.params}, batch, deterministic=True,
                    method=gen.full_output)
    assert np.all(np.isfinite(np.asarray(out["combined_scores"])))
