"""PLM tower tests: HF torch weight-porting parity, PLM-NR head, layer
freezing, NRMS-with-PLM integration.  Uses a tiny randomly-initialized local
HF BertModel (no network)."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from newsreclib_tpu.models.components.plm import (
    PLMTextEncoder,
    TransformerEncoder,
    encoder_config_from_hf,
    load_hf_torch_weights,
    plm_freeze_labels,
)


@pytest.fixture(scope="module")
def tiny_bert_dir(tmp_path_factory):
    import torch
    from transformers import BertConfig, BertModel

    torch.manual_seed(0)
    cfg = BertConfig(
        vocab_size=120, hidden_size=32, num_hidden_layers=3, num_attention_heads=4,
        intermediate_size=64, max_position_embeddings=40,
    )
    model = BertModel(cfg)
    d = str(tmp_path_factory.mktemp("tiny_bert"))
    model.save_pretrained(d, safe_serialization=False)
    return d


def test_hf_weight_port_parity(tiny_bert_dir):
    import torch
    from transformers import BertModel

    params, kwargs = load_hf_torch_weights(tiny_bert_dir)
    enc = TransformerEncoder(**kwargs)

    rng = np.random.default_rng(0)
    tokens = rng.integers(1, 120, size=(3, 12)).astype(np.int32)
    tokens[0, 8:] = 0
    mask = tokens != 0

    ours = enc.apply(
        {"params": params}, jnp.asarray(tokens), jnp.asarray(mask), deterministic=True
    )

    hf = BertModel.from_pretrained(tiny_bert_dir)
    hf.eval()
    with torch.no_grad():
        theirs = hf(
            input_ids=torch.tensor(tokens.astype(np.int64)),
            attention_mask=torch.tensor(mask.astype(np.int64)),
        ).last_hidden_state.numpy()

    # padded positions differ (HF computes them; we only guarantee valid ones)
    m = mask[..., None]
    np.testing.assert_allclose(
        np.asarray(ours) * m, theirs * m, atol=2e-4, rtol=1e-3
    )


def test_plm_text_encoder_heads(tiny_bert_dir):
    params, kwargs = load_hf_torch_weights(tiny_bert_dir)
    enc = TransformerEncoder(**kwargs)
    tokens = jnp.asarray(np.random.default_rng(1).integers(1, 120, size=(4, 10)))

    for use_mhsa in (True, False):
        plm = PLMTextEncoder(
            encoder=enc, use_mhsa=use_mhsa, num_heads=4, query_dim=16,
            apply_reduce_dim=True, reduced_embed_dim=24,
        )
        variables = plm.init(jax.random.key(0), tokens, deterministic=True)
        # splice ported encoder weights under the submodule name
        variables["params"]["encoder"] = params
        out = plm.apply(variables, tokens, deterministic=True)
        assert out.shape == (4, 24)
        assert np.all(np.isfinite(np.asarray(out)))


def test_hf_save_roundtrip(tiny_bert_dir, tmp_path):
    """save_as_hf_bert → load_hf_torch_weights is the identity on encoder
    params (the offline-MLM-pretraining export path, round 5)."""
    from newsreclib_tpu.models.components.plm import save_as_hf_bert

    params, kwargs = load_hf_torch_weights(tiny_bert_dir)
    out = save_as_hf_bert(params, kwargs, str(tmp_path / "exported"))
    params2, kwargs2 = load_hf_torch_weights(out)
    assert kwargs2 == kwargs
    flat1 = jax.tree_util.tree_leaves_with_path(params)
    flat2 = jax.tree_util.tree_leaves_with_path(params2)
    assert len(flat1) == len(flat2)
    for (p1, a), (p2, b) in zip(flat1, flat2):
        assert p1 == p2
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_plm_packing_exact(tiny_bert_dir):
    """pack_to (segment-ID packing of articles into one transformer
    sequence) must match the unpacked path — block-diagonal attention +
    per-article positions make it numerically equivalent (round 5, the PLM
    analog of text.py MHSAAddAtt.pack_to)."""
    params, kwargs = load_hf_torch_weights(tiny_bert_dir)
    rng = np.random.default_rng(3)
    U, L = 8, 10
    tokens = np.asarray(rng.integers(1, 120, size=(U, L)), dtype=np.int32)
    # ragged masks: variable article lengths exercise key masking
    lens = rng.integers(3, L + 1, size=U)
    tokens = np.where(np.arange(L)[None] < lens[:, None], tokens, 0)
    tokens_j = jnp.asarray(tokens)

    for use_mhsa in (True, False):
        plm_u = PLMTextEncoder(
            encoder=TransformerEncoder(**kwargs), use_mhsa=use_mhsa,
            num_heads=4, query_dim=16,
        )
        plm_p = PLMTextEncoder(
            encoder=TransformerEncoder(**kwargs), use_mhsa=use_mhsa,
            num_heads=4, query_dim=16, pack_to=4 * L,
        )
        variables = plm_u.init(jax.random.key(0), tokens_j, deterministic=True)
        variables["params"]["encoder"] = params
        out_u = plm_u.apply(variables, tokens_j, deterministic=True)
        out_p = plm_p.apply(variables, tokens_j, deterministic=True)
        np.testing.assert_allclose(
            np.asarray(out_u), np.asarray(out_p), atol=1e-5, rtol=1e-5,
        )

    # non-divisible U falls back to unpacked (logged) and still matches
    plm_u = PLMTextEncoder(
        encoder=TransformerEncoder(**kwargs), use_mhsa=True,
        num_heads=4, query_dim=16,
    )
    variables = plm_u.init(jax.random.key(0), tokens_j, deterministic=True)
    variables["params"]["encoder"] = params
    plm_f = PLMTextEncoder(
        encoder=TransformerEncoder(**kwargs), use_mhsa=True,
        num_heads=4, query_dim=16, pack_to=3 * L,
    )
    np.testing.assert_allclose(
        np.asarray(plm_u.apply(variables, tokens_j, deterministic=True)),
        np.asarray(plm_f.apply(variables, tokens_j, deterministic=True)),
        atol=1e-6,
    )


def test_layer_freezing(tiny_bert_dir):
    import optax

    from newsreclib_tpu.training.state import make_optimizer

    params, kwargs = load_hf_torch_weights(tiny_bert_dir)
    labels = plm_freeze_labels(params, frozen_layers=[0, 1], freeze_embeddings=True)
    # spot-check labels
    assert labels["layer_0"]["q"]["kernel"] == "freeze"
    assert labels["layer_2"]["q"]["kernel"] == "train"
    assert labels["word_embeddings"]["embedding"] == "freeze"

    enc = TransformerEncoder(**kwargs)
    opt = make_optimizer(1e-2, freeze_labels=labels)
    opt_state = opt.init(params)
    tokens = jnp.asarray(np.random.default_rng(2).integers(1, 120, size=(2, 8)))

    def loss_fn(p):
        return jnp.sum(enc.apply({"params": p}, tokens, deterministic=True) ** 2)

    grads = jax.grad(loss_fn)(params)
    updates, _ = opt.update(grads, opt_state, params)
    new_params = optax.apply_updates(params, updates)
    np.testing.assert_array_equal(
        np.asarray(new_params["layer_0"]["q"]["kernel"]),
        np.asarray(params["layer_0"]["q"]["kernel"]),
    )
    assert not np.array_equal(
        np.asarray(new_params["layer_2"]["q"]["kernel"]),
        np.asarray(params["layer_2"]["q"]["kernel"]),
    )


def test_frozen_layers_config_wiring(tiny_bert_dir):
    """End-to-end config wiring (VERDICT r1 item 6): ``model.frozen_layers``
    flows through train.py::build_optimizer → plm_freeze_labels →
    make_optimizer, and frozen-layer params are BIT-IDENTICAL after a real
    train step while unfrozen layers move."""
    import train as train_mod
    from newsreclib_tpu.data.synthetic import SyntheticConfig, make_batch
    from newsreclib_tpu.models.components.losses import cross_entropy_loss
    from newsreclib_tpu.models.factory import (
        DataInfo,
        build_model,
        splice_plm_params,
        take_pending_plm_params,
    )
    from newsreclib_tpu.training.state import create_train_state
    from newsreclib_tpu.training.steps import make_train_step

    cfg = {
        "model": {
            "name": "nrms", "use_plm": True, "plm_model": tiny_bert_dir,
            "plm_use_mhsa": True, "frozen_layers": [0, 1],
            "embed_dim": 32, "num_heads": 4, "query_dim": 16,
            "optimizer": {"lr": 1e-2},
        },
        "trainer": {"max_epochs": 1},
    }
    model = build_model(cfg["model"], DataInfo(vocab_size=120))
    scfg = SyntheticConfig(vocab_size=120, title_len=12)
    batch = make_batch(np.random.default_rng(5), batch_size=4, hist_len=5,
                       num_candidates=5, unique_news=16, cfg=scfg,
                       with_abstract=False, with_entities=False)
    state = create_train_state(model, batch, jax.random.key(0),
                               train_mod.build_optimizer(cfg, steps_per_epoch=10))
    ported = take_pending_plm_params()
    assert ported is not None
    splice_plm_params(state.params, ported)

    def enc_tree(p):
        node = p
        while "encoder" not in node:
            node = node[next(iter(node))]
        return node["encoder"]

    before = jax.tree.map(np.array, enc_tree(state.params))
    step = make_train_step(cross_entropy_loss, donate=False)
    state, metrics = step(state, batch)
    assert np.isfinite(float(metrics["loss"]))
    after = enc_tree(state.params)
    np.testing.assert_array_equal(  # frozen: bit-identical
        before["layer_0"]["q"]["kernel"], np.asarray(after["layer_0"]["q"]["kernel"]))
    np.testing.assert_array_equal(
        before["layer_1"]["ff1"]["kernel"], np.asarray(after["layer_1"]["ff1"]["kernel"]))
    assert not np.array_equal(  # trainable: moved
        before["layer_2"]["q"]["kernel"], np.asarray(after["layer_2"]["q"]["kernel"]))


def test_nrms_with_plm_tower(tiny_bert_dir):
    from newsreclib_tpu.data.synthetic import SyntheticConfig, make_batch
    from newsreclib_tpu.models.components.losses import cross_entropy_loss
    from newsreclib_tpu.models.general_rec import NRMS
    from newsreclib_tpu.training.state import create_train_state, make_optimizer
    from newsreclib_tpu.training.steps import make_train_step

    params, kwargs = load_hf_torch_weights(tiny_bert_dir)
    enc = TransformerEncoder(**kwargs)
    plm = PLMTextEncoder(encoder=enc, use_mhsa=True, num_heads=4, query_dim=16)

    cfg = SyntheticConfig(vocab_size=120, title_len=12)
    batch = make_batch(np.random.default_rng(3), batch_size=4, hist_len=5,
                       num_candidates=5, unique_news=16, cfg=cfg,
                       with_abstract=False, with_entities=False)
    model = NRMS(vocab_size=120, embed_dim=32, num_heads=4, query_dim=16,
                 text_encoder_module=plm)
    state = create_train_state(model, batch, jax.random.key(0), make_optimizer(1e-3))
    # splice ported weights into the initialized tree
    state.params["text_encoder_module"]["encoder"] = params

    scores, _ = model.apply({"params": state.params}, batch, deterministic=True)
    assert scores.shape == (4, 5)
    step = make_train_step(cross_entropy_loss, donate=False)
    state, metrics = step(state, batch)
    assert np.isfinite(float(metrics["loss"]))
