"""Component-level numerics parity against the REFERENCE torch modules
(`/root/reference/newsreclib`, imported directly — torch is installed).

These tests copy weights from the torch modules into the flax ones and
assert outputs agree to float tolerance, nailing the "AUC within noise"
claim at the component level (SURVEY.md §7 hard part: exact metric/loss
parity; VERDICT r1 item 7).

Semantics notes:
  * The reference runs softmax over padded positions unmasked; parity
    inputs therefore use NO padding so masked and unmasked coincide.
  * The reference NRMS *user* encoder (`encoders/user/nrms.py:33-41`) feeds
    a batch-first (B, H, D) tensor into `nn.MultiheadAttention` without
    permuting, so torch attends over dim 0 — the BATCH axis (a known quirk
    of several NRMS reimplementations).  The text encoder permutes
    correctly (`text.py:228-234`).  We therefore test the user encoder with
    the (H, B, D) layout that gives the intended over-history attention.
"""

import os
import sys

import numpy as np
import pytest

sys.path.insert(0, "/root/reference")

import torch

import jax
import jax.numpy as jnp


def _t(x):
    return torch.tensor(np.asarray(x))


# ---------------- AdditiveAttention ----------------


def test_additive_attention_matches_reference():
    from newsreclib.models.components.layers.attention import (
        AdditiveAttention as TorchAddAtt,
    )

    from newsreclib_tpu.models.components.attention import AdditiveAttention

    torch.manual_seed(0)
    D, Q, B, L = 24, 12, 5, 7
    ref = TorchAddAtt(input_dim=D, query_dim=Q).eval()
    x = np.random.default_rng(0).normal(size=(B, L, D)).astype(np.float32)
    with torch.no_grad():
        want = ref(_t(x)).numpy()

    ours = AdditiveAttention(query_dim=Q)
    params = {
        "proj": {
            "kernel": jnp.asarray(ref.linear.weight.detach().numpy().T),
            "bias": jnp.asarray(ref.linear.bias.detach().numpy()),
        },
        "query": jnp.asarray(ref.query.detach().numpy()),
    }
    got = ours.apply({"params": params}, jnp.asarray(x))  # no mask == unmasked ref
    np.testing.assert_allclose(np.asarray(got), want, atol=1e-5, rtol=1e-5)


# ---------------- MultiheadAttention layer ----------------


def _copy_mha(ref_mha, d):
    """torch nn.MultiheadAttention → our MultiHeadSelfAttention params."""
    return {
        "qkv": {
            "kernel": jnp.asarray(ref_mha.in_proj_weight.detach().numpy().T),
            "bias": jnp.asarray(ref_mha.in_proj_bias.detach().numpy()),
        },
        "out": {
            "kernel": jnp.asarray(ref_mha.out_proj.weight.detach().numpy().T),
            "bias": jnp.asarray(ref_mha.out_proj.bias.detach().numpy()),
        },
    }


def test_mhsa_matches_torch_multihead_attention():
    from newsreclib_tpu.models.components.attention import MultiHeadSelfAttention

    torch.manual_seed(1)
    D, H, B, L = 32, 4, 3, 9
    ref = torch.nn.MultiheadAttention(embed_dim=D, num_heads=H).eval()
    x = np.random.default_rng(1).normal(size=(B, L, D)).astype(np.float32)
    with torch.no_grad():
        want, _ = ref(_t(x).permute(1, 0, 2), _t(x).permute(1, 0, 2), _t(x).permute(1, 0, 2))
    want = want.permute(1, 0, 2).numpy()

    got = MultiHeadSelfAttention(num_heads=H).apply(
        {"params": _copy_mha(ref, D)}, jnp.asarray(x)
    )
    np.testing.assert_allclose(np.asarray(got), want, atol=1e-5, rtol=1e-4)


# ---------------- MHSAAddAtt text encoder ----------------


def _copy_mhsa_addatt(ref):
    return {
        "embedding": {"embedding": jnp.asarray(ref.embedding_layer.weight.detach().numpy())},
        "mhsa": _copy_mha(ref.multihead_attention, None),
        "add_att": {
            "proj": {
                "kernel": jnp.asarray(ref.additive_attention.linear.weight.detach().numpy().T),
                "bias": jnp.asarray(ref.additive_attention.linear.bias.detach().numpy()),
            },
            "query": jnp.asarray(ref.additive_attention.query.detach().numpy()),
        },
    }


def test_mhsa_addatt_text_encoder_matches_reference():
    from newsreclib.models.components.encoders.news.text import (
        MHSAAddAtt as TorchMHSAAddAtt,
    )

    from newsreclib_tpu.models.components.text import MHSAAddAtt

    torch.manual_seed(2)
    V, D, H, Q, U, L = 50, 24, 4, 16, 6, 8
    pre = np.random.default_rng(2).normal(size=(V, D)).astype(np.float32)
    pre[0] = 0.0  # padding row zero, matching the artifact contract
    ref = TorchMHSAAddAtt(
        pretrained_embeddings=pre, embed_dim=D, num_heads=H, query_dim=Q,
        dropout_probability=0.2,
    ).eval()

    tokens = np.random.default_rng(3).integers(1, V, size=(U, L)).astype(np.int32)
    with torch.no_grad():
        want = ref(_t(tokens.astype(np.int64))).numpy()

    ours = MHSAAddAtt(vocab_size=V, embed_dim=D, num_heads=H, query_dim=Q)
    got = ours.apply(
        {"params": _copy_mhsa_addatt(ref)}, jnp.asarray(tokens), deterministic=True
    )
    np.testing.assert_allclose(np.asarray(got), want, atol=1e-5, rtol=1e-4)


# ---------------- CE loss ----------------


def test_cross_entropy_matches_torch():
    from newsreclib_tpu.models.components.losses import cross_entropy_loss

    rng = np.random.default_rng(4)
    B, C = 8, 5
    scores = rng.normal(size=(B, C)).astype(np.float32)
    pos = rng.integers(0, C, size=B)
    labels = np.zeros((B, C), np.float32)
    labels[np.arange(B), pos] = 1.0
    want = torch.nn.functional.cross_entropy(_t(scores), _t(pos)).item()
    got = float(cross_entropy_loss(
        jnp.asarray(scores), jnp.asarray(labels),
        jnp.ones((B, C), bool), jnp.ones(B, bool),
    ))
    assert abs(got - want) < 1e-5


# ---------------- DotProduct scoring ----------------


def test_dot_product_scores_match_reference():
    from newsreclib.models.components.layers.click_predictor import DotProduct

    from newsreclib_tpu.models.components.click import dot_product_scores

    rng = np.random.default_rng(5)
    B, C, D = 4, 6, 16
    user = rng.normal(size=(B, D)).astype(np.float32)
    cand = rng.normal(size=(B, C, D)).astype(np.float32)
    with torch.no_grad():
        want = DotProduct()(_t(user)[:, None, :], _t(cand).permute(0, 2, 1)).numpy()
    got = dot_product_scores(jnp.asarray(user), jnp.asarray(cand))
    np.testing.assert_allclose(np.asarray(got), want, atol=1e-5, rtol=1e-5)


# ---------------- Full NRMS forward ----------------


def test_full_nrms_forward_matches_reference_composition():
    """Our NRMS forward vs the reference composition (text encoder → user
    encoder → dot product, ``nrms_module.py:230-253``) with copied weights,
    on full (pad-free) inputs."""
    from newsreclib.models.components.encoders.news.text import (
        MHSAAddAtt as TorchMHSAAddAtt,
    )
    from newsreclib.models.components.encoders.user.nrms import (
        UserEncoder as TorchUserEncoder,
    )

    from newsreclib_tpu.data.batch import NewsFeatures, RecBatch
    from newsreclib_tpu.models.general_rec import NRMS

    torch.manual_seed(6)
    V, D, Hh, Q = 60, 24, 4, 16
    B, HIST, C, L = 3, 5, 4, 8
    pre = np.random.default_rng(6).normal(size=(V, D)).astype(np.float32)
    pre[0] = 0.0
    t_text = TorchMHSAAddAtt(pre, D, Hh, Q, 0.2).eval()
    t_user = TorchUserEncoder(news_embed_dim=D, num_heads=Hh, query_dim=Q).eval()

    rng = np.random.default_rng(7)
    U = 1 + B * (HIST + C)  # unique table: row 0 pad + one row per slot
    tokens = np.zeros((U, L), np.int32)
    tokens[1:] = rng.integers(1, V, size=(U - 1, L))
    hist_idx = np.arange(1, 1 + B * HIST).reshape(B, HIST).astype(np.int32)
    cand_idx = (1 + B * HIST + np.arange(B * C).reshape(B, C)).astype(np.int32)

    with torch.no_grad():
        vecs = t_text(_t(tokens.astype(np.int64)))  # (U, D)
        hist_v = vecs[_t(hist_idx.astype(np.int64))]  # (B, HIST, D)
        cand_v = vecs[_t(cand_idx.astype(np.int64))]
        # intended over-history attention → feed (HIST, B, D); the reference
        # module passes batch-first unpermuted (see module docstring note)
        u, _ = t_user.multihead_attention(
            hist_v.permute(1, 0, 2), hist_v.permute(1, 0, 2), hist_v.permute(1, 0, 2)
        )
        u = t_user.additive_attention(u.permute(1, 0, 2))  # (B, D)
        want = torch.bmm(u.unsqueeze(1), cand_v.permute(0, 2, 1)).squeeze(1).numpy()

    model = NRMS(vocab_size=V, embed_dim=D, num_heads=Hh, query_dim=Q)
    params = {
        "news_encoder": _copy_mhsa_addatt(t_text),
        "user_encoder": {
            "mhsa": _copy_mha(t_user.multihead_attention, D),
            "add_att": {
                "proj": {
                    "kernel": jnp.asarray(
                        t_user.additive_attention.linear.weight.detach().numpy().T
                    ),
                    "bias": jnp.asarray(
                        t_user.additive_attention.linear.bias.detach().numpy()
                    ),
                },
                "query": jnp.asarray(t_user.additive_attention.query.detach().numpy()),
            },
        },
    }
    batch = RecBatch(
        news=NewsFeatures(title=tokens, title_mask=tokens != 0),
        hist_idx=hist_idx, hist_mask=np.ones((B, HIST), bool),
        cand_idx=cand_idx, cand_mask=np.ones((B, C), bool),
        labels=np.zeros((B, C), np.float32), user_idx=np.zeros(B, np.int32),
        impression_valid=np.ones(B, bool),
    )
    got, _ = model.apply({"params": params}, batch, deterministic=True)
    np.testing.assert_allclose(np.asarray(got), want, atol=1e-4, rtol=1e-4)
