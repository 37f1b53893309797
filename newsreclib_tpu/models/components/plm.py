"""PLM text tower: BERT/RoBERTa-architecture encoder with HF weight porting.

Reference analog: ``encoders/news/text.py:15-109`` (``PLM``): HF ``AutoModel``
with per-layer freezing (``text.py:70-73``), CLS pooling or a PLM-NR
MHSA+additive-attention head, optional dim reduction.

TPU-native design: the transformer is implemented directly in linen (static
shapes, bf16-friendly, fused QKV) instead of wrapping torch; pretrained
weights are PORTED from a HuggingFace torch checkpoint
(``load_hf_torch_weights``) — this keeps the compute path pure JAX/XLA.
Layer freezing maps to ``jax.lax.stop_gradient`` on the frozen layers'
params, the functional equivalent of ``requires_grad=False``.
"""

from __future__ import annotations

from typing import Any, Dict, Optional, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from newsreclib_tpu.models.components.attention import (
    AdditiveAttention,
    MultiHeadSelfAttention,
)

_MASK_MIN = -1e30


class TransformerLayer(nn.Module):
    """Post-LN BERT encoder layer."""

    hidden_dim: int
    num_heads: int
    intermediate_dim: int
    dropout: float = 0.1
    layer_norm_eps: float = 1e-12

    @nn.compact
    def __call__(self, x, mask=None, deterministic: bool = True, pair_mask=None):
        h = self.hidden_dim
        head_dim = h // self.num_heads
        q = nn.Dense(h, name="q")(x)
        k = nn.Dense(h, name="k")(x)
        v = nn.Dense(h, name="v")(x)

        def split(t):
            t = t.reshape(t.shape[:-1] + (self.num_heads, head_dim))
            return jnp.swapaxes(t, -2, -3)

        logits = jnp.einsum("...ld,...md->...lm", split(q), split(k)) / jnp.sqrt(
            jnp.asarray(head_dim, x.dtype)
        )
        if mask is not None:
            logits = jnp.where(mask[..., None, None, :], logits, _MASK_MIN)
        if pair_mask is not None:
            # segment-ID packing: queries see only their own article's keys
            # (block-diagonal), see PLMTextEncoder.pack_to
            logits = jnp.where(pair_mask[:, None, :, :], logits, _MASK_MIN)
        att = nn.softmax(logits, axis=-1)
        att = nn.Dropout(self.dropout)(att, deterministic=deterministic)
        ctx = jnp.einsum("...lm,...md->...ld", att, split(v))
        ctx = jnp.swapaxes(ctx, -2, -3).reshape(x.shape[:-1] + (h,))
        ctx = nn.Dense(h, name="attn_out")(ctx)
        ctx = nn.Dropout(self.dropout)(ctx, deterministic=deterministic)
        x = nn.LayerNorm(epsilon=self.layer_norm_eps, name="attn_ln")(x + ctx)

        ff = nn.Dense(self.intermediate_dim, name="ff1")(x)
        ff = nn.gelu(ff, approximate=False)
        ff = nn.Dense(h, name="ff2")(ff)
        ff = nn.Dropout(self.dropout)(ff, deterministic=deterministic)
        return nn.LayerNorm(epsilon=self.layer_norm_eps, name="ff_ln")(x + ff)


class TransformerEncoder(nn.Module):
    """BERT/RoBERTa-style encoder: embeddings + L layers.

    ``frozen_layers``: indices whose params get ``stop_gradient`` (reference
    ``text.py:70-73``).
    """

    vocab_size: int
    hidden_dim: int = 768
    num_layers: int = 12
    num_heads: int = 12
    intermediate_dim: int = 3072
    max_position: int = 512
    type_vocab_size: int = 2
    dropout: float = 0.1
    layer_norm_eps: float = 1e-12
    pad_token_id: int = 0
    position_offset: int = 0  # RoBERTa uses 2 (pad_token_id + 1)
    # optional per-layer rematerialization.  Measured on the v5e (round 4):
    # XLA:TPU's own scheduling already bounds the backward working set at
    # news-encoder shapes — temp HBM is IDENTICAL with and without remat
    # (0.17G at U=512, 0.85G at U=2048, 1.90G at U=4096, L<=96) while remat
    # costs +29% step time (191.8 vs 148.9 ms).  Default off; enable only
    # for shapes that actually OOM (then verify with benchmarks/hbm_probe).
    remat: bool = False

    @nn.compact
    def __call__(self, tokens, mask=None, deterministic: bool = True,
                 pair_mask=None, positions=None):
        if mask is None:
            mask = tokens != self.pad_token_id
        b, l = tokens.shape
        word = nn.Embed(self.vocab_size, self.hidden_dim, name="word_embeddings")(tokens)
        if positions is None:
            positions = jnp.arange(l) + self.position_offset
        pos = nn.Embed(self.max_position, self.hidden_dim, name="position_embeddings")(
            positions
        )[None, :, :]
        typ = nn.Embed(self.type_vocab_size, self.hidden_dim, name="token_type_embeddings")(
            jnp.zeros_like(tokens)
        )
        x = nn.LayerNorm(epsilon=self.layer_norm_eps, name="emb_ln")(word + pos + typ)
        x = nn.Dropout(self.dropout)(x, deterministic=deterministic)

        layer_cls = (
            nn.remat(TransformerLayer, static_argnums=(3,))
            if self.remat
            else TransformerLayer
        )
        for i in range(self.num_layers):
            x = layer_cls(
                hidden_dim=self.hidden_dim,
                num_heads=self.num_heads,
                intermediate_dim=self.intermediate_dim,
                dropout=self.dropout,
                layer_norm_eps=self.layer_norm_eps,
                name=f"layer_{i}",
            )(x, mask, deterministic, pair_mask)
        return x


def plm_freeze_labels(params: Dict, frozen_layers: Sequence[int],
                      freeze_embeddings: bool = False) -> Dict:
    """Label pytree for optimizer-level layer freezing.

    Reference ``text.py:70-73`` sets ``requires_grad=False`` per layer index;
    the optax equivalent is ``multi_transform`` with ``set_to_zero`` on
    'freeze'-labeled params (see ``make_optimizer(freeze_labels=...)``).
    Any param whose path contains ``layer_<i>`` for i in frozen_layers (or
    the embedding tables when ``freeze_embeddings``) is labeled 'freeze'.
    """
    frozen_names = {f"layer_{i}" for i in frozen_layers}
    emb_names = {"word_embeddings", "position_embeddings", "token_type_embeddings", "emb_ln"}

    def label(path, _):
        keys = {getattr(p, "key", None) for p in path}
        if keys & frozen_names:
            return "freeze"
        if freeze_embeddings and keys & emb_names:
            return "freeze"
        return "train"

    return jax.tree_util.tree_map_with_path(label, params)


class PLMTextEncoder(nn.Module):
    """The reference's ``PLM`` wrapper: encoder + (PLM-NR MHSA+AddAtt head |
    CLS pooling) + optional dim reduction."""

    encoder: TransformerEncoder
    use_mhsa: bool = True
    num_heads: int = 16
    query_dim: int = 200
    apply_reduce_dim: bool = False
    reduced_embed_dim: Optional[int] = None
    dropout: float = 0.2
    # segment-ID article packing (round 5, VERDICT r4 task 3): when the
    # padded title width L divides pack_to, P = pack_to//L articles are
    # packed into ONE transformer sequence of P*L tokens with a
    # block-diagonal attention mask and per-article position ids.  The
    # length-split short segments (L=32 majority) get MXU-shaped attention
    # (128 rows vs 32) and P× fewer per-layer dispatches.  Numerically
    # exact: softmax rows see only their own article's keys; positions
    # restart per article; pooling runs on the unpacked (U, L, D) view.
    # Same machinery as MHSAAddAtt.pack_to (components/text.py, proven
    # exact in round 4).  0 disables.  Requires U % P == 0.
    pack_to: int = 0

    @nn.compact
    def __call__(self, tokens, mask=None, deterministic: bool = True):
        if mask is None:
            mask = tokens != self.encoder.pad_token_id
        u, l = tokens.shape
        p = self.pack_to // l if self.pack_to else 0
        if p >= 2 and u % p == 0:
            g, pl = u // p, p * l
            seg = jnp.arange(pl) // l
            pair = (seg[:, None] == seg[None, :])[None]  # (1, PL, PL)
            positions = jnp.arange(pl) % l + self.encoder.position_offset
            hidden = self.encoder(
                tokens.reshape(g, pl), mask.reshape(g, pl), deterministic,
                pair_mask=pair, positions=positions,
            )
            hidden = hidden.reshape(u, l, hidden.shape[-1])
        else:
            if self.pack_to and p >= 2:
                # p < 2 (title width >= pack_to) is a structural no-op, not
                # a regression — only a broken divisibility/mask invariant
                # deserves a warning (ADVICE r4)
                import logging

                logging.getLogger("newsreclib_tpu").warning(
                    "PLMTextEncoder pack_to=%d fell back to unpacked for "
                    "shape U=%d L=%d", self.pack_to, u, l,
                )
            hidden = self.encoder(tokens, mask, deterministic)
        if self.use_mhsa:
            x = nn.Dropout(self.dropout)(hidden, deterministic=deterministic)
            x = MultiHeadSelfAttention(self.num_heads, name="mhsa")(x, mask)
            x = nn.Dropout(self.dropout)(x, deterministic=deterministic)
            out = AdditiveAttention(self.query_dim, name="add_att")(x, mask)
        else:
            out = hidden[:, 0, :]  # CLS
        if self.apply_reduce_dim:
            out = nn.Dense(self.reduced_embed_dim, name="reduce_dim")(out)
            out = nn.Dropout(self.dropout)(out, deterministic=deterministic)
        return out


# ---------------- HF weight porting ----------------


def encoder_config_from_hf(hf_config) -> Dict[str, Any]:
    """Map a HF Bert/Roberta config to TransformerEncoder kwargs."""
    is_roberta = getattr(hf_config, "model_type", "bert") == "roberta"
    return dict(
        vocab_size=hf_config.vocab_size,
        hidden_dim=hf_config.hidden_size,
        num_layers=hf_config.num_hidden_layers,
        num_heads=hf_config.num_attention_heads,
        intermediate_dim=hf_config.intermediate_size,
        max_position=hf_config.max_position_embeddings,
        type_vocab_size=hf_config.type_vocab_size,
        dropout=hf_config.hidden_dropout_prob,
        layer_norm_eps=hf_config.layer_norm_eps,
        pad_token_id=hf_config.pad_token_id or 0,
        position_offset=(hf_config.pad_token_id + 1) if is_roberta else 0,
    )


def save_as_hf_bert(params: Dict, encoder_kwargs: Dict[str, Any], out_dir: str) -> str:
    """Inverse of ``load_hf_torch_weights``: write TransformerEncoder params
    as a HF-format torch BertModel checkpoint directory.

    Round-5 use: offline MLM pretraining (benchmarks/mlm_pretrain.py) saves
    its tower this way so fine-tuning exercises the REAL porting + freezing
    path (reference ``text.py:67-73`` loads ``AutoModel.from_pretrained``)
    with a genuinely pretrained init — the closest offline proxy to the
    roberta-base configs."""
    import torch
    from transformers import BertConfig, BertModel

    cfg = BertConfig(
        vocab_size=encoder_kwargs["vocab_size"],
        hidden_size=encoder_kwargs.get("hidden_dim", 768),
        num_hidden_layers=encoder_kwargs.get("num_layers", 12),
        num_attention_heads=encoder_kwargs.get("num_heads", 12),
        intermediate_size=encoder_kwargs.get("intermediate_dim", 3072),
        max_position_embeddings=encoder_kwargs.get("max_position", 512),
        type_vocab_size=encoder_kwargs.get("type_vocab_size", 2),
        hidden_dropout_prob=encoder_kwargs.get("dropout", 0.1),
        layer_norm_eps=encoder_kwargs.get("layer_norm_eps", 1e-12),
        pad_token_id=encoder_kwargs.get("pad_token_id", 0),
    )
    model = BertModel(cfg)
    p = jax.tree.map(np.asarray, params)

    def T(x):  # flax (in,out) → torch (out,in)
        return torch.from_numpy(np.ascontiguousarray(np.asarray(x).T))

    def A(x):
        return torch.from_numpy(np.ascontiguousarray(np.asarray(x)))

    sd = {
        "embeddings.word_embeddings.weight": A(p["word_embeddings"]["embedding"]),
        "embeddings.position_embeddings.weight": A(p["position_embeddings"]["embedding"]),
        "embeddings.token_type_embeddings.weight": A(p["token_type_embeddings"]["embedding"]),
        "embeddings.LayerNorm.weight": A(p["emb_ln"]["scale"]),
        "embeddings.LayerNorm.bias": A(p["emb_ln"]["bias"]),
    }
    for i in range(cfg.num_hidden_layers):
        lp, pre = p[f"layer_{i}"], f"encoder.layer.{i}."
        sd.update({
            pre + "attention.self.query.weight": T(lp["q"]["kernel"]),
            pre + "attention.self.query.bias": A(lp["q"]["bias"]),
            pre + "attention.self.key.weight": T(lp["k"]["kernel"]),
            pre + "attention.self.key.bias": A(lp["k"]["bias"]),
            pre + "attention.self.value.weight": T(lp["v"]["kernel"]),
            pre + "attention.self.value.bias": A(lp["v"]["bias"]),
            pre + "attention.output.dense.weight": T(lp["attn_out"]["kernel"]),
            pre + "attention.output.dense.bias": A(lp["attn_out"]["bias"]),
            pre + "attention.output.LayerNorm.weight": A(lp["attn_ln"]["scale"]),
            pre + "attention.output.LayerNorm.bias": A(lp["attn_ln"]["bias"]),
            pre + "intermediate.dense.weight": T(lp["ff1"]["kernel"]),
            pre + "intermediate.dense.bias": A(lp["ff1"]["bias"]),
            pre + "output.dense.weight": T(lp["ff2"]["kernel"]),
            pre + "output.dense.bias": A(lp["ff2"]["bias"]),
            pre + "output.LayerNorm.weight": A(lp["ff_ln"]["scale"]),
            pre + "output.LayerNorm.bias": A(lp["ff_ln"]["bias"]),
        })
    missing, unexpected = model.load_state_dict(sd, strict=False)
    # pooler.* stays at its random init (our encoder has no pooler; the
    # porting path never reads it back)
    assert not unexpected, unexpected
    assert all(k.startswith("pooler.") for k in missing), missing
    model.save_pretrained(out_dir, safe_serialization=False)
    return out_dir


def load_hf_torch_weights(model_name_or_path: str) -> Tuple[Dict, Dict[str, Any]]:
    """Load a HF torch checkpoint and port it to TransformerEncoder params.

    Returns (params_dict, encoder_kwargs).  Works offline with a local
    checkpoint directory; network names need the HF hub (gated in this
    environment).
    """
    import torch
    from transformers import AutoConfig, AutoModel

    model = AutoModel.from_pretrained(model_name_or_path)
    cfg = AutoConfig.from_pretrained(model_name_or_path)
    sd = {k: v.detach().numpy() for k, v in model.state_dict().items()}
    kwargs = encoder_config_from_hf(cfg)

    def t(name):  # dense weights transpose: torch (out,in) → flax (in,out)
        return np.ascontiguousarray(sd[name].T)

    p: Dict[str, Any] = {
        "word_embeddings": {"embedding": sd["embeddings.word_embeddings.weight"]},
        "position_embeddings": {"embedding": sd["embeddings.position_embeddings.weight"]},
        "token_type_embeddings": {"embedding": sd["embeddings.token_type_embeddings.weight"]},
        "emb_ln": {
            "scale": sd["embeddings.LayerNorm.weight"],
            "bias": sd["embeddings.LayerNorm.bias"],
        },
    }
    for i in range(kwargs["num_layers"]):
        pre = f"encoder.layer.{i}."
        p[f"layer_{i}"] = {
            "q": {"kernel": t(pre + "attention.self.query.weight"),
                  "bias": sd[pre + "attention.self.query.bias"]},
            "k": {"kernel": t(pre + "attention.self.key.weight"),
                  "bias": sd[pre + "attention.self.key.bias"]},
            "v": {"kernel": t(pre + "attention.self.value.weight"),
                  "bias": sd[pre + "attention.self.value.bias"]},
            "attn_out": {"kernel": t(pre + "attention.output.dense.weight"),
                         "bias": sd[pre + "attention.output.dense.bias"]},
            "attn_ln": {"scale": sd[pre + "attention.output.LayerNorm.weight"],
                        "bias": sd[pre + "attention.output.LayerNorm.bias"]},
            "ff1": {"kernel": t(pre + "intermediate.dense.weight"),
                    "bias": sd[pre + "intermediate.dense.bias"]},
            "ff2": {"kernel": t(pre + "output.dense.weight"),
                    "bias": sd[pre + "output.dense.bias"]},
            "ff_ln": {"scale": sd[pre + "output.LayerNorm.weight"],
                      "bias": sd[pre + "output.LayerNorm.bias"]},
        }
    return jax.tree.map(jnp.asarray, p), kwargs
