"""User encoders: per-click news vectors → user representation.

Reference analogs (``newsreclib/models/components/encoders/user/``):
NRMS ``nrms.py:24-41``; NAML ``naml.py:22-31``; LSTUR ``lstur.py:28-86``;
NPA ``npa.py:29-58``; CAUM ``caum.py:35-125``; MINS ``mins.py:27-82``;
CenNewsRec ``cen_news_rec.py:32-93``; DKN ``dkn.py:22-107``.

TPU-native notes:
  * All encoders take dense left-aligned ``(B, H, D)`` histories with boolean
    masks — no ragged packing.
  * CAUM's per-candidate Python loop (the reference hot loop, SURVEY.md §3)
    is replaced by a candidate-batched dense formulation: one fused pass over
    ``(B, C, H, D)``.
  * GRUs use ``MaskedGRU`` (lax.scan) instead of pack_padded_sequence.
"""

from __future__ import annotations

from typing import Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from newsreclib_tpu.models.components.attention import (
    AdditiveAttention,
    DenseAttention,
    MultiHeadSelfAttention,
    PersonalizedAttention,
    masked_softmax,
)
from newsreclib_tpu.models.components.projection import UserPreferenceQueryProjection
from newsreclib_tpu.models.components.rnn import MaskedGRU


class NRMSUserEncoder(nn.Module):
    """MHSA over history + additive attention."""

    num_heads: int = 15
    query_dim: int = 200

    @nn.compact
    def __call__(
        self, hist: jnp.ndarray, mask: Optional[jnp.ndarray] = None, deterministic: bool = True
    ) -> jnp.ndarray:
        x = MultiHeadSelfAttention(self.num_heads, name="mhsa")(hist, mask)
        return AdditiveAttention(self.query_dim, name="add_att")(x, mask)


class NAMLUserEncoder(nn.Module):
    """Additive attention only."""

    query_dim: int = 200

    @nn.compact
    def __call__(
        self, hist: jnp.ndarray, mask: Optional[jnp.ndarray] = None, deterministic: bool = True
    ) -> jnp.ndarray:
        return AdditiveAttention(self.query_dim, name="add_att")(hist, mask)


class LSTURUserEncoder(nn.Module):
    """Long-term user-ID embedding + GRU over history; ``ini`` initializes
    the GRU with the long-term vector, ``con`` concatenates them.

    The reference's ``Dropout2d`` on the user embedding zeroes the WHOLE
    long-term vector with probability p (user masking) — reproduced here with
    a per-row bernoulli mask.
    """

    num_users: int
    input_dim: int = 400
    user_masking_probability: float = 0.5
    long_short_term_method: str = "ini"  # "ini" | "con"

    @nn.compact
    def __call__(
        self,
        user_idx: jnp.ndarray,  # (B,)
        hist: jnp.ndarray,  # (B, H, D)
        mask: Optional[jnp.ndarray] = None,
        deterministic: bool = True,
    ) -> jnp.ndarray:
        assert self.long_short_term_method in ("ini", "con")
        lt_dim = self.input_dim if self.long_short_term_method == "ini" else self.input_dim // 2
        table = self.param(
            "long_term_user_embedding",
            nn.initializers.normal(stddev=0.02),
            (self.num_users, lt_dim),
        )
        lt = jnp.take(table, user_idx, axis=0) * (user_idx != 0)[:, None]
        if not deterministic and self.user_masking_probability > 0.0:
            rng = self.make_rng("dropout")
            keep = (
                jax.random.bernoulli(
                    rng, 1.0 - self.user_masking_probability, (lt.shape[0], 1)
                )
            ).astype(lt.dtype)
            # torch Dropout2d scales kept values by 1/(1-p)
            lt = lt * keep / (1.0 - self.user_masking_probability)
        gru = MaskedGRU(lt_dim, name="gru")
        if self.long_short_term_method == "ini":
            return gru(hist, mask, init_h=lt)
        st = gru(hist, mask)
        return jnp.concatenate([st, lt], axis=-1)


class NPAUserEncoder(nn.Module):
    """Personalized attention over history, query projected from user vector."""

    preference_query_dim: int = 200
    num_filters: int = 400
    dropout: float = 0.2

    @nn.compact
    def __call__(
        self,
        hist: jnp.ndarray,  # (B, H, F)
        projected_users: jnp.ndarray,  # (B, Du)
        mask: Optional[jnp.ndarray] = None,
        deterministic: bool = True,
    ) -> jnp.ndarray:
        query = UserPreferenceQueryProjection(
            self.preference_query_dim, self.dropout, name="news_query_proj"
        )(projected_users, deterministic)
        return PersonalizedAttention(self.num_filters, name="pers_att")(query, hist, mask)


class CAUMUserEncoder(nn.Module):
    """Candidate-aware user encoder (CAUM) — returns SCORES directly.

    hist (B, H, D), cand (B, C, D) → scores (B, C).

    The reference calls this per candidate in a Python loop
    (``caum_module.py`` forward); here the candidate axis is folded into the
    batch: candi-CNN (neighbor concat), candi-self-attention, and dense
    attention all operate on ``(B, C, H, ·)`` tensors in one pass.
    """

    news_embed_dim: int = 400
    num_filters: int = 400
    dense_att_hidden_dim1: int = 400
    dense_att_hidden_dim2: int = 256
    user_vector_dim: int = 400
    num_heads: int = 4
    dropout: float = 0.2

    @nn.compact
    def __call__(
        self,
        hist: jnp.ndarray,
        cand: jnp.ndarray,
        mask: Optional[jnp.ndarray] = None,
        deterministic: bool = True,
    ) -> jnp.ndarray:
        b, h, d = hist.shape
        c = cand.shape[1]
        drop = lambda x: nn.Dropout(self.dropout)(x, deterministic=deterministic)
        cand = drop(cand)
        hist = drop(hist)

        hist_e = jnp.broadcast_to(hist[:, None], (b, c, h, d))
        cand_e = jnp.broadcast_to(cand[:, :, None, :], (b, c, h, d))

        # candi-cnn: neighbor window (circular, matching reference roll)
        left = jnp.roll(hist, shift=1, axis=1)
        right = jnp.roll(hist, shift=-1, axis=1)
        left_e = jnp.broadcast_to(left[:, None], (b, c, h, d))
        right_e = jnp.broadcast_to(right[:, None], (b, c, h, d))
        hist_cnn = nn.Dense(self.num_filters, name="linear1")(
            jnp.concatenate([left_e, hist_e, right_e, cand_e], axis=-1)
        )

        # candi-selfatt
        hist_cat = nn.Dense(self.user_vector_dim, name="linear2")(
            jnp.concatenate([cand_e, hist_e], axis=-1)
        )
        key_mask = None if mask is None else jnp.broadcast_to(mask[:, None], (b, c, h))
        hist_self = MultiHeadSelfAttention(self.num_heads, name="mhsa")(hist_cat, key_mask)

        hist_all = nn.Dense(self.user_vector_dim, name="linear3")(
            drop(jnp.concatenate([hist_cnn, hist_self], axis=-1))
        )

        # candi-att
        att_logits = DenseAttention(
            self.dense_att_hidden_dim1, self.dense_att_hidden_dim2, name="dense_att"
        )(jnp.concatenate([hist_all, cand_e], axis=-1))[..., 0]
        weights = masked_softmax(att_logits, key_mask)  # (B, C, H)
        user_vec = jnp.einsum("bch,bchd->bcd", weights, hist_all)
        return jnp.einsum("bcd,bcd->bc", cand, user_vec)


class MINSUserEncoder(nn.Module):
    """MHSA → multi-channel GRU (weight-shared across channels, matching the
    reference's ModuleList of one GRU) → additive attention."""

    news_embed_dim: int = 400
    query_dim: int = 200
    num_filters: int = 400
    num_gru_channels: int = 4

    @nn.compact
    def __call__(
        self, hist: jnp.ndarray, mask: Optional[jnp.ndarray] = None, deterministic: bool = True
    ) -> jnp.ndarray:
        assert self.num_filters % self.num_gru_channels == 0
        x = MultiHeadSelfAttention(self.num_gru_channels, name="mhsa")(hist, mask)
        chunks = jnp.split(x, self.num_gru_channels, axis=-1)
        gru = MaskedGRU(self.num_filters // self.num_gru_channels, name="gru")
        channels = [gru(chunk, mask) for chunk in chunks]  # weight sharing
        multi = jnp.concatenate(channels, axis=-1)[:, None, :]  # (B, 1, D)
        return AdditiveAttention(self.query_dim, name="add_att")(multi)


class CenNewsRecUserEncoder(nn.Module):
    """Long-term (MHSA+AddAtt) + short-term (GRU over most recent clicks)
    fused by a final additive attention."""

    num_filters: int = 300
    num_heads: int = 15
    query_dim: int = 200
    gru_hidden_dim: int = 300
    num_recent_news: int = 20
    dropout: float = 0.2

    @nn.compact
    def __call__(
        self, hist: jnp.ndarray, mask: Optional[jnp.ndarray] = None, deterministic: bool = True
    ) -> jnp.ndarray:
        x = MultiHeadSelfAttention(self.num_heads, name="mhsa")(hist, mask)
        x = nn.Dropout(self.dropout)(x, deterministic=deterministic)
        longterm = AdditiveAttention(self.query_dim, name="add_att")(x, mask)

        # short-term: last num_recent_news *valid* clicks. With left-aligned
        # masks, taking the GRU's last-valid carry over the full history
        # window restricted to the most recent positions matches the
        # reference's tail slice.
        recent = hist[:, -self.num_recent_news :, :]
        recent_mask = None if mask is None else mask[:, -self.num_recent_news :]
        shortterm = MaskedGRU(self.gru_hidden_dim, name="gru")(recent, recent_mask)

        both = jnp.stack([shortterm, longterm], axis=1)
        return AdditiveAttention(self.query_dim, name="final_add_att")(both)


class DKNUserEncoder(nn.Module):
    """Candidate-attentive history pooling (DKN).

    hist (B, H, D), cand (B, C, D) → per-candidate user vectors (B, C, D).
    """

    hidden_dim: int = 100

    @nn.compact
    def __call__(
        self,
        hist: jnp.ndarray,
        cand: jnp.ndarray,
        hist_mask: Optional[jnp.ndarray] = None,
        deterministic: bool = True,
    ) -> jnp.ndarray:
        b, h, d = hist.shape
        c = cand.shape[1]
        cand_e = jnp.broadcast_to(cand[:, :, None, :], (b, c, h, d))
        hist_e = jnp.broadcast_to(hist[:, None], (b, c, h, d))
        x = jnp.concatenate([cand_e, hist_e], axis=-1)
        # reference dnn: two stacked Linears with NO activation (dkn.py:42-46)
        logits = nn.Dense(1, name="fc2")(nn.Dense(self.hidden_dim, name="fc1")(x))[..., 0]
        key_mask = None if hist_mask is None else jnp.broadcast_to(hist_mask[:, None], (b, c, h))
        weights = masked_softmax(logits, key_mask)  # (B, C, H)
        return jnp.einsum("bch,bhd->bcd", weights, hist)
