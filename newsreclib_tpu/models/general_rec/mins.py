"""MINS — multi-interest news sequence modelling.

Reference analog: ``newsreclib/models/general_rec/mins_module.py`` (558
LoC): MHSAAddAtt text + category concat news encoder (same as LSTUR's
composition), user encoder = MHSA → 6-channel GRU → additive attention.
Defaults from ``configs/model/mins.yaml``.
"""

from __future__ import annotations

from typing import Optional, Sequence

import flax.linen as nn
import numpy as np

import jax.numpy as jnp

from newsreclib_tpu.data.batch import NewsFeatures, RecBatch
from newsreclib_tpu.models.base import (
    ModelOutput,
    encode_all_news,
    gather_news,
    late_fusion_user,
)
from newsreclib_tpu.models.components.category import LinearEncoder
from newsreclib_tpu.models.components.click import dot_product_scores
from newsreclib_tpu.models.components.news import NewsEncoder
from newsreclib_tpu.models.components.text import MHSAAddAtt
from newsreclib_tpu.models.components.user import MINSUserEncoder


class MINS(nn.Module):
    vocab_size: int
    num_categories: int = 19
    attributes2encode: Sequence[str] = ("title", "abstract", "category")
    text_embed_dim: int = 300
    categ_embed_dim: int = 100
    num_heads: int = 15
    query_dim: int = 200
    dropout: float = 0.2
    pack_titles: int = 0  # segment-ID packing (MHSAAddAtt.pack_to)
    num_filters: Optional[int] = None  # defaults to the news dim (= t_dim)
    num_gru_channels: int = 6
    late_fusion: bool = False
    pretrained_embeddings: Optional[np.ndarray] = None
    # pluggable text tower (reference use_plm path, ``mins_module.py``)
    text_encoder_module: Optional[nn.Module] = None
    text_encoder_dim: Optional[int] = None

    def setup(self):
        text_encoder = self.text_encoder_module or MHSAAddAtt(
            vocab_size=self.vocab_size,
            embed_dim=self.text_embed_dim,
            num_heads=self.num_heads,
            query_dim=self.query_dim,
            dropout=self.dropout,
            pretrained=self.pretrained_embeddings,
            pack_to=self.pack_titles,
        )
        t_dim = (
            self.text_encoder_dim
            if self.text_encoder_module is not None
            else self.text_embed_dim
        )
        # reference MINS projects categories to the text dim and combines all
        # attribute vectors via additive attention (news dim stays t_dim) —
        # ``mins_module.py:159-183`` (linear_transform -> text_embed_dim,
        # combine_type="add_att").  Round-3 fix: this previously concatenated
        # (news dim 700), which cannot feed the canonical 6-channel GRU.
        category_encoder = LinearEncoder(
            num_categories=self.num_categories,
            embed_dim=self.categ_embed_dim,
            use_dropout=False,
            linear_transform=True,
            output_dim=t_dim,
        )
        self.news_encoder = NewsEncoder(
            attributes2encode=self.attributes2encode,
            text_encoder=text_encoder,
            category_encoder=category_encoder,
            combine_type="add_att",
            query_dim=self.query_dim,
        )
        if not self.late_fusion:
            self.user_encoder = MINSUserEncoder(
                news_embed_dim=t_dim,
                query_dim=self.query_dim,
                # the reference requires num_filters == news dim for the
                # dot-product head (canonical config: 300/300); default to it
                num_filters=self.num_filters or t_dim,
                num_gru_channels=self.num_gru_channels,
            )

    def encode_news(self, news: NewsFeatures, deterministic: bool = True) -> jnp.ndarray:
        return self.news_encoder(news, deterministic=deterministic)

    def score_with_vectors(
        self, batch: RecBatch, news_vecs: jnp.ndarray, deterministic: bool = True
    ) -> jnp.ndarray:
        hist = gather_news(news_vecs, batch.hist_idx)
        cand = gather_news(news_vecs, batch.cand_idx)
        if self.late_fusion:
            user = late_fusion_user(hist, batch.hist_mask)
        else:
            user = self.user_encoder(hist, batch.hist_mask, deterministic)
        return dot_product_scores(user, cand)

    def __call__(self, batch: RecBatch, deterministic: bool = True) -> ModelOutput:
        news_vecs = encode_all_news(self.encode_news, batch, deterministic)
        return self.score_with_vectors(batch, news_vecs, deterministic), {}
