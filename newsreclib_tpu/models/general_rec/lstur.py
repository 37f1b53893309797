"""LSTUR — long- and short-term user representations.

Reference analog: ``newsreclib/models/general_rec/lstur_module.py`` (583
LoC): CNNAddAtt text + category embeddings combined by concat
(``combine_type="concat"``), user encoder = user-ID long-term embedding with
whole-vector masking dropout + GRU over history (``encoders/user/lstur.py``).
Defaults from ``configs/model/lstur.yaml`` (num_users 45214, masking 0.5,
method "ini").
"""

from __future__ import annotations

from typing import Optional, Sequence

import flax.linen as nn
import jax.numpy as jnp
import numpy as np

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
from newsreclib_tpu.models.components.text import CNNAddAtt
from newsreclib_tpu.models.components.user import LSTURUserEncoder


class LSTUR(nn.Module):
    vocab_size: int
    num_users: int
    num_categories: int = 19
    attributes2encode: Sequence[str] = ("title", "abstract", "category")
    text_embed_dim: int = 300
    categ_embed_dim: int = 100
    num_filters: int = 300
    window_size: int = 3
    query_dim: int = 200
    dropout: float = 0.2
    user_masking_probability: float = 0.5
    long_short_term_method: str = "ini"
    late_fusion: bool = False
    pretrained_embeddings: Optional[np.ndarray] = None
    # pluggable text tower (reference use_plm path, ``lstur_module.py``)
    text_encoder_module: Optional[nn.Module] = None
    text_encoder_dim: Optional[int] = None

    def setup(self):
        text_encoder = self.text_encoder_module or CNNAddAtt(
            vocab_size=self.vocab_size,
            embed_dim=self.text_embed_dim,
            num_filters=self.num_filters,
            window_size=self.window_size,
            query_dim=self.query_dim,
            dropout=self.dropout,
            pretrained=self.pretrained_embeddings,
        )
        category_encoder = LinearEncoder(
            num_categories=self.num_categories,
            embed_dim=self.categ_embed_dim,
            use_dropout=False,
            linear_transform=False,
        )
        self.news_encoder = NewsEncoder(
            attributes2encode=self.attributes2encode,
            text_encoder=text_encoder,
            category_encoder=category_encoder,
            combine_type="concat",
        )
        if not self.late_fusion:
            t_dim = (
                self.text_encoder_dim
                if self.text_encoder_module is not None
                else self.num_filters
            )
            news_dim = t_dim + self.categ_embed_dim * (
                ("category" in self.attributes2encode)
                + ("subcategory" in self.attributes2encode)
            )
            if "abstract" in self.attributes2encode and "title" in self.attributes2encode:
                news_dim += t_dim
            self.user_encoder = LSTURUserEncoder(
                num_users=self.num_users,
                input_dim=news_dim,
                user_masking_probability=self.user_masking_probability,
                long_short_term_method=self.long_short_term_method,
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
            user = self.user_encoder(
                batch.user_idx, hist, batch.hist_mask, deterministic
            )
        return dot_product_scores(user, cand)

    def __call__(self, batch: RecBatch, deterministic: bool = True) -> ModelOutput:
        news_vecs = encode_all_news(self.encode_news, batch, deterministic)
        return self.score_with_vectors(batch, news_vecs, deterministic), {}
