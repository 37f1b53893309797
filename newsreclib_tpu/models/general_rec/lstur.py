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
import numpy as np

from newsreclib_tpu.data.batch import RecBatch
from newsreclib_tpu.models.base import ModelOutput, gather_news, late_fusion_user
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

    @nn.compact
    def __call__(self, batch: RecBatch, deterministic: bool = True) -> ModelOutput:
        text_encoder = CNNAddAtt(
            vocab_size=self.vocab_size,
            embed_dim=self.text_embed_dim,
            num_filters=self.num_filters,
            window_size=self.window_size,
            query_dim=self.query_dim,
            dropout=self.dropout,
            pretrained=self.pretrained_embeddings,
            name="text_encoder",
        )
        category_encoder = LinearEncoder(
            num_categories=self.num_categories,
            embed_dim=self.categ_embed_dim,
            use_dropout=False,
            linear_transform=False,
            name="category_encoder",
        )
        news_vecs = NewsEncoder(
            attributes2encode=self.attributes2encode,
            text_encoder=text_encoder,
            category_encoder=category_encoder,
            combine_type="concat",
            name="news_encoder",
        )(batch.news, deterministic=deterministic)

        hist = gather_news(news_vecs, batch.hist_idx)
        cand = gather_news(news_vecs, batch.cand_idx)
        if self.late_fusion:
            user = late_fusion_user(hist, batch.hist_mask)
        else:
            news_dim = news_vecs.shape[-1]
            user = LSTURUserEncoder(
                num_users=self.num_users,
                input_dim=news_dim,
                user_masking_probability=self.user_masking_probability,
                long_short_term_method=self.long_short_term_method,
                name="user_encoder",
            )(batch.user_idx, hist, batch.hist_mask, deterministic)
        return dot_product_scores(user, cand), {}
