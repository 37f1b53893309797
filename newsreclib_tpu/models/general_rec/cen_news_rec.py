"""CenNewsRec — centralized baseline of the privacy-preserving news
recommender (FedNewsRec line of work).

Reference analog: ``newsreclib/models/general_rec/cen_news_rec_module.py``
(553 LoC): CNNMHSAAddAtt title encoder; long-term (MHSA+AddAtt) + short-term
(GRU over last ``num_recent_news`` clicks) user encoder.  Defaults from
``configs/model/cen_news_rec.yaml``.
"""

from __future__ import annotations

from typing import Optional

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
from newsreclib_tpu.models.components.click import dot_product_scores
from newsreclib_tpu.models.components.text import CNNMHSAAddAtt
from newsreclib_tpu.models.components.user import CenNewsRecUserEncoder


class CenNewsRec(nn.Module):
    vocab_size: int
    embed_dim: int = 300
    num_heads: int = 20
    num_filters: int = 400
    window_size: int = 3
    query_dim: int = 200
    dropout: float = 0.2
    gru_hidden_dim: int = 400
    num_recent_news: int = 20
    late_fusion: bool = False
    pretrained_embeddings: Optional[np.ndarray] = None
    # pluggable text tower (reference use_plm path, ``cen_news_rec_module.py``)
    text_encoder_module: Optional[nn.Module] = None
    text_encoder_dim: Optional[int] = None

    def setup(self):
        self.news_encoder = self.text_encoder_module or CNNMHSAAddAtt(
            vocab_size=self.vocab_size,
            embed_dim=self.embed_dim,
            num_filters=self.num_filters,
            window_size=self.window_size,
            num_heads=self.num_heads,
            query_dim=self.query_dim,
            dropout=self.dropout,
            pretrained=self.pretrained_embeddings,
        )
        if not self.late_fusion:
            self.user_encoder = CenNewsRecUserEncoder(
                num_filters=self.num_filters,
                num_heads=self.num_heads,
                query_dim=self.query_dim,
                gru_hidden_dim=self.gru_hidden_dim,
                num_recent_news=self.num_recent_news,
                dropout=self.dropout,
            )

    def encode_news(self, news: NewsFeatures, deterministic: bool = True) -> jnp.ndarray:
        return self.news_encoder(news.title, news.title_mask, deterministic)

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
