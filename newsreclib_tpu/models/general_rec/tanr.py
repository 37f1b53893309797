"""TANR — topic-aware news recommendation with an auxiliary topic classifier.

Reference analog: ``newsreclib/models/general_rec/tanr_module.py`` (574
LoC): CNNAddAtt title encoder + the NAML user encoder (additive attention
only — ``tanr_module.py:18`` imports ``encoders.user.naml.UserEncoder``,
instantiated at ``:195-196`` over ``num_filters``-dim news vectors) + a
linear topic classifier over news vectors whose CE loss (vs the category
label) is added with coefficient ``topic_pred_loss_coef`` (0.2)
(``tanr_module.py:186-190,284,361-368``).  Round-3 fix: this previously
wired the NRMS MHSA user encoder, which cannot even be constructed at the
canonical dims (400 filters % 15 heads != 0) — exposed by the statfix
accuracy matrix.

TPU note: the topic loss runs over the batch's UNIQUE news vectors (each
article counted once); the reference runs it per hist/cand occurrence.
"""

from __future__ import annotations

from typing import Optional

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from newsreclib_tpu.data.batch import NewsFeatures, RecBatch
from newsreclib_tpu.models.base import (
    ModelOutput,
    encode_all_news,
    gather_news,
    late_fusion_user,
    news_field,
    news_valid,
)
from newsreclib_tpu.models.components.click import dot_product_scores
from newsreclib_tpu.models.components.text import CNNAddAtt
from newsreclib_tpu.models.components.user import NAMLUserEncoder


class TANR(nn.Module):
    vocab_size: int
    num_categories: int = 19
    embed_dim: int = 300
    num_heads: int = 15
    num_filters: int = 400
    window_size: int = 3
    query_dim: int = 200
    dropout: float = 0.2
    topic_pred_loss_coef: float = 0.2
    late_fusion: bool = False
    pretrained_embeddings: Optional[np.ndarray] = None
    # pluggable text tower (reference use_plm path, ``tanr_module.py``)
    text_encoder_module: Optional[nn.Module] = None
    text_encoder_dim: Optional[int] = None

    def setup(self):
        self.news_encoder = self.text_encoder_module or CNNAddAtt(
            vocab_size=self.vocab_size,
            embed_dim=self.embed_dim,
            num_filters=self.num_filters,
            window_size=self.window_size,
            query_dim=self.query_dim,
            dropout=self.dropout,
            pretrained=self.pretrained_embeddings,
        )
        if not self.late_fusion:
            # reference TANR reuses the NAML user encoder (additive att only)
            self.user_encoder = NAMLUserEncoder(query_dim=self.query_dim)
        self.topic_predictor = nn.Dense(self.num_categories)

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
        scores = self.score_with_vectors(batch, news_vecs, deterministic)

        # auxiliary topic classification over unique news (valid rows only)
        topic_logits = self.topic_predictor(news_vecs)
        valid = news_valid(batch)
        log_probs = nn.log_softmax(topic_logits, axis=-1)
        onehot = jax.nn.one_hot(news_field(batch, "category"), self.num_categories)
        ce = -jnp.sum(onehot * log_probs, axis=-1)
        v = valid.astype(jnp.float32)
        topic_loss = jnp.sum(ce * v) / jnp.maximum(jnp.sum(v), 1.0)
        return scores, {"topic_loss": self.topic_pred_loss_coef * topic_loss}
