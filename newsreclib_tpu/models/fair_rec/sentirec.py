"""SentiRec — sentiment-diversity-aware news recommendation.

Reference analog: ``newsreclib/models/fair_rec/sentirec_module.py`` (570
LoC): NRMS backbone + a linear sentiment-score regression head over news
vectors; loss += ``sent_pred_loss_coef``(0.4) × L1(pred, target) +
``sent_div_loss_coef``(10) × mean(relu(user_mean_sent × cand_sent × score))
(``sentirec_module.py:348-366``).

Note: the reference's ``model_step`` rebinds ``sent_scores`` to the TARGETS
before computing ``sent_pred_loss(sent_scores.flatten(), sent_scores)`` — an
always-zero loss (a bug).  This implementation applies the intended
semantics: L1 between the prediction head's output and the annotated
sentiment scores.

The news tower is user-independent, so SentiRec supports the cached-serving
split (``encode_news`` + ``score_with_vectors``); the aux sentiment losses
only exist on the fused training path.
"""

from __future__ import annotations

from typing import Optional

import flax.linen as nn
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
from newsreclib_tpu.models.components.text import MHSAAddAtt
from newsreclib_tpu.models.components.user import NRMSUserEncoder


class SentiRec(nn.Module):
    vocab_size: int
    embed_dim: int = 300
    num_heads: int = 15
    query_dim: int = 200
    dropout: float = 0.2
    pack_titles: int = 0  # segment-ID packing (MHSAAddAtt.pack_to)
    sent_pred_loss_coef: float = 0.4
    sent_div_loss_coef: float = 10.0
    late_fusion: bool = False
    pretrained_embeddings: Optional[np.ndarray] = None
    # pluggable text tower (reference use_plm path, ``sentirec_module.py``)
    text_encoder_module: Optional[nn.Module] = None
    text_encoder_dim: Optional[int] = None

    def setup(self):
        if self.text_encoder_module is not None:
            self.news_encoder = self.text_encoder_module
        else:
            self.news_encoder = MHSAAddAtt(
                vocab_size=self.vocab_size,
                embed_dim=self.embed_dim,
                num_heads=self.num_heads,
                query_dim=self.query_dim,
                dropout=self.dropout,
                pretrained=self.pretrained_embeddings,
                pack_to=self.pack_titles,
            )
        if not self.late_fusion:
            self.user_encoder = NRMSUserEncoder(
                num_heads=self.num_heads, query_dim=self.query_dim
            )
        self.sent_predictor = nn.Dense(1)

    def encode_news(self, news: NewsFeatures, deterministic: bool = True) -> jnp.ndarray:
        """(U, L) unique news → (U, D) vectors (cacheable)."""
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

        # sentiment regression head over unique news (each article once)
        pred_sent = self.sent_predictor(news_vecs)[..., 0]
        valid = news_valid(batch).astype(jnp.float32)
        sent_score = news_field(batch, "sentiment_score")
        l1 = jnp.abs(pred_sent - sent_score) * valid
        sent_pred_loss = jnp.sum(l1) / jnp.maximum(jnp.sum(valid), 1.0)

        # sentiment-diversity regularization
        hist_sent = jnp.take(sent_score, batch.hist_idx, axis=0)
        cand_sent = jnp.take(sent_score, batch.cand_idx, axis=0)
        hm = batch.hist_mask.astype(jnp.float32)
        user_mean_sent = jnp.sum(hist_sent * hm, axis=1) / jnp.maximum(
            jnp.sum(hm, axis=1), 1.0
        )
        cm = batch.cand_mask.astype(jnp.float32)
        div_terms = nn.relu(user_mean_sent[:, None] * cand_sent * scores) * cm
        sent_div_loss = jnp.sum(div_terms) / jnp.maximum(jnp.sum(cm), 1.0)

        aux = {
            "sent_pred_loss": self.sent_pred_loss_coef * sent_pred_loss,
            "sent_div_loss": self.sent_div_loss_coef * sent_div_loss,
        }
        return scores, aux
