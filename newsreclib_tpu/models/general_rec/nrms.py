"""NRMS — Neural news recommendation with multi-head self-attention.

Reference analog: ``newsreclib/models/general_rec/nrms_module.py:230-535``
(model math only; the Lightning plumbing is replaced by the framework's
jitted train/eval steps).  Canonical hparams from ``configs/model/nrms.yaml``:
embed 300, heads 15, query 200, dropout 0.2.

TPU-native structure: the title encoder runs ONCE over the batch's unique
news table ``(U, L)``; history/candidate slots gather from it.  The
reference re-encodes each occurrence (``nrms_module.py:231-237``).  For
serving/eval, ``encode_news`` + ``score_with_vectors`` split the model so a
per-epoch news-vector cache can skip re-encoding entirely
(``newsreclib_tpu/serving.py``).
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
)
from newsreclib_tpu.models.components.click import dot_product_scores
from newsreclib_tpu.models.components.text import MHSAAddAtt
from newsreclib_tpu.models.components.user import NRMSUserEncoder


class NRMS(nn.Module):
    vocab_size: int
    embed_dim: int = 300
    num_heads: int = 15
    query_dim: int = 200
    dropout: float = 0.2
    late_fusion: bool = False
    pretrained_embeddings: Optional[np.ndarray] = None
    text_encoder_module: Optional[nn.Module] = None  # e.g. PLMTextEncoder
    pack_titles: int = 0  # segment-ID article packing (MHSAAddAtt.pack_to)

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

    def encode_news(self, news: NewsFeatures, deterministic: bool = True) -> jnp.ndarray:
        """(U, L) unique news → (U, D) vectors (cacheable)."""
        return self.news_encoder(
            news.title, mask=news.title_mask, deterministic=deterministic
        )

    def score_with_vectors(
        self, batch: RecBatch, news_vecs: jnp.ndarray, deterministic: bool = True
    ) -> jnp.ndarray:
        """Score a batch whose hist/cand indices point into ``news_vecs``."""
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
