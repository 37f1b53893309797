"""MINER — multi-interest matching network for news recommendation.

Reference analog: ``newsreclib/models/general_rec/miner_module.py`` (613
LoC): PLM news encoder reduced to ``news_embed_dim`` 256
(``miner_module.py:150-156``), PolyAttention user encoder with 32 context
codes, optional category bias from (GloVe-initialized) category embeddings
via pairwise cosine similarity (``:165-174``), score aggregation
max / mean / weighted (TargetAwareAttention) (``:299-306``), disagreement
regularization = mean pairwise cosine of the K user vectors added to the
loss (``:397-406``).  Defaults from ``configs/model/miner.yaml``.

The text tower is pluggable: ``text_encoder_module`` (e.g. a
``PLMTextEncoder``) overrides the default MHSAAddAtt tower.  Cached serving
(``score_with_vectors``) supports ``use_categ_bias`` by caching category
vectors alongside news vectors via ``encode_categories``.
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
)
from newsreclib_tpu.models.components.attention import PolyAttention, TargetAwareAttention
from newsreclib_tpu.models.components.category import LinearEncoder
from newsreclib_tpu.models.components.click import dot_product_scores
from newsreclib_tpu.models.components.text import MHSAAddAtt
from newsreclib_tpu.models.components.utils import pairwise_cosine_similarity


class MINER(nn.Module):
    vocab_size: int
    num_categories: int = 19
    text_embed_dim: int = 300  # 768 with PLM
    news_embed_dim: int = 256
    num_heads: int = 15  # MHSA tower only
    query_dim: int = 200
    dropout: float = 0.2
    pack_titles: int = 0  # segment-ID packing (MHSAAddAtt.pack_to)
    use_categ_bias: bool = True
    categ_embed_dim: int = 100
    num_context_codes: int = 32
    context_code_dim: int = 200
    score_type: str = "weighted"  # weighted | mean | max
    late_fusion: bool = False
    pretrained_embeddings: Optional[np.ndarray] = None
    pretrained_categ_embeddings: Optional[np.ndarray] = None
    text_encoder_module: Optional[nn.Module] = None  # override (e.g. PLM)

    def setup(self):
        if self.text_encoder_module is not None:
            self.text_encoder = self.text_encoder_module
        else:
            self.text_encoder = MHSAAddAtt(
                vocab_size=self.vocab_size,
                embed_dim=self.text_embed_dim,
                num_heads=self.num_heads,
                query_dim=self.query_dim,
                dropout=self.dropout,
                pretrained=self.pretrained_embeddings,
                pack_to=self.pack_titles,
            )
        self.reduce_dim = nn.Dense(self.news_embed_dim)
        self.reduce_dropout = nn.Dropout(self.dropout)
        if not self.late_fusion:
            if self.use_categ_bias:
                self.categ_encoder = LinearEncoder(
                    num_categories=self.num_categories,
                    embed_dim=self.categ_embed_dim,
                    pretrained=self.pretrained_categ_embeddings,
                    use_dropout=True,
                    dropout=self.dropout,
                    linear_transform=False,
                )
            self.user_encoder = PolyAttention(
                num_context_codes=self.num_context_codes,
                context_code_dim=self.context_code_dim,
            )
            if self.score_type == "weighted":
                self.target_aware_attn = TargetAwareAttention()

    def encode_news(self, news: NewsFeatures, deterministic: bool = True) -> jnp.ndarray:
        text = self.text_encoder(
            news.title, mask=news.title_mask, deterministic=deterministic
        )
        # reduce_dim (PLM.apply_reduce_dim analog, miner_module.py:150-156)
        out = self.reduce_dim(text)
        return self.reduce_dropout(out, deterministic=deterministic)

    def encode_categories(
        self, categories: jnp.ndarray, deterministic: bool = True
    ) -> jnp.ndarray:
        return self.categ_encoder(categories, deterministic=deterministic)

    def _score_and_user(
        self,
        batch: RecBatch,
        news_vecs: jnp.ndarray,
        deterministic: bool = True,
        categ_vecs: Optional[jnp.ndarray] = None,
    ):
        hist = gather_news(news_vecs, batch.hist_idx)
        cand = gather_news(news_vecs, batch.cand_idx)
        if self.late_fusion:
            user = late_fusion_user(hist, batch.hist_mask)
            return dot_product_scores(user, cand), user[:, None, :]

        bias = None
        if self.use_categ_bias:
            if categ_vecs is None and batch.news is not None:
                categ_vecs = self.encode_categories(
                    news_field(batch, "category"), deterministic
                )
            if categ_vecs is not None:
                hist_categ = gather_news(categ_vecs, batch.hist_idx)
                cand_categ = gather_news(categ_vecs, batch.cand_idx)
                bias = pairwise_cosine_similarity(hist_categ, cand_categ)  # (B, H, C)
                bias = bias * batch.cand_mask[:, None, :].astype(bias.dtype)

        user_k = self.user_encoder(hist, batch.hist_mask, bias)  # (B, K, D)
        raw = jnp.einsum("bcd,bkd->bck", cand, user_k)  # (B, C, K)
        if self.score_type == "max":
            return jnp.max(raw, axis=-1), user_k
        if self.score_type == "mean":
            return jnp.mean(raw, axis=-1), user_k
        if self.score_type == "weighted":
            return self.target_aware_attn(user_k, cand, raw), user_k
        raise ValueError(f"invalid score_type {self.score_type!r}")

    def score_with_vectors(
        self,
        batch: RecBatch,
        news_vecs: jnp.ndarray,
        deterministic: bool = True,
        categ_vecs: Optional[jnp.ndarray] = None,
    ) -> jnp.ndarray:
        return self._score_and_user(batch, news_vecs, deterministic, categ_vecs)[0]

    def __call__(self, batch: RecBatch, deterministic: bool = True) -> ModelOutput:
        news_vecs = encode_all_news(self.encode_news, batch, deterministic)
        scores, user = self._score_and_user(batch, news_vecs, deterministic)
        disagreement = jnp.mean(
            pairwise_cosine_similarity(user, user, zero_diagonal=True)
        )
        return scores, {"disagreement_loss": disagreement}
