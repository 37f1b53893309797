"""MINER — multi-interest matching network for news recommendation.

Reference analog: ``newsreclib/models/general_rec/miner_module.py`` (613
LoC): PLM news encoder reduced to ``news_embed_dim`` 256
(``miner_module.py:150-156``), PolyAttention user encoder with 32 context
codes, optional category bias from (GloVe-initialized) category embeddings
via pairwise cosine similarity (``:165-174``), score aggregation
max / mean / weighted (TargetAwareAttention) (``:299-306``), disagreement
regularization = mean pairwise cosine of the K user vectors added to the
loss (``:397-406``).  Defaults from ``configs/model/miner.yaml``.

The text tower is pluggable: ``use_plm=False`` wires an MHSAAddAtt tower
(for GloVe-style configs and tests); the PLM tower lives in
``components/plm.py``.
"""

from __future__ import annotations

from typing import Optional

import flax.linen as nn
import jax.numpy as jnp
import numpy as np

from newsreclib_tpu.data.batch import RecBatch
from newsreclib_tpu.models.base import ModelOutput, gather_news, late_fusion_user
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
    use_categ_bias: bool = True
    categ_embed_dim: int = 100
    num_context_codes: int = 32
    context_code_dim: int = 200
    score_type: str = "weighted"  # weighted | mean | max
    late_fusion: bool = False
    pretrained_embeddings: Optional[np.ndarray] = None
    pretrained_categ_embeddings: Optional[np.ndarray] = None
    text_encoder_module: Optional[nn.Module] = None  # override (e.g. PLM)

    @nn.compact
    def __call__(self, batch: RecBatch, deterministic: bool = True) -> ModelOutput:
        if self.text_encoder_module is not None:
            text_vecs = self.text_encoder_module(
                batch.news.title, mask=batch.news.title_mask, deterministic=deterministic
            )
        else:
            text_vecs = MHSAAddAtt(
                vocab_size=self.vocab_size,
                embed_dim=self.text_embed_dim,
                num_heads=self.num_heads,
                query_dim=self.query_dim,
                dropout=self.dropout,
                pretrained=self.pretrained_embeddings,
                name="text_encoder",
            )(batch.news.title, batch.news.title_mask, deterministic)
        # reduce_dim (PLM.apply_reduce_dim analog, miner_module.py:150-156)
        news_vecs = nn.Dense(self.news_embed_dim, name="reduce_dim")(text_vecs)
        news_vecs = nn.Dropout(self.dropout)(news_vecs, deterministic=deterministic)

        hist = gather_news(news_vecs, batch.hist_idx)  # (B, H, D)
        cand = gather_news(news_vecs, batch.cand_idx)  # (B, C, D)

        if self.late_fusion:
            user = late_fusion_user(hist, batch.hist_mask)
            scores = dot_product_scores(user, cand)
            disagreement = jnp.mean(
                pairwise_cosine_similarity(user[:, None, :], user[:, None, :], zero_diagonal=True)
            )
            return scores, {"disagreement_loss": disagreement}

        bias = None
        if self.use_categ_bias:
            categ_encoder = LinearEncoder(
                num_categories=self.num_categories,
                embed_dim=self.categ_embed_dim,
                pretrained=self.pretrained_categ_embeddings,
                use_dropout=True,
                dropout=self.dropout,
                linear_transform=False,
                name="categ_encoder",
            )
            categ_vecs = categ_encoder(batch.news.category, deterministic=deterministic)
            hist_categ = gather_news(categ_vecs, batch.hist_idx)
            cand_categ = gather_news(categ_vecs, batch.cand_idx)
            bias = pairwise_cosine_similarity(hist_categ, cand_categ)  # (B, H, C)
            bias = bias * batch.cand_mask[:, None, :].astype(bias.dtype)

        user_k = PolyAttention(
            num_context_codes=self.num_context_codes,
            context_code_dim=self.context_code_dim,
            name="user_encoder",
        )(hist, batch.hist_mask, bias)  # (B, K, D)

        raw = jnp.einsum("bcd,bkd->bck", cand, user_k)  # (B, C, K)
        if self.score_type == "max":
            scores = jnp.max(raw, axis=-1)
        elif self.score_type == "mean":
            scores = jnp.mean(raw, axis=-1)
        elif self.score_type == "weighted":
            scores = TargetAwareAttention(name="target_aware_attn")(user_k, cand, raw)
        else:
            raise ValueError(f"invalid score_type {self.score_type!r}")

        disagreement = jnp.mean(
            pairwise_cosine_similarity(user_k, user_k, zero_diagonal=True)
        )
        return scores, {"disagreement_loss": disagreement}
