"""CAUM — candidate-aware user modeling.

Reference analog: ``newsreclib/models/general_rec/caum_module.py`` (640
LoC): MHSAAddAtt title encoder + MHSAAddAtt entity encoder + category
embedding, combined by linear projection to news_embed_dim
(``caum_module.py:250-251``); candidate-aware user encoder producing scores
directly.  The reference's per-candidate Python loop (its known hot loop)
is replaced by the dense candidate-batched encoder in
``components/user.py::CAUMUserEncoder``.  Defaults from
``configs/model/caum.yaml``.
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
from newsreclib_tpu.models.components.news import EntityAddAtt, NewsEncoder
from newsreclib_tpu.models.components.text import MHSAAddAtt
from newsreclib_tpu.models.components.user import CAUMUserEncoder


class CAUM(nn.Module):
    vocab_size: int
    entity_vocab_size: int = 1
    num_categories: int = 19
    attributes2encode: Sequence[str] = ("title", "category", "title_entities")
    text_embed_dim: int = 300
    text_num_heads: int = 20
    categ_embed_dim: int = 100
    news_embed_dim: int = 400
    entity_embed_dim: int = 100
    entity_num_heads: int = 20
    query_dim: int = 200
    dropout: float = 0.2
    pack_titles: int = 0  # segment-ID packing (MHSAAddAtt.pack_to)
    user_vector_dim: int = 400
    num_filters: int = 400
    dense_att_hidden_dim1: int = 400
    dense_att_hidden_dim2: int = 256
    late_fusion: bool = False
    pretrained_embeddings: Optional[np.ndarray] = None
    pretrained_entity_embeddings: Optional[np.ndarray] = None
    # pluggable text tower (reference use_plm path, ``caum_module.py``);
    # the linear combine absorbs whatever dim the tower emits
    text_encoder_module: Optional[nn.Module] = None
    text_encoder_dim: Optional[int] = None

    def setup(self):
        text_encoder = self.text_encoder_module or MHSAAddAtt(
            vocab_size=self.vocab_size,
            embed_dim=self.text_embed_dim,
            num_heads=self.text_num_heads,
            query_dim=self.query_dim,
            dropout=self.dropout,
            pretrained=self.pretrained_embeddings,
            pack_to=self.pack_titles,
        )
        entity_encoder = EntityAddAtt(
            vocab_size=self.entity_vocab_size,
            embed_dim=self.entity_embed_dim,
            query_dim=self.query_dim,
            dropout=self.dropout,
            pretrained=self.pretrained_entity_embeddings,
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
            entity_encoder=entity_encoder,
            combine_type="linear",
            output_dim=self.news_embed_dim,
        )
        if not self.late_fusion:
            self.user_encoder = CAUMUserEncoder(
                news_embed_dim=self.news_embed_dim,
                num_filters=self.num_filters,
                dense_att_hidden_dim1=self.dense_att_hidden_dim1,
                dense_att_hidden_dim2=self.dense_att_hidden_dim2,
                user_vector_dim=self.user_vector_dim,
                num_heads=self.text_num_heads,
                dropout=self.dropout,
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
            return dot_product_scores(user, cand)
        return self.user_encoder(hist, cand, batch.hist_mask, deterministic)

    def __call__(self, batch: RecBatch, deterministic: bool = True) -> ModelOutput:
        news_vecs = encode_all_news(self.encode_news, batch, deterministic)
        return self.score_with_vectors(batch, news_vecs, deterministic), {}
