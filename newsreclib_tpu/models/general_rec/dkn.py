"""DKN — deep knowledge-aware network.

Reference analog: ``newsreclib/models/general_rec/dkn_module.py`` (519 LoC):
KCNN news encoder (word + entity (+context) channels, multi-window convs),
candidate-attentive user encoder producing per-candidate user vectors, DNN
click predictor in the early-fusion path / dot product for late fusion
(``dkn_module.py:146-151``).  Defaults from ``configs/model/dkn.yaml``.
"""

from __future__ import annotations

from typing import Optional, Sequence

import flax.linen as nn
import jax.numpy as jnp
import numpy as np

from newsreclib_tpu.data.batch import RecBatch
from newsreclib_tpu.models.base import ModelOutput, gather_news, late_fusion_user
from newsreclib_tpu.models.components.click import DNNPredictor, dot_product_scores
from newsreclib_tpu.models.components.news import KCNN
from newsreclib_tpu.models.components.user import DKNUserEncoder


class DKN(nn.Module):
    vocab_size: int
    entity_vocab_size: int
    text_embed_dim: int = 300
    entity_embed_dim: int = 100
    num_filters: int = 100
    window_sizes: Sequence[int] = (1, 2, 3, 4)
    use_context: bool = True
    hidden_dim_dnn: int = 16
    late_fusion: bool = False
    pretrained_embeddings: Optional[np.ndarray] = None
    pretrained_entity_embeddings: Optional[np.ndarray] = None
    pretrained_context_embeddings: Optional[np.ndarray] = None

    @nn.compact
    def __call__(self, batch: RecBatch, deterministic: bool = True) -> ModelOutput:
        news_vecs = KCNN(
            word_vocab_size=self.vocab_size,
            entity_vocab_size=self.entity_vocab_size,
            word_embed_dim=self.text_embed_dim,
            entity_embed_dim=self.entity_embed_dim,
            num_filters=self.num_filters,
            window_sizes=self.window_sizes,
            use_context=self.use_context,
            pretrained_words=self.pretrained_embeddings,
            pretrained_entities=self.pretrained_entity_embeddings,
            pretrained_context=self.pretrained_context_embeddings,
            name="news_encoder",
        )(
            batch.news.title,
            batch.news.title_entities,
            batch.news.title_mask,
            deterministic,
        )

        hist = gather_news(news_vecs, batch.hist_idx)
        cand = gather_news(news_vecs, batch.cand_idx)
        if self.late_fusion:
            user = late_fusion_user(hist, batch.hist_mask)
            scores = dot_product_scores(user, cand)
        else:
            user_per_cand = DKNUserEncoder(hidden_dim=100, name="user_encoder")(
                hist, cand, batch.hist_mask, deterministic
            )  # (B, C, D)
            scores = DNNPredictor(self.hidden_dim_dnn, name="click_predictor")(
                user_per_cand, cand
            )
            # reference masks padded-candidate scores to 0 in early fusion
            scores = jnp.where(batch.cand_mask, scores, 0.0)
        return scores, {}
