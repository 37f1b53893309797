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

from newsreclib_tpu.data.batch import NewsFeatures, RecBatch
from newsreclib_tpu.models.base import (
    ModelOutput,
    encode_all_news,
    gather_news,
    late_fusion_user,
)
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
    use_entities: bool = True  # ablation switch (see KCNN.use_entities)
    hidden_dim_dnn: int = 16
    late_fusion: bool = False
    pretrained_embeddings: Optional[np.ndarray] = None
    pretrained_entity_embeddings: Optional[np.ndarray] = None
    pretrained_context_embeddings: Optional[np.ndarray] = None

    def setup(self):
        self.news_encoder = KCNN(
            word_vocab_size=self.vocab_size,
            entity_vocab_size=self.entity_vocab_size,
            word_embed_dim=self.text_embed_dim,
            entity_embed_dim=self.entity_embed_dim,
            num_filters=self.num_filters,
            window_sizes=self.window_sizes,
            use_context=self.use_context,
            use_entities=self.use_entities,
            pretrained_words=self.pretrained_embeddings,
            pretrained_entities=self.pretrained_entity_embeddings,
            pretrained_context=self.pretrained_context_embeddings,
        )
        if not self.late_fusion:
            self.user_encoder = DKNUserEncoder(hidden_dim=100)
            self.click_predictor = DNNPredictor(self.hidden_dim_dnn)

    @property
    def TITLE_SPLIT_MARGIN(self) -> int:
        """KCNN VALID-convs max-pool over windows that straddle/exceed the
        title, so length-split batches need max(window) title headroom to
        stay exact (ADVICE r3: a config with a window > the old constant 4
        would have made the default-on length split silently inexact).
        Read via getattr on the instance (serving.py) or computed from the
        model config by ``factory.title_split_margin`` (pre-build callers)."""
        return max(self.window_sizes)

    def encode_news(self, news: NewsFeatures, deterministic: bool = True) -> jnp.ndarray:
        return self.news_encoder(
            news.title, news.title_entities, news.title_mask, deterministic
        )

    def score_with_vectors(
        self, batch: RecBatch, news_vecs: jnp.ndarray, deterministic: bool = True
    ) -> jnp.ndarray:
        hist = gather_news(news_vecs, batch.hist_idx)
        cand = gather_news(news_vecs, batch.cand_idx)
        if self.late_fusion:
            user = late_fusion_user(hist, batch.hist_mask)
            return dot_product_scores(user, cand)
        user_per_cand = self.user_encoder(hist, cand, batch.hist_mask, deterministic)
        scores = self.click_predictor(user_per_cand, cand)
        # reference masks padded-candidate scores to 0 in early fusion
        return jnp.where(batch.cand_mask, scores, 0.0)

    def __call__(self, batch: RecBatch, deterministic: bool = True) -> ModelOutput:
        news_vecs = encode_all_news(self.encode_news, batch, deterministic)
        return self.score_with_vectors(batch, news_vecs, deterministic), {}
