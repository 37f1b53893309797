"""NPA — neural news recommendation with personalized attention.

Reference analog: ``newsreclib/models/general_rec/npa_module.py`` (530 LoC):
a user-ID projection feeds personalized attention in BOTH the text encoder
(per news article, ``text.py:386-390``) and the user encoder
(``npa_module.py:224-246``).  Defaults from ``configs/model/npa.yaml``.

TPU note: because the news encoding is *user-conditioned*, the batch-level
unique-news dedup used by other models does not apply; titles are encoded
per history/candidate slot, exactly as the reference does per occurrence.
"""

from __future__ import annotations

from typing import Optional

import flax.linen as nn
import jax.numpy as jnp
import numpy as np

from newsreclib_tpu.data.batch import RecBatch
from newsreclib_tpu.models.base import ModelOutput, full_title_tokens, late_fusion_user
from newsreclib_tpu.models.components.click import dot_product_scores
from newsreclib_tpu.models.components.projection import UserProjection
from newsreclib_tpu.models.components.text import CNNPersAtt
from newsreclib_tpu.models.components.user import NPAUserEncoder


class NPA(nn.Module):
    vocab_size: int
    num_users: int
    text_embed_dim: int = 300
    user_embed_dim: int = 50
    num_filters: int = 400
    window_size: int = 3
    word_pref_query_dim: int = 200
    news_pref_query_dim: int = 200
    dropout: float = 0.2
    late_fusion: bool = False
    pretrained_embeddings: Optional[np.ndarray] = None

    @nn.compact
    def __call__(self, batch: RecBatch, deterministic: bool = True) -> ModelOutput:
        b, h = batch.hist_idx.shape
        c = batch.cand_idx.shape[1]

        projected_users = UserProjection(
            self.num_users, self.user_embed_dim, self.dropout, name="user_projection"
        )(batch.user_idx, deterministic)  # (B, Du)

        text_encoder = CNNPersAtt(
            vocab_size=self.vocab_size,
            query_dim=self.word_pref_query_dim,
            embed_dim=self.text_embed_dim,
            num_filters=self.num_filters,
            window_size=self.window_size,
            dropout=self.dropout,
            pretrained=self.pretrained_embeddings,
            name="text_encoder",
        )

        # per-slot token gather: (B, X, L) — user-conditioned, no dedup
        # (length-bucketed batches are re-joined to one full-width view;
        # NPA encodes per occurrence, so the table layout is irrelevant)
        all_titles, all_title_masks = full_title_tokens(batch)

        def encode_slots(idx):
            tokens = jnp.take(all_titles, idx, axis=0)  # (B, X, L)
            mask = jnp.take(all_title_masks, idx, axis=0)
            x = idx.shape[1]
            flat_tokens = tokens.reshape(b * x, -1)
            flat_mask = mask.reshape(b * x, -1)
            users = jnp.repeat(projected_users, x, axis=0)  # (B*X, Du)
            vecs = text_encoder(flat_tokens, users, flat_mask, deterministic)
            return vecs.reshape(b, x, -1)

        hist = encode_slots(batch.hist_idx)
        cand = encode_slots(batch.cand_idx)

        if self.late_fusion:
            user = late_fusion_user(hist, batch.hist_mask)
        else:
            user = NPAUserEncoder(
                preference_query_dim=self.news_pref_query_dim,
                num_filters=self.num_filters,
                dropout=self.dropout,
                name="user_encoder",
            )(hist, projected_users, batch.hist_mask, deterministic)
        return dot_product_scores(user, cand), {}
