"""Category / aspect encoders.

Reference analogs: ``encoders/news/category.py:8-83`` (LinearEncoder),
``encoders/news/aspect.py:5-30`` (SentimentEncoder).
"""

from __future__ import annotations

from typing import Optional

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from newsreclib_tpu.models.components.embedding import TokenEmbedding


class LinearEncoder(nn.Module):
    """Category embedding (optionally GloVe-initialized) + optional dropout +
    optional Linear+ReLU transform."""

    num_categories: int
    embed_dim: int
    pretrained: Optional[np.ndarray] = None
    frozen: bool = False
    use_dropout: bool = True
    dropout: float = 0.2
    linear_transform: bool = False
    output_dim: Optional[int] = None

    @nn.compact
    def __call__(self, category: jnp.ndarray, deterministic: bool = True) -> jnp.ndarray:
        x = TokenEmbedding(
            self.num_categories, self.embed_dim, self.pretrained, self.frozen, name="embedding"
        )(category)
        if self.use_dropout:
            x = nn.Dropout(self.dropout)(x, deterministic=deterministic)
        if self.linear_transform:
            x = nn.relu(nn.Dense(self.output_dim, name="linear")(x))
        return x


class SentimentEncoder(nn.Module):
    """Sentiment-class embedding + tanh(Linear) (SentiDebias)."""

    num_sent_classes: int
    sent_embed_dim: int
    sent_output_dim: int

    @nn.compact
    def __call__(self, sentiment: jnp.ndarray) -> jnp.ndarray:
        x = TokenEmbedding(
            self.num_sent_classes + 1, self.sent_embed_dim, name="embedding"
        )(sentiment)
        return jnp.tanh(nn.Dense(self.sent_output_dim, name="linear")(x))
