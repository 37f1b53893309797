"""User-ID projections (NPA).

Reference analogs: ``layers/projection.py:8-98``.
"""

from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp


class UserProjection(nn.Module):
    """User-ID → dense vector lookup (uniform [0,1) init like the
    reference's ``torch.rand``) + dropout."""

    num_users: int
    user_embed_dim: int
    dropout: float = 0.2

    @nn.compact
    def __call__(self, users: jnp.ndarray, deterministic: bool = True) -> jnp.ndarray:
        table = self.param(
            "user_embed",
            nn.initializers.uniform(scale=1.0),
            (self.num_users, self.user_embed_dim),
        )
        x = jnp.take(table, users, axis=0)
        return nn.Dropout(self.dropout)(x, deterministic=deterministic)


class UserPreferenceQueryProjection(nn.Module):
    """Dense user vector → preference query: Linear → ReLU → dropout."""

    preference_query_dim: int
    dropout: float = 0.2

    @nn.compact
    def __call__(self, projected_users: jnp.ndarray, deterministic: bool = True) -> jnp.ndarray:
        q = nn.relu(nn.Dense(self.preference_query_dim, name="proj")(projected_users))
        return nn.Dropout(self.dropout)(q, deterministic=deterministic)
