"""News encoder composition shell + KCNN (DKN).

Reference analogs: ``encoders/news/news.py:10-299``.

The composition shell applies per-attribute sub-encoders (text for
title/abstract, category for category/subcategory, entity encoders) to the
batch's **unique** news table and combines the per-attribute vectors via
additive attention / linear / concat — matching ``news.py:115-182``,
including the reference's weight sharing: one text encoder instance is
reused for title and abstract, one category encoder for category and
subcategory (``news.py:63-113`` builds ModuleDicts that all point at the
same module object).
"""

from __future__ import annotations

from typing import Optional, Sequence

import flax.linen as nn
import jax.numpy as jnp
import numpy as np

from newsreclib_tpu.data.batch import NewsFeatures
from newsreclib_tpu.models.components.attention import AdditiveAttention
from newsreclib_tpu.models.components.embedding import TokenEmbedding


class NewsEncoder(nn.Module):
    """Composition shell: per-attribute encoders + combine.

    ``text_encoder`` / ``category_encoder`` / ``entity_encoder`` are linen
    module *instances* (shared across the attributes they serve).
    ``combine_type`` ∈ {None, "add_att", "linear", "concat"}.
    """

    attributes2encode: Sequence[str]
    text_encoder: Optional[nn.Module] = None
    category_encoder: Optional[nn.Module] = None
    entity_encoder: Optional[nn.Module] = None
    combine_type: Optional[str] = None
    query_dim: Optional[int] = None  # for add_att combine
    output_dim: Optional[int] = None  # for linear combine

    @nn.compact
    def __call__(
        self,
        news: NewsFeatures,
        user_query: Optional[jnp.ndarray] = None,  # NPA per-article query
        deterministic: bool = True,
    ) -> jnp.ndarray:
        attrs = set(self.attributes2encode)
        vectors = []
        if "title" in attrs:
            kwargs = {} if user_query is None else {"user_query": user_query}
            vectors.append(
                self.text_encoder(
                    news.title, mask=news.title_mask, deterministic=deterministic, **kwargs
                )
            )
        if "abstract" in attrs:
            kwargs = {} if user_query is None else {"user_query": user_query}
            vectors.append(
                self.text_encoder(
                    news.abstract, mask=news.abstract_mask, deterministic=deterministic, **kwargs
                )
            )
        if "category" in attrs:
            vectors.append(self.category_encoder(news.category, deterministic=deterministic))
        if "subcategory" in attrs:
            vectors.append(self.category_encoder(news.subcategory, deterministic=deterministic))
        if "title_entities" in attrs:
            vectors.append(
                self.entity_encoder(
                    news.title_entities,
                    mask=news.title_entities_mask,
                    deterministic=deterministic,
                )
            )
        if "abstract_entities" in attrs:
            vectors.append(
                self.entity_encoder(
                    news.abstract_entities,
                    mask=news.abstract_entities_mask,
                    deterministic=deterministic,
                )
            )
        assert vectors, "at least one attribute must be encoded"

        if len(vectors) == 1:
            return vectors[0]
        if self.combine_type == "add_att":
            stacked = jnp.stack(vectors, axis=1)  # (U, n_attr, D)
            return AdditiveAttention(self.query_dim, name="combine_add_att")(stacked)
        if self.combine_type == "linear":
            return nn.Dense(self.output_dim, name="combine_linear")(
                jnp.concatenate(vectors, axis=-1)
            )
        if self.combine_type == "concat":
            return jnp.concatenate(vectors, axis=-1)
        raise ValueError(f"invalid combine_type {self.combine_type!r}")


class EntityAddAtt(nn.Module):
    """Entity encoder: entity-embedding lookup + additive-attention pooling
    over the entity sequence (used where the reference wires a text-style
    encoder over entity ids, e.g. CAUM ``caum_module.py:250-251``)."""

    vocab_size: int
    embed_dim: int = 100
    query_dim: int = 200
    dropout: float = 0.2
    pretrained: Optional[np.ndarray] = None

    @nn.compact
    def __call__(
        self,
        entities: jnp.ndarray,
        mask: Optional[jnp.ndarray] = None,
        deterministic: bool = True,
    ) -> jnp.ndarray:
        x = TokenEmbedding(self.vocab_size, self.embed_dim, self.pretrained, name="embedding")(
            entities
        )
        x = nn.Dropout(self.dropout)(x, deterministic=deterministic)
        return AdditiveAttention(self.query_dim, name="add_att")(x, mask)


class KCNN(nn.Module):
    """Knowledge-aware CNN (DKN news encoder, reference ``news.py:186-299``):
    word + entity (+context) channels, entity→word-space transform, parallel
    convolutions over window sizes, max-pool over positions.

    tokens (U, L), entities (U, L) aligned per word → (U, num_filters * |windows|).
    """

    word_vocab_size: int
    entity_vocab_size: int
    word_embed_dim: int = 300
    entity_embed_dim: int = 100
    num_filters: int = 100
    window_sizes: Sequence[int] = (2, 3, 4)
    use_context: bool = False
    # ablation switch (not a reference knob): word-channel-only KCNN, used to
    # measure the entity channel's AUC contribution on statfix v2 (VERDICT r4)
    use_entities: bool = True
    pretrained_words: Optional[np.ndarray] = None
    pretrained_entities: Optional[np.ndarray] = None
    pretrained_context: Optional[np.ndarray] = None

    @nn.compact
    def __call__(
        self,
        tokens: jnp.ndarray,
        entities: jnp.ndarray,
        mask: Optional[jnp.ndarray] = None,
        deterministic: bool = True,
    ) -> jnp.ndarray:
        # align the entity sequence to the token sequence (DKN's data format
        # carries one entity id per title word; pad/truncate if they differ)
        l_tok, l_ent = tokens.shape[1], entities.shape[1]
        if l_ent < l_tok:
            entities = jnp.pad(entities, ((0, 0), (0, l_tok - l_ent)))
        elif l_ent > l_tok:
            entities = entities[:, :l_tok]

        words = TokenEmbedding(
            self.word_vocab_size, self.word_embed_dim, self.pretrained_words, name="word_emb"
        )(tokens)
        channels = [words]
        if self.use_entities:
            ents = TokenEmbedding(
                self.entity_vocab_size,
                self.entity_embed_dim,
                self.pretrained_entities,
                name="entity_emb",
            )(entities)
            # transform entity embeddings into word space: tanh(Linear)
            ents_t = jnp.tanh(nn.Dense(self.word_embed_dim, name="entity_transform")(ents))
            channels.append(ents_t)
        if self.use_context and self.use_entities:
            ctx = TokenEmbedding(
                self.entity_vocab_size,
                self.entity_embed_dim,
                self.pretrained_context,
                name="context_emb",
            )(entities)
            ctx_t = jnp.tanh(nn.Dense(self.word_embed_dim, name="context_transform")(ctx))
            channels.append(ctx_t)
        x = jnp.stack(channels, axis=-1)  # (U, L, D, ch)

        outs = []
        for w in self.window_sizes:
            # Conv over (L, D) with kernel (w, D) across channels — VALID, as
            # in the reference's Conv2d(kernel=(w, D)) + maxpool over L-w+1.
            conv = nn.Conv(
                self.num_filters,
                kernel_size=(w, self.word_embed_dim),
                padding="VALID",
                name=f"conv_w{w}",
            )
            feat = nn.relu(conv(x))  # (U, L-w+1, 1, F)
            outs.append(jnp.max(feat[:, :, 0, :], axis=1))  # (U, F)
        out = jnp.concatenate(outs, axis=-1)
        return nn.Dropout(0.2)(out, deterministic=deterministic)
