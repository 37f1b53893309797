"""SentiDebias — adversarial removal of sentiment bias.

Reference analog: ``newsreclib/models/fair_rec/senti_debias_module.py`` (679
LoC): a Generator (news + sentiment encoders → bias-free and bias-aware user
vectors + two dot-product heads + orthogonality regularizers,
``senti_debias_module.py:160-230``) trained adversarially against a
Discriminator (2-layer tanh MLP sentiment classifier, ``:39-52``) with
manual alternating optimization (``:475-518``): G maximizes the
discriminator loss (coef alpha 0.15) + beta(10) × orthogonality; D minimizes
sentiment CE.  Eval uses bias-free scores only (``:431``).

JAX design: both networks are plain modules; the alternating two-optimizer
step is ONE jitted function over a ``SentiDebiasState`` (g/d TrainStates) —
no Lightning manual-optimization machinery.
"""

from __future__ import annotations

from typing import Dict, NamedTuple, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np
import optax

from newsreclib_tpu.data.batch import RecBatch
from newsreclib_tpu.models.base import (
    ModelOutput,
    encode_all_news,
    gather_news,
    late_fusion_user,
    news_field,
    news_valid,
)
from newsreclib_tpu.models.components.category import SentimentEncoder
from newsreclib_tpu.models.components.click import dot_product_scores
from newsreclib_tpu.models.components.losses import cross_entropy_loss
from newsreclib_tpu.models.components.text import MHSAAddAtt
from newsreclib_tpu.models.components.user import NRMSUserEncoder
from newsreclib_tpu.training.state import TrainState


def _abs_cos(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    # max-guarded norms: zero vectors (padding articles) yield 0 with zero
    # gradient instead of NaN (d/dx sqrt at 0)
    na = jnp.sqrt(jnp.maximum(jnp.sum(a * a, axis=-1), 1e-16))
    nb = jnp.sqrt(jnp.maximum(jnp.sum(b * b, axis=-1), 1e-16))
    return jnp.abs(jnp.sum(a * b, axis=-1) / (na * nb))


class SentiDebiasGenerator(nn.Module):
    """News + sentiment towers; returns scores and regularizers."""

    vocab_size: int
    num_sent_classes: int = 3
    embed_dim: int = 300
    num_heads: int = 15
    query_dim: int = 200
    sent_embed_dim: int = 64
    dropout: float = 0.2
    pack_titles: int = 0  # segment-ID packing (MHSAAddAtt.pack_to)
    late_fusion: bool = False
    pretrained_embeddings: Optional[np.ndarray] = None
    # pluggable text tower (reference use_plm path, ``senti_debias_module.py``)
    text_encoder_module: Optional[nn.Module] = None
    text_encoder_dim: Optional[int] = None

    @nn.compact
    def full_output(self, batch: RecBatch, deterministic: bool = True) -> Dict:
        news_encoder = self.text_encoder_module or MHSAAddAtt(
            vocab_size=self.vocab_size,
            embed_dim=self.embed_dim,
            num_heads=self.num_heads,
            query_dim=self.query_dim,
            dropout=self.dropout,
            pretrained=self.pretrained_embeddings,
            pack_to=self.pack_titles,
            name="news_encoder",
        )
        news_vecs = encode_all_news(
            lambda news, det: news_encoder(news.title, news.title_mask, det),
            batch,
            deterministic,
        )
        # the sentiment tower must emit the same dim as the news tower: the
        # bias-aware head dots user_aware (from sent vectors) with cand_sent
        news_dim = (
            self.text_encoder_dim if self.text_encoder_module is not None else self.embed_dim
        )
        sent_vecs = SentimentEncoder(
            num_sent_classes=self.num_sent_classes,
            sent_embed_dim=self.sent_embed_dim,
            sent_output_dim=news_dim,
            name="sentiment_encoder",
        )(news_field(batch, "sentiment"))

        hist = gather_news(news_vecs, batch.hist_idx)
        cand = gather_news(news_vecs, batch.cand_idx)
        hist_sent = gather_news(sent_vecs, batch.hist_idx)
        cand_sent = gather_news(sent_vecs, batch.cand_idx)

        if self.late_fusion:
            user_free = late_fusion_user(hist, batch.hist_mask)
            user_aware = late_fusion_user(hist_sent, batch.hist_mask)
        else:
            user_encoder = NRMSUserEncoder(
                num_heads=self.num_heads, query_dim=self.query_dim, name="user_encoder"
            )  # shared between the two views (reference shares it too)
            user_free = user_encoder(hist, batch.hist_mask, deterministic)
            user_aware = user_encoder(hist_sent, batch.hist_mask, deterministic)

        # orthogonality regularizers over unique news + user vectors
        news_valid_f = news_valid(batch).astype(jnp.float32)
        orth_news = jnp.sum(
            _abs_cos(news_vecs, sent_vecs) * news_valid_f
        ) / jnp.maximum(jnp.sum(news_valid_f), 1.0)
        orth_user = jnp.mean(_abs_cos(user_free, user_aware))
        loss_orth = 2.0 * orth_news + orth_user  # hist+cand news terms → unique news

        bias_free_scores = dot_product_scores(user_free, cand)
        bias_aware_scores = dot_product_scores(user_aware, cand_sent)
        return {
            "combined_scores": bias_free_scores + bias_aware_scores,
            "bias_free_scores": bias_free_scores,
            "loss_orth": loss_orth,
            "news_vecs": news_vecs,
            "news_valid": news_valid_f,
            "news_sentiments": news_field(batch, "sentiment"),
        }

    def __call__(self, batch: RecBatch, deterministic: bool = True) -> ModelOutput:
        """Standard eval protocol: bias-free scores (reference ``:431``)."""
        return self.full_output(batch, deterministic)["bias_free_scores"], {}


class SentiDebiasDiscriminator(nn.Module):
    """2-layer tanh MLP sentiment classifier over news vectors."""

    hidden_dim: int = 128
    num_sent_classes: int = 3

    @nn.compact
    def __call__(self, news_vecs: jnp.ndarray) -> jnp.ndarray:
        h = jnp.tanh(nn.Dense(self.hidden_dim, name="linear1")(news_vecs))
        return nn.Dense(self.num_sent_classes + 1, name="linear2")(h)


class SentiDebiasState(NamedTuple):
    g: TrainState
    d: TrainState


def _sent_ce(logits: jnp.ndarray, labels: jnp.ndarray, valid: jnp.ndarray) -> jnp.ndarray:
    logp = jax.nn.log_softmax(logits, axis=-1)
    onehot = jax.nn.one_hot(labels, logits.shape[-1])
    ce = -jnp.sum(onehot * logp, axis=-1) * valid
    return jnp.sum(ce) / jnp.maximum(jnp.sum(valid), 1.0)


def make_sentidebias_train_step(
    alpha: float = 0.15, beta: float = 10.0
):
    """Jitted alternating G/D step (reference ``training_step :475-518``)."""

    def step(state: SentiDebiasState, batch: RecBatch):
        g_rng = jax.random.fold_in(state.g.dropout_rng, state.g.step)

        def g_loss_fn(g_params):
            out = state.g.apply_fn(
                {"params": g_params}, batch, deterministic=False,
                rngs={"dropout": g_rng}, method=SentiDebiasGenerator.full_output,
            )
            logits = state.d.apply_fn({"params": state.d.params}, out["news_vecs"])
            adv = _sent_ce(logits, out["news_sentiments"], out["news_valid"])
            rec = cross_entropy_loss(
                out["combined_scores"], batch.labels, batch.cand_mask, batch.impression_valid
            )
            loss = rec + beta * out["loss_orth"] - alpha * adv
            return loss, (rec, adv, out["loss_orth"])

        (g_loss, (rec, adv, orth)), g_grads = jax.value_and_grad(g_loss_fn, has_aux=True)(
            state.g.params
        )
        new_g = state.g.apply_gradients(grads=g_grads)

        # discriminator step on the UPDATED generator's embeddings
        out = new_g.apply_fn(
            {"params": new_g.params}, batch, deterministic=False,
            rngs={"dropout": g_rng}, method=SentiDebiasGenerator.full_output,
        )
        news_vecs = jax.lax.stop_gradient(out["news_vecs"])

        def d_loss_fn(d_params):
            logits = state.d.apply_fn({"params": d_params}, news_vecs)
            return _sent_ce(logits, out["news_sentiments"], out["news_valid"])

        d_loss, d_grads = jax.value_and_grad(d_loss_fn)(state.d.params)
        new_d = state.d.apply_gradients(grads=d_grads)

        metrics = {
            "loss": g_loss, "g_loss": g_loss, "d_loss": d_loss,
            "rec_loss": rec, "adv_loss": adv, "orth_loss": orth,
        }
        return SentiDebiasState(new_g, new_d), metrics

    return jax.jit(step, donate_argnums=(0,))


def create_sentidebias_state(
    generator: SentiDebiasGenerator,
    discriminator: SentiDebiasDiscriminator,
    example_batch: RecBatch,
    rng: jax.Array,
    g_lr: float = 1e-5,
    d_lr: float = 2e-5,
) -> SentiDebiasState:
    g_rng, d_rng, drop_rng, d_drop_rng = jax.random.split(rng, 4)
    g_vars = generator.init(
        {"params": g_rng, "dropout": drop_rng},
        example_batch,
        deterministic=True,
        method=SentiDebiasGenerator.full_output,
    )
    g_state = TrainState.create(
        apply_fn=generator.apply, params=g_vars["params"], tx=optax.adam(g_lr),
        dropout_rng=drop_rng,
    )
    embed_dim = (
        generator.text_encoder_dim
        if generator.text_encoder_module is not None
        else generator.embed_dim
    )
    d_vars = discriminator.init(d_rng, jnp.zeros((1, embed_dim), jnp.float32))
    d_state = TrainState.create(
        apply_fn=discriminator.apply, params=d_vars["params"], tx=optax.adam(d_lr),
        dropout_rng=d_drop_rng,  # distinct from g's (shared buffers break donation)
    )
    return SentiDebiasState(g_state, d_state)
