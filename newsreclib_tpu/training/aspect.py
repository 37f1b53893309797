"""A-module (aspect) training: SupCon on news batches + t-SNE visualization.

Reference analog: ``fair_rec/manner_a_module.py`` — SupCon over an
aspect-labeled embedding space with m-per-class batches
(``mind_news_datamodule.py:327-332``) and t-SNE scatter plots of the
embeddings at epoch end (``manner_a_module.py:229-289``; their
MulticoreTSNE+seaborn becomes sklearn TSNE + matplotlib here).
"""

from __future__ import annotations

import logging
import os
from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from newsreclib_tpu.data.batch import NewsBatch
from newsreclib_tpu.data.news_batching import MPerClassNewsBatcher
from newsreclib_tpu.models.fair_rec.manner import supcon_embedding_loss
from newsreclib_tpu.training.state import TrainState

log = logging.getLogger("newsreclib_tpu")


def make_aspect_train_step(temperature: float = 0.1):
    def step(state: TrainState, batch: NewsBatch):
        rng = jax.random.fold_in(state.dropout_rng, state.step)

        def loss_of(params):
            emb = state.apply_fn(
                {"params": params}, batch.news, deterministic=False,
                rngs={"dropout": rng},
            )
            return supcon_embedding_loss(
                emb, jnp.asarray(batch.labels), jnp.asarray(batch.valid), temperature
            )

        loss, grads = jax.value_and_grad(loss_of)(state.params)
        return state.apply_gradients(grads=grads), {"loss": loss}

    return jax.jit(step, donate_argnums=(0,))


def train_aspect_module(
    state: TrainState,
    batcher: MPerClassNewsBatcher,
    epochs: int = 1,
    temperature: float = 0.1,
    limit_batches: Optional[int] = None,
    loggers=(),
) -> TrainState:
    step = make_aspect_train_step(temperature)
    gstep = 0
    for epoch in range(epochs):
        for i, batch in enumerate(batcher.epoch(epoch)):
            if limit_batches and i >= limit_batches:
                break
            state, metrics = step(state, batch)
            gstep += 1
            if i % 20 == 0:
                loss = float(metrics["loss"])
                for lg in loggers:
                    lg.log_metrics({"aspect/loss": loss, "epoch": epoch}, gstep)
    return state


def tsne_plot(
    embeddings: np.ndarray,
    labels: np.ndarray,
    fpath: str,
    max_points: int = 2000,
    seed: int = 0,
) -> str:
    """t-SNE scatter of an aspect embedding space, saved as PNG."""
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt
    from sklearn.manifold import TSNE

    rng = np.random.default_rng(seed)
    if len(embeddings) > max_points:
        sel = rng.choice(len(embeddings), max_points, replace=False)
        embeddings, labels = embeddings[sel], labels[sel]
    xy = TSNE(n_components=2, random_state=seed, init="pca",
              perplexity=min(30, max(5, len(embeddings) // 10))).fit_transform(embeddings)
    fig, ax = plt.subplots(figsize=(7, 6))
    scatter = ax.scatter(xy[:, 0], xy[:, 1], c=labels, s=6, cmap="tab20", alpha=0.7)
    ax.set_title("A-module embedding space (t-SNE)")
    fig.colorbar(scatter, ax=ax, label="aspect class")
    os.makedirs(os.path.dirname(fpath) or ".", exist_ok=True)
    fig.savefig(fpath, dpi=120, bbox_inches="tight")
    plt.close(fig)
    log.info("t-SNE plot saved to %s", fpath)
    return fpath
