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


def make_aspect_eval_loss(temperature: float = 0.1):
    """Jitted deterministic SupCon loss for validation news batches."""

    def step(state: TrainState, batch: NewsBatch):
        emb = state.apply_fn({"params": state.params}, batch.news, deterministic=True)
        return supcon_embedding_loss(
            emb, jnp.asarray(batch.labels), jnp.asarray(batch.valid), temperature
        )

    return jax.jit(step)


def run_aspect_training(cfg: Dict, mind, info, loggers, out_dir: str) -> Dict[str, float]:
    """Full A-module CLI flow (reference ``manner_a_module.py`` +
    ``configs/model/manner_a_module.yaml``): SupCon over m-per-class news
    batches on the chosen aspect, val-loss early stopping, best/last
    checkpoints, t-SNE embedding plot at the end.

    Entered from ``train.py`` when ``model.name == manner_a``.
    """
    import optax

    from newsreclib_tpu.models.factory import build_manner_a
    from newsreclib_tpu.training.checkpoint import Checkpointer

    mc, dc, tc = cfg["model"], cfg["data"], cfg["trainer"]
    aspect = mc.get("aspect", "category")
    temperature = mc.get("temperature") or 0.1
    store_train = mind.news_store("train")
    store_val = mind.news_store("test")  # dev/test articles for val loss
    batch_size = mc.get("news_batch_size", dc.get("batch_size", 64))
    m = mc.get("m_per_class", 8)
    train_batcher = MPerClassNewsBatcher(
        store_train, aspect, batch_size=batch_size, m_per_class=m,
        seed=cfg.get("seed", 0),
    )
    val_batcher = MPerClassNewsBatcher(
        store_val, aspect, batch_size=batch_size, m_per_class=m,
        seed=cfg.get("seed", 0) + 1,
    )

    model = build_manner_a(mc, info)
    example = next(iter(train_batcher.epoch(0)))
    rng = jax.random.key(cfg.get("seed", 0))
    params_rng, dropout_rng = jax.random.split(rng)
    variables = model.init(
        {"params": params_rng, "dropout": dropout_rng}, example.news,
        deterministic=True,
    )
    opt_cfg = mc.get("optimizer", {})
    state = TrainState.create(
        apply_fn=model.apply, params=variables["params"],
        tx=optax.adam(opt_cfg.get("lr", 1e-4)), dropout_rng=dropout_rng,
    )
    if mc.get("use_plm"):
        from newsreclib_tpu.models.factory import (
            splice_plm_params,
            take_pending_plm_params,
        )

        ported = take_pending_plm_params()
        if ported is not None:
            splice_plm_params(state.params, ported)

    ckpt = Checkpointer(os.path.join(out_dir, "checkpoints"))
    train_step = make_aspect_train_step(temperature)
    val_step = make_aspect_eval_loss(temperature)
    limit = tc.get("limit_train_batches")
    limit_val = tc.get("limit_eval_batches")
    best, bad, gstep = None, 0, 0
    history: Dict[str, float] = {}
    log_every = tc.get("log_every_n_steps", 50)
    for epoch in range(tc.get("max_epochs", 20)):
        losses = []
        for i, nb in enumerate(train_batcher.epoch(epoch)):
            if limit and i >= limit:
                break
            state, metrics = train_step(state, nb)
            losses.append(metrics["loss"])
            gstep += 1
            if i % log_every == 0:
                # keep stdout alive during first-epoch compiles: the matrix
                # runner's stall watchdog kills on log silence (an epoch-0
                # A-module run came within 1s of the 720s limit, round 4)
                log.info("aspect step %d: epoch=%d train/loss=%.4f",
                         gstep, epoch, float(metrics["loss"]))
        val_losses = []
        for i, nb in enumerate(val_batcher.epoch(epoch)):
            if limit_val and i >= limit_val:
                break
            val_losses.append(val_step(state, nb))
        train_loss = float(np.mean([np.asarray(l) for l in losses]))
        val_loss = float(np.mean([np.asarray(l) for l in val_losses]))
        history = {"train/loss": train_loss, "val/loss": val_loss}
        for lg in loggers:
            lg.log_metrics({**history, "epoch": epoch}, gstep)
        ckpt.save(state, gstep, metric=val_loss, extra={"epoch": epoch})
        if best is None or val_loss < best:
            best, bad = val_loss, 0
        else:
            bad += 1
            if bad >= tc.get("patience", 5):
                log.info("aspect early stopping at epoch %d (best val/loss=%.5f)",
                         epoch, best)
                break
    history["best_loss"] = best if best is not None else float("nan")

    # quality of the learned aspect space (VERDICT r4 task 7): kNN label
    # purity over a multi-batch article sample — a number comparable across
    # runs, unlike the t-SNE picture — plus the reference's t-SNE scatter
    # (manner_a_module.py:229-289)
    try:
        embs, labs = [], []
        for i, nb in enumerate(val_batcher.epoch(0)):
            if len(embs) * batch_size >= 2048:
                break
            e = np.asarray(
                model.apply({"params": state.params}, nb.news, deterministic=True)
            )
            embs.append(e[nb.valid])
            labs.append(np.asarray(nb.labels)[nb.valid])
        emb = np.concatenate(embs)
        lab = np.concatenate(labs)
        history["val/knn_purity"] = knn_label_purity(emb, lab)
        log.info("aspect kNN label purity (k=10, n=%d): %.4f",
                 len(emb), history["val/knn_purity"])
        tsne_plot(emb, lab, os.path.join(out_dir, f"tsne_{aspect}.png"))
    except Exception as e:  # noqa: BLE001 — visualization must not fail a run
        log.warning("aspect-space quality report skipped: %s", e)
    return history


def knn_label_purity(embeddings: np.ndarray, labels: np.ndarray, k: int = 10) -> float:
    """Mean fraction of each point's k nearest neighbors (cosine, excluding
    itself) that share its label.  Chance level = the label marginal's
    self-collision rate; a well-organized aspect space scores far above it."""
    x = embeddings / np.maximum(
        np.linalg.norm(embeddings, axis=1, keepdims=True), 1e-12
    )
    sim = x @ x.T
    np.fill_diagonal(sim, -np.inf)
    nn = np.argsort(-sim, axis=1)[:, :k]
    return float((labels[nn] == labels[:, None]).mean())


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
