"""A-module training loop + t-SNE viz; adversarial trainer smoke via CLI."""

import os

import jax
import numpy as np
import optax
import pytest

from newsreclib_tpu.data.news_batching import MPerClassNewsBatcher
from newsreclib_tpu.data.news_store import build_news_store
from newsreclib_tpu.models import fair_rec
from newsreclib_tpu.training.aspect import (
    make_aspect_train_step,
    train_aspect_module,
    tsne_plot,
)
from newsreclib_tpu.training.state import TrainState

VOCAB = 120


@pytest.fixture(scope="module")
def store():
    rng = np.random.default_rng(0)
    n = 80
    titles = [list(rng.integers(2, VOCAB, size=8)) for _ in range(n)]
    cats = rng.integers(1, 5, size=n).tolist()
    return build_news_store(
        nids=[f"N{i}" for i in range(n)], tokenized_titles=titles,
        max_title_len=10, categories=cats,
    )


def test_aspect_training_reduces_loss(store):
    batcher = MPerClassNewsBatcher(store, "category", batch_size=16, m_per_class=4)
    model = fair_rec.MANNeRA(
        vocab_size=VOCAB, use_entities=False, text_embed_dim=32, num_heads=4, query_dim=16
    )
    batch = next(iter(batcher.epoch(0)))
    variables = model.init(
        {"params": jax.random.key(0), "dropout": jax.random.key(1)},
        batch.news, deterministic=True,
    )
    state = TrainState.create(
        apply_fn=model.apply, params=variables["params"], tx=optax.adam(2e-3),
        dropout_rng=jax.random.key(2),
    )
    step = make_aspect_train_step()
    losses = []
    for _ in range(20):
        state, metrics = step(state, batch)
        losses.append(float(metrics["loss"]))
    assert losses[-1] < losses[0]

    # full loop wrapper
    state = train_aspect_module(state, batcher, epochs=1, limit_batches=3)
    assert state.step > 20


def test_tsne_plot(store, tmp_path):
    rng = np.random.default_rng(1)
    emb = rng.normal(size=(120, 16)).astype(np.float32)
    labels = rng.integers(0, 5, size=120)
    fpath = tsne_plot(emb, labels, str(tmp_path / "tsne.png"), max_points=100)
    assert os.path.exists(fpath)
    assert os.path.getsize(fpath) > 1000


def test_knn_label_purity():
    from newsreclib_tpu.training.aspect import knn_label_purity

    rng = np.random.default_rng(0)
    labels = rng.integers(0, 4, size=200)
    # well-separated clusters -> purity ~1; random space -> ~label marginal
    centers = rng.normal(size=(4, 16)) * 10
    clustered = centers[labels] + rng.normal(size=(200, 16)) * 0.1
    assert knn_label_purity(clustered.astype(np.float32), labels) > 0.95
    random_emb = rng.normal(size=(200, 16)).astype(np.float32)
    assert knn_label_purity(random_emb, labels) < 0.45


def test_senti_debias_cli(tmp_path):
    """Adversarial path through train.py on the demo fixture."""
    import sys

    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    from newsreclib_tpu.config.compose import compose
    import train as train_mod

    cfg = compose(
        os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                     "newsreclib_tpu", "configs"),
        "train",
        [
            "experiment=nrms_demo", "model=senti_debias",
            f"data.data_dir={tmp_path}/demo/",
            f"data.word_embeddings_fpath={tmp_path}/demo/glove_demo.txt",
            f"output_dir={tmp_path}/out",
            "model.embed_dim=60", "model.num_heads=6", "model.query_dim=16",
            "model.sent_embed_dim=16", "model.use_pretrained_embeddings=false",
            "trainer.max_epochs=1", "trainer.limit_train_batches=2",
            "trainer.limit_eval_batches=2",
            "data.eval_target_cells=64", "data.u_bucket_min=64",
        ],
    )
    metrics = train_mod.run(cfg)
    assert np.isfinite(metrics["train/g_loss"])
    assert np.isfinite(metrics["train/d_loss"])
    assert "test/mrr" in metrics
