"""End-to-end NRMS smoke + convergence tests on synthetic data."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from newsreclib_tpu.data.synthetic import make_batch
from newsreclib_tpu.models.components.losses import cross_entropy_loss, get_loss_fn
from newsreclib_tpu.models.general_rec.nrms import NRMS
from newsreclib_tpu.training.state import create_train_state, make_optimizer, param_count
from newsreclib_tpu.training.steps import make_eval_step, make_train_step

VOCAB = 200


@pytest.fixture(scope="module")
def small_batch():
    rng = np.random.default_rng(1)
    return make_batch(rng, batch_size=4, hist_len=8, num_candidates=5, unique_news=16,
                      cfg=_small_cfg())


def _small_cfg():
    from newsreclib_tpu.data.synthetic import SyntheticConfig

    return SyntheticConfig(vocab_size=VOCAB, title_len=12, abstract_len=8, entity_len=4)


def _small_model():
    return NRMS(vocab_size=VOCAB, embed_dim=60, num_heads=6, query_dim=32, dropout=0.2)


def test_nrms_forward_shapes(small_batch):
    model = _small_model()
    state = create_train_state(model, small_batch, jax.random.key(0), make_optimizer(1e-3))
    scores, aux = model.apply({"params": state.params}, small_batch, deterministic=True)
    assert scores.shape == (4, 5)
    assert aux == {}
    assert np.all(np.isfinite(np.asarray(scores)))
    assert param_count(state.params) > 0


def test_nrms_late_fusion(small_batch):
    model = NRMS(vocab_size=VOCAB, embed_dim=60, num_heads=6, query_dim=32, late_fusion=True)
    state = create_train_state(model, small_batch, jax.random.key(0), make_optimizer(1e-3))
    scores, _ = model.apply({"params": state.params}, small_batch, deterministic=True)
    assert scores.shape == (4, 5)


def test_nrms_overfits_synthetic():
    rng = np.random.default_rng(2)
    batch = make_batch(
        rng, batch_size=16, hist_len=8, num_candidates=5, unique_news=96,
        cfg=_small_cfg(), planted_signal=True,
    )
    model = _small_model()
    state = create_train_state(model, batch, jax.random.key(0), make_optimizer(5e-3))
    step = make_train_step(get_loss_fn("cross_entropy_loss"), donate=False)
    first = None
    for i in range(60):
        state, metrics = step(state, batch)
        if first is None:
            first = float(metrics["loss"])
    last = float(metrics["loss"])
    assert np.isfinite(last)
    assert last < first * 0.5, (first, last)


def test_nrms_eval_step(small_batch):
    model = _small_model()
    state = create_train_state(model, small_batch, jax.random.key(0), make_optimizer(1e-3))
    eval_step = make_eval_step(loss_fn=get_loss_fn("cross_entropy_loss"))
    scores, per_imp, valid, loss = eval_step(state, small_batch)
    assert scores.shape == (4, 5)
    assert "mrr" in per_imp and "ndcg@10" in per_imp and "categ_div@5" in per_imp
    for k, v in per_imp.items():
        assert v.shape == (4,), k
        assert np.all(np.isfinite(np.asarray(v))), k
    assert np.isfinite(float(loss))


def test_nrms_supcon_loss_trains():
    rng = np.random.default_rng(3)
    batch = make_batch(rng, batch_size=8, hist_len=8, num_candidates=5, unique_news=48,
                       cfg=_small_cfg())
    model = _small_model()
    state = create_train_state(model, batch, jax.random.key(0), make_optimizer(1e-3))
    step = make_train_step(get_loss_fn("sup_con_loss", temperature=0.1), donate=False)
    state, metrics = step(state, batch)
    assert np.isfinite(float(metrics["loss"]))


def test_train_step_multidevice_dp():
    """Full train step sharded over an 8-device CPU mesh (data parallel)."""
    from newsreclib_tpu.parallel.mesh import make_mesh, shard_batch

    rng = np.random.default_rng(4)
    batch = make_batch(rng, batch_size=16, hist_len=8, num_candidates=5, unique_news=32,
                       cfg=_small_cfg())
    mesh = make_mesh()
    model = _small_model()
    state = create_train_state(model, batch, jax.random.key(0), make_optimizer(1e-3))
    sharded = shard_batch(batch, mesh)
    step = make_train_step(cross_entropy_loss, donate=False)
    state2, metrics = step(state, sharded)
    # replicated single-device result must match the sharded one
    state3, metrics_ref = step(state, batch)
    np.testing.assert_allclose(
        float(metrics["loss"]), float(metrics_ref["loss"]), rtol=2e-5
    )
