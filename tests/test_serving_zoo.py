"""Every cacheable model: encode_news + score_with_vectors must equal the
fused __call__ path (the cached-serving contract)."""

import jax
import numpy as np
import pytest

from tests.test_model_zoo import MODELS, _batch


CACHEABLE = [
    "nrms", "naml", "lstur", "lstur_con", "tanr", "caum", "mins",
    "cen_news_rec", "dkn", "miner", "miner_mean", "nrms_late", "caum_late",
    "dkn_late",
]


@pytest.mark.parametrize("name", CACHEABLE)
def test_split_path_matches_fused(name):
    batch = _batch(seed=11)
    model = MODELS[name]()
    variables = model.init(
        {"params": jax.random.key(0), "dropout": jax.random.key(1)},
        batch, deterministic=True,
    )
    fused, _ = model.apply(variables, batch, deterministic=True)
    vecs = model.apply(variables, batch.news, deterministic=True, method="encode_news")
    split = model.apply(
        variables, batch, vecs, deterministic=True, method="score_with_vectors"
    )
    np.testing.assert_allclose(np.asarray(fused), np.asarray(split), atol=1e-5)
