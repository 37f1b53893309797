"""Every cacheable model: encode_news + score_with_vectors must equal the
fused __call__ path (the cached-serving contract)."""

import jax
import numpy as np
import pytest

from newsreclib_tpu.models import fair_rec
from tests.test_model_zoo import MODELS, VOCAB, _batch

# sentirec's news tower is user-independent → cacheable (its aux sentiment
# losses exist only on the fused training path)
MODELS = dict(
    MODELS,
    sentirec=lambda: fair_rec.SentiRec(
        vocab_size=VOCAB, embed_dim=60, num_heads=6, query_dim=32
    ),
)

CACHEABLE = [
    "nrms", "naml", "lstur", "lstur_con", "tanr", "caum", "mins",
    "cen_news_rec", "dkn", "miner", "miner_mean", "nrms_late", "caum_late",
    "dkn_late", "sentirec",
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
