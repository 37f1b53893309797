"""Pallas kernel numerics tests (interpret mode on CPU)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from newsreclib_tpu.ops.mhsa import fused_small_mhsa, head_indicator, mhsa_reference


def test_head_indicator():
    e = np.asarray(head_indicator(60, 6))
    assert e.shape == (60, 6)
    assert e.sum() == 60
    assert np.all(e[:10, 0] == 1) and np.all(e[10:, 0] == 0)


@pytest.mark.parametrize("u,l,d,h", [(8, 6, 24, 4), (33, 30, 60, 6)])
def test_fused_mhsa_matches_reference(u, l, d, h):
    rng = np.random.default_rng(0)
    qkv = jnp.asarray(rng.normal(size=(u, l, 3 * d)).astype(np.float32))
    mask = jnp.asarray(rng.random((u, l)) < 0.85)
    mask = mask.at[:, 0].set(True)  # at least one valid key per article
    got = fused_small_mhsa(qkv, mask, num_heads=h, block_u=8, interpret=True)
    want = mhsa_reference(qkv, mask, num_heads=h)
    # padded key positions produce arbitrary context at padded QUERY rows;
    # compare only valid query rows (downstream pooling masks them anyway)
    m = np.asarray(mask)[..., None]
    np.testing.assert_allclose(
        np.asarray(got) * m, np.asarray(want) * m, atol=2e-5, rtol=1e-4
    )


def test_fused_mhsa_fully_masked_rows_are_finite():
    rng = np.random.default_rng(1)
    qkv = jnp.asarray(rng.normal(size=(8, 6, 36)).astype(np.float32))
    mask = jnp.zeros((8, 6), dtype=bool).at[0, 0].set(True)
    out = fused_small_mhsa(qkv, mask, num_heads=4, block_u=8, interpret=True)
    assert np.all(np.isfinite(np.asarray(out)))
