"""Parallelism tests on the virtual 8-device CPU mesh."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from newsreclib_tpu.parallel.embedding import sharded_lookup
from newsreclib_tpu.parallel.mesh import make_mesh


def test_sharded_embedding_lookup_matches_dense():
    mesh = make_mesh(model_axis=2)
    rng = np.random.default_rng(0)
    table = jnp.asarray(rng.normal(size=(64, 16)).astype(np.float32))
    ids = jnp.asarray(rng.integers(0, 64, size=(5, 7)).astype(np.int32))
    got = sharded_lookup(table, ids, mesh)
    want = jnp.take(table, ids, axis=0)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-6)


def test_sharded_lookup_under_jit():
    mesh = make_mesh(model_axis=4)
    table = jnp.arange(32 * 8, dtype=jnp.float32).reshape(32, 8)
    ids = jnp.asarray([0, 31, 7, 16], dtype=jnp.int32)
    f = jax.jit(lambda t, i: sharded_lookup(t, i, mesh))
    np.testing.assert_allclose(
        np.asarray(f(table, ids)), np.asarray(jnp.take(table, ids, axis=0))
    )


def test_dryrun_multichip_entry():
    import __graft_entry__ as ge

    ge.dryrun_multichip(8)
