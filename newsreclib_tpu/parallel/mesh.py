"""Device mesh + sharding helpers.

Reference analog: the reference's only parallelism is Lightning DDP
(``configs/trainer/ddp.yaml:1-9``).  The TPU-native equivalent is SPMD over a
``jax.sharding.Mesh``: batches sharded over the ``data`` axis, parameters
replicated (with optional row-sharded embedding tables over a ``model``
axis), gradients all-reduced implicitly by jit-compiled collectives over ICI.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(
    devices: Optional[Sequence[jax.Device]] = None,
    data_axis: int = -1,
    model_axis: int = 1,
) -> Mesh:
    """Build a (data, model) mesh. model_axis=1 → pure data parallelism."""
    devices = list(devices if devices is not None else jax.devices())
    n = len(devices)
    assert n % model_axis == 0, (n, model_axis)
    arr = np.asarray(devices).reshape(n // model_axis, model_axis)
    return Mesh(arr, axis_names=("data", "model"))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Leading-axis data-parallel sharding for batch pytrees."""
    return NamedSharding(mesh, P("data"))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def row_sharded(mesh: Mesh) -> NamedSharding:
    """Row-shard an embedding table over the model axis."""
    return NamedSharding(mesh, P("model", None))


def shard_batch(batch, mesh: Mesh):
    """Place a host batch onto the mesh, sharded over the data axis.

    Leading-dim-sharded for every leaf EXCEPT the unique-news table, which is
    replicated (its rows are indexed by every data shard).
    """
    from newsreclib_tpu.data.batch import RecBatch

    data_s = batch_sharding(mesh)
    repl = replicated(mesh)

    def place(x, shard):
        return jax.device_put(x, shard)

    if isinstance(batch, RecBatch):
        news = jax.tree.map(lambda x: place(x, repl), batch.news)
        rest = jax.tree.map(lambda x: place(x, data_s), batch._replace(news=None)._asdict())
        rest["news"] = news
        return RecBatch(**rest)
    return jax.tree.map(lambda x: place(x, data_s), batch)
