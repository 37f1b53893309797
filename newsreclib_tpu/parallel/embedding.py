"""Row-sharded embedding tables for host-spanning vocabularies.

Reference analog: none — the reference replicates all tables under DDP.
For MINDlarge-scale vocabularies (GloVe 840B ~2.2M rows x 300 = 2.6GB f32)
replication wastes HBM; the TPU-native layout row-shards the table over the
``model`` mesh axis and lets XLA turn the lookup into a dynamic-slice +
all-reduce (each shard contributes the rows it owns; zeros elsewhere).

Usage: shard the param with ``NamedSharding(mesh, P("model", None))`` (see
``parallel/mesh.py::row_sharded`` and ``__graft_entry__.dryrun_multichip``);
inside jit, a plain ``jnp.take`` on the sharded table already compiles to
the right collectives under SPMD.  ``sharded_lookup`` below is the explicit
shard_map formulation for when manual control (e.g. custom padding rules)
is needed.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P


def sharded_lookup(table: jnp.ndarray, ids: jnp.ndarray, mesh: Mesh) -> jnp.ndarray:
    """Embedding lookup with the table row-sharded over the 'model' axis.

    Each shard gathers the ids it owns (local-range ids), zeroes the rest,
    and a psum over the model axis reassembles full vectors.  ids may be any
    shape; returns ids.shape + (dim,), replicated over the model axis.
    """
    n_shards = mesh.shape["model"]
    rows_total = table.shape[0]
    assert rows_total % n_shards == 0, (rows_total, n_shards)
    rows_local = rows_total // n_shards

    def body(local_table, ids):
        shard = jax.lax.axis_index("model")
        lo = shard * rows_local
        local_ids = ids - lo
        in_range = (local_ids >= 0) & (local_ids < rows_local)
        safe = jnp.where(in_range, local_ids, 0)
        out = jnp.take(local_table, safe, axis=0)
        out = out * in_range[..., None].astype(out.dtype)
        return jax.lax.psum(out, axis_name="model")

    return jax.shard_map(
        body,
        mesh=mesh,
        in_specs=(P("model", None), P()),
        out_specs=P(),
    )(table, ids)
