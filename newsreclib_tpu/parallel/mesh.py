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


# Megatron-style tensor-parallel layout for the PLM transformer tower
# (components/plm.py::TransformerLayer, params under ``layer_<i>/``):
# q/k/v and ff1 shard their OUTPUT features (column-parallel — each model
# shard owns a contiguous block of heads / MLP hidden units), attn_out and
# ff2 shard their INPUT features (row-parallel); under GSPMD a single
# all-reduce per block reassembles activations after attn_out / ff2.
# Reference analog: none — the reference is DDP-only (SURVEY.md §2.6).
_TP_COL = ("/q/kernel", "/k/kernel", "/v/kernel", "/ff1/kernel")
_TP_COL_BIAS = ("/q/bias", "/k/bias", "/v/bias", "/ff1/bias")
_TP_ROW = ("/attn_out/kernel", "/ff2/kernel")


def _leaf_spec(name: str, x, want_rows: bool, want_tp: bool):
    ndim = getattr(x, "ndim", 0)
    if want_rows and ndim == 2 and name.endswith("embedding/embedding"):
        return P("model", None)
    if want_tp and "layer_" in name:
        if ndim == 2 and name.endswith(_TP_COL):
            return P(None, "model")
        if ndim == 1 and name.endswith(_TP_COL_BIAS):
            return P("model")
        if ndim == 2 and name.endswith(_TP_ROW):
            return P("model", None)
    return P()


def param_shardings(params, mesh: Mesh, row_shard_embeddings: bool = True,
                    tp_transformer: bool = False):
    """Sharding pytree for model params.  Everything replicated except:

    - 2-D ``*/embedding/embedding`` tables (word/entity vocab tables),
      row-sharded over ``model`` when the axis is >1 (SURVEY.md §2.6:
      MINDlarge GloVe vocab ~0.5M rows × 300);
    - with ``tp_transformer=True``, the PLM tower's per-layer q/k/v/ff1
      (column-parallel) and attn_out/ff2 (row-parallel) kernels — tensor
      parallelism over the same ``model`` axis, so a 12-layer tower's
      weights and its attention/MLP FLOPs split across model shards.
    """
    big = mesh.shape.get("model", 1) > 1
    want_rows = row_shard_embeddings and big
    want_tp = tp_transformer and big

    def spec_for(path, x):
        name = "/".join(str(p.key) for p in path if hasattr(p, "key"))
        return NamedSharding(mesh, _leaf_spec(name, x, want_rows, want_tp))

    return jax.tree_util.tree_map_with_path(spec_for, params)


def put_global(x, sharding: NamedSharding):
    """Place a host/local value onto a (possibly multi-host) sharding.

    Single-process: plain ``device_put`` (zero-copy when already on device).
    Multi-host: every process must hold the SAME full value (true for
    replicated init params — same seed everywhere — and for corpus feature
    tables); the global array is assembled from per-process shards via
    ``make_array_from_callback``.
    """
    if jax.process_count() == 1:
        return jax.device_put(x, sharding)
    if hasattr(x, "dtype") and jax.dtypes.issubdtype(x.dtype, jax.dtypes.prng_key):
        raw = np.asarray(jax.random.key_data(x))
        g = jax.make_array_from_callback(raw.shape, sharding, lambda idx: raw[idx])
        return jax.random.wrap_key_data(g, impl=jax.random.key_impl(x))
    arr = np.asarray(x)
    return jax.make_array_from_callback(arr.shape, sharding, lambda idx: arr[idx])


def place_state(state, mesh: Mesh, row_shard_embeddings: bool = True,
                tp_transformer: bool = False):
    """Place a TrainState onto the mesh: params per ``param_shardings``,
    optimizer state following the same rule (adam's mu/nu mirror the param
    tree — replicating a row-sharded table's moments would keep 2× the full
    table's bytes on every device, defeating the sharding), RNG replicated.
    The production multi-device path (``train.py`` / ``Trainer``) and the
    driver dryrun both go through here."""
    shardings = param_shardings(state.params, mesh, row_shard_embeddings,
                                tp_transformer)
    params = jax.tree.map(put_global, state.params, shardings)
    repl = replicated(mesh)
    big = mesh.shape.get("model", 1) > 1
    want_rows = row_shard_embeddings and big
    want_tp = tp_transformer and big

    def opt_spec(path, x):
        name = "/".join(str(p.key) for p in path if hasattr(p, "key"))
        return NamedSharding(mesh, _leaf_spec(name, x, want_rows, want_tp))

    opt_shardings = jax.tree_util.tree_map_with_path(opt_spec, state.opt_state)
    opt_state = jax.tree.map(put_global, state.opt_state, opt_shardings)
    return state.replace(
        params=params,
        opt_state=opt_state,
        dropout_rng=put_global(state.dropout_rng, repl),
    )


def shard_batch(batch, mesh: Mesh):
    """Place a host batch onto the mesh, sharded over the data axis.

    Leading-dim-sharded for every leaf EXCEPT the unique-news table, which is
    replicated (its rows are indexed by every data shard).
    """
    from newsreclib_tpu.data.batch import RecBatch

    data_s = batch_sharding(mesh)
    repl = replicated(mesh)
    multi_host = jax.process_count() > 1

    def place(x, shard):
        if multi_host and shard is data_s:
            # each process holds only its shard of the global batch
            # (parallel/data.py::shard_impressions); assemble the global
            # array from per-process local data (SNIPPETS.md pattern [3])
            return jax.make_array_from_process_local_data(shard, np.asarray(x))
        return jax.device_put(x, shard)

    if isinstance(batch, RecBatch):
        if multi_host and batch.news is not None:
            # A per-batch deduped news table is process-local (each host
            # deduped ITS impression shard), so it cannot be replicated as a
            # global array.  Multi-host training uses GLOBAL-ROW batches:
            # ``TrainBatcher(global_rows=True)`` emits ``news=None`` batches
            # carrying corpus row ids, and the jitted step dedups on device
            # against a device-resident corpus table
            # (``data/batch.py::densify``).  ``train.py`` selects this mode
            # automatically when ``process_count > 1``.
            raise ValueError(
                "multi-host shard_batch requires global-row batches "
                "(news=None): use TrainBatcher(global_rows=True) + "
                "Trainer(corpus=..., u_bucket=...)"
            )
        news = jax.tree.map(lambda x: place(x, repl), batch.news)
        news2 = jax.tree.map(lambda x: place(x, repl), batch.news2)
        rest = jax.tree.map(
            lambda x: place(x, data_s),
            batch._replace(news=None, news2=None)._asdict(),
        )
        rest["news"] = news
        rest["news2"] = news2
        return RecBatch(**rest)
    return jax.tree.map(lambda x: place(x, data_s), batch)
