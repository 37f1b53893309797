"""Multi-host data sharding.

Reference analog: Lightning's DistributedSampler under DDP.  On multi-host
TPU, each process loads/assembles only its shard of impressions
(``jax.process_index()``) and builds per-host batches; global batches are
assembled with ``jax.make_array_from_single_device_arrays`` or simply by
keeping per-host batch dims (DP over the data axis).
"""

from __future__ import annotations

import numpy as np

from newsreclib_tpu.data.batching import Impressions


def shard_impressions(
    imp: Impressions, process_index: int, process_count: int
) -> Impressions:
    """Deterministic strided shard of the impression set for this host."""
    if process_count <= 1:
        return imp
    sel = np.arange(process_index, len(imp), process_count)
    hist_lens = np.diff(imp.hist_offsets)[sel]
    cand_lens = np.diff(imp.cand_offsets)[sel]

    def gather_csr(flat, offsets, lens, idxs):
        out_off = np.zeros(len(idxs) + 1, dtype=np.int64)
        np.cumsum(lens, out=out_off[1:])
        pieces = [flat[offsets[i] : offsets[i + 1]] for i in idxs]
        out_flat = np.concatenate(pieces) if pieces else flat[:0]
        return out_flat, out_off

    hist_flat, hist_off = gather_csr(imp.hist_flat, imp.hist_offsets, hist_lens, sel)
    cand_flat, cand_off = gather_csr(imp.cand_flat, imp.cand_offsets, cand_lens, sel)
    # labels share cand offsets
    lab_pieces = [
        imp.labels_flat[imp.cand_offsets[i] : imp.cand_offsets[i + 1]] for i in sel
    ]
    labels_flat = np.concatenate(lab_pieces) if lab_pieces else imp.labels_flat[:0]
    return Impressions(
        hist_flat, hist_off, cand_flat, cand_off, labels_flat,
        imp.user_idx[sel],
        None if imp.user_ids is None else imp.user_ids[sel],
    )
