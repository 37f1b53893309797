"""Profiling / tracing hooks.

Reference analog: Lightning's config-selected profilers
(``configs/trainer/default.yaml:22``, ``debug/profiler.yaml``).  TPU-native
equivalents: ``jax.profiler`` traces (viewable in TensorBoard/XProf or
Perfetto) and a lightweight step timer.
"""

from __future__ import annotations

import contextlib
import logging
import time
from collections import defaultdict
from typing import Dict, Iterator, Optional

import jax

log = logging.getLogger("newsreclib_tpu")


@contextlib.contextmanager
def trace(out_dir: str) -> Iterator[None]:
    """Capture a jax profiler trace for the enclosed block.

    View with: tensorboard --logdir <out_dir> (XProf) or upload the
    .trace.json.gz from <out_dir>/plugins/profile to Perfetto.
    """
    jax.profiler.start_trace(out_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()
        log.info("profiler trace written to %s", out_dir)


def annotate(name: str):
    """Named region inside a trace (TraceAnnotation)."""
    return jax.profiler.TraceAnnotation(name)


class StepTimer:
    """Aggregating wall-clock timer for named phases.

    NOTE: on the axon-tunneled TPU, wall time around an async dispatch
    measures enqueue, not execution — use
    ``newsreclib_tpu.utils.timing.timeit_pipelined`` for kernel timing; this
    timer is for host-side phases (batch assembly, ETL, logging).
    """

    def __init__(self):
        self._totals: Dict[str, float] = defaultdict(float)
        self._counts: Dict[str, int] = defaultdict(int)

    @contextlib.contextmanager
    def phase(self, name: str) -> Iterator[None]:
        t0 = time.perf_counter()
        try:
            yield
        finally:
            self._totals[name] += time.perf_counter() - t0
            self._counts[name] += 1

    def summary(self) -> Dict[str, Dict[str, float]]:
        return {
            k: {
                "total_s": round(self._totals[k], 4),
                "count": self._counts[k],
                "mean_ms": round(1e3 * self._totals[k] / max(self._counts[k], 1), 3),
            }
            for k in sorted(self._totals)
        }

    def log_summary(self) -> None:
        for name, row in self.summary().items():
            log.info(
                "phase %-24s total %.3fs  n=%d  mean %.2fms",
                name, row["total_s"], row["count"], row["mean_ms"],
            )
