"""Device timing helpers.

On the axon-tunneled TPU platform in this container, ``block_until_ready``
acknowledges before device execution completes and each host<->device fetch
pays a ~30ms relay round trip.  True per-step time is therefore measured by
pipelining N independent step launches, forcing completion by fetching one
scalar derived from the LAST step's output, and differencing against a 1-step
run:  step_time = (T_N - T_1) / (N - 1).
"""

from __future__ import annotations

import time
from typing import Callable

import jax
import jax.numpy as jnp


def _fetch(out) -> float:
    leaf = jax.tree.leaves(out)[0]
    return float(jnp.ravel(leaf)[0])


def timeit_pipelined(fn: Callable, *args, steps: int = 20, warmup: int = 2) -> float:
    """Per-step wall time (seconds) of ``fn(*args)``, tunnel-latency corrected.

    ``fn`` must be side-effect free w.r.t. ``args`` (same call repeated).
    """
    for _ in range(warmup):
        _fetch(fn(*args))

    def run(n: int) -> float:
        t0 = time.time()
        out = None
        for _ in range(n):
            out = fn(*args)
        _fetch(out)
        return time.time() - t0

    t1 = min(run(1) for _ in range(3))
    tn = min(run(steps) for _ in range(2))
    return max((tn - t1) / (steps - 1), 1e-9)
