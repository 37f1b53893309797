"""Test configuration: force JAX onto a virtual 8-device CPU platform.

Must run before the first `import jax` anywhere in the test session, which
pytest guarantees by importing conftest first.  This is the TPU-native analog
of the reference's `ddp_sim` debug config (`configs/trainer/ddp_sim.yaml`):
multi-device semantics exercised on CPU processes/devices.
"""

import os

# The environment pins JAX_PLATFORMS=axon (remote TPU tunnel) and
# pre-imports jax via sitecustomize; override BOTH the env var and the
# already-read config so tests run on a local 8-device virtual CPU platform.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
os.environ.setdefault("JAX_ENABLE_X64", "0")
# zero-egress sandbox: make HF from_pretrained fail fast instead of
# spending minutes in connect/retry loops (PLM factories fall back to
# random init with a warning)
os.environ.setdefault("HF_HUB_OFFLINE", "1")
os.environ.setdefault("TRANSFORMERS_OFFLINE", "1")

import jax

jax.config.update("jax_platforms", "cpu")

# persistent XLA compilation cache: the suite is compile-bound (each model
# zoo / PLM / trainer test lowers a distinct program; ~10-20s each on 2
# CPUs).  With the cache warm, re-runs skip nearly all of it (measured
# ~14min → ~4min).  Safe across jax versions: entries are keyed on
# compiler/version/flags.
_CACHE_DIR = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                          ".cache", "jax_tests")
os.makedirs(_CACHE_DIR, exist_ok=True)
jax.config.update("jax_compilation_cache_dir", _CACHE_DIR)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)

import numpy as np
import pytest


@pytest.fixture
def rng():
    return np.random.default_rng(0)
