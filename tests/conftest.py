"""Test configuration: force a virtual 8-device CPU mesh.

The environment preloads an ``axon`` module that pins the JAX platform to the
tunnelled TPU before conftest runs, so plain env vars are ignored; the
platform must be overridden through ``jax.config`` before any backend
initialises. Tests always run on CPU (the single real TPU chip is reserved
for bench.py).
"""

import os

_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax

jax.config.update("jax_platforms", "cpu")
# Persistent compilation cache: the parallel-scan kernels are compile-heavy
# on CPU; caching makes re-runs fast.
os.environ.setdefault("AUDIOFORGE_JAX_CACHE", "/tmp/afx_jax_cache")
from audioforge_tpu.cache import enable_compile_cache  # noqa: E402

enable_compile_cache()

import numpy as np
import pytest


@pytest.fixture
def rng():
    return np.random.default_rng(0x5EED)
