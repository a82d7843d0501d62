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

# Children spawned by tests (tool subprocesses) must never touch the
# tunnelled TPU either — a dead/busy tunnel blocks backend init forever.
# Plain JAX_PLATFORMS is unreliable (the preloaded axon module rewrites it
# at interpreter start); the package honours AUDIOFORGE_PLATFORM through
# jax.config before any backend initialises, so export that for children.
os.environ.setdefault("AUDIOFORGE_PLATFORM", "cpu")
# Disable the processor's fused backlog drain by default: its background
# warm worker compiles a burst-shaped live-chain graph per processor
# start, which the 1-core CI host cannot afford per test. The dedicated
# drain test (test_runtime.py::TestFusedDrainProcessor) opts back in with
# monkeypatch.setenv before constructing its processor.
os.environ.setdefault("AUDIOFORGE_MAX_DRAIN_BLOCKS", "1")

import jax

jax.config.update("jax_platforms", "cpu")
# Persistent compilation cache: the parallel-scan kernels are compile-heavy
# on CPU; caching makes re-runs fast.
os.environ.setdefault("AUDIOFORGE_JAX_CACHE", "/tmp/afx_jax_cache")
from audioforge_tpu.cache import enable_compile_cache  # noqa: E402

enable_compile_cache()

import numpy as np
import pytest

# Compile-heavy suites (fused chain / serving / engine graphs): on the
# single-core CPU dev host their XLA compiles dominate wall clock. The
# two-tier split keeps the default developer loop under budget:
#
#   pytest -m "not jit_heavy" -q     # fast tier (numeric DSP + aux logic)
#   pytest -m jit_heavy -q           # compile-heavy tier
#
# Both tiers together are the full suite; see docs/testing.md for the
# measured per-file wall times behind this list.
JIT_HEAVY_MODULES = frozenset({
    "test_serving.py",
    "test_runtime.py",
    "test_fused_chain.py",
    "test_golden.py",
    "test_models.py",
    "test_sharding.py",
    "test_rnnoise_exact.py",
    "test_api.py",
})


def pytest_configure(config):
    config.addinivalue_line(
        "markers",
        "jit_heavy: compile-heavy suite (fused chain/serving/engine graphs)",
    )


def pytest_collection_modifyitems(config, items):
    for item in items:
        module_file = item.nodeid.split("::", 1)[0].rsplit("/", 1)[-1]
        if module_file in JIT_HEAVY_MODULES:
            item.add_marker(pytest.mark.jit_heavy)


@pytest.fixture
def rng():
    return np.random.default_rng(0x5EED)


@pytest.fixture
def no_persistent_cache():
    """Disable the persistent compile cache for the duration of a test.

    The jaxlib serializer can SIGSEGV while WRITING large executables
    (r4 judged runs died inside ``put_executable_and_time`` during
    test_serving; r5 reproduced it on the mesh-sharded serving graph).
    The affected graphs are one-off test shapes that gain nothing from
    cross-run caching, so the cache is simply off around them — reads
    and writes both."""
    import jax

    prev = jax.config.jax_compilation_cache_dir
    jax.config.update("jax_compilation_cache_dir", None)
    try:
        yield
    finally:
        jax.config.update("jax_compilation_cache_dir", prev)
