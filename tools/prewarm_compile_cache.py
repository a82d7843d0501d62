"""Pre-warm the persistent XLA compile cache with the hot graphs.

Compiles, in dependency order, the graphs that dominate cold-start wall
clock on CPU dev hosts and CI images: the live-chain halves, the serving
step at the capacities the test suite instantiates, and the offline
batched chain. After one run, `pytest -m jit_heavy` and the CLI pay cache
deserialization instead of compilation (see docs/testing.md).

Platform: forces CPU (the cache is keyed per backend; tests run on CPU).
"""

from __future__ import annotations

import os
import sys
import time
from pathlib import Path

REPO_ROOT = Path(__file__).resolve().parent.parent
if str(REPO_ROOT) not in sys.path:
    sys.path.insert(0, str(REPO_ROOT))

os.environ.setdefault("AUDIOFORGE_PLATFORM", "cpu")

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

from audioforge_tpu.cache import compile_cache_dir, enable_compile_cache  # noqa: E402

enable_compile_cache()

import numpy as np  # noqa: E402


def _timed(label, fn):
    t0 = time.perf_counter()
    fn()
    print(f"  {label}: {time.perf_counter() - t0:.1f}s")


def main() -> int:
    print(f"compile cache: {compile_cache_dir()}")

    from audioforge_tpu.runtime import live_chain as lc
    from audioforge_tpu.runtime.serving import (BLOCK, ServingConfig,
                                                ServingEngine)

    def serving(capacity, suppressor, vad, deesser):
        cfg = ServingConfig(
            capacity=capacity, suppressor_model=suppressor, vad_enabled=vad,
            chain=lc.LiveChainConfig(deesser_enabled=deesser))
        eng = ServingEngine(cfg)
        s = eng.attach()
        eng.push(s, np.zeros(2 * BLOCK, np.float32))
        eng.step()       # interactive step graph
        eng.step_many(2)  # fused scan graph

    # the capacities/configs the test suite and CLI instantiate most
    _timed("serving cap=2 bare", lambda: serving(2, None, False, False))
    _timed("serving cap=4 bare", lambda: serving(4, None, False, False))
    _timed("serving cap=2 rnnoise", lambda: serving(2, "rnnoise", False, False))
    _timed("serving cap=2 vad", lambda: serving(2, None, True, False))
    _timed("serving cap=2 full",
           lambda: serving(2, "rnnoise", True, True))

    def offline_chain():
        from audioforge_tpu.ops import compressor as comp_ops
        from audioforge_tpu.runtime import chain as chain_rt

        cfg = chain_rt.ChainConfig(
            sample_rate=48000.0, eq_enabled=True, compressor_enabled=True,
            limiter_enabled=True,
            compressor=comp_ops.CompressorConfig(
                sample_rate=48000.0, enabled=True, block_samples=480))
        params = comp_ops.compressor_params(cfg.compressor)
        state = chain_rt.chain_init(cfg, params)
        blocks = np.zeros((4, 480), np.float32)
        chain_rt.chain_run(cfg, params, state, blocks, return_audio=False)

    _timed("offline chain", offline_chain)

    print("cache pre-warm complete")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
