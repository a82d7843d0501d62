"""Calibration-fleet sharding evaluation: candidate-axis data parallelism.

Validates the multi-chip recipe (``docs/multichip_fleet.md``,
:mod:`audioforge_tpu.parallel.fleet`) on the virtual 8-device CPU mesh:

- **numerical parity**: the sharded candidate sweep must reproduce the
  unsharded sweep's per-candidate diagnostics exactly (sharding may never
  change semantics);
- **padding correctness**: candidate counts that don't divide the device
  count pad internally and return exactly the requested results;
- **full-search parity**: `_calibrate_compressor` (the Auto Voice Setup
  68-candidate bounded search) selects identical parameters with and
  without the mesh;
- **serving parity**: the production fused serving step (RNNoise +
  de-esser + in-step VAD-assisted gating, the exact config bench.py and
  the multichip dryrun use) produces numerically matching audio on the
  8-device mesh vs single-device execution;
- **wall-clock**: advisory on the CPU mesh (all virtual devices share the
  host's cores, so no speedup is expected here — the recipe's scaling
  claim is validated by structure: GSPMD confirms a collective-free
  partitioning of the batched scan).

Regenerates ``evaluation/fleet-sharding-report.json``.
"""

from __future__ import annotations

import os
import sys
import time
from pathlib import Path

REPO_ROOT = Path(__file__).resolve().parent.parent
if str(REPO_ROOT) not in sys.path:
    sys.path.insert(0, str(REPO_ROOT))

_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
from audioforge_tpu.cache import enable_compile_cache
enable_compile_cache()

import numpy as np  # noqa: E402

from tools._evaluation_common import write_report  # noqa: E402

CANDIDATES = 29  # deliberately not a multiple of 8: exercises padding
SERVING_STREAMS = 16  # 2 streams/device on the 8-device mesh
SERVING_BLOCKS = 25   # 250 ms per stream
# float32 round-off budget: GSPMD partitioning may re-associate reductions
# inside the fused step; audio samples are O(1), so 1e-5 absolute is ~100x
# ULP headroom while still catching any semantic divergence
SERVING_TOLERANCE = 1e-5


def _serving_outputs(sharding):
    """Run the production fused serving config (RNNoise + de-esser +
    in-step VAD-assisted gating) for SERVING_BLOCKS and return the
    per-stream output audio ``[N, blocks*BLOCK]``."""
    from audioforge_tpu.ops import gate as gate_ops
    from audioforge_tpu.runtime import live_chain as lc
    from audioforge_tpu.runtime.serving import (
        BLOCK,
        ServingConfig,
        ServingEngine,
    )

    eng = ServingEngine(
        ServingConfig(
            capacity=SERVING_STREAMS,
            suppressor_model="rnnoise",
            vad_enabled=True,
            chain=lc.LiveChainConfig(
                deesser_enabled=True,
                gate_mode=gate_ops.VAD_ASSISTED,
                auto_threshold_enabled=True,
            ),
        ),
        sharding=sharding,
    )
    rng = np.random.default_rng(0xFA111)
    audio = (0.1 * rng.standard_normal(
        (SERVING_STREAMS, SERVING_BLOCKS * BLOCK))).astype(np.float32)
    sinks = [[] for _ in range(SERVING_STREAMS)]
    for i in range(SERVING_STREAMS):
        slot = eng.attach(sink=sinks[i].append)
        eng.push(slot, audio[i])
    eng.run_blocks(SERVING_BLOCKS)
    return np.stack([np.concatenate(s) for s in sinks])


def _speech(seconds=2.0, fs=48000.0):
    rng = np.random.default_rng(0xF7EE7)
    t = np.arange(int(fs * seconds)) / fs
    bursts = (np.sin(2 * np.pi * 2.5 * t) > 0).astype(np.float32)
    return (0.15 * np.sin(2 * np.pi * 220 * t) * bursts
            + 0.12 * np.sin(2 * np.pi * 440 * t) * bursts
            + 0.008 * rng.standard_normal(t.size)).astype(np.float32)


def evaluate():
    from audioforge_tpu.api import simulate_auto_eq_chain_batched
    from audioforge_tpu.ops import eq as eq_ops
    from audioforge_tpu.parallel import fleet_mesh

    fs = 48000.0
    speech = _speech()
    bands = [
        (b.frequency_hz, 1.5 if i in (3, 4) else 0.0, 4.33)
        for i, b in enumerate(eq_ops.default_bands())
    ]
    rng = np.random.default_rng(1)
    cands = [
        {
            "threshold_db": float(-55.0 + 49.0 * rng.random()),
            "ratio": float(1.5 + 4.5 * rng.random()),
            "attack_ms": float(3.0 + 22.0 * rng.random()),
            "release_ms": float(60.0 + 260.0 * rng.random()),
        }
        for _ in range(CANDIDATES)
    ]

    t0 = time.perf_counter()
    plain = simulate_auto_eq_chain_batched(speech, fs, bands, None, cands)
    plain_s = time.perf_counter() - t0

    mesh = fleet_mesh()
    t0 = time.perf_counter()
    sharded = simulate_auto_eq_chain_batched(speech, fs, bands, None, cands,
                                             mesh=mesh)
    sharded_s = time.perf_counter() - t0

    worst = 0.0
    compared = 0
    for a, b in zip(plain, sharded):
        for k, v in a.items():
            if isinstance(v, float) and not k.endswith("runtime_ms"):
                worst = max(worst, abs(v - float(b[k])))
                compared += 1
    parity_ok = worst < 1e-5 and len(plain) == len(sharded) == CANDIDATES

    # full bounded search with and without the fleet
    from audioforge_tpu.analysis.voice_setup import _calibrate_compressor

    comp = {"threshold_db": -20.0, "ratio": 4.0, "attack_ms": 10.0,
            "release_ms": 200.0, "makeup_gain_db": 0.0, "enabled": True}
    eq_settings = {
        "band_freqs": [b.frequency_hz for b in eq_ops.default_bands()],
        "band_gains": [g for _, g, _ in bands],
        "band_qs": [q for _, _, q in bands],
    }
    kwargs = dict(
        speech_audio=speech, sample_rate=fs, eq_settings=eq_settings,
        deesser_settings=None, compressor_settings=dict(comp),
        target_p95_db=3.5, target_median_db=2.0, peak_cap_db=8.0,
    )
    sel_plain, diag_plain = _calibrate_compressor(**kwargs)
    sel_fleet, diag_fleet = _calibrate_compressor(**kwargs, mesh=mesh)
    search_keys = ("threshold_db", "ratio", "attack_ms", "release_ms")
    search_parity = all(
        abs(float(sel_plain[k]) - float(sel_fleet[k])) < 1e-9
        for k in search_keys
    )

    # production fused serving step: single-device vs 8-device mesh
    from jax.sharding import NamedSharding, PartitionSpec

    plain_audio = _serving_outputs(None)
    mesh_audio = _serving_outputs(
        NamedSharding(mesh, PartitionSpec(mesh.axis_names[0])))
    serving_diff = float(np.max(np.abs(plain_audio - mesh_audio)))
    serving_parity = (plain_audio.shape == mesh_audio.shape
                      and serving_diff < SERVING_TOLERANCE)

    status = ("pass" if (parity_ok and search_parity and serving_parity)
              else "fail")
    return {
        "schema_version": 1,
        "report": "fleet-sharding",
        "platform": jax.devices()[0].platform,
        "n_devices": len(jax.devices()),
        "configuration": {
            "candidates": CANDIDATES,
            "padding_exercised": CANDIDATES % len(jax.devices()) != 0,
            "audio_seconds": 2.0,
            "mesh_axis": "candidates",
        },
        "results": {
            "sweep_parity_max_abs_diff": worst,
            "sweep_diagnostics_compared": compared,
            "search_selected_plain": {k: float(sel_plain[k])
                                      for k in search_keys},
            "search_selected_fleet": {k: float(sel_fleet[k])
                                      for k in search_keys},
            "search_iterations_plain": diag_plain["iterations"],
            "search_iterations_fleet": diag_fleet["iterations"],
            "sweep_seconds_plain": plain_s,
            "sweep_seconds_sharded": sharded_s,
            "wall_clock_advisory": (
                "virtual CPU devices share host cores; scaling is "
                "structural (collective-free GSPMD partitioning), "
                "measured speedup requires real chips"
            ),
        },
        "serving_parity": {
            "config": ("rnnoise + de-esser + in-step VAD-assisted gating "
                       "(the bench.py production serving config)"),
            "streams": SERVING_STREAMS,
            "blocks": SERVING_BLOCKS,
            "tolerance_max_abs_diff": SERVING_TOLERANCE,
            "max_abs_diff": serving_diff,
            "passed": serving_parity,
        },
        "gates": {
            "sweep_parity": parity_ok,
            "search_selection_parity": search_parity,
            "serving_parity": serving_parity,
        },
        "decision": {
            "status": status,
            "summary": (
                "candidate-axis fleet sharding is semantics-preserving: "
                f"sweep parity {worst:.2e}, search selects identical "
                "parameters, and the production fused serving step matches "
                f"single-device audio within {serving_diff:.2e} on the "
                "8-device mesh"
                if status == "pass" else "FLEET PARITY FAILED"
            ),
        },
    }


def main() -> int:
    report = evaluate()
    write_report("fleet-sharding-report.json", report)
    print(report["decision"]["summary"])
    return 0 if report["decision"]["status"] == "pass" else 1


if __name__ == "__main__":
    raise SystemExit(main())
