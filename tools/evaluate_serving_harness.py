"""Serving-harness evaluation: multi-stream throughput and step latency.

Measures the :class:`audioforge_tpu.runtime.serving.ServingEngine` — the
batched-stream production-serving path — across fleet sizes, separating the
two quantities that matter:

- **compute capability** (the fused scan with device-resident audio:
  inputs pre-staged, outputs reduced on device): per-block chip time and
  aggregate audio-sec/sec for the full live chain (routing → auto-gate →
  smart gate → RNNoise → de-esser → EQ → compressor → limiter →
  true-peak) — the binding realtime gate;
- **host audio I/O** (``step_many`` end-to-end) and **interactive
  dispatch** (``step``: one device call per 10 ms block): advisory on dev
  hosts — the tunnelled TPU's ~100 MB/s link and per-call RTT dominate
  there (measured ~21 ms/block of pure transfer at fleet 256), while
  production host↔chip links move the same audio in tens of µs.

Decision gates (binding on accelerators):
- the fused path must sustain realtime per stream at every fleet size
  (per-block compute below the 10 ms block period), and
- aggregate fused throughput must grow with fleet size (batching pays).

Regenerates ``evaluation/serving-harness-report.json``.
"""

from __future__ import annotations

import sys
import time
from pathlib import Path

REPO_ROOT = Path(__file__).resolve().parent.parent
if str(REPO_ROOT) not in sys.path:
    sys.path.insert(0, str(REPO_ROOT))

from tools._evaluation_common import utc_now, write_report  # noqa: E402

from audioforge_tpu.cache import enable_compile_cache  # noqa: E402

# the serving-engine graphs at five fleet sizes are compile-heavy; the
# persistent cache makes regeneration pay compile once per machine
enable_compile_cache()

BLOCK_PERIOD_S = 480 / 48000.0
FLEET_SIZES = (1, 4, 16, 256, 1024)
# DeepFilterNet3 chains are ~15x the FLOPs of the RNNoise chain; the
# ladder stops earlier and the binding requirement is realtime at fleet 1
# (the product mode must serve) with the max realtime fleet REPORTED as
# the chip's DFN3 capacity (VERDICT r4 missing #4; reference gates the
# per-frame runtime in `evaluation/deepfilter-fullband-report.json`)
DFN3_FLEET_SIZES = (1, 16, 64, 256)
SCAN_SPAN_BLOCKS = 100  # 1 s of audio per fused device call
SCAN_REPEATS = 5
INTERACTIVE_WARMUP = 10
INTERACTIVE_BLOCKS = 60
# device-side per-block latency distribution (round-1 review #8): fleets
# small enough for interactive serving, measured by the difference method
# (T(span) - median T(1)) / (span - 1) so fixed dispatch/tunnel RTT cancels
DEVICE_LATENCY_FLEETS = (1, 16)
DEVICE_LATENCY_SPAN = 8
DEVICE_LATENCY_REPEATS = 40
DEVICE_LATENCY_RUNS = 3  # across-run variance of the p99


def _percentile(values, q):
    values = sorted(values)
    idx = min(len(values) - 1, max(0, int(round(q / 100.0 * (len(values) - 1)))))
    return values[idx]


def evaluate():
    import jax
    import numpy as np

    from audioforge_tpu.runtime import live_chain as lc
    from audioforge_tpu.runtime.serving import BLOCK, ServingConfig, ServingEngine

    platform = jax.devices()[0].platform
    chain = lc.LiveChainConfig(deesser_enabled=True)
    vad_chain = lc.LiveChainConfig(
        deesser_enabled=True, gate_mode=lc.gate_ops.VAD_ASSISTED)
    rng = np.random.default_rng(0xF1EE7)

    def fused_compute_per_block(eng, fleet):
        """Best-of-N fused-scan chip time per block (inputs device-resident,
        output reduced on device)."""
        import jax
        import jax.numpy as jnp

        from audioforge_tpu.runtime import serving as srv

        params = eng._device_params()
        active = jnp.ones((fleet,), jnp.bool_)
        reset = jnp.zeros((fleet,), jnp.bool_)
        vp = jnp.zeros((fleet,), jnp.float32)
        va = jnp.zeros((fleet,), jnp.bool_)
        xs = jnp.asarray(
            (0.1 * rng.standard_normal((SCAN_SPAN_BLOCKS, fleet, BLOCK)))
            .astype(np.float32))

        @jax.jit
        def compute_only(params, state, xs):
            _, ys, _ = srv._serving_scan(
                eng.config, params, state, eng._fresh, xs, active, reset,
                vp, va)
            return jnp.sum(ys)

        float(compute_only(params, eng._state, xs))  # compile
        best = 1e9
        for _ in range(SCAN_REPEATS):
            t0 = time.perf_counter()
            float(compute_only(params, eng._state, xs))
            best = min(best, time.perf_counter() - t0)
        return best / SCAN_SPAN_BLOCKS, (compute_only, params, xs)

    results = []
    for fleet in FLEET_SIZES:
        eng = ServingEngine(ServingConfig(
            capacity=fleet, suppressor_model="rnnoise", vad_enabled=False,
            chain=chain))
        slots = [eng.attach() for _ in range(fleet)]

        def feed(n_blocks):
            for s in slots:
                eng.push(s, (0.1 * rng.standard_normal(n_blocks * BLOCK))
                         .astype(np.float32))

        # ---- fused-scan compute (device-resident: the binding figure) ----
        # Inputs pre-staged, outputs reduced on device: measures what the
        # chip does per block. Host audio I/O is measured separately below
        # — on the tunnelled dev TPU it is bandwidth-bound (~100 MB/s) and
        # NOT representative of production host<->chip links.
        per_block_s, (compute_only, params, xs) = fused_compute_per_block(
            eng, fleet)
        fused_audio_sec_per_sec = fleet * BLOCK_PERIOD_S / per_block_s

        # ---- the same fused sweep with the in-step batched VAD + the
        # VAD-assisted gate (the flagship gating mode): its fleet-scale
        # cost is a tracked headline (bench.py secondary line) ----
        vad_eng = ServingEngine(ServingConfig(
            capacity=fleet, suppressor_model="rnnoise", vad_enabled=True,
            chain=vad_chain))
        for _ in range(fleet):
            vad_eng.attach()
        vad_per_block_s, _ = fused_compute_per_block(vad_eng, fleet)
        del vad_eng

        # ---- fused path with host audio I/O (advisory on dev tunnels) ----
        feed(SCAN_SPAN_BLOCKS)
        eng.step_many(SCAN_SPAN_BLOCKS)  # compile
        io_times = []
        for _ in range(SCAN_REPEATS):
            feed(SCAN_SPAN_BLOCKS)
            t0 = time.perf_counter()
            eng.step_many(SCAN_SPAN_BLOCKS)
            io_times.append(time.perf_counter() - t0)
        io_per_block_s = min(io_times) / SCAN_SPAN_BLOCKS

        # ---- interactive path (per-call dispatch) ----
        # skipped at the largest fleet: per-call host transfer dominates on
        # dev tunnels and the figure adds nothing beyond the smaller fleets
        step_times = [io_per_block_s]
        pipelined_times = [io_per_block_s]
        if fleet <= 256:
            step_times = []
            for i in range(INTERACTIVE_WARMUP + INTERACTIVE_BLOCKS):
                feed(1)
                t0 = time.perf_counter()
                eng.step()
                dt = time.perf_counter() - t0
                if i >= INTERACTIVE_WARMUP:
                    step_times.append(dt)
            # pipelined interactive: device compute overlaps host delivery
            # (the free-run loop's default path)
            pipelined_times = []
            for i in range(INTERACTIVE_WARMUP + INTERACTIVE_BLOCKS):
                feed(1)
                t0 = time.perf_counter()
                eng.step_pipelined()
                dt = time.perf_counter() - t0
                if i >= INTERACTIVE_WARMUP:
                    pipelined_times.append(dt)
            eng.flush_pipeline()

        # ---- device-side per-block latency distribution + variance ----
        device_latency = None
        if fleet in DEVICE_LATENCY_FLEETS:
            xs_one = xs[:1]
            xs_span = xs[:DEVICE_LATENCY_SPAN]
            float(compute_only(params, eng._state, xs_one))  # compile
            float(compute_only(params, eng._state, xs_span))

            def run_once():
                t1, tn = [], []
                for _ in range(DEVICE_LATENCY_REPEATS):
                    t0 = time.perf_counter()
                    float(compute_only(params, eng._state, xs_one))
                    t1.append(time.perf_counter() - t0)
                    t0 = time.perf_counter()
                    float(compute_only(params, eng._state, xs_span))
                    tn.append(time.perf_counter() - t0)
                base = _percentile(t1, 50)
                return [max(0.0, (t - base) / (DEVICE_LATENCY_SPAN - 1))
                        for t in tn]

            runs = [run_once() for _ in range(DEVICE_LATENCY_RUNS)]
            all_samples = [s for run in runs for s in run]
            run_p99s = [_percentile(run, 99) for run in runs]
            device_latency = {
                "method": (
                    f"(T({DEVICE_LATENCY_SPAN} blocks) - median T(1)) / "
                    f"{DEVICE_LATENCY_SPAN - 1}; fixed dispatch cancels"),
                "samples_per_run": DEVICE_LATENCY_REPEATS,
                "runs": DEVICE_LATENCY_RUNS,
                "p50_seconds": _percentile(all_samples, 50),
                "p95_seconds": _percentile(all_samples, 95),
                "p99_seconds": _percentile(all_samples, 99),
                "per_run_p99_seconds": run_p99s,
                "p99_run_spread_seconds": max(run_p99s) - min(run_p99s),
                "p99_under_block_period": (
                    _percentile(all_samples, 99) < BLOCK_PERIOD_S),
            }

        results.append({
            "fleet_size": fleet,
            "fused_per_block_seconds": per_block_s,
            "fused_aggregate_audio_sec_per_sec": fused_audio_sec_per_sec,
            "fused_realtime_ok": per_block_s <= BLOCK_PERIOD_S,
            "fused_per_stream_realtime_margin": BLOCK_PERIOD_S / per_block_s,
            "vad_on_fused_per_block_seconds": vad_per_block_s,
            "vad_on_fused_aggregate_audio_sec_per_sec": (
                fleet * BLOCK_PERIOD_S / vad_per_block_s),
            "vad_on_fused_realtime_ok": vad_per_block_s <= BLOCK_PERIOD_S,
            "vad_on_cost_ratio": vad_per_block_s / per_block_s,
            "fused_with_host_io_per_block_seconds": io_per_block_s,
            "host_io_overhead_per_block_seconds": max(
                0.0, io_per_block_s - per_block_s),
            "interactive_median_step_seconds": _percentile(step_times, 50),
            "interactive_p95_step_seconds": _percentile(step_times, 95),
            "interactive_dispatch_overhead_seconds": max(
                0.0, _percentile(step_times, 50) - per_block_s
            ),
            "interactive_pipelined_median_step_seconds": _percentile(
                pipelined_times, 50),
            "interactive_pipelined_p95_step_seconds": _percentile(
                pipelined_times, 95),
            **({"device_block_latency": device_latency}
               if device_latency is not None else {}),
        })

    # ---- DeepFilterNet3 fleet ladder (standard variant; LL included
    # once a trained archive exists) ----
    from audioforge_tpu.models import dfn3 as dfn3_model

    dfn3_models = ["deepfilter"]
    try:
        dfn3_model.resolve_weight_path(low_latency=True)
        dfn3_models.append("deepfilter-ll")
    except Exception:
        pass
    dfn3_sections = {}
    for model_name in dfn3_models:
        rows = []
        for fleet in DFN3_FLEET_SIZES:
            deng = ServingEngine(ServingConfig(
                capacity=fleet, suppressor_model=model_name,
                vad_enabled=False, chain=chain))
            for _ in range(fleet):
                deng.attach()
            per_block_s, _ = fused_compute_per_block(deng, fleet)
            rows.append({
                "fleet_size": fleet,
                "fused_per_block_seconds": per_block_s,
                "fused_aggregate_audio_sec_per_sec": (
                    fleet * BLOCK_PERIOD_S / per_block_s),
                "fused_realtime_ok": per_block_s <= BLOCK_PERIOD_S,
                "fused_per_stream_realtime_margin": (
                    BLOCK_PERIOD_S / per_block_s),
            })
            del deng
        realtime_fleets = [r["fleet_size"] for r in rows
                           if r["fused_realtime_ok"]]
        dfn3_sections[model_name] = {
            "results": rows,
            "max_realtime_fleet_measured": (
                max(realtime_fleets) if realtime_fleets else 0),
            "realtime_at_fleet_1": bool(rows and rows[0]["fused_realtime_ok"]),
        }

    throughput_grows = all(
        results[i + 1]["fused_aggregate_audio_sec_per_sec"]
        > results[i]["fused_aggregate_audio_sec_per_sec"]
        for i in range(len(results) - 1)
    )
    all_realtime = all(r["fused_realtime_ok"] for r in results)
    vad_all_realtime = all(r["vad_on_fused_realtime_ok"] for r in results)
    device_p99_ok = all(
        r["device_block_latency"]["p99_seconds"] < BLOCK_PERIOD_S
        for r in results if "device_block_latency" in r
    )
    gates_binding = platform != "cpu"

    dfn3_realtime = all(s["realtime_at_fleet_1"]
                        for s in dfn3_sections.values())

    return {
        "schema_version": 3,
        "report": "serving-harness",
        "generated_at_utc": utc_now(),
        "platform": platform,
        "configuration": {
            "chain": "routing+auto-gate+gate+rnnoise+deesser+eq+compressor+limiter+true-peak",
            "suppressor_model": "rnnoise",
            "block_samples": 480,
            "fleet_sizes": list(FLEET_SIZES),
            "scan_span_blocks": SCAN_SPAN_BLOCKS,
            "interactive_blocks": INTERACTIVE_BLOCKS,
        },
        "results": results,
        "deepfilter": dfn3_sections,
        "gates": {
            "binding": gates_binding,
            "all_fleets_fused_realtime": all_realtime,
            "vad_on_all_fleets_fused_realtime": vad_all_realtime,
            "throughput_grows_with_fleet": throughput_grows,
            "device_block_p99_under_period_small_fleets": device_p99_ok,
            "deepfilter_realtime_at_fleet_1": dfn3_realtime,
        },
        "decision": {
            "status": "pass" if (throughput_grows
                                 and ((all_realtime and vad_all_realtime
                                       and device_p99_ok and dfn3_realtime)
                                      or not gates_binding))
            else "fail",
            "summary": (
                ("fused serving sustains realtime at every fleet size and "
                 "scales with fleet"
                 if all_realtime and throughput_grows else
                 "fused serving scales with fleet; realtime gate "
                 + ("advisory on this host" if not gates_binding
                    else "FAILED"))
                + "; interactive per-call dispatch overhead reported "
                  "separately (tunnel RTT on dev hosts)"
            ),
        },
    }


def main() -> int:
    report = evaluate()
    write_report("serving-harness-report.json", report)
    print(report["decision"]["summary"])
    return 0 if report["decision"]["status"] == "pass" else 1


if __name__ == "__main__":
    raise SystemExit(main())
