"""AudioForge-TPU headless health check.

Runs the live processor for a duration and gates on callback health and the
zero-tolerance runtime counters, mirroring `python/tools/health_check.py`:
retiming counters are observational; recovery, callback-error, overflow,
short-write, and backlog-loss counters must stay at zero. Exit codes match
the reference (1 callback age, 2 unexpected recovery, 3 polling error,
4 failed recovery, 5 callback never observed, 6 critical counters).
"""

from __future__ import annotations

import sys
from pathlib import Path

# allow running directly from a source checkout
_REPO_ROOT = str(Path(__file__).resolve().parents[1])
if _REPO_ROOT not in sys.path:
    sys.path.insert(0, _REPO_ROOT)

import argparse
import json
import sys
import time

# Same strict set as `tools/health_check.py:18-34`.
_ZERO_REQUIRED_DIAGNOSTICS = (
    "input_dropped_samples",
    "input_backlog_dropped_samples",
    "input_backlog_recovery_count",
    "input_callback_error_count",
    "lock_contention_count",
    "output_callback_error_count",
    "output_recovery_count",
    "output_recovery_event_count",
    "output_short_write_dropped_samples",
    "output_underrun_streak",
    "rt_buffer_overflow_count",
    "rt_error_code",
    "stream_restart_count",
    "suppressor_non_finite_count",
)


def _zero_counter_verdict(diagnostics: dict, key: str) -> str | None:
    """``None`` when the counter exists and is exactly zero; otherwise a
    ``key=<what went wrong>`` description."""
    if key not in diagnostics:
        return f"{key}=missing"
    try:
        count = int(diagnostics[key] or 0)
    except (TypeError, ValueError):
        return f"{key}=invalid"
    return None if count == 0 else f"{key}={count}"


def critical_diagnostic_failures(diagnostics: dict, *,
                                 output_underrun_baseline: int) -> list[str]:
    """Every way a run can fail the zero-tolerance release gate: a strict
    counter moved (or is missing/unreadable), the suppressor backend is
    down or has latched failed, a stream error is recorded, or underruns
    advanced past the post-warmup baseline."""
    failures = [
        verdict
        for key in _ZERO_REQUIRED_DIAGNOSTICS
        if (verdict := _zero_counter_verdict(diagnostics, key)) is not None
    ]
    flag_checks = (
        (not diagnostics.get("noise_backend_available", False),
         "noise_backend_available=false"),
        (bool(diagnostics.get("noise_backend_failed", False)),
         "noise_backend_failed=true"),
        (bool(diagnostics.get("last_stream_error")),
         "last_stream_error=set"),
    )
    failures.extend(text for tripped, text in flag_checks if tripped)
    underruns = diagnostics.get("output_underrun_total")
    if not isinstance(underruns, (int, float)):
        failures.append("output_underrun_total=missing_or_invalid")
    elif int(underruns) != output_underrun_baseline:
        failures.append(
            f"output_underrun_total={int(underruns)} "
            f"(baseline {output_underrun_baseline})"
        )
    return failures


def main() -> int:
    parser = argparse.ArgumentParser(
        description="AudioForge-TPU headless health check."
    )
    parser.add_argument("--duration", type=float, default=60.0,
                        help="Total runtime in seconds (default 60).")
    parser.add_argument("--poll", type=float, default=0.5,
                        help="Polling interval in seconds (default 0.5).")
    parser.add_argument("--max-callback-age", type=int, default=2000,
                        help="Max allowed callback age in ms (default 2000).")
    parser.add_argument("--warmup", type=float, default=5.0,
                        help="Warmup grace in seconds (default 5).")
    parser.add_argument("--allow-recovery", action="store_true",
                        help="Allow auto-recovery events without failing.")
    parser.add_argument("--input-device", type=str, default=None)
    parser.add_argument("--output-device", type=str, default=None)
    parser.add_argument("--json", action="store_true",
                        help="Emit a JSON summary line on success.")
    parser.add_argument("--host-block-multiple", type=int, default=None,
                        help="Fused host step size in 10 ms blocks: one "
                             "device dispatch per H blocks, for hosts whose "
                             "per-dispatch overhead cannot hold 10 ms steps "
                             "at realtime. Adds (H-1)*10 ms + scaled output "
                             "priming to the documented latency; the "
                             "summary records the value used.")
    args = parser.parse_args()

    import os

    if args.host_block_multiple is not None:
        os.environ["AUDIOFORGE_HOST_BLOCK_MULTIPLE"] = str(
            max(1, args.host_block_multiple))

    # the persistent compile cache is part of the deployment recipe: a
    # cold in-process XLA compile mid-run would starve the DSP thread on
    # small hosts and read as a (false) realtime failure
    from audioforge_tpu.cache import enable_compile_cache

    enable_compile_cache()

    from audioforge_tpu import AudioProcessor

    processor = AudioProcessor()
    try:
        result = processor.start(args.input_device, args.output_device)
        print(f"Started processor: {result}")

        start = time.monotonic()
        warmup_start = start
        last_restart_count = processor.get_stream_restart_count()
        max_input_age = 0
        max_output_age = 0
        underrun_baseline: int | None = None

        while time.monotonic() - start < args.duration:
            try:
                input_age = processor.get_input_callback_age_ms()
                output_age = processor.get_output_callback_age_ms()
            except Exception as exc:  # noqa: BLE001
                print(f"Health check error: {type(exc).__name__}: {exc}")
                return 3

            recovery_result = processor.service_recovery()
            if recovery_result is False:
                err = processor.get_last_stream_error() or ""
                print(f"Health check failed: auto-recovery failed ({err}).")
                return 4

            restarts = processor.get_stream_restart_count()
            if restarts > last_restart_count:
                warmup_start = time.monotonic()

            now = time.monotonic()
            in_warmup = (now - warmup_start) < args.warmup
            input_unknown = input_age == 0 and processor._counters[
                "input_callback_at"
            ] == 0.0
            output_unknown = output_age == 0 and processor._counters[
                "output_callback_at"
            ] == 0.0

            if in_warmup and (input_unknown or output_unknown):
                last_restart_count = restarts
                time.sleep(args.poll)
                continue

            if not in_warmup and underrun_baseline is None:
                warm = processor.get_runtime_diagnostics()
                underrun_baseline = int(warm.get("output_underrun_total", 0))

            if not in_warmup and (input_unknown or output_unknown):
                missing = "/".join(
                    p for p, u in (("input", input_unknown),
                                   ("output", output_unknown)) if u
                )
                print(
                    "Health check failed: callback never observed "
                    f"({missing}) after {args.warmup:.1f}s warmup."
                )
                return 5

            max_input_age = max(max_input_age, input_age)
            max_output_age = max(max_output_age, output_age)
            if (input_age > args.max_callback_age
                    or output_age > args.max_callback_age):
                print(
                    "Health check failed: callback age exceeded "
                    f"(input={input_age}ms, output={output_age}ms)."
                )
                return 1

            if not args.allow_recovery and restarts > last_restart_count:
                print(
                    "Health check failed: auto-recovery triggered "
                    f"(restarts={restarts})."
                )
                return 2
            last_restart_count = restarts
            time.sleep(args.poll)

        diagnostics = processor.get_runtime_diagnostics()
        failures = critical_diagnostic_failures(
            diagnostics, output_underrun_baseline=underrun_baseline or 0
        )
        if failures:
            print("Health check failed: " + ", ".join(sorted(failures)))
            return 6

        summary = {
            "duration_s": args.duration,
            "max_input_callback_age_ms": max_input_age,
            "max_output_callback_age_ms": max_output_age,
            "dsp_time_smoothed_ms": processor.get_dsp_time_smoothed_ms(),
            "host_block_multiple": int(
                diagnostics.get("host_block_multiple", 1)),
            "engine_latency_ms": processor.get_engine_latency_ms(),
            "result": "pass",
        }
        if args.json:
            print(json.dumps(summary))
        else:
            print(
                "Health check passed: max callback age "
                f"in={max_input_age}ms out={max_output_age}ms."
            )
        return 0
    finally:
        processor.stop()


if __name__ == "__main__":
    sys.exit(main())
