"""Hardware validation record: run the framework's own battery on the
actual accelerator and gate the release.

Framework re-run of `python/tools/evaluate_hardware_validation.py` adapted
to the TPU deployment shape: instead of Windows release-artifact routes, the
gates are (1) the headline full-chain benchmark on the real chip against the
>=1000x-realtime north star, (2) the loopback probe/capture/correlation
self-test, and (3) the seeded control/DSP contention run staying finite.
The sustained host health check is a BINDING release gate (the reference's
30-minute zero-tolerance bar, `python/tools/health_check.py:18-34`): the
engine drives audio through the live loop for the full duration with zero
drops/underruns/restarts. On dispatch-bound hosts the engine runs at an
honest host block multiple (AUDIOFORGE_HOST_BLOCK_MULTIPLE: H fused blocks
per device call, latency accounted and reported), which is how this
environment's single-core CPU + tunnelled-TPU host sustains realtime.
"""

from __future__ import annotations

import argparse
import json
import platform
import re
import subprocess
import sys
from pathlib import Path

from _evaluation_common import _REPO_ROOT, utc_now, write_report

SELF_TEST_RESULT = re.compile(
    r"Self-test PASSED: round trip (?P<latency>[0-9]+\.[0-9]+) ms, "
    r"confidence (?P<confidence>[0-9]+\.[0-9]+)"
)


def _run(command, timeout=900):
    proc = subprocess.run(
        command, cwd=_REPO_ROOT, capture_output=True, text=True,
        timeout=timeout,
    )
    return {
        "command": " ".join(Path(c).name if "/" in str(c) else str(c)
                            for c in command),
        "exit_code": proc.returncode,
        "stdout_tail": proc.stdout.strip().splitlines()[-3:],
    }, proc.stdout


def main() -> int:
    parser = argparse.ArgumentParser()
    parser.add_argument("--skip-health", action="store_true")
    parser.add_argument("--health-duration", type=float, default=1800.0)
    parser.add_argument("--host-block-multiple", type=int, default=8)
    args = parser.parse_args()

    import jax

    runs = {}

    # 1) headline benchmark on the real chip
    bench_run, bench_out = _run([sys.executable, "bench.py"], timeout=2400)
    runs["bench"] = bench_run
    bench_json = None
    for line in bench_out.splitlines():
        if line.startswith("{"):
            bench_json = json.loads(line)
    throughput = float(bench_json["value"]) if bench_json else 0.0

    # 2) loopback self-test
    st_run, st_out = _run(
        [sys.executable, "tools/self_test.py", "--duration", "3",
         "--delay", "0.7"]
    )
    runs["self_test"] = st_run
    st_match = SELF_TEST_RESULT.search(st_out)
    self_test = {
        "passed": st_run["exit_code"] == 0 and st_match is not None,
        "round_trip_ms": float(st_match["latency"]) if st_match else None,
        "confidence": float(st_match["confidence"]) if st_match else None,
    }

    # 3) seeded contention stress
    from audioforge_tpu.runtime.stress_harness import (
        MAX_OUTPUT_ABS,
        run_seeded_control_dsp_stress,
    )

    report_stress = run_seeded_control_dsp_stress(seed=600, iterations=200)
    stress = {
        "control_updates": report_stress.control_updates,
        "processed_blocks": report_stress.processed_blocks,
        "max_output_abs": report_stress.max_output_abs,
        "bounded": report_stress.max_output_abs <= MAX_OUTPUT_ABS,
        # a bounded-but-idle run certifies nothing: the gate requires real
        # audio to have flowed through the mutation storm (the reference's
        # equivalent processes 600 live updates, `stress_tests.rs:12-25`)
        "active": (
            report_stress.processed_blocks >= 100
            and report_stress.max_output_abs > 0.0
        ),
    }

    # binding: sustained host health (zero-tolerance realtime pacing).
    # The reference's release bar is one clean 30-minute zero-drop run
    # (`python/tools/health_check.py:18-34`,
    # `evaluation/hardware-validation-v1.10.1-published.json`); a skipped
    # or sub-30-minute health run can therefore never produce a "pass"
    # decision — the report records it, but the decision is "fail".
    health = {"skipped": True, "passed": False, "binding": False}
    if not args.skip_health:
        h_run, h_out = _run(
            [sys.executable, "tools/health_check.py", "--duration",
             str(args.health_duration), "--warmup", "5",
             "--host-block-multiple", str(args.host_block_multiple),
             "--json"],
            timeout=args.health_duration + 600,
        )
        summary_json = None
        for line in h_out.splitlines():
            if line.startswith("{"):
                try:
                    summary_json = json.loads(line)
                except json.JSONDecodeError:
                    pass
        health = {
            "skipped": False,
            "passed": h_run["exit_code"] == 0,
            "binding": args.health_duration >= 1800.0,
            "duration_seconds": args.health_duration,
            "host_block_multiple": args.host_block_multiple,
            "exit_code": h_run["exit_code"],
            "summary": h_run["stdout_tail"],
            # honest end-to-end engine latency at the configuration that
            # actually passes on this host, stated next to the reference's
            # published figure (Zen 4 release bundle, 38.44 ms)
            "engine_latency_ms": (summary_json or {}).get(
                "engine_latency_ms"),
            "reference_engine_latency_ms": 38.44,
            "max_input_callback_age_ms": (summary_json or {}).get(
                "max_input_callback_age_ms"),
            "max_output_callback_age_ms": (summary_json or {}).get(
                "max_output_callback_age_ms"),
            "dsp_time_smoothed_ms": (summary_json or {}).get(
                "dsp_time_smoothed_ms"),
        }

    gates = {
        "throughput_min_audio_sec_per_sec": 1000.0,
        "self_test_min_confidence": 0.5,
        "stress_max_output_abs": MAX_OUTPUT_ABS,
        "stress_min_processed_blocks": 100,
        "host_health_zero_tolerance_min_seconds": 1800.0,
    }
    passed = (
        throughput >= gates["throughput_min_audio_sec_per_sec"]
        and self_test["passed"]
        and (self_test["confidence"] or 0.0)
        >= gates["self_test_min_confidence"]
        and stress["bounded"]
        and stress["active"]
        # host health is a binding release gate: it must have run for the
        # full 30-minute zero-tolerance duration AND passed
        and health["passed"]
        and health["binding"]
    )

    report = {
        "schema_version": 1,
        "generated_at_utc": utc_now(),
        "environment": {
            "accelerator": str(jax.devices()[0]),
            "backend": jax.default_backend(),
            "python_version": platform.python_version(),
        },
        "predefined_gates": gates,
        "metrics": {
            "chain_throughput_audio_sec_per_sec": throughput,
            "bench": bench_json,
            "self_test": self_test,
            "stress": stress,
            "host_health": health,
        },
        "runs": runs,
        "decision": {
            "hardware_validation": "pass" if passed else "fail",
            "reason": (
                "Throughput, loopback self-test, and contention gates hold "
                "on the target accelerator."
                if passed else "A hardware gate failed; see metrics."
            ),
        },
        "limitations": [
            "Single-chip run; multi-chip sharding validated separately on "
            "the virtual device mesh.",
            "Host health runs at the documented host block multiple "
            "(fused multi-block device dispatch) on dispatch-bound dev "
            "hosts; the added latency is reported by the engine.",
        ],
    }
    write_report("hardware-validation-report.json", report)
    return 0 if passed else 1


if __name__ == "__main__":
    raise SystemExit(main())
