"""Record comparable release hardening metrics across versions.

Mirrors the reference's `python/tools/update_release_trends.py` (report
`evaluation/release-trends.json`): each entry pins the package version and
git commit, then records package size, headline runtime, and the
hardware-validation outcome from the tracked evaluation reports so releases
stay comparable over time. Entries are append-or-replace by version and the
file stays deterministic (sorted keys, no absolute paths).
"""

from __future__ import annotations

import argparse
import hashlib
import json
import subprocess
import sys
from datetime import datetime, timezone
from pathlib import Path

REPO_ROOT = Path(__file__).resolve().parents[1]
if str(REPO_ROOT) not in sys.path:
    sys.path.insert(0, str(REPO_ROOT))

TRENDS_PATH = REPO_ROOT / "evaluation" / "release-trends.json"
HARDWARE_REPORT = REPO_ROOT / "evaluation" / "hardware-validation-report.json"
FAILURE_COUNTERS = (
    "input_dropped_samples",
    "output_underrun_total",
    "output_short_writes",
    "stream_restart_count",
    "suppressor_non_finite_count",
)


def _sha256(path: Path) -> str:
    return hashlib.sha256(path.read_bytes()).hexdigest()


def _git_commit() -> str:
    result = subprocess.run(
        ["git", "rev-parse", "HEAD"],
        cwd=REPO_ROOT,
        capture_output=True,
        text=True,
        check=False,
    )
    commit = result.stdout.strip()
    return commit if result.returncode == 0 and len(commit) == 40 else "unknown"


def _package_metrics() -> dict:
    tracked = subprocess.run(
        ["git", "ls-files"], cwd=REPO_ROOT, capture_output=True, text=True,
        check=False,
    )
    if tracked.returncode != 0:
        return {"status": "not_measured", "reason": "git unavailable"}
    names = [n for n in tracked.stdout.splitlines() if n]
    total = sum(
        (REPO_ROOT / name).stat().st_size
        for name in names
        if (REPO_ROOT / name).is_file()
    )
    return {
        "status": "measured",
        "value": {"bytes": total, "file_count": len(names)},
    }


def _hardware_metrics() -> dict:
    if not HARDWARE_REPORT.is_file():
        return {
            "status": "not_measured",
            "reason": "No release-matched hardware-validation report present.",
        }
    report = json.loads(HARDWARE_REPORT.read_text())
    metrics = report.get("metrics", {})
    bench = metrics.get("bench", {})
    return {
        "status": "measured",
        "value": {
            "report_sha256": _sha256(HARDWARE_REPORT),
            "decision": report.get("decision", {}).get("hardware_validation"),
            "accelerator": report.get("environment", {}).get("accelerator"),
            "chain_throughput_audio_sec_per_sec": metrics.get(
                "chain_throughput_audio_sec_per_sec"
            ),
            "p99_block_latency_ms": bench.get("p99_block_latency_ms"),
            "self_test_confidence": metrics.get("self_test", {}).get("confidence"),
            "stress_bounded": metrics.get("stress", {}).get("bounded"),
        },
    }


def _latency_metrics() -> dict:
    """The interactive-latency story as tracked trend keys: device-side
    per-block p99 per fleet (serving report, gated < 10 ms), host dispatch
    overhead, and end-to-end engine latency at the host block multiple the
    sustained health run passes at (hardware report), next to the
    reference's published 38.44 ms engine latency."""
    serving = REPO_ROOT / "evaluation" / "serving-harness-report.json"
    out: dict = {}
    if serving.is_file():
        report = json.loads(serving.read_text())
        rows = report.get("results", report.get("fleets", [])) or []
        device_p99 = {}
        dispatch_ms = {}
        for row in rows:
            fleet = row.get("fleet_size")
            lat = row.get("device_block_latency") or {}
            if lat.get("p99_seconds") is not None:
                device_p99[str(fleet)] = round(
                    lat["p99_seconds"] * 1000.0, 3)
            if row.get("interactive_dispatch_overhead_seconds") is not None:
                dispatch_ms[str(fleet)] = round(
                    row["interactive_dispatch_overhead_seconds"] * 1000.0, 3)
        out["device_block_p99_ms_by_fleet"] = device_p99
        out["host_dispatch_overhead_ms_by_fleet"] = dispatch_ms
        out["device_block_p99_under_period"] = report.get("gates", {}).get(
            "device_block_p99_under_period_small_fleets")
    if HARDWARE_REPORT.is_file():
        health = json.loads(HARDWARE_REPORT.read_text()).get(
            "metrics", {}).get("host_health", {})
        out["engine_latency_ms_at_passing_host_config"] = health.get(
            "engine_latency_ms")
        out["host_block_multiple"] = health.get("host_block_multiple")
        out["reference_engine_latency_ms"] = health.get(
            "reference_engine_latency_ms", 38.44)
    if not out:
        return {"status": "not_measured", "reason": "no latency reports"}
    return {"status": "measured", "value": out}


def _runtime_metrics() -> dict:
    """Headline runtime from the sustained virtual-device health counters."""
    health = REPO_ROOT / "evaluation" / "hardware-validation-report.json"
    if not health.is_file():
        return {"status": "not_measured", "reason": "no hardware report"}
    report = json.loads(health.read_text())
    counters = {
        name: report.get("metrics", {}).get(
            "host_health", report.get("metrics", {}).get(
                "host_health_advisory", {})).get(name)
        for name in FAILURE_COUNTERS
    }
    return {"status": "measured", "value": {"failure_counters": counters}}


def build_entry(status: str) -> dict:
    import audioforge_tpu

    return {
        "version": audioforge_tpu.__version__,
        "status": status,
        "commit": _git_commit(),
        "recorded_at_utc": datetime.now(timezone.utc).isoformat(),
        "package": _package_metrics(),
        "hardware": _hardware_metrics(),
        "runtime": _runtime_metrics(),
        "latency": _latency_metrics(),
    }


def main() -> int:
    parser = argparse.ArgumentParser()
    parser.add_argument("--status", default="candidate",
                        choices=("candidate", "published"))
    args = parser.parse_args()

    trends = {"schema_version": 1, "releases": []}
    if TRENDS_PATH.is_file():
        trends = json.loads(TRENDS_PATH.read_text())
    entry = build_entry(args.status)
    releases = [
        r for r in trends.get("releases", []) if r.get("version") != entry["version"]
    ]
    releases.append(entry)
    trends["releases"] = sorted(releases, key=lambda r: r["version"])
    TRENDS_PATH.write_text(
        json.dumps(trends, indent=2, sort_keys=True, allow_nan=False) + "\n"
    )
    print(f"wrote {TRENDS_PATH.relative_to(REPO_ROOT)}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
