"""Diagnostics-export privacy decision record.

Re-runs the reference's export audit (`python/tools/evaluate_diagnostics_export.py`,
report `evaluation/diagnostics-export-report.json`) against this framework's
`audioforge_tpu/diagnostics_export.py`: builds snapshots from a synthetic
fixture containing deliberately sensitive strings, then gates on the privacy
contract — raw device names absent, paths redacted, enums collapsed,
non-finite numbers removed, report-local pseudonyms, bounded size, and
deterministic output for fixed inputs.
"""

from __future__ import annotations

import hashlib
import json
import math
from datetime import datetime, timezone
from pathlib import Path

from _evaluation_common import _REPO_ROOT, utc_now, write_report

SENSITIVE_INPUT_NAME = "Sensitive Desk Mic (Jane's)"
SENSITIVE_OUTPUT_NAME = "C:/Users/jane/AppData/Speakers"
SENSITIVE_PATH = "/home/jane/secret/build"
WHEN = datetime(2026, 8, 16, 12, 0, 0, tzinfo=timezone.utc)
KEY_A = b"0123456789abcdef0123456789abcdef"
KEY_B = b"fedcba9876543210fedcba9876543210"


def _source_hash(rel: str) -> str:
    return hashlib.sha256((_REPO_ROOT / rel).read_bytes()).hexdigest()


def _fixture_snapshot(pseudonym_key: bytes):
    import audioforge_tpu.config as cfg
    from audioforge_tpu.diagnostics_export import build_diagnostics_snapshot

    diag = {
        "input_dropped_samples": 12,
        "output_underrun_total": 3,
        "noise_model": "rnnoise",
        "noise_backend_available": True,
        "noise_backend_failed": False,
        "last_stream_error": "device unplugged at " + SENSITIVE_PATH,
        "input_channel_mode": "definitely-not-an-enum",
        "rt_error_name": "none",
        "gate_fused_score": float("nan"),
    }
    return build_diagnostics_snapshot(
        app_version="0.1.0",
        runtime_diagnostics=diag,
        config=cfg.AppConfig(),
        processing_settings=cfg.Preset(name="fixture").to_dict(),
        input_device={
            "name": SENSITIVE_INPUT_NAME,
            "endpoint_id": "synthetic-endpoint-1",
            "host_api": "virtual",
            "direction": "input",
            "is_default": True,
        },
        output_device=SENSITIVE_OUTPUT_NAME,
        processing_sample_rate_hz=48000,
        output_sample_rate_hz=48000,
        running=True,
        generated_at=WHEN,
        pseudonym_key=pseudonym_key,
        system_info={
            "operating_system": "Linux",
            "os_version": SENSITIVE_PATH,
            "machine": "x86_64",
        },
    )


def _walk_numbers(node):
    if isinstance(node, dict):
        for value in node.values():
            yield from _walk_numbers(value)
    elif isinstance(node, (list, tuple)):
        for value in node:
            yield from _walk_numbers(value)
    elif isinstance(node, float):
        yield node


def main() -> int:
    from audioforge_tpu.diagnostics_export import (
        MAX_SERIALIZED_BYTES,
        serialize_diagnostics_snapshot,
    )

    snap_a = _fixture_snapshot(KEY_A)
    snap_a2 = _fixture_snapshot(KEY_A)
    snap_b = _fixture_snapshot(KEY_B)

    blob_a = serialize_diagnostics_snapshot(snap_a)
    blob_a2 = serialize_diagnostics_snapshot(snap_a2)
    text = blob_a.decode("utf-8")

    forbidden = (SENSITIVE_INPUT_NAME, SENSITIVE_OUTPUT_NAME, SENSITIVE_PATH,
                 "jane", "AppData")
    checks = {
        "schema": (
            isinstance(snap_a.get("schema"), dict)
            and snap_a["schema"].get("name") == "audioforge-support-snapshot"
        ),
        "forbidden_values_absent": not any(s in text for s in forbidden),
        "raw_errors_reduced_to_presence": SENSITIVE_PATH
        not in json.dumps(snap_a.get("runtime", {})),
        "non_finite_values_removed": all(
            math.isfinite(v) for v in _walk_numbers(snap_a)
        ),
        "report_local_pseudonyms": (
            snap_a["audio_engine"]["input_device"]["pseudonym"]
            != snap_b["audio_engine"]["input_device"]["pseudonym"]
        ),
        "deterministic_for_fixed_inputs": blob_a == blob_a2,
        "size_bounded": len(blob_a) <= MAX_SERIALIZED_BYTES,
        "privacy_contract_declared": True,
    }

    report = {
        "schema_version": 1,
        "generated_at": utc_now(),
        "status": "passed" if all(checks.values()) else "failed",
        "checks": checks,
        "metrics": {
            "maximum_bytes": MAX_SERIALIZED_BYTES,
            "serialized_bytes": len(blob_a),
            "processing_section_count": len(snap_a.get("processing", {})),
            "runtime_allowlisted_field_count": len(snap_a.get("runtime", {})),
        },
        "privacy_contract": {
            "raw_device_names_included": False,
            "arbitrary_paths_included": False,
            "environment_variables_included": False,
            "raw_audio_included": False,
            "secrets_included": False,
            "pseudonyms_are_report_local": True,
        },
        "provenance": {
            "fixture_contains_only_synthetic_identifiers": True,
            "source_hashes": {
                "audioforge_tpu/diagnostics_export.py": _source_hash(
                    "audioforge_tpu/diagnostics_export.py"
                ),
                "tools/evaluate_diagnostics_export.py": _source_hash(
                    "tools/evaluate_diagnostics_export.py"
                ),
                "tests/test_observability.py": _source_hash(
                    "tests/test_observability.py"
                ),
            },
        },
        "limitations": [
            "The snapshot is an allowlisted state sample, not a raw application log.",
            "Report-local pseudonyms cannot correlate devices across exports.",
            "Automated checks cannot prove completeness for future fields; new "
            "fields require explicit allowlisting and tests.",
        ],
    }
    write_report("diagnostics-export-report.json", report)
    return 0 if all(checks.values()) else 1


if __name__ == "__main__":
    raise SystemExit(main())
