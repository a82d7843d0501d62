"""Aggregate exact-artifact hardware cases into the autonomous release gate.

Counterpart of the reference's `python/tools/evaluate_hardware_matrix.py`:
validates every per-machine lifecycle case artifact
(``evaluation/hardware-cases/*.json``, produced by
``tools/run_hardware_case.py``) against the matrix contract —

- case schema v3 with ``exact-artifact-hardware`` qualification,
- all cases pass and share one source revision and one artifact hash,
- supported device class / sample rate / lifecycle scenario values,
- evidence rules: ``baseline`` must be automated; lifecycle scenarios on
  *physical* device classes need operator attestation, while the
  ``virtual`` class (this framework's registered virtual devices) is
  fully automated end-to-end,
- device identities are HMAC pseudonyms only (``device-<16 hex>``) — the
  privacy contract from the diagnostics export applies to case artifacts
  too —

then reports coverage (scenarios, device classes, sample rates) and the
matrix verdict. Regenerates ``evaluation/hardware-matrix-report.json``.
"""

from __future__ import annotations

import argparse
import json
import re
import sys
from pathlib import Path

REPO_ROOT = Path(__file__).resolve().parents[1]
if str(REPO_ROOT) not in sys.path:
    sys.path.insert(0, str(REPO_ROOT))

from tools._evaluation_common import write_report  # noqa: E402

CASES_DIR = REPO_ROOT / "evaluation" / "hardware-cases"
SUPPORTED_DEVICE_CLASSES = frozenset({"built_in", "usb", "virtual", "other"})
SUPPORTED_SAMPLE_RATES = frozenset({44_100, 48_000})
SUPPORTED_SCENARIOS = frozenset({
    "baseline", "device_reconnect", "default_device_change",
    "sleep_resume", "buffer_negotiation", "route_change",
})
MINIMUM_AUTOMATED_BASELINE_CASES = 1
PSEUDONYM = re.compile(r"^device-[0-9a-f]{16}$")


def _load_case(path: Path) -> tuple[dict, list[str]]:
    errors: list[str] = []
    try:
        report = json.loads(path.read_text(encoding="utf-8-sig"))
    except (OSError, UnicodeDecodeError, json.JSONDecodeError) as error:
        return {}, [f"{path.name}: unreadable report ({error})"]
    if not isinstance(report, dict):
        return {}, [f"{path.name}: root must be an object"]
    if report.get("schema_version") != 3:
        errors.append(f"{path.name}: hardware case schema must be 3")
    if report.get("qualification_kind") != "exact-artifact-hardware":
        errors.append(f"{path.name}: wrong qualification kind")
    if report.get("passed") is not True or report.get("status") != "passed":
        errors.append(f"{path.name}: case did not pass")
    if not str(report.get("source_revision", "")):
        errors.append(f"{path.name}: source revision is missing")
    artifact = report.get("artifact")
    if (not isinstance(artifact, dict)
            or not re.fullmatch(r"[0-9a-f]{64}",
                                str(artifact.get("archive_sha256", "")))):
        errors.append(f"{path.name}: exact artifact provenance is missing")
    case = report.get("case")
    if not isinstance(case, dict) or not str(case.get("id", "")):
        errors.append(f"{path.name}: case metadata is missing")
    else:
        device_class = case.get("device_class")
        scenario = case.get("scenario")
        evidence_kind = case.get("evidence_kind")
        if device_class not in SUPPORTED_DEVICE_CLASSES:
            errors.append(f"{path.name}: unsupported device class")
        if case.get("nominal_sample_rate_hz") not in SUPPORTED_SAMPLE_RATES:
            errors.append(f"{path.name}: unsupported nominal sample rate")
        if scenario not in SUPPORTED_SCENARIOS:
            errors.append(f"{path.name}: unsupported lifecycle scenario")
        if evidence_kind not in {"automated", "operator_observed"}:
            errors.append(f"{path.name}: unsupported evidence kind")
        if scenario == "baseline" and evidence_kind != "automated":
            errors.append(
                f"{path.name}: baseline case must use automated evidence")
        if (scenario != "baseline" and device_class != "virtual"
                and evidence_kind != "operator_observed"):
            errors.append(
                f"{path.name}: physical lifecycle scenario lacks operator "
                "evidence")
        if (scenario != "baseline" and device_class != "virtual"
                and case.get("operator_attestation") is not True):
            errors.append(
                f"{path.name}: physical lifecycle scenario lacks operator "
                "attestation")
        if case.get("scenario_evidence_valid") is not True:
            errors.append(f"{path.name}: scenario evidence was not validated")
    for field in ("package_smoke", "engine_startup", "model_discovery"):
        check = report.get(field)
        if not isinstance(check, dict) or check.get("passed") is not True:
            errors.append(f"{path.name}: {field} did not pass")
    routes = report.get("routes")
    if not isinstance(routes, dict):
        errors.append(f"{path.name}: route pseudonyms are missing")
    else:
        for route in routes.values():
            if not isinstance(route, dict):
                errors.append(f"{path.name}: invalid route record")
                continue
            for value in route.values():
                if (not isinstance(value, str)
                        or PSEUDONYM.fullmatch(value) is None):
                    errors.append(
                        f"{path.name}: raw or invalid device identity")
    return report, errors


def aggregate(report_paths: list[Path]) -> dict:
    reports: list[tuple[Path, dict]] = []
    errors: list[str] = []
    case_ids: set[str] = set()
    for path in sorted(report_paths):
        report, report_errors = _load_case(path)
        errors.extend(report_errors)
        case = report.get("case") if isinstance(report, dict) else None
        case_id = str(case.get("id", "")) if isinstance(case, dict) else ""
        if case_id in case_ids:
            errors.append(f"duplicate hardware case ID: {case_id}")
        elif case_id:
            case_ids.add(case_id)
        reports.append((path, report))

    revisions = {str(r.get("source_revision", "")) for _p, r in reports
                 if str(r.get("source_revision", ""))}
    if len(revisions) > 1:
        errors.append("hardware reports contain multiple source revisions")
    hashes = {str(r.get("artifact", {}).get("archive_sha256", ""))
              for _p, r in reports if isinstance(r.get("artifact"), dict)}
    if len(hashes) > 1:
        errors.append("hardware reports span multiple artifacts")

    def case_values(key):
        return sorted({
            str(r.get("case", {}).get(key, ""))
            for _p, r in reports if isinstance(r.get("case"), dict)
        } - {""})

    scenarios = case_values("scenario")
    automated_baselines = sum(
        1 for _p, r in reports
        if r.get("case", {}).get("scenario") == "baseline"
        and r.get("case", {}).get("evidence_kind") == "automated"
    )
    missing_baselines = max(
        0, MINIMUM_AUTOMATED_BASELINE_CASES - automated_baselines)
    missing_scenarios = sorted(SUPPORTED_SCENARIOS - set(scenarios))
    complete = (not errors and missing_baselines == 0
                and not missing_scenarios)

    return {
        "schema_version": 1,
        "report": "hardware-matrix",
        "qualification_kind": "exact-artifact-hardware-matrix",
        "status": "passed" if complete else "incomplete",
        "passed": complete,
        "case_count": len(reports),
        "case_ids": sorted(case_ids),
        "coverage": {
            "scenarios": scenarios,
            "missing_scenarios": missing_scenarios,
            "device_classes": case_values("device_class"),
            "sample_rates": sorted({
                int(r.get("case", {}).get("nominal_sample_rate_hz", 0) or 0)
                for _p, r in reports if isinstance(r.get("case"), dict)
            } - {0}),
            "automated_baseline_cases": automated_baselines,
        },
        "artifact": {"archive_sha256": next(iter(hashes), "")},
        "source_revision": next(iter(revisions), ""),
        "errors": errors,
        "decision": {
            "summary": (
                "full lifecycle matrix passed on this artifact"
                if complete else
                "matrix incomplete: "
                + "; ".join(errors[:3]
                            or [f"missing scenarios: {missing_scenarios}"])
            ),
        },
    }


def main() -> int:
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--cases-dir", type=Path, default=CASES_DIR)
    args = parser.parse_args()
    paths = sorted(args.cases_dir.glob("*.json"))
    report = aggregate(paths)
    write_report("hardware-matrix-report.json", report)
    print(report["decision"]["summary"])
    return 0 if report["passed"] else 1


if __name__ == "__main__":
    raise SystemExit(main())
