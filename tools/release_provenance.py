"""Release provenance record: bind the source revision to its evidence.

Framework counterpart of `python/tools/release_provenance.py`: one compact
record tying the git revision to the release-asset manifest digest, the
tracked evaluation decisions, and the latest hardware-validation outcome —
so a shipped build's facts are reconstructible from the repo alone.
"""

from __future__ import annotations

import hashlib
import json
import subprocess
import sys
from pathlib import Path

_REPO_ROOT = Path(__file__).resolve().parents[1]
if str(_REPO_ROOT / "tools") not in sys.path:
    sys.path.insert(0, str(_REPO_ROOT / "tools"))

from _evaluation_common import utc_now, write_report  # noqa: E402


def _git(*args) -> str:
    return subprocess.run(
        ["git", *args], cwd=_REPO_ROOT, check=True, capture_output=True,
        text=True,
    ).stdout.strip()


def main() -> int:
    revision = _git("rev-parse", "HEAD")
    dirty = bool(_git("status", "--porcelain"))

    manifest_path = _REPO_ROOT / "release-assets.json"
    manifest_sha = (
        hashlib.sha256(manifest_path.read_bytes()).hexdigest()
        if manifest_path.exists() else None
    )

    decisions = {}
    for path in sorted((_REPO_ROOT / "evaluation").glob("*.json")):
        if path.name == "release-provenance.json":
            continue
        try:
            record = json.loads(path.read_text())
        except json.JSONDecodeError:
            continue
        if isinstance(record.get("decision"), dict):
            decisions[path.stem] = record["decision"]

    hw = {}
    hw_path = _REPO_ROOT / "evaluation" / "hardware-validation-report.json"
    if hw_path.exists():
        record = json.loads(hw_path.read_text())
        hw = {
            "outcome": record.get("decision", {}).get("hardware_validation"),
            "chain_throughput_audio_sec_per_sec": record.get(
                "metrics", {}
            ).get("chain_throughput_audio_sec_per_sec"),
            "accelerator": record.get("environment", {}).get("accelerator"),
        }

    import audioforge_tpu

    report = {
        "schema_version": 1,
        "generated_at_utc": utc_now(),
        "source": {"revision": revision, "dirty_worktree": dirty},
        "package_version": audioforge_tpu.__version__,
        "release_assets_manifest_sha256": manifest_sha,
        "evaluation_decisions": decisions,
        "hardware_validation": hw,
    }
    write_report("release-provenance.json", report)
    return 0


if __name__ == "__main__":
    sys.exit(main())
