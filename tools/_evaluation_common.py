"""Shared plumbing for evaluation decision records.

Mirrors the reference evaluation conventions (`evaluation/README.md:1-10`):
tracked JSON keeps only experiment configuration, aggregate metrics,
predefined gates, the decision, and limitations — no raw dumps, no absolute
paths, no local identifiers.
"""

from __future__ import annotations

import json
import sys
from datetime import datetime, timezone
from pathlib import Path

_REPO_ROOT = Path(__file__).resolve().parents[1]
if str(_REPO_ROOT) not in sys.path:
    sys.path.insert(0, str(_REPO_ROOT))

EVALUATION_DIR = _REPO_ROOT / "evaluation"


def utc_now() -> str:
    return datetime.now(timezone.utc).isoformat()


def _without_generation_stamp(report: dict) -> dict:
    return {k: v for k, v in report.items()
            if k not in ("generated_at", "generated_at_utc")}


def write_report(name: str, report: dict, *, force: bool = False) -> Path:
    EVALUATION_DIR.mkdir(parents=True, exist_ok=True)
    path = EVALUATION_DIR / name
    # Idempotent: tracked decision records should only change when their
    # CONTENT changes — a re-run that reproduces the same metrics/gates
    # keeps the existing file (and its generation stamp) so test-suite
    # regenerations don't churn version control with timestamp-only diffs.
    # ``force=True`` writes the fresh stamp even when content is equal:
    # used when a record is deliberately re-verified under a changed
    # evaluator so the freshness guard (check_report_gates) can see the
    # verification.
    if path.exists() and not force:
        try:
            existing = json.loads(path.read_text(encoding="utf-8"))
        except (OSError, ValueError):
            existing = None
        if (isinstance(existing, dict)
                and _without_generation_stamp(existing)
                == _without_generation_stamp(report)):
            print(f"unchanged {path.relative_to(_REPO_ROOT)}")
            return path
    payload = json.dumps(report, indent=2, sort_keys=True, allow_nan=False,
                         default=_json_default)
    path.write_text(payload + "\n", encoding="utf-8")
    print(f"wrote {path.relative_to(_REPO_ROOT)}")
    return path


def _json_default(value):
    """Numpy scalars leak into report dicts easily (a single un-cast
    ``float32`` crashes the whole record); coerce them here."""
    import numpy as _np

    if isinstance(value, (_np.floating, _np.integer)):
        return value.item()
    if isinstance(value, _np.bool_):
        return bool(value)
    if isinstance(value, _np.ndarray):
        return value.tolist()
    raise TypeError(f"not JSON serializable: {type(value).__name__}")
