"""CI guard: evaluation records must stay compact and privacy-safe.

Mirrors `python/tools/check_evaluation_hygiene.py`
(`evaluation/README.md:30-32`): tracked evaluation JSON may not contain
absolute paths, home directories, user names, raw device names, or oversized
per-case dumps.
"""

from __future__ import annotations

import json
import re
import sys
from pathlib import Path

_REPO_ROOT = Path(__file__).resolve().parents[1]
EVALUATION_DIR = _REPO_ROOT / "evaluation"
MAX_BYTES = 256 * 1024

_FORBIDDEN_PATTERNS = (
    re.compile(r"[A-Za-z]:\\\\"),      # Windows drive paths
    re.compile(r'"/(?:home|Users|root|tmp|var)/'),  # absolute unix paths
    re.compile(r"\\\\\\\\"),           # UNC paths
    re.compile(r"(?i)hostname"),
    re.compile(r"(?i)ip_address"),
)


def check_file(path: Path) -> list[str]:
    problems: list[str] = []
    raw = path.read_bytes()
    if len(raw) > MAX_BYTES:
        problems.append(f"{path.name}: exceeds {MAX_BYTES} bytes")
    text = raw.decode("utf-8", errors="replace")
    try:
        json.loads(text)
    except json.JSONDecodeError as exc:
        problems.append(f"{path.name}: invalid JSON ({exc})")
        return problems
    for pattern in _FORBIDDEN_PATTERNS:
        if pattern.search(text):
            problems.append(
                f"{path.name}: matches forbidden pattern {pattern.pattern!r}"
            )
    return problems


def main() -> int:
    if not EVALUATION_DIR.exists():
        print("no evaluation directory; nothing to check")
        return 0
    problems: list[str] = []
    count = 0
    for path in sorted(EVALUATION_DIR.glob("*.json")):
        count += 1
        problems.extend(check_file(path))
    if problems:
        print("Evaluation hygiene check FAILED:")
        for p in problems:
            print(f"  - {p}")
        return 1
    print(f"Evaluation hygiene check passed ({count} records).")
    return 0


if __name__ == "__main__":
    sys.exit(main())
