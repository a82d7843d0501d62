"""Verify shippable artifacts against the hash-pinned manifest.

Framework counterpart of `python/tools/verify_release_assets.py`: each
asset in ``release-assets.json`` must exist with the exact pinned SHA-256
and size; unexpected extra assets matching the shippable globs are also an
error (nothing ships merely because it exists locally).
"""

from __future__ import annotations

import json
import sys
from pathlib import Path

_REPO_ROOT = Path(__file__).resolve().parents[1]
if str(_REPO_ROOT / "tools") not in sys.path:
    sys.path.insert(0, str(_REPO_ROOT / "tools"))

from update_release_assets import MANIFEST, collect_assets  # noqa: E402


def main() -> int:
    if not MANIFEST.exists():
        print("release-assets.json is missing; run "
              "tools/update_release_assets.py")
        return 1
    pinned = json.loads(MANIFEST.read_text())["assets"]
    actual = collect_assets()

    problems = []
    for rel, meta in pinned.items():
        got = actual.get(rel)
        if got is None:
            problems.append(f"missing asset: {rel}")
        elif got["sha256"] != meta["sha256"]:
            problems.append(f"hash mismatch: {rel}")
        elif got["bytes"] != meta["bytes"]:
            problems.append(f"size mismatch: {rel}")
    for rel in actual:
        if rel not in pinned:
            problems.append(f"unpinned asset present: {rel}")

    if problems:
        print("Release asset verification FAILED:")
        for p in problems:
            print(f"  - {p}")
        return 1
    print(f"Release assets verified ({len(pinned)} pinned).")
    return 0


if __name__ == "__main__":
    sys.exit(main())
