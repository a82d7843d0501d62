"""Prune non-runtime payloads from a built bundle and check the path baseline.

Mirrors the reference's `python/tools/prune_bundle.py` + the tracked
`evaluation/release-bundle-path-baseline.json`: after pruning caches and
test/debug payloads, the bundle's relative path list must match the pinned
baseline exactly — any new path is a deliberate, reviewed addition
(`--update-baseline`), never an accident.
"""

from __future__ import annotations

import argparse
import json
import shutil
import sys
from pathlib import Path

REPO_ROOT = Path(__file__).resolve().parents[1]
BASELINE_PATH = REPO_ROOT / "evaluation" / "release-bundle-path-baseline.json"

PRUNE_DIR_NAMES = {"__pycache__", ".pytest_cache", "tests", ".mypy_cache"}
PRUNE_SUFFIXES = {".pyc", ".pyo", ".orig", ".rej", ".tmp"}


def prune_bundle(bundle_root: Path) -> list[Path]:
    removed: list[Path] = []
    for path in sorted(bundle_root.rglob("*"), reverse=True):
        if path.is_dir() and path.name in PRUNE_DIR_NAMES:
            shutil.rmtree(path)
            removed.append(path)
        elif path.is_file() and path.suffix in PRUNE_SUFFIXES:
            path.unlink()
            removed.append(path)
    return removed


def bundle_paths(bundle_root: Path) -> list[str]:
    return sorted(
        p.relative_to(bundle_root).as_posix()
        for p in bundle_root.rglob("*")
        if p.is_file()
    )


def check_baseline(paths: list[str]) -> list[str]:
    if not BASELINE_PATH.is_file():
        return ["baseline missing: run with --update-baseline to create it"]
    baseline = json.loads(BASELINE_PATH.read_text())["paths"]
    problems = []
    for extra in sorted(set(paths) - set(baseline)):
        problems.append(f"unexpected bundle path: {extra}")
    for gone in sorted(set(baseline) - set(paths)):
        problems.append(f"missing baseline path: {gone}")
    return problems


def main() -> int:
    parser = argparse.ArgumentParser()
    parser.add_argument("bundle", type=Path, nargs="?",
                        default=REPO_ROOT / "dist" / "audioforge-tpu")
    parser.add_argument("--update-baseline", action="store_true")
    args = parser.parse_args()

    bundle_root = args.bundle.resolve(strict=True)
    removed = prune_bundle(bundle_root)
    for path in removed:
        print(f"pruned {path.relative_to(bundle_root)}")

    paths = bundle_paths(bundle_root)
    if args.update_baseline:
        BASELINE_PATH.write_text(
            json.dumps(
                {"schema_version": 1, "paths": paths}, indent=2, sort_keys=True
            )
            + "\n"
        )
        print(f"wrote {BASELINE_PATH.relative_to(REPO_ROOT)} ({len(paths)} paths)")
        return 0

    problems = check_baseline(paths)
    for problem in problems:
        print(f"error: {problem}", file=sys.stderr)
    if not problems:
        print(f"bundle matches baseline ({len(paths)} paths)")
    return 1 if problems else 0


if __name__ == "__main__":
    raise SystemExit(main())
