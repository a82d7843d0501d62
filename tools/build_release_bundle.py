"""Build the portable deployment bundle.

The reference ships a PyInstaller portable folder (`AudioForge.spec`,
`build_exe.ps1`); the TPU framework's deployable unit is a plain directory —
package sources, pre-compiled native host libraries, the headless ops tools,
and a build-provenance record — that `bundle_runtime.py` can load directly
and `prune_bundle.py`/`verify` keep honest against
`evaluation/release-bundle-path-baseline.json`.

Layout (under --dist, default `dist/audioforge-tpu`):

    audioforge_tpu/...          package sources
    native/libafringbuffer.so   compiled SPSC ring
    native/libafingest.so       compiled host ingest shim
    tools/...                   headless ops subset
    release-assets.json         hash-pinned asset manifest
    audioforge-build.json       version + commit + build time
"""

from __future__ import annotations

import argparse
import json
import shutil
import subprocess
import sys
from datetime import datetime, timezone
from pathlib import Path

REPO_ROOT = Path(__file__).resolve().parents[1]
if str(REPO_ROOT) not in sys.path:
    sys.path.insert(0, str(REPO_ROOT))

BUNDLED_TOOLS = (
    "health_check.py",
    "self_test.py",
    "bundle_runtime.py",
    "verify_release_assets.py",
    "_evaluation_common.py",
)
NATIVE_SOURCES = {
    "libafringbuffer.so": "ringbuffer.cpp",
    "libafingest.so": "ingest.cpp",
}


def _compile_native(out_dir: Path) -> list[str]:
    built = []
    for lib_name, source in NATIVE_SOURCES.items():
        src = REPO_ROOT / "native" / source
        dst = out_dir / lib_name
        cmd = ["g++", "-O2", "-shared", "-fPIC", "-std=c++17",
               "-o", str(dst), str(src)]
        result = subprocess.run(cmd, capture_output=True, text=True)
        if result.returncode != 0:
            raise RuntimeError(f"native build failed for {source}:\n{result.stderr}")
        built.append(lib_name)
    return built


def _copy_package(dist: Path) -> int:
    count = 0
    for src in sorted((REPO_ROOT / "audioforge_tpu").rglob("*.py")):
        rel = src.relative_to(REPO_ROOT)
        dst = dist / rel
        dst.parent.mkdir(parents=True, exist_ok=True)
        shutil.copy2(src, dst)
        count += 1
    return count


def build_bundle(dist: Path) -> dict:
    if dist.exists():
        shutil.rmtree(dist)
    dist.mkdir(parents=True)

    file_count = _copy_package(dist)

    native_dir = dist / "native"
    native_dir.mkdir()
    built = _compile_native(native_dir)
    file_count += len(built)

    tools_dir = dist / "tools"
    tools_dir.mkdir()
    for name in BUNDLED_TOOLS:
        shutil.copy2(REPO_ROOT / "tools" / name, tools_dir / name)
        file_count += 1

    manifest = REPO_ROOT / "release-assets.json"
    if manifest.is_file():
        shutil.copy2(manifest, dist / "release-assets.json")
        file_count += 1

    import audioforge_tpu

    commit = subprocess.run(
        ["git", "rev-parse", "HEAD"], cwd=REPO_ROOT,
        capture_output=True, text=True, check=False,
    ).stdout.strip() or "unknown"
    build_record = {
        "name": "audioforge-tpu",
        "version": audioforge_tpu.__version__,
        "commit": commit,
        "built_at_utc": datetime.now(timezone.utc).isoformat(),
        "native_libraries": built,
    }
    (dist / "audioforge-build.json").write_text(
        json.dumps(build_record, indent=2, sort_keys=True) + "\n"
    )
    file_count += 1

    total_bytes = sum(p.stat().st_size for p in dist.rglob("*") if p.is_file())
    return {"path": str(dist), "files": file_count, "bytes": total_bytes}


def main() -> int:
    parser = argparse.ArgumentParser()
    parser.add_argument("--dist", type=Path,
                        default=REPO_ROOT / "dist" / "audioforge-tpu")
    args = parser.parse_args()
    info = build_bundle(args.dist)
    print(f"bundle built: {info['files']} files, {info['bytes']} bytes")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
