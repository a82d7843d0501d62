"""Load the framework's runtime directly from an extracted release bundle.

Mirrors the reference's `python/tools/bundle_runtime.py` (which resolves the
portable-folder layout and imports the native `mic_eq_core` extension from
inside it): resolves the bundle layout produced by
`tools/build_release_bundle.py`, validates the build record, pre-loads the
native host libraries via ctypes, and imports `audioforge_tpu` from the
bundle rather than the source tree.
"""

from __future__ import annotations

import ctypes
import importlib
import json
import sys
from pathlib import Path
from types import ModuleType


def resolve_bundle_layout(bundle_root: Path) -> dict[str, Path]:
    """Resolve and validate the deployable layout; raises on a broken bundle."""
    root = Path(bundle_root).resolve(strict=True)
    package_dir = root / "audioforge_tpu"
    native_dir = root / "native"
    build_record = root / "audioforge-build.json"
    if not (package_dir / "__init__.py").is_file():
        raise FileNotFoundError(f"bundle has no audioforge_tpu package: {root}")
    if not build_record.is_file():
        raise FileNotFoundError(f"bundle has no build record: {build_record}")
    layout = {
        "root": root,
        "package_dir": package_dir,
        "native_dir": native_dir,
        "build_record": build_record,
        "ringbuffer_library": native_dir / "libafringbuffer.so",
        "ingest_library": native_dir / "libafingest.so",
        "asset_manifest": root / "release-assets.json",
    }
    return layout


def load_build_record(layout: dict[str, Path]) -> dict:
    record = json.loads(layout["build_record"].read_text())
    for key in ("name", "version", "commit", "native_libraries"):
        if key not in record:
            raise ValueError(f"build record missing {key!r}")
    if record["name"] != "audioforge-tpu":
        raise ValueError(f"unexpected bundle name {record['name']!r}")
    return record


def load_native_libraries(layout: dict[str, Path]) -> dict[str, object]:
    """ctypes-load the bundled host libraries (skip gracefully if absent —
    the package falls back to its compile-on-first-use path)."""
    handles: dict[str, object] = {}
    # the ingest shim links against the ring's symbols, so the ring must be
    # loaded first and with global symbol visibility
    for key in ("ringbuffer_library", "ingest_library"):
        path = layout[key]
        if path.is_file():
            handles[key] = ctypes.CDLL(str(path), mode=ctypes.RTLD_GLOBAL)
    return handles


def import_bundled_runtime(bundle_root: Path) -> ModuleType:
    """Import `audioforge_tpu` from the bundle (shadowing any source tree)."""
    layout = resolve_bundle_layout(bundle_root)
    load_build_record(layout)
    load_native_libraries(layout)
    for name in [n for n in sys.modules if n.split(".")[0] == "audioforge_tpu"]:
        del sys.modules[name]
    sys.path.insert(0, str(layout["root"]))
    try:
        module = importlib.import_module("audioforge_tpu")
    finally:
        sys.path.remove(str(layout["root"]))
    loaded_from = Path(module.__file__).resolve()
    if layout["package_dir"].resolve() not in loaded_from.parents:
        raise RuntimeError(
            f"audioforge_tpu resolved outside the bundle: {loaded_from}"
        )
    return module


def main() -> int:
    import argparse

    parser = argparse.ArgumentParser()
    parser.add_argument("bundle", type=Path)
    args = parser.parse_args()
    module = import_bundled_runtime(args.bundle)
    record = load_build_record(resolve_bundle_layout(args.bundle))
    print(
        f"loaded audioforge_tpu {module.__version__} from bundle "
        f"(commit {record['commit'][:12]})"
    )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
