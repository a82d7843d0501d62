"""Stage verified runtime assets (converted model weights) into `models/`.

Framework counterpart of the reference's `python/tools/fetch_release_assets.py`
(which downloads `df.dll` / ONNX models and verifies them against the
hash-pinned `release-assets.json`). Here the runtime assets are converted
numpy weight archives for RNNoise / Silero VAD / DeepFilterNet3 produced by
`tools/convert_model_weights.py`. This environment has no network egress, so
the default source is a trusted local staging directory (`--from-dir`);
`--url-base` exists for deployments that mirror the assets internally.

Every staged file must match the `external_assets` section of
`release-assets.json` byte-for-byte (sha256 + size) before it is moved into
place — an unverifiable asset is never installed.
"""

from __future__ import annotations

import argparse
import hashlib
import json
import shutil
import sys
import tempfile
import urllib.request
from pathlib import Path

REPO_ROOT = Path(__file__).resolve().parents[1]
MANIFEST_PATH = REPO_ROOT / "release-assets.json"
MODELS_DIR = REPO_ROOT / "models"


def _sha256(path: Path) -> str:
    digest = hashlib.sha256()
    with path.open("rb") as handle:
        for chunk in iter(lambda: handle.read(1 << 20), b""):
            digest.update(chunk)
    return digest.hexdigest()


def external_assets() -> dict[str, dict]:
    manifest = json.loads(MANIFEST_PATH.read_text())
    return manifest.get("external_assets", {})


def stage_asset(name: str, pin: dict, source: Path) -> Path:
    if not source.is_file():
        raise FileNotFoundError(f"{name}: source not found: {source}")
    actual = _sha256(source)
    if actual != pin["sha256"]:
        raise ValueError(
            f"{name}: hash mismatch (expected {pin['sha256'][:12]}…, "
            f"got {actual[:12]}…) — refusing to install"
        )
    if source.stat().st_size != pin["bytes"]:
        raise ValueError(f"{name}: size mismatch — refusing to install")
    destination = MODELS_DIR / name
    destination.parent.mkdir(parents=True, exist_ok=True)
    shutil.copy2(source, destination)
    return destination


def main() -> int:
    parser = argparse.ArgumentParser()
    group = parser.add_mutually_exclusive_group()
    group.add_argument("--from-dir", type=Path,
                       help="trusted local staging directory")
    group.add_argument("--url-base",
                       help="internal mirror base URL (requires egress)")
    args = parser.parse_args()

    assets = external_assets()
    if not assets:
        print(
            "No external assets are pinned in release-assets.json — all "
            "tracked assets are generated in-repo; nothing to fetch."
        )
        return 0
    if args.from_dir is None and args.url_base is None:
        print("error: external assets are pinned but no --from-dir/--url-base "
              "source was given", file=sys.stderr)
        return 1

    failures = []
    for name, pin in sorted(assets.items()):
        try:
            if args.from_dir is not None:
                installed = stage_asset(name, pin, args.from_dir / name)
            else:
                with tempfile.TemporaryDirectory() as tmp:
                    tmp_path = Path(tmp) / Path(name).name
                    url = args.url_base.rstrip("/") + "/" + name
                    urllib.request.urlretrieve(url, tmp_path)
                    installed = stage_asset(name, pin, tmp_path)
            print(f"installed {installed.relative_to(REPO_ROOT)}")
        except (OSError, ValueError) as exc:
            failures.append(f"{name}: {exc}")

    for failure in failures:
        print(f"error: {failure}", file=sys.stderr)
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
