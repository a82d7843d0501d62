"""Regenerate the hash-pinned release-asset manifest.

Framework counterpart of the reference's `release-assets.json` flow
(`README.md:166-205`): every shippable artifact — native sources, model
weight archives under ``models/``, and tracked evaluation records — is
pinned by SHA-256 so packaging and CI can verify exact bytes with
``tools/verify_release_assets.py``.
"""

from __future__ import annotations

import hashlib
import json
import sys
from pathlib import Path

_REPO_ROOT = Path(__file__).resolve().parents[1]
MANIFEST = _REPO_ROOT / "release-assets.json"

ASSET_GLOBS = (
    "native/*.cpp",
    "models/*.npz",
    "evaluation/*.json",
)


def _sha256(path: Path) -> str:
    digest = hashlib.sha256()
    with path.open("rb") as handle:
        for chunk in iter(lambda: handle.read(1 << 20), b""):
            digest.update(chunk)
    return digest.hexdigest()


def collect_assets() -> dict[str, dict]:
    assets = {}
    for pattern in ASSET_GLOBS:
        for path in sorted(_REPO_ROOT.glob(pattern)):
            rel = path.relative_to(_REPO_ROOT).as_posix()
            assets[rel] = {
                "sha256": _sha256(path),
                "bytes": path.stat().st_size,
            }
    return assets


def main() -> int:
    manifest = {"schema_version": 1, "assets": collect_assets()}
    MANIFEST.write_text(
        json.dumps(manifest, indent=2, sort_keys=True) + "\n",
        encoding="utf-8",
    )
    print(f"wrote {MANIFEST.name} ({len(manifest['assets'])} assets)")
    return 0


if __name__ == "__main__":
    sys.exit(main())
