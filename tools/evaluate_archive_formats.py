"""Benchmark archive formats for the release bundle.

Framework counterpart of the reference's archive experiment
(`evaluation/archive-format-benchmark.json`, produced on Windows with 7z):
archive the same built bundle with every format available from the Python
standard library (zip store/deflate/bzip2/lzma, tar.gz, tar.bz2, tar.xz),
validate each archive by re-listing and test-extracting one member, and
record size/time so the release pipeline picks the best ratio within a
time budget.
"""

from __future__ import annotations

import argparse
import lzma
import shutil
import tarfile
import time
import zipfile
from pathlib import Path

from _evaluation_common import _REPO_ROOT, utc_now, write_report

DEFAULT_BUNDLE = _REPO_ROOT / "dist" / "audioforge-tpu"


def _zip_archive(bundle: Path, out: Path, compression, level=None) -> None:
    kwargs = {} if level is None else {"compresslevel": level}
    with zipfile.ZipFile(out, "w", compression=compression, **kwargs) as zf:
        for path in sorted(bundle.rglob("*")):
            if path.is_file():
                zf.write(path, path.relative_to(bundle).as_posix())


def _tar_archive(bundle: Path, out: Path, mode: str) -> None:
    with tarfile.open(out, mode) as tf:
        tf.add(bundle, arcname=bundle.name, recursive=True)


def _validate(out: Path) -> bool:
    try:
        if out.suffix == ".zip":
            with zipfile.ZipFile(out) as zf:
                bad = zf.testzip()
                return bad is None and len(zf.namelist()) > 0
        with tarfile.open(out, "r:*") as tf:
            members = tf.getmembers()
            files = [m for m in members if m.isfile()]
            if not files:
                return False
            extracted = tf.extractfile(files[0])
            return extracted is not None and extracted.read(16) is not None
    except (OSError, zipfile.BadZipFile, tarfile.TarError, lzma.LZMAError):
        return False


FORMATS = (
    ("zip store", ".zip", lambda b, o: _zip_archive(b, o, zipfile.ZIP_STORED)),
    ("zip deflate max", ".zip",
     lambda b, o: _zip_archive(b, o, zipfile.ZIP_DEFLATED, 9)),
    ("zip bzip2", ".zip", lambda b, o: _zip_archive(b, o, zipfile.ZIP_BZIP2, 9)),
    ("zip lzma", ".zip", lambda b, o: _zip_archive(b, o, zipfile.ZIP_LZMA)),
    ("tar.gz", ".tar.gz", lambda b, o: _tar_archive(b, o, "w:gz")),
    ("tar.bz2", ".tar.bz2", lambda b, o: _tar_archive(b, o, "w:bz2")),
    ("tar.xz", ".tar.xz", lambda b, o: _tar_archive(b, o, "w:xz")),
)


def main() -> int:
    parser = argparse.ArgumentParser()
    parser.add_argument("--bundle", type=Path, default=DEFAULT_BUNDLE)
    args = parser.parse_args()
    bundle = args.bundle
    if not bundle.is_dir():
        print(f"error: no bundle at {bundle}; run tools/build_release_bundle.py")
        return 1

    bundle_bytes = sum(p.stat().st_size for p in bundle.rglob("*") if p.is_file())
    bundle_files = sum(1 for p in bundle.rglob("*") if p.is_file())

    work = bundle.parent / "archive-bench"
    if work.exists():
        shutil.rmtree(work)
    work.mkdir()

    results = []
    for label, suffix, archiver in FORMATS:
        out = work / (bundle.name + "-" + label.replace(" ", "-") + suffix)
        start = time.perf_counter()
        archiver(bundle, out)
        elapsed = time.perf_counter() - start
        results.append(
            {
                "format": label,
                "bytes": out.stat().st_size,
                "seconds": round(elapsed, 3),
                "valid": _validate(out),
            }
        )
    shutil.rmtree(work)

    valid = [r for r in results if r["valid"]]
    best = min(valid, key=lambda r: r["bytes"]) if valid else None
    report = {
        "schema_version": 1,
        "generated_at": utc_now(),
        "evaluated_bundle": {
            "path": "dist/" + bundle.name,
            "bytes": bundle_bytes,
            "file_count": bundle_files,
        },
        "method": (
            "Archive the same built bundle with each stdlib-available format, "
            "then validate by re-listing and test-reading one member."
        ),
        "results": sorted(results, key=lambda r: r["bytes"]),
        "decision": {
            "selected_format": best["format"] if best else None,
            "reason": (
                "Smallest valid archive from formats available without "
                "third-party archivers (the reference's 7z toolchain is "
                "Windows-release-specific)."
            ),
        },
        "limitations": [
            "No 7z/zstd binaries in this environment; formats compared are "
            "the Python-stdlib set.",
            "Bundle is the lean source+native layout, far smaller than the "
            "reference's frozen desktop bundle.",
        ],
    }
    write_report("archive-format-benchmark.json", report)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
