"""Release-bundle pipeline: build, prune, path baseline, runtime load."""

import json
import subprocess
import sys
from pathlib import Path

import pytest

REPO = Path(__file__).resolve().parents[1]
TOOLS = REPO / "tools"


def _run(script, *args):
    return subprocess.run(
        [sys.executable, str(TOOLS / script), *args],
        capture_output=True,
        text=True,
        cwd=REPO,
    )


@pytest.fixture(scope="module")
def bundle(tmp_path_factory):
    dist = tmp_path_factory.mktemp("dist") / "audioforge-tpu"
    result = _run("build_release_bundle.py", "--dist", str(dist))
    assert result.returncode == 0, result.stderr
    return dist


class TestBundle:
    def test_layout_and_build_record(self, bundle):
        record = json.loads((bundle / "audioforge-build.json").read_text())
        assert record["name"] == "audioforge-tpu"
        assert (bundle / "audioforge_tpu" / "__init__.py").is_file()
        assert (bundle / "native" / "libafringbuffer.so").is_file()
        assert (bundle / "native" / "libafingest.so").is_file()
        assert (bundle / "tools" / "health_check.py").is_file()

    def test_prune_removes_caches(self, bundle):
        junk_dir = bundle / "audioforge_tpu" / "__pycache__"
        junk_dir.mkdir(exist_ok=True)
        (junk_dir / "x.pyc").write_bytes(b"\x00")
        sys.path.insert(0, str(TOOLS))
        try:
            import prune_bundle as pb
        finally:
            sys.path.pop(0)
        pb.prune_bundle(bundle)
        assert not junk_dir.exists()

    def test_paths_match_tracked_baseline(self, bundle):
        sys.path.insert(0, str(TOOLS))
        try:
            import prune_bundle as pb
        finally:
            sys.path.pop(0)
        pb.prune_bundle(bundle)
        problems = pb.check_baseline(pb.bundle_paths(bundle))
        assert problems == [], problems

    def test_runtime_loads_from_bundle(self, bundle):
        # subprocess so the bundled package import cannot leak into this process
        code = (
            "import sys; sys.path.insert(0, r'%s');\n"
            "import bundle_runtime as br\n"
            "m = br.import_bundled_runtime(r'%s')\n"
            "assert m.CORE_AVAILABLE\n"
            "print('ok', m.__version__)\n" % (TOOLS, bundle)
        )
        result = subprocess.run(
            [sys.executable, "-c", code], capture_output=True, text=True
        )
        assert result.returncode == 0, result.stderr
        assert "ok" in result.stdout


class TestFetchAssets:
    def test_no_external_assets_is_clean_noop(self):
        result = _run("fetch_release_assets.py")
        assert result.returncode == 0
        assert "nothing to fetch" in result.stdout

    def test_hash_mismatch_refuses_install(self, tmp_path):
        sys.path.insert(0, str(TOOLS))
        try:
            import fetch_release_assets as fra
        finally:
            sys.path.pop(0)
        bad = tmp_path / "weights.npz"
        bad.write_bytes(b"not the pinned bytes")
        with pytest.raises(ValueError, match="hash mismatch"):
            fra.stage_asset(
                "weights.npz",
                {"sha256": "0" * 64, "bytes": bad.stat().st_size},
                bad,
            )


class TestArchiveBenchmark:
    def test_report_schema(self):
        report = json.loads(
            (REPO / "evaluation" / "archive-format-benchmark.json").read_text()
        )
        assert report["results"], "at least one archive format measured"
        assert all(r["valid"] for r in report["results"])
        assert report["decision"]["selected_format"] in {
            r["format"] for r in report["results"]
        }
