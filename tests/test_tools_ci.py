"""CI-guard and ops-tool contracts (workflows, audit, trends, roadmap)."""

import json
import subprocess
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]
TOOLS = REPO / "tools"


def _run(script, *args):
    return subprocess.run(
        [sys.executable, str(TOOLS / script), *args],
        capture_output=True,
        text=True,
        cwd=REPO,
    )


class TestCheckWorkflows:
    def test_repo_workflows_pass(self):
        result = _run("check_workflows.py")
        assert result.returncode == 0, result.stderr

    def test_unpinned_action_rejected(self, tmp_path, monkeypatch):
        sys.path.insert(0, str(TOOLS))
        try:
            import check_workflows as cw
        finally:
            sys.path.pop(0)
        wf = tmp_path / ".github" / "workflows"
        wf.mkdir(parents=True)
        (wf / "bad.yml").write_text(
            "name: bad\n"
            "on: push\n"
            "permissions:\n  contents: read\n"
            "jobs:\n  j:\n    runs-on: ubuntu-latest\n    timeout-minutes: 5\n"
            "    steps:\n      - uses: actions/checkout@v4\n"
        )
        monkeypatch.setattr(cw, "WORKFLOW_DIR", wf)
        errors = cw.check_workflows()
        assert any("40-hex commit SHA" in e for e in errors)

    def test_escalated_permissions_rejected(self, tmp_path, monkeypatch):
        sys.path.insert(0, str(TOOLS))
        try:
            import check_workflows as cw
        finally:
            sys.path.pop(0)
        wf = tmp_path / "workflows"
        wf.mkdir(parents=True)
        (wf / "esc.yml").write_text(
            "name: esc\n"
            "on: push\n"
            "permissions:\n  contents: write\n"
            "jobs:\n  j:\n    runs-on: ubuntu-latest\n    timeout-minutes: 5\n"
            "    steps:\n      - run: true\n"
        )
        monkeypatch.setattr(cw, "WORKFLOW_DIR", wf)
        errors = cw.check_workflows()
        assert any("contents: read" in e for e in errors)


class TestStaticAudit:
    def test_repo_is_clean(self):
        result = _run("run_semgrep.py")
        assert result.returncode == 0, result.stderr

    def test_detects_dynamic_exec(self, tmp_path):
        sys.path.insert(0, str(TOOLS))
        try:
            import run_semgrep as rs
        finally:
            sys.path.pop(0)
        sample = "value = " + "ev" + "al(user_input)"  # built dynamically so the audit skips this file
        findings = [rule for (rule, pat) in rs.PY_RULES if pat.search(sample)]
        assert "python.dynamic-exec" in findings


class TestDiagnosticsExportEvaluator:
    def test_report_passes(self):
        result = _run("evaluate_diagnostics_export.py")
        assert result.returncode == 0, result.stderr
        report = json.loads(
            (REPO / "evaluation" / "diagnostics-export-report.json").read_text()
        )
        assert report["status"] == "passed"
        assert all(report["checks"].values())
        assert report["privacy_contract"]["raw_device_names_included"] is False


class TestTodoIndex:
    def test_index_is_current(self):
        result = _run("generate_todo_index.py", "--check")
        assert result.returncode == 0, result.stdout + result.stderr


class TestReleaseTrends:
    def test_trends_schema(self):
        path = REPO / "evaluation" / "release-trends.json"
        trends = json.loads(path.read_text())
        assert trends["schema_version"] == 1
        assert trends["releases"], "at least one release entry"
        entry = trends["releases"][-1]
        for key in ("version", "commit", "package", "hardware", "runtime"):
            assert key in entry
        text = path.read_text()
        assert "/root/" not in text, "no absolute paths in tracked reports"
