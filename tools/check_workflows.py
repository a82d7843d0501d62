"""CI-workflow hygiene guard.

Mirrors the reference's `python/tools/check_workflows.py`: every workflow under
`.github/workflows/` must parse as YAML, pin every third-party action to an
immutable 40-hex commit SHA (with a human-readable version comment), grant only
read-only `contents` permissions at the top level, set an explicit
`timeout-minutes` on every job, and avoid `pull_request_target` triggers.
Exit code is non-zero on any violation so CI can gate on itself.
"""

from __future__ import annotations

import re
import sys
from pathlib import Path
from typing import Any

import yaml

REPO_ROOT = Path(__file__).resolve().parents[1]
WORKFLOW_DIR = REPO_ROOT / ".github" / "workflows"
ACTION_REF = re.compile(r"^\s*(?:-\s*)?uses:\s*([^@\s]+)@([^\s#]+)(\s*#.*)?$")
COMMIT_SHA = re.compile(r"^[0-9a-f]{40}$")


def _mapping(value: Any, context: str, errors: list[str]) -> dict[str, Any]:
    if not isinstance(value, dict):
        errors.append(f"{context} must be a mapping")
        return {}
    return value


def _check_action_pins(name: str, text: str, errors: list[str]) -> None:
    for line in text.splitlines():
        match = ACTION_REF.match(line)
        if not match:
            continue
        action, ref, comment = match.group(1), match.group(2), match.group(3)
        if action.startswith("./"):
            continue  # local composite actions are pinned by the checkout SHA
        if not COMMIT_SHA.match(ref):
            errors.append(
                f"{name}: action {action} must be pinned to a 40-hex commit "
                f"SHA, found {ref!r}"
            )
        elif not (comment or "").strip():
            errors.append(
                f"{name}: SHA-pinned action {action} needs a version comment"
            )


def _check_permissions(name: str, doc: dict[str, Any], errors: list[str]) -> None:
    permissions = _mapping(doc.get("permissions"), f"{name}: permissions", errors)
    if permissions != {"contents": "read"}:
        errors.append(
            f"{name}: top-level permissions must be exactly 'contents: read'"
        )
    for job_name, raw_job in _mapping(doc.get("jobs"), f"{name}: jobs", errors).items():
        job = _mapping(raw_job, f"{name}: job {job_name}", errors)
        job_permissions = job.get("permissions")
        if job_permissions is not None and job_permissions != {"contents": "read"}:
            errors.append(
                f"{name}: job {job_name} must not escalate permissions"
            )
        if "timeout-minutes" not in job:
            errors.append(f"{name}: job {job_name} is missing timeout-minutes")


def _check_triggers(name: str, doc: dict[str, Any], errors: list[str]) -> None:
    # YAML parses the bare key `on:` as boolean True
    triggers = doc.get("on", doc.get(True))
    if triggers is None:
        errors.append(f"{name}: missing 'on' triggers")
        return
    if isinstance(triggers, str):
        triggers = {triggers: None}
    if isinstance(triggers, list):
        triggers = {key: None for key in triggers}
    if "pull_request_target" in triggers:
        errors.append(f"{name}: pull_request_target is forbidden")


def check_workflows() -> list[str]:
    errors: list[str] = []
    if not WORKFLOW_DIR.is_dir():
        return [".github/workflows/ is missing"]
    paths = sorted(WORKFLOW_DIR.glob("*.yml")) + sorted(WORKFLOW_DIR.glob("*.yaml"))
    if not paths:
        return [".github/workflows/ has no workflow files"]
    for path in paths:
        name = path.name
        text = path.read_text(encoding="utf-8")
        try:
            doc = yaml.safe_load(text)
        except yaml.YAMLError as exc:
            errors.append(f"{name}: YAML parse error: {exc}")
            continue
        doc = _mapping(doc, name, errors)
        if not doc:
            continue
        _check_action_pins(name, text, errors)
        _check_permissions(name, doc, errors)
        _check_triggers(name, doc, errors)
    return errors


def main() -> int:
    errors = check_workflows()
    for error in errors:
        print(f"error: {error}", file=sys.stderr)
    if not errors:
        print("workflows ok")
    return 1 if errors else 0


if __name__ == "__main__":
    raise SystemExit(main())
