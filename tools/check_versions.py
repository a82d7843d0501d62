"""CI guard: version strings must agree across the repo.

Mirrors `python/tools/check_versions.py`: the package ``__version__``, the
``pyproject.toml`` version, and the config schema's ``CURRENT_VERSION``
lineage must stay consistent (the config version tracks the behaviour
contract of the reference line, not the package release)."""

from __future__ import annotations

import re
import sys
from pathlib import Path

_REPO_ROOT = Path(__file__).resolve().parents[1]
if str(_REPO_ROOT) not in sys.path:
    sys.path.insert(0, str(_REPO_ROOT))


def main() -> int:
    problems = []

    import audioforge_tpu
    from audioforge_tpu.config import CURRENT_VERSION
    from audioforge_tpu.config.presets import _PASSTHROUGH_VERSIONS

    pyproject = (_REPO_ROOT / "pyproject.toml").read_text()
    match = re.search(r'^version\s*=\s*"([^"]+)"', pyproject, re.M)
    if not match:
        problems.append("pyproject.toml has no version field")
    elif match.group(1) != audioforge_tpu.__version__:
        problems.append(
            f"pyproject version {match.group(1)} != package "
            f"__version__ {audioforge_tpu.__version__}"
        )

    if _PASSTHROUGH_VERSIONS[-1] != CURRENT_VERSION:
        problems.append(
            "preset migration chain does not end at CURRENT_VERSION "
            f"({_PASSTHROUGH_VERSIONS[-1]} != {CURRENT_VERSION})"
        )

    if problems:
        print("Version check FAILED:")
        for p in problems:
            print(f"  - {p}")
        return 1
    print(
        f"Version check passed: package {audioforge_tpu.__version__}, "
        f"config line {CURRENT_VERSION}."
    )
    return 0


if __name__ == "__main__":
    sys.exit(main())
