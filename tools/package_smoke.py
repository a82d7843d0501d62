"""Package smoke test: import the public surface and run one tiny job.

Mirrors `python/tools/package_smoke.py`: a fast end-to-end sanity pass for
packaging/CI — imports every public name, round-trips a preset, renders a
short take through the EQ simulator, and checks one magnitude response.
"""

from __future__ import annotations

import sys
from pathlib import Path

_REPO_ROOT = Path(__file__).resolve().parents[1]
if str(_REPO_ROOT) not in sys.path:
    sys.path.insert(0, str(_REPO_ROOT))


def main() -> int:
    import numpy as np

    import audioforge_tpu as af

    missing = [n for n in af.__all__ if not hasattr(af, n)]
    if missing:
        print(f"Package smoke FAILED: missing exports {missing}")
        return 1

    preset = af.BUILTIN_PRESETS["voice"]
    round_tripped = af.Preset.from_dict(preset.to_dict())
    if round_tripped.name != "Voice Clarity":
        print("Package smoke FAILED: preset round-trip")
        return 1

    bands = [
        ("bell", 1000.0, 3.0, 1.41, 12, True) if i == 4
        else ("bell", 100.0 * (i + 1), 0.0, 1.41, 12, True)
        for i in range(10)
    ]
    response = af.eq_magnitude_response_v2([1000.0], bands, 48000.0)
    if abs(response[0] - 3.0) > 0.1:
        print(f"Package smoke FAILED: EQ response {response[0]} != 3 dB")
        return 1

    audio = (0.1 * np.sin(2 * np.pi * 440 * np.arange(9600) / 48000)).astype(
        np.float32
    )
    diag = af.simulate_eq_v2(audio, 48000.0, bands)
    if diag["non_finite_output"] or diag["sample_count"] != 9600:
        print("Package smoke FAILED: simulate_eq_v2 diagnostics")
        return 1

    print("Package smoke passed.")
    return 0


if __name__ == "__main__":
    sys.exit(main())
