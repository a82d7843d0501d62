"""Builtin catalogs: EQ band layout, target curves, analysis gates.

Mirrors `python/mic_eq/config_parts/catalogs.py` and the constants exported
from `config_parts/settings.py:11-47`.
"""

from __future__ import annotations

from dataclasses import dataclass

EQ_FREQUENCIES = [80, 160, 320, 640, 1280, 2500, 5000, 8000, 12000, 16000]
AUTO_EQ_DEFAULT_Q = 4.33
EQ_SCHEMA_VERSION = 2

ANALYSIS_MIN_PEAK_COUNT = 3
ANALYSIS_MIN_DYNAMIC_RANGE = 20
ANALYSIS_MIN_SNR = 12
ANALYSIS_MAX_SPECTRAL_FLATNESS = 0.8


@dataclass(frozen=True)
class TargetCurve:
    name: str
    description: str
    band_targets: list[float]


TARGET_CURVES = {
    "broadcast": TargetCurve(
        name="Broadcast-style Voice",
        description="House curve for clear, balanced broadcast-style speech",
        band_targets=[-2.0, -1.0, 0.0, 1.0, 2.0, 3.0, 2.0, 1.0, 0.0, -1.0],
    ),
    "podcast": TargetCurve(
        name="Podcast / Voice-Over",
        description="Enhanced presence for intimate vocal recording",
        band_targets=[0.0, 0.0, 1.0, 2.0, 3.0, 4.0, 3.0, 2.0, 1.0, 0.0],
    ),
    "streaming": TargetCurve(
        name="Streaming / Gaming",
        description="Cuts through game audio mix with aggressive presence",
        band_targets=[-1.0, 0.0, 1.0, 2.0, 4.0, 5.0, 4.0, 2.0, 0.0, -2.0],
    ),
    "flat": TargetCurve(
        name="Neutral Reference",
        description="Neutral house target for broad microphone-response correction",
        band_targets=[0.0] * 10,
    ),
}
