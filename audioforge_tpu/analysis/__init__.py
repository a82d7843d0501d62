"""Offline analysis / calibration: spectrum estimation, Auto-EQ, noise
reference, voice setup, latency calibration, VAD helpers."""

from . import (  # noqa: F401
    auto_eq,
    eq_quality,
    failure_detection,
    headroom,
    spectrum,
    vad,
    wav_io,
)
from .auto_eq import analyze_auto_eq, calculate_eq_bands, get_target_curve  # noqa: F401
from .spectrum import analyze_voice_spectrum, smooth_spectrum_perceptual  # noqa: F401
