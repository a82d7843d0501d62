"""Multi-criteria Auto-EQ failure detection.

Mirrors `python/mic_eq/analysis/failure_detection.py`: peak count, voice-band
dynamic range, noise-referenced SNR (or spectral contrast when no reference),
spectral flatness, excessive-correction checks — tiered into hard failures
and soft failures (fail on any hard, or >= 2 soft), returning a generic
user-facing reason. Gates: flatness <= 0.8, dynamic range >= 20, SNR >= 12,
>= 3 peaks (`config_parts/settings.py:44-47`).
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np

from ..config import (
    ANALYSIS_MAX_SPECTRAL_FLATNESS,
    ANALYSIS_MIN_DYNAMIC_RANGE,
    ANALYSIS_MIN_PEAK_COUNT,
    ANALYSIS_MIN_SNR,
)
from .spectrum import find_octave_spaced_peaks

__all__ = [
    "ValidationResult",
    "calculate_spectral_flatness",
    "calculate_spectral_contrast",
    "validate_analysis",
]


@dataclass
class ValidationResult:
    passed: bool
    reason: str | None
    details: dict


def calculate_spectral_flatness(spectrum_db):
    """Wiener entropy: geometric/arithmetic power mean
    (`failure_detection.py:36-68`)."""
    linear = np.maximum(np.power(10.0, np.asarray(spectrum_db, float) / 10.0), 1e-12)
    geo = np.exp(np.mean(np.log(linear)))
    arith = np.mean(linear)
    if arith < 1e-12:
        return 1.0
    return min(float(geo / arith), 1.0)


def calculate_spectral_contrast(freqs, spectrum_db):
    """80th-to-20th percentile voice-band contrast
    (`failure_detection.py:71-110`) — explicitly NOT an SNR."""
    freqs = np.asarray(freqs, float)
    spectrum_db = np.asarray(spectrum_db, float)
    if freqs.shape != spectrum_db.shape or spectrum_db.size == 0:
        return 0.0
    vmask = (freqs >= 80.0) & (freqs <= 8000.0)
    spec = spectrum_db[vmask] if np.any(vmask) else spectrum_db
    fv = freqs[vmask] if np.any(vmask) else freqs
    mid = (fv >= 300.0) & (fv <= 3400.0)
    signal_db = float(np.percentile(spec[mid] if np.any(mid) else spec, 80))
    floor_db = float(np.percentile(spec, 20))
    return signal_db - floor_db


def validate_analysis(eq_settings, spectrum_db, freqs) -> ValidationResult:
    """Tiered validation gates (`failure_detection.py:112-280`)."""
    peak_freqs, _ = find_octave_spaced_peaks(spectrum_db, freqs, octave_fraction=3)
    peak_count = len(peak_freqs)

    freqs = np.asarray(freqs, float)
    spectrum_db = np.asarray(spectrum_db, float)
    vmask = (freqs >= 80.0) & (freqs <= 8000.0)
    spec_v = spectrum_db[vmask] if np.any(vmask) else spectrum_db
    freq_v = freqs[vmask] if np.any(vmask) else freqs

    dynamic_range = float(np.percentile(spec_v, 95) - np.percentile(spec_v, 5))
    contrast_db = calculate_spectral_contrast(freq_v, spec_v)
    band_snrs = np.asarray(
        [v for v in eq_settings.get("band_snr_db", []) if v is not None], float
    )
    snr_ref = bool(
        eq_settings.get("snr_reference_available", False)
        and band_snrs.size
        and np.any(np.isfinite(band_snrs))
    )
    global_snr = eq_settings.get("noise_referenced_snr_db")
    snr_db = (
        float(global_snr)
        if snr_ref and global_snr is not None
        else (float(np.median(band_snrs[np.isfinite(band_snrs)])) if snr_ref else None)
    )
    flatness = calculate_spectral_flatness(spec_v)

    gains = np.asarray(eq_settings.get("band_gains", []), float)
    clipped = int(np.sum(np.abs(gains) >= 11.5)) if gains.size else 0
    gain_rms = float(np.sqrt(np.mean(np.square(gains)))) if gains.size else 0.0
    headroom = eq_settings.get("headroom_validation") or {}
    headroom_safe = bool(headroom.get("safe", True)) if isinstance(headroom, dict) else True

    hard, soft = [], []
    if peak_count < max(2, ANALYSIS_MIN_PEAK_COUNT - 1):
        hard.append(f"peak_count ({peak_count} too low)")
    if flatness > min(0.92, ANALYSIS_MAX_SPECTRAL_FLATNESS + 0.10):
        hard.append(f"flatness ({flatness:.2f} too noise-like)")
    if clipped >= 6:
        hard.append(f"clipped_gains ({clipped} >= 6)")
    if gain_rms > 10.0:
        hard.append(f"gain_rms ({gain_rms:.1f} > 10.0 dB)")
    if not headroom_safe:
        hard.append("headroom risk after downstream simulation")

    if peak_count < ANALYSIS_MIN_PEAK_COUNT:
        soft.append(f"peak_count ({peak_count} < {ANALYSIS_MIN_PEAK_COUNT})")
    if dynamic_range < ANALYSIS_MIN_DYNAMIC_RANGE:
        soft.append(f"dynamic_range ({dynamic_range:.1f} < {ANALYSIS_MIN_DYNAMIC_RANGE} dB)")
    if snr_db is not None and snr_db < ANALYSIS_MIN_SNR:
        soft.append(f"snr ({snr_db:.1f} < {ANALYSIS_MIN_SNR} dB)")
    if not snr_ref and contrast_db < ANALYSIS_MIN_SNR:
        soft.append(f"spectral_contrast ({contrast_db:.1f} < {ANALYSIS_MIN_SNR} dB)")
    if flatness > ANALYSIS_MAX_SPECTRAL_FLATNESS:
        soft.append(f"flatness ({flatness:.2f} > {ANALYSIS_MAX_SPECTRAL_FLATNESS})")
    if clipped >= 4:
        soft.append(f"clipped_gains ({clipped} >= 4)")
    if gain_rms > 8.0:
        soft.append(f"gain_rms ({gain_rms:.1f} > 8.0 dB)")

    failures = list(hard) if hard else (soft if len(soft) >= 2 else [])
    details = {
        "peak_count": peak_count,
        "dynamic_range_db": dynamic_range,
        "snr_db": snr_db,
        "snr_reference_available": snr_ref,
        "spectral_contrast_db": contrast_db,
        "flatness": flatness,
        "clipped_gains": clipped,
        "gain_rms_db": gain_rms,
        "headroom_safe": headroom_safe,
    }
    if failures:
        details["failures"] = failures
        return ValidationResult(False, "Recording too unclear. Please try again.", details)
    return ValidationResult(True, None, details)
