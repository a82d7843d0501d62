"""Evaluation-only cross-take Auto-EQ agreement evidence.

Behavioral contract mirrored from
`python/mic_eq/analysis/auto_eq_parts/cross_take.py` (not imported by the
production Auto-EQ or Voice Setup paths — retained so the cross-take
experiment and its objective retention decision stay reproducible):

- each take's spectrum is level-normalised by its 100 Hz–8 kHz median
  (`cross_take.py:58-68`);
- per-bin precision confidence `1/(1+(u/2.5)^2)` shrinks with the combined
  (root-sum-square) uncertainty of the two takes, agreement confidence is a
  Gaussian (2.5 dB scale) of only the mismatch *beyond* the stated
  precision, and the per-bin confidence is their geometric mean
  (`cross_take.py:144-162`);
- the global confidence is the voice-band (80 Hz–12 kHz) median
  (`cross_take.py:163-173`).
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np

__all__ = ["CrossTakeEvidence", "cross_take_evidence"]

VOICE_MIN_HZ = 80.0
VOICE_MAX_HZ = 12_000.0
LEVEL_REFERENCE_MIN_HZ = 100.0
LEVEL_REFERENCE_MAX_HZ = 8_000.0
PRECISION_SCALE_DB = 2.5
MISMATCH_SCALE_DB = 2.5
_UNCERTAINTY_CAP_DB = 40.0
_MIN_BINS = 16
_MIN_BAND_BINS = 8


def _band_mask(freqs: np.ndarray, lo: float, hi: float) -> np.ndarray:
    return (freqs >= lo) & (freqs <= hi)


@dataclass(frozen=True, slots=True)
class CrossTakeEvidence:
    frequencies_hz: np.ndarray
    shape_delta_db: np.ndarray
    combined_precision_uncertainty_db: np.ndarray
    precision_confidence: np.ndarray
    agreement_confidence: np.ndarray
    confidence: np.ndarray
    global_confidence: float
    voice_band_shape_rms_db: float
    first_phonetic_coverage: float
    second_phonetic_coverage: float

    def diagnostics(self) -> dict:
        voice = _band_mask(self.frequencies_hz, VOICE_MIN_HZ, VOICE_MAX_HZ)
        coverages = (self.first_phonetic_coverage,
                     self.second_phonetic_coverage)
        return {
            "available": True,
            "global_confidence": self.global_confidence,
            "voice_band_shape_rms_db": self.voice_band_shape_rms_db,
            "first_phonetic_coverage": coverages[0],
            "second_phonetic_coverage": coverages[1],
            "minimum_phonetic_coverage": min(coverages),
            "median_precision_uncertainty_db": float(
                np.median(self.combined_precision_uncertainty_db[voice])
            ),
        }


class _Take:
    """One take's spectrum, validated and paired with its uncertainty.

    Uncertainty is optional; absent or non-finite bins count as unknown
    (infinite), which drives the precision confidence to zero there.
    """

    __slots__ = ("freqs", "level_db", "uncertainty_db")

    def __init__(self, freqs, level_db, uncertainty_db):
        self.freqs = np.asarray(freqs, dtype=float)
        self.level_db = np.asarray(level_db, dtype=float)
        ok = (
            self.freqs.ndim == 1
            and self.freqs.size >= _MIN_BINS
            and self.level_db.shape == self.freqs.shape
            and bool(np.isfinite(self.freqs).all())
            and bool(np.isfinite(self.level_db).all())
            and bool((np.diff(self.freqs) > 0.0).all())
        )
        if not ok:
            raise ValueError(
                "cross-take spectra must be finite increasing 1-D arrays"
            )
        if uncertainty_db is None:
            self.uncertainty_db = np.full(self.freqs.shape, np.inf)
        else:
            u = np.asarray(uncertainty_db, dtype=float)
            if u.shape != self.freqs.shape:
                raise ValueError(
                    "cross-take uncertainty shape does not match its spectrum"
                )
            self.uncertainty_db = np.where(
                np.isfinite(u), u.clip(0.0, _UNCERTAINTY_CAP_DB), np.inf
            )

    def shape_db(self, on_freqs: np.ndarray) -> np.ndarray:
        """Level-normalised shape resampled onto ``on_freqs``."""
        level = _flat_interp(on_freqs, self.freqs, self.level_db)
        anchor = _band_mask(
            on_freqs, LEVEL_REFERENCE_MIN_HZ, LEVEL_REFERENCE_MAX_HZ
        )
        if int(anchor.sum()) < _MIN_BAND_BINS:
            raise ValueError(
                "cross-take spectrum has insufficient voice-band bins"
            )
        return level - float(np.median(level[anchor]))

    def uncertainty_on(self, on_freqs: np.ndarray) -> np.ndarray:
        return _flat_interp(on_freqs, self.freqs, self.uncertainty_db)


def _flat_interp(x, xp, fp) -> np.ndarray:
    """Linear interpolation holding the edge values outside ``xp``."""
    if x is xp:
        return fp
    return np.interp(x, xp, fp, left=float(fp[0]), right=float(fp[-1]))


def cross_take_evidence(
    first_frequencies_hz,
    first_spectrum_db,
    first_uncertainty_db,
    first_phonetic_coverage,
    second_frequencies_hz,
    second_spectrum_db,
    second_uncertainty_db,
    second_phonetic_coverage,
) -> CrossTakeEvidence:
    """Frequency-dependent agreement between two takes — agreement is kept
    separate from phonetic coverage, which passes through untouched
    (`cross_take.py:87-97`)."""
    one = _Take(first_frequencies_hz, first_spectrum_db, first_uncertainty_db)
    two = _Take(second_frequencies_hz, second_spectrum_db,
                second_uncertainty_db)
    grid = one.freqs

    delta = two.shape_db(grid) - one.shape_db(grid)
    combined_u = np.hypot(one.uncertainty_on(grid), two.uncertainty_on(grid))
    u = np.where(np.isfinite(combined_u), combined_u, _UNCERTAINTY_CAP_DB)

    precision = 1.0 / (1.0 + (u / PRECISION_SCALE_DB) ** 2)
    excess_mismatch = (np.abs(delta) - u).clip(min=0.0)
    agreement = np.exp(-0.5 * (excess_mismatch / MISMATCH_SCALE_DB) ** 2)
    per_bin = np.sqrt(precision * agreement)

    voice = _band_mask(grid, VOICE_MIN_HZ, VOICE_MAX_HZ)
    if int(voice.sum()) < _MIN_BAND_BINS:
        raise ValueError("cross-take spectra do not cover the voice band")

    return CrossTakeEvidence(
        frequencies_hz=grid,
        shape_delta_db=delta,
        combined_precision_uncertainty_db=combined_u,
        precision_confidence=precision.clip(0.0, 1.0),
        agreement_confidence=agreement.clip(0.0, 1.0),
        confidence=per_bin.clip(0.0, 1.0),
        global_confidence=float(np.median(per_bin[voice])),
        voice_band_shape_rms_db=float(
            np.sqrt(np.mean(delta[voice] ** 2))
        ),
        first_phonetic_coverage=float(
            np.clip(first_phonetic_coverage, 0.0, 1.0)
        ),
        second_phonetic_coverage=float(
            np.clip(second_phonetic_coverage, 0.0, 1.0)
        ),
    )
