"""EQ response quality metrics and interaction warnings.

Mirrors `python/mic_eq/analysis/eq_quality.py:81-217`: boosted/cut extremes,
voice-band ripple, adjacent-band stacking, shelf/peak stacking, narrow-boost
risk, and the composite ``risk_score``.
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np

from .auto_eq import predict_eq_response

__all__ = ["EqInteractionWarning", "EqQualityMetrics", "evaluate_eq_quality",
           "weighted_target_error"]


@dataclass(frozen=True)
class EqInteractionWarning:
    kind: str
    frequency_hz: float
    severity: float
    message: str


@dataclass(frozen=True)
class EqQualityMetrics:
    max_boost_db: float
    max_cut_db: float
    ripple_db: float
    overlapping_adjacent_bands: int
    shelf_peak_stacking: int
    narrow_boost_risk: int
    warnings: tuple

    @property
    def risk_score(self) -> float:
        """`eq_quality.py:36-44`."""
        return (
            max(0.0, self.max_boost_db - 9.0) / 6.0
            + max(0.0, self.max_cut_db - 12.0) / 6.0
            + max(0.0, self.ripple_db - 10.0) / 8.0
            + self.overlapping_adjacent_bands * 0.4
            + self.shelf_peak_stacking * 0.45
            + self.narrow_boost_risk * 0.5
        )

    def to_dict(self):
        return {
            "max_boost_db": self.max_boost_db,
            "max_cut_db": self.max_cut_db,
            "ripple_db": self.ripple_db,
            "overlapping_adjacent_bands": self.overlapping_adjacent_bands,
            "shelf_peak_stacking": self.shelf_peak_stacking,
            "narrow_boost_risk": self.narrow_boost_risk,
            "risk_score": self.risk_score,
            "warnings": [
                {
                    "kind": w.kind,
                    "frequency_hz": w.frequency_hz,
                    "severity": w.severity,
                    "message": w.message,
                }
                for w in self.warnings
            ],
        }


def evaluate_eq_quality(freqs, gains, qs, sample_rate=48000.0) -> EqQualityMetrics:
    centers = np.asarray(list(freqs), float)
    gains_db = np.asarray(list(gains), float)
    q_values = np.asarray(list(qs), float)
    if not (centers.size == gains_db.size == q_values.size):
        raise ValueError("frequency, gain, and Q arrays must have the same length")
    order = np.argsort(centers)
    centers, gains_db, q_values = centers[order], gains_db[order], q_values[order]
    if centers.size == 0:
        return EqQualityMetrics(0.0, 0.0, 0.0, 0, 0, 0, ())

    grid = np.logspace(np.log10(20.0), np.log10(min(20000.0, sample_rate / 2 - 1)), 256)
    response = predict_eq_response(grid, gains_db, q_values, centers)
    vmask = (grid >= 80.0) & (grid <= 12000.0)
    voice = response[vmask] if np.any(vmask) else response

    max_boost = float(max(0.0, np.max(response)))
    max_cut = float(max(0.0, -np.min(response)))
    ripple = float(np.percentile(voice, 95) - np.percentile(voice, 5))

    warnings: list[EqInteractionWarning] = []
    overlap = shelf_stack = narrow = 0

    for i in range(centers.size - 1):
        if abs(gains_db[i]) < 0.5 or abs(gains_db[i + 1]) < 0.5:
            continue
        gap = abs(float(np.log2(centers[i + 1] / centers[i])))
        same_sign = np.sign(gains_db[i]) == np.sign(gains_db[i + 1])
        high_q = max(q_values[i], q_values[i + 1]) >= 3.0
        high_g = min(abs(gains_db[i]), abs(gains_db[i + 1])) >= 3.0
        if same_sign and gap < 0.42 and (high_q or high_g):
            overlap += 1
            warnings.append(EqInteractionWarning(
                "overlap", float(np.sqrt(centers[i] * centers[i + 1])),
                min(1.0, (0.42 - gap) / 0.42 + 0.25), "Adjacent bands are stacking",
            ))

    if centers.size >= 2:
        low_g = gains_db[0]
        for i in range(1, min(4, centers.size)):
            if centers[i] <= 320.0 and np.sign(low_g) == np.sign(gains_db[i]):
                if abs(low_g) >= 3.0 and abs(gains_db[i]) >= 2.0:
                    shelf_stack += 1
                    warnings.append(EqInteractionWarning(
                        "shelf_stack", float(centers[i]),
                        min(1.0, (abs(low_g) + abs(gains_db[i])) / 16.0),
                        "Shelf and nearby peak are stacking",
                    ))
        high_g_shelf = gains_db[-1]
        for i in range(max(0, centers.size - 4), centers.size - 1):
            if centers[i] >= 7000.0 and np.sign(high_g_shelf) == np.sign(gains_db[i]):
                if abs(high_g_shelf) >= 3.0 and abs(gains_db[i]) >= 2.0:
                    shelf_stack += 1
                    warnings.append(EqInteractionWarning(
                        "shelf_stack", float(centers[i]),
                        min(1.0, (abs(high_g_shelf) + abs(gains_db[i])) / 16.0),
                        "Shelf and nearby peak are stacking",
                    ))

    for c, g, q in zip(centers, gains_db, q_values):
        if g > 5.0 and q > 3.5:
            narrow += 1
            warnings.append(EqInteractionWarning(
                "narrow_boost", float(c),
                min(1.0, ((g - 5.0) / 7.0) + ((q - 3.5) / 5.0)),
                "Narrow high-gain boost",
            ))

    if max_boost > 10.5:
        warnings.append(EqInteractionWarning(
            "max_boost", float(grid[int(np.argmax(response))]),
            min(1.0, (max_boost - 10.5) / 6.0), "Combined boost is high",
        ))
    if ripple > 11.0:
        warnings.append(EqInteractionWarning(
            "ripple", float(grid[int(np.argmax(np.abs(response)))]),
            min(1.0, (ripple - 11.0) / 8.0), "Combined response is uneven",
        ))

    warnings.sort(key=lambda w: w.severity, reverse=True)
    return EqQualityMetrics(max_boost, max_cut, ripple, overlap, shelf_stack,
                            narrow, tuple(warnings))


# re-export for parity with the reference module layout
from .auto_eq import weighted_target_error  # noqa: E402,F401
