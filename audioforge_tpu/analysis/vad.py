"""Offline VAD helpers shared by Auto-EQ and Auto Voice Setup.

Mirrors `python/mic_eq/analysis/vad.py`: returns native Silero posteriors or
an explicit ``energy_fallback`` backend label — never pretends Silero ran
(`analysis/vad.py:15-52`). Thresholds 0.48/0.40/0.65/0.35.
"""

from __future__ import annotations

import numpy as np

CALIBRATED_VAD_DEFAULT_THRESHOLD = 0.48
VAD_SPEECH_EVIDENCE_THRESHOLD = 0.40
VAD_STRONG_SPEECH_THRESHOLD = 0.65
VAD_NOISE_CONTAMINATION_THRESHOLD = 0.35

__all__ = [
    "CALIBRATED_VAD_DEFAULT_THRESHOLD",
    "VAD_NOISE_CONTAMINATION_THRESHOLD",
    "VAD_SPEECH_EVIDENCE_THRESHOLD",
    "VAD_STRONG_SPEECH_THRESHOLD",
    "analyze_offline_vad",
]


def analyze_offline_vad(audio, sample_rate, *, threshold=CALIBRATED_VAD_DEFAULT_THRESHOLD):
    """Return ``(posteriors or None, backend_label)``.

    Uses the native batched Silero path when available; degrades to the
    explicit ``energy_fallback`` label otherwise so diagnostics never claim a
    neural posterior that was not computed.
    """
    samples = np.ascontiguousarray(np.asarray(audio, np.float32).reshape(-1))
    if samples.size == 0 or sample_rate <= 0:
        return None, "energy_fallback"
    if int(sample_rate) not in (16000, 48000):
        return None, "energy_fallback"
    try:
        from ..models.silero import analyze_vad_probabilities

        raw = analyze_vad_probabilities(samples, int(sample_rate), float(threshold))
    except (ImportError, OSError, RuntimeError, ValueError, TypeError):
        return None, "energy_fallback"
    probs = np.asarray(raw, float).reshape(-1)
    if probs.size == 0 or not np.isfinite(probs).all():
        return None, "energy_fallback"
    return np.clip(probs, 0.0, 1.0), "silero"
