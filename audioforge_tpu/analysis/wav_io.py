"""Strict WAV conversion helpers (behavioral contract of
`python/mic_eq/analysis/wav_io.py:12-67`): no silent repair — bad shapes,
non-finite samples, and exotic sample types are errors, never coerced."""

from __future__ import annotations

from pathlib import Path

import numpy as np
from scipy.io import wavfile

__all__ = ["pcm_to_float_mono", "read_mono_wav"]


def _normalise_samples(audio: np.ndarray, label: str) -> np.ndarray:
    """Map one dtype family onto centred [-1, 1] float64.

    Signed ints divide by the larger of |min|/max so full scale maps to
    exactly ±1; unsigned ints are first re-centred about 2^(bits-1); floats
    pass through (already nominal ±1)."""
    kind = audio.dtype.kind
    as64 = audio.astype(np.float64)
    if kind == "f":
        return as64
    if kind == "i":
        bounds = np.iinfo(audio.dtype)
        return as64 / float(max(-int(bounds.min), int(bounds.max)))
    if kind == "u":
        half_range = float(int(np.iinfo(audio.dtype).max) + 1) / 2.0
        return as64 / half_range - 1.0
    raise ValueError(f"{label} uses unsupported WAV sample type {audio.dtype}")


def pcm_to_float_mono(raw, *, label="audio", allow_stereo=True,
                      dtype=np.float32):
    """Finite mono/stereo PCM → centred normalised float mono.

    Normalisation runs per-dtype BEFORE any channel fold-down: averaging
    integer stereo first would promote to float and silently skip the
    full-scale division."""
    audio = np.asarray(raw)
    if audio.ndim not in (1, 2):
        raise ValueError(f"{label} must contain mono or interleaved PCM audio")
    if audio.ndim == 2 and (not allow_stereo or audio.shape[1] == 0):
        expected = "mono" if not allow_stereo else "non-empty interleaved"
        raise ValueError(f"{label} must contain {expected} PCM audio")

    mono = _normalise_samples(audio, label)
    if mono.ndim == 2:
        mono = mono.mean(axis=1)
    if mono.size == 0 or not np.all(np.isfinite(mono)):
        raise ValueError(f"{label} must contain finite audio")
    return np.ascontiguousarray(mono, dtype=dtype)


def read_mono_wav(path, *, allow_stereo=True, dtype=np.float32):
    """Read a WAV file and convert via :func:`pcm_to_float_mono`."""
    path = Path(path)
    sample_rate, raw = wavfile.read(path)
    samples = pcm_to_float_mono(
        np.asarray(raw), label=path.name, allow_stereo=allow_stereo,
        dtype=dtype,
    )
    return int(sample_rate), samples
