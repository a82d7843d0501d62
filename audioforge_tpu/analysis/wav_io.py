"""Strict WAV conversion helpers (`python/mic_eq/analysis/wav_io.py:12-67`)."""

from __future__ import annotations

from pathlib import Path

import numpy as np
from scipy.io import wavfile

__all__ = ["pcm_to_float_mono", "read_mono_wav"]


def pcm_to_float_mono(raw, *, label="audio", allow_stereo=True, dtype=np.float32):
    """Finite mono/stereo PCM -> centred normalised float mono.

    Integer conversion happens BEFORE channel averaging so full-scale
    normalisation is never bypassed by dtype promotion."""
    audio = np.asarray(raw)
    if audio.ndim not in (1, 2):
        raise ValueError(f"{label} must contain mono or interleaved PCM audio")
    if audio.ndim == 2 and (not allow_stereo or audio.shape[1] == 0):
        expected = "mono" if not allow_stereo else "non-empty interleaved"
        raise ValueError(f"{label} must contain {expected} PCM audio")

    if np.issubdtype(audio.dtype, np.floating):
        converted = audio.astype(np.float64)
    elif np.issubdtype(audio.dtype, np.signedinteger):
        info = np.iinfo(audio.dtype)
        converted = audio.astype(np.float64) / float(max(abs(int(info.min)), int(info.max)))
    elif np.issubdtype(audio.dtype, np.unsignedinteger):
        info = np.iinfo(audio.dtype)
        mid = float(int(info.max) + 1) / 2.0
        converted = (audio.astype(np.float64) - mid) / mid
    else:
        raise ValueError(f"{label} uses unsupported WAV sample type {audio.dtype}")

    if converted.ndim == 2:
        converted = converted.mean(axis=1)
    if converted.size == 0 or not np.all(np.isfinite(converted)):
        raise ValueError(f"{label} must contain finite audio")
    return np.ascontiguousarray(converted, dtype=dtype)


def read_mono_wav(path, *, allow_stereo=True, dtype=np.float32):
    sample_rate, raw = wavfile.read(Path(path))
    return int(sample_rate), pcm_to_float_mono(
        np.asarray(raw), label=Path(path).name, allow_stereo=allow_stereo, dtype=dtype
    )
