"""Deterministic, source-generated labeled corpus for de-esser evaluation.

Mirrors `python/mic_eq/analysis/deesser_corpus.py`: every waveform is built
from mathematical signals and seeded noise — no recorded voice, biometric
material, or third-party audio is redistributed. The case matrix sweeps
{44.1k, 48k} x voice {low 105, mid 155, high 220 Hz} x distance {near, far}
x {positive sibilant s/sh cases, six negative conditions}, with sibilant
events at five fixed intervals and VAD evidence at the Silero window
cadence (`deesser_corpus.py:18-27,55-104,141-268`).

The corpus is a reproducible engineering fixture, not a perceptual-quality
proof; generated samples are CC0-1.0.
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np

__all__ = [
    "CORPUS_CASES",
    "CORPUS_LICENSE",
    "CORPUS_VERSION",
    "DeEsserCorpusCase",
    "GeneratedDeEsserCase",
    "generate_deesser_case",
    "labels_for_analysis_frames",
]

CORPUS_VERSION = "audioforge-generated-deesser-corpus-v1"
CORPUS_LICENSE = "CC0-1.0"
EVENT_INTERVALS_S = (
    (0.62, 0.84),
    (1.43, 1.67),
    (2.31, 2.55),
    (3.22, 3.47),
    (4.13, 4.38),
)

_VOICES = (("low", 105.0), ("mid", 155.0), ("high", 220.0))
_DISTANCES = (("near", 1.0), ("far", 0.55))
# negative conditions that must NOT trigger the de-esser
_NEGATIVE_CONDITIONS = (
    ("clean", None),
    ("bright", None),
    ("hiss", None),
    ("hvac", None),
    ("transient", None),
    ("fricative_f", "f"),
)


@dataclass(frozen=True)
class DeEsserCorpusCase:
    """One generated clip and its clip/frame label specification."""

    name: str
    sample_rate: int
    voice_hz: float
    distance_scale: float
    condition: str
    sibilant_kind: str | None
    needs_deesser: bool
    seed: int


@dataclass
class GeneratedDeEsserCase:
    """Generated samples, VAD evidence, and event intervals."""

    specification: DeEsserCorpusCase
    noise_audio: np.ndarray
    speech_audio: np.ndarray
    vad_probabilities: np.ndarray
    event_intervals_s: tuple[tuple[float, float], ...]


def _case_matrix() -> tuple[DeEsserCorpusCase, ...]:
    cases: list[DeEsserCorpusCase] = []
    seed = 5200
    for sample_rate in (44_100, 48_000):
        for voice_label, voice_hz in _VOICES:
            for distance_label, distance_scale in _DISTANCES:
                for kind in ("s", "sh"):
                    cases.append(DeEsserCorpusCase(
                        name=f"{voice_label}-{distance_label}-{kind}-{sample_rate}",
                        sample_rate=sample_rate,
                        voice_hz=voice_hz,
                        distance_scale=distance_scale,
                        condition="clean",
                        sibilant_kind=kind,
                        needs_deesser=True,
                        seed=seed,
                    ))
                    seed += 1
                for condition, kind in _NEGATIVE_CONDITIONS:
                    cases.append(DeEsserCorpusCase(
                        name=(
                            f"{voice_label}-{distance_label}-{condition}-"
                            f"{sample_rate}"
                        ),
                        sample_rate=sample_rate,
                        voice_hz=voice_hz,
                        distance_scale=distance_scale,
                        condition=condition,
                        sibilant_kind=kind,
                        needs_deesser=False,
                        seed=seed,
                    ))
                    seed += 1
    return tuple(cases)


CORPUS_CASES = _case_matrix()


def _half_sine_edge(frequencies: np.ndarray, edge_hz: float,
                    transition_hz: float, rising: bool) -> np.ndarray:
    """Quarter-sine spectral ramp: 0 at the stopband side of ``edge_hz``,
    1 once ``transition_hz`` past it."""
    if rising:
        t = np.clip((frequencies - edge_hz) / transition_hz, 0.0, 1.0)
    else:
        t = np.clip((edge_hz - frequencies) / transition_hz, 0.0, 1.0)
    return np.sin(0.5 * np.pi * t)


def _band_limited_noise(rng, sample_count: int, sample_rate: int,
                        low_hz: float, high_hz: float) -> np.ndarray:
    """Unit-RMS noise band with sine-tapered edges (the corpus-spec band
    shape behind the committed fixture hashes; same parameterization as
    the reference corpus, `deesser_corpus.py:107-126`)."""
    transition_hz = max(150.0, 0.08 * (high_hz - low_hz))
    frequencies = np.fft.rfftfreq(sample_count, 1.0 / sample_rate)
    taper = (_half_sine_edge(frequencies, low_hz, transition_hz, True)
             * _half_sine_edge(frequencies, high_hz, transition_hz, False))
    shaped = np.fft.irfft(np.fft.rfft(rng.normal(size=sample_count)) * taper,
                          n=sample_count)
    rms = float(np.sqrt(np.mean(shaped * shaped)))
    return shaped / max(rms, 1e-9)


def _event_mask(time_s: np.ndarray,
                intervals: tuple[tuple[float, float], ...]) -> np.ndarray:
    mask = np.zeros(time_s.shape, dtype=float)
    for start_s, end_s in intervals:
        inside = (time_s >= start_s) & (time_s < end_s)
        count = int(np.count_nonzero(inside))
        if count:
            mask[inside] = np.hanning(max(3, count))[:count]
    return mask


# sibilant / fricative event bands: kind -> (low_hz, high_cap_hz,
# nyquist_fraction, amplitude)
_EVENT_BANDS = {
    "s": (5200.0, 10_500.0, 0.46, 0.10),
    "sh": (3600.0, 8200.0, 0.46, 0.085),
    "f": (1800.0, 6500.0, 0.44, 0.028),
}


def generate_deesser_case(specification: DeEsserCorpusCase, *,
                          duration_s: float = 5.0) -> GeneratedDeEsserCase:
    """Generate one deterministic corpus case
    (`deesser_corpus.py:141-268`)."""
    fs = specification.sample_rate
    n = int(round(duration_s * fs))
    t = np.arange(n, dtype=float) / fs
    rng = np.random.default_rng(specification.seed)

    # syllabic voiced carrier: 0.55 s syllable cycle, two formant humps
    syllable_phase = np.mod(t, 0.55)
    voice_envelope = np.where(syllable_phase < 0.40, 1.0, 0.025)
    voice_envelope *= 0.72 + 0.28 * np.sin(2.0 * np.pi * 1.7 * t) ** 2
    voice = np.zeros(n, dtype=float)
    for harmonic in range(1, 10):
        hz = specification.voice_hz * harmonic
        if hz >= fs * 0.45:
            break
        weight = (1.0 / harmonic) * (
            1.0
            + 1.8 * np.exp(-0.5 * ((hz - 700.0) / 260.0) ** 2)
            + 1.2 * np.exp(-0.5 * ((hz - 2200.0) / 520.0) ** 2)
        )
        voice += weight * np.sin(2.0 * np.pi * hz * t + 0.17 * harmonic)
    voice /= max(float(np.max(np.abs(voice))), 1e-9)
    speech = 0.095 * specification.distance_scale * voice_envelope * voice

    kind = specification.sibilant_kind
    event_intervals = EVENT_INTERVALS_S if kind in {"s", "sh"} else ()
    event_envelope = _event_mask(t, EVENT_INTERVALS_S)
    if kind in _EVENT_BANDS:
        low, cap, frac, amp = _EVENT_BANDS[kind]
        noise = _band_limited_noise(rng, n, fs, low, min(cap, fs * frac))
        speech += amp * specification.distance_scale * event_envelope * noise

    condition = specification.condition
    if condition == "bright":
        brightness = _band_limited_noise(rng, n, fs, 4800.0,
                                         min(10_500.0, fs * 0.46))
        speech += 0.018 * specification.distance_scale * voice_envelope * brightness
    elif condition == "hiss":
        speech += 0.012 * _band_limited_noise(rng, n, fs, 4300.0,
                                              min(11_000.0, fs * 0.46))
    elif condition == "hvac":
        speech += 0.018 * np.sin(2.0 * np.pi * 120.0 * t)
        speech += 0.010 * _band_limited_noise(rng, n, fs, 80.0, 650.0)
    elif condition == "transient":
        for event_s in (0.78, 1.91, 3.04, 4.17):
            start = int(event_s * fs)
            length = min(int(0.018 * fs), n - start)
            if length > 0:
                speech[start:start + length] += (
                    0.13 * np.hanning(length) * rng.normal(size=length)
                )

    speech += 0.0018 * rng.normal(size=n)
    noise_audio = (0.0018 * rng.normal(size=int(3.0 * fs))).astype(np.float32)

    # VAD evidence at the Silero window cadence: speech frames 0.82,
    # silence 0.06, sibilant events dip to 0.18 (the model reads fricatives
    # as low-voicing) — `deesser_corpus.py:245-261`
    vad_window = max(1, int(np.ceil(fs * 512 / 16_000)))
    vad_count = int(np.ceil(n / vad_window))
    vad_times = (np.arange(vad_count, dtype=float) + 0.5) * vad_window / fs
    vad_voice = np.interp(vad_times, t, voice_envelope, left=0.0, right=0.0)
    vad_probabilities = np.where(vad_voice >= 0.20, 0.82, 0.06)
    if event_intervals:
        event_at_vad = _event_mask(vad_times, event_intervals)
        vad_probabilities = np.where(event_at_vad > 0.05, 0.18,
                                     vad_probabilities)

    return GeneratedDeEsserCase(
        specification=specification,
        noise_audio=noise_audio,
        speech_audio=np.clip(speech, -0.98, 0.98).astype(np.float32),
        vad_probabilities=vad_probabilities.astype(float),
        event_intervals_s=event_intervals,
    )


def labels_for_analysis_frames(generated: GeneratedDeEsserCase,
                               frame_indices: np.ndarray, *,
                               hop_ms: float = 20.0,
                               frame_ms: float = 40.0) -> np.ndarray:
    """Binary sibilance labels at analysis-frame centres
    (`deesser_corpus.py:271-284`)."""
    indices = np.asarray(frame_indices, dtype=float)
    centres_s = indices * hop_ms / 1000.0 + frame_ms / 2000.0
    labels = np.zeros(indices.shape, dtype=int)
    for start_s, end_s in generated.event_intervals_s:
        labels[(centres_s >= start_s) & (centres_s < end_s)] = 1
    return labels
