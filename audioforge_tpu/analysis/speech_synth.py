"""Deterministic formant speech synthesizer for corpora and training.

The reference's model evidence is anchored to real recorded corpora
(`python/tools/build_vad_evaluation_corpus.py` pins FSDD + ESC-50;
`evaluation/rnnoise-backend-comparison.json` reports 8.59 dB median SI-SDR
on a real noisy corpus). This environment has no network egress and the
repository policy stores no third-party audio, so the corpus domain is
fully synthetic — but it must be SPEECH-LIKE, not tonal: a 5-harmonic
syllabic tone can be separated from noise by an energy detector, which
would make every model gate vacuous.

This module synthesizes utterances with the articulatory structure real
speech detectors key on:

- a glottal pulse train (jittered f0 with declination + vibrato, soft
  pulse shape, −12 dB/oct source tilt) driving
- 3 formant resonators per vowel (two-pole sections, vowel-dependent
  F1/F2/F3 with per-speaker vocal-tract scaling and trajectory
  interpolation between syllable nuclei),
- voiced/unvoiced excitation mix (aspiration noise through the same
  formants),
- fricative onsets/codas (band-limited noise bursts: /s/ /sh/ /f/ — the
  same event bands as `analysis/deesser_corpus.py`),
- plosive onsets (closure silence + 15 ms broadband burst),
- syllable/word prosody (energy envelopes, inter-word pauses),

plus *babble* built from the speech generator itself (N overlapped
talkers) and *tone confounders* (steady/AM harmonic tones, hum) used as a
negative set that energy- or pitch-based detectors misclassify.

Everything is seeded and pure numpy/scipy; every sample is computed from
the seed (CC0).
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np

__all__ = [
    "SpeechProfile",
    "VOWELS",
    "FRICATIVE_BANDS",
    "synthesize_utterance",
    "synthesize_babble",
    "synthesize_plain_voice",
    "synthesize_test_voice",
    "tone_confounder",
    "TONE_CONFOUNDER_KINDS",
]

SAMPLE_RATE = 48000

# vowel nucleus formants (F1, F2, F3) in Hz — canonical adult values;
# per-speaker vocal-tract length scaling is applied on top
VOWELS: dict[str, tuple[float, float, float]] = {
    "a": (800.0, 1200.0, 2600.0),
    "e": (500.0, 1900.0, 2600.0),
    "i": (320.0, 2300.0, 3000.0),
    "o": (500.0, 900.0, 2400.0),
    "u": (330.0, 800.0, 2300.0),
}
_FORMANT_BW = (90.0, 120.0, 180.0)

# fricative noise bands (low_hz, high_hz, relative amplitude) — the same
# event bands as the de-esser corpus generator
FRICATIVE_BANDS: dict[str, tuple[float, float, float]] = {
    "s": (5200.0, 10500.0, 0.55),
    "sh": (3600.0, 8200.0, 0.50),
    "f": (1800.0, 6500.0, 0.22),
}
_PLOSIVES = ("t", "k", "p")

TONE_CONFOUNDER_KINDS = ("steady", "am_harmonic", "hum_harmonics")


@dataclass(frozen=True)
class SpeechProfile:
    """Per-speaker voice: pitch, vocal-tract scale, speaking rate."""

    f0_hz: float = 140.0            # base pitch
    f0_span: float = 0.35           # relative prosodic pitch range
    tract_scale: float = 1.0        # formant frequency multiplier (~0.8-1.25)
    rate_hz: float = 3.2            # syllables per second
    breathiness: float = 0.08       # aspiration level relative to voicing
    tilt: float = 1.0               # relative high-formant emphasis


def _resonator(x: np.ndarray, freq: float, bw: float, fs: float) -> np.ndarray:
    """Two-pole formant section with unit peak gain."""
    from scipy.signal import lfilter

    r = np.exp(-np.pi * bw / fs)
    theta = 2.0 * np.pi * freq / fs
    a = [1.0, -2.0 * r * np.cos(theta), r * r]
    # normalize to ~unit gain at the resonance
    g = (1.0 - r) * np.sqrt(1.0 - 2.0 * r * np.cos(2.0 * theta) + r * r)
    return lfilter([g], a, x)


def _band_noise(rng, n: int, fs: float, low: float, high: float) -> np.ndarray:
    """Unit-RMS band-limited noise with sine-tapered edges."""
    white = rng.normal(size=n)
    spectrum = np.fft.rfft(white)
    freqs = np.fft.rfftfreq(n, 1.0 / fs)
    trans = max(150.0, 0.08 * (high - low))
    lo = np.clip((freqs - low) / trans, 0.0, 1.0)
    hi = np.clip((high - freqs) / trans, 0.0, 1.0)
    shaped = np.fft.irfft(spectrum * np.sin(0.5 * np.pi * lo)
                          * np.sin(0.5 * np.pi * hi), n=n)
    rms = float(np.sqrt(np.mean(shaped * shaped)))
    return (shaped / max(rms, 1e-9)).astype(np.float64)


def _glottal_pulses(rng, n: int, fs: float, f0_contour: np.ndarray) -> np.ndarray:
    """Soft glottal pulse train following the instantaneous f0 contour,
    with jitter (cycle-level pitch perturbation) and shimmer (amplitude
    perturbation). The pulse is a raised-cosine closing phase, giving the
    natural −12 dB/oct source roll-off."""
    phase = np.cumsum(f0_contour / fs)
    # cycle-synchronous jitter: perturb the phase with a slow random walk
    jitter = np.cumsum(rng.normal(0.0, 0.003, n))
    jitter -= np.linspace(jitter[0], jitter[-1], n)
    cycles = phase + 0.01 * jitter
    frac = np.mod(cycles, 1.0)
    # open phase ~0.6 of the cycle: pulse = 0.5(1-cos) ramp then sharp close
    open_q = 0.6
    rising = 0.5 * (1.0 - np.cos(np.pi * np.clip(frac / open_q, 0.0, 1.0)))
    closing = np.clip((1.0 - frac) / (1.0 - open_q), 0.0, 1.0)
    pulse = rising * closing
    # shimmer: per-cycle amplitude wobble approximated by slow noise
    shimmer = 1.0 + 0.06 * np.convolve(
        rng.normal(0.0, 1.0, n), np.ones(480) / 480.0, mode="same")
    # differentiate to get the glottal flow derivative (what reaches lips)
    src = np.diff(pulse * shimmer, prepend=pulse[0])
    return src


def _syllable_plan(rng, seconds: float, profile: SpeechProfile):
    """Word/syllable schedule: [(t_start, t_end, vowel, onset, coda)]."""
    plan = []
    t = float(rng.uniform(0.15, 0.4))
    vowel_names = sorted(VOWELS)
    while t < seconds - 0.3:
        word_syllables = int(rng.integers(1, 5))
        for _ in range(word_syllables):
            dur = float(np.clip(rng.normal(1.0 / profile.rate_hz, 0.05),
                                0.12, 0.5))
            if t + dur > seconds - 0.05:
                break
            vowel = vowel_names[int(rng.integers(len(vowel_names)))]
            onset = None
            draw = rng.uniform()
            if draw < 0.25:
                onset = ("fricative",
                         sorted(FRICATIVE_BANDS)[int(
                             rng.integers(len(FRICATIVE_BANDS)))])
            elif draw < 0.45:
                onset = ("plosive", _PLOSIVES[int(rng.integers(3))])
            coda = None
            if rng.uniform() < 0.12:
                coda = ("fricative", "s")
            plan.append((t, t + dur, vowel, onset, coda))
            t += dur
        t += float(rng.uniform(0.12, 0.55))  # inter-word pause
    if not plan and seconds > 0.1:
        # Sub-second clips can fall entirely inside the lead-in/tail
        # margins above; guarantee one (possibly truncated) nucleus so
        # short requests are never silent (unit-RMS contract).
        dur = min(max(seconds - 0.04, 0.06), 0.5)
        t0 = max((seconds - dur) * 0.5, 0.0)
        vowel = vowel_names[int(rng.integers(len(vowel_names)))]
        plan.append((t0, t0 + dur, vowel, None, None))
    return plan


def synthesize_utterance(rng, seconds: float,
                         profile: SpeechProfile | None = None,
                         sample_rate: int = SAMPLE_RATE):
    """One utterance. Returns ``(audio float32 (peak-normalized ~0.5),
    speech_intervals_samples)`` where the intervals cover voiced nuclei
    AND consonant segments (they are speech for VAD purposes)."""
    if profile is None:
        profile = SpeechProfile()
    fs = float(sample_rate)
    n = int(round(seconds * fs))
    t = np.arange(n) / fs
    plan = _syllable_plan(rng, seconds, profile)
    if not plan:
        return np.zeros(n, np.float32), []

    # prosodic f0 contour: declination per word + vibrato + drift
    f0 = np.full(n, profile.f0_hz)
    f0 *= 1.0 + profile.f0_span * (
        0.4 * np.sin(2.0 * np.pi * 0.43 * t + rng.uniform(0, 6.28))
        + 0.2 * np.sin(2.0 * np.pi * 1.1 * t + rng.uniform(0, 6.28)))
    f0 *= 1.0 + 0.008 * np.sin(2.0 * np.pi * 5.2 * t)  # vibrato
    voiced_src = _glottal_pulses(rng, n, fs, f0)
    asp_src = rng.normal(0.0, 1.0, n)

    audio = np.zeros(n)
    intervals: list[tuple[int, int]] = []
    for (t0, t1, vowel, onset, coda) in plan:
        i0, i1 = int(t0 * fs), min(int(t1 * fs), n)
        seg_start = i0
        # --- onset consonant ---
        if onset is not None:
            kind, which = onset
            if kind == "plosive":
                closure = int(0.035 * fs)
                burst_len = int(0.015 * fs)
                b0 = i0 + closure
                if b0 + burst_len < i1:
                    burst = _band_noise(rng, burst_len, fs, 500.0, 9000.0)
                    env = np.exp(-np.arange(burst_len) / (0.004 * fs))
                    audio[b0:b0 + burst_len] += 0.35 * burst * env
                i0 = b0 + burst_len
            else:
                fr_len = int(rng.uniform(0.06, 0.12) * fs)
                fr_len = min(fr_len, max(i1 - i0 - int(0.05 * fs), 0))
                if fr_len > 64:
                    low, high, amp = FRICATIVE_BANDS[which]
                    noise = _band_noise(rng, fr_len, fs, low,
                                        min(high, fs * 0.46))
                    env = np.hanning(fr_len) ** 0.5
                    audio[i0:i0 + fr_len] += amp * 0.28 * noise * env
                    i0 += int(fr_len * 0.8)  # slight overlap into the vowel
        # --- voiced nucleus through the formant stack ---
        if i1 - i0 > 96:
            seg = slice(i0, i1)
            length = i1 - i0
            env = np.ones(length)
            attack = max(int(0.020 * fs), 1)
            decay = max(int(0.045 * fs), 1)
            env[:attack] *= np.linspace(0.0, 1.0, attack)
            env[-decay:] *= np.linspace(1.0, 0.05, decay)
            # stress variation per syllable
            env *= rng.uniform(0.55, 1.0)
            excitation = (voiced_src[seg]
                          + profile.breathiness * asp_src[seg])
            f1, f2, f3 = (f * profile.tract_scale
                          * rng.uniform(0.94, 1.06) for f in VOWELS[vowel])
            voiced = (_resonator(excitation, f1, _FORMANT_BW[0], fs)
                      + 0.6 * profile.tilt
                      * _resonator(excitation, f2, _FORMANT_BW[1], fs)
                      + 0.3 * profile.tilt
                      * _resonator(excitation, f3, _FORMANT_BW[2], fs))
            # voiced nuclei carry the bulk of speech energy: normalize the
            # nucleus to a common RMS so consonant bursts sit ~12-18 dB
            # below it (their amplitudes above are relative to this scale)
            v_rms = float(np.sqrt(np.mean(voiced * voiced)))
            voiced *= 0.28 / max(v_rms, 1e-9)
            audio[seg] += voiced * env
        # --- coda ---
        if coda is not None and i1 + int(0.08 * fs) < n:
            low, high, amp = FRICATIVE_BANDS[coda[1]]
            fr_len = int(0.07 * fs)
            noise = _band_noise(rng, fr_len, fs, low, min(high, fs * 0.46))
            env = np.hanning(fr_len) ** 0.5
            audio[i1:i1 + fr_len] += amp * 0.22 * noise * env
            i1 += fr_len
        intervals.append((seg_start, min(i1, n)))

    peak = float(np.max(np.abs(audio)))
    audio = (audio / max(peak, 1e-9) * 0.5).astype(np.float32)
    # merge overlapping/adjacent intervals
    merged: list[tuple[int, int]] = []
    for lo, hi in sorted(intervals):
        if merged and lo <= merged[-1][1] + int(0.02 * fs):
            merged[-1] = (merged[-1][0], max(merged[-1][1], hi))
        else:
            merged.append((lo, hi))
    return audio, merged


def synthesize_babble(rng, seconds: float, n_talkers: int = 6,
                      sample_rate: int = SAMPLE_RATE) -> np.ndarray:
    """Unit-RMS babble: N overlapped independent talkers from the speech
    generator itself (so its spectro-temporal statistics are genuinely
    speech-like — the hard negative for speech detectors)."""
    n = int(round(seconds * sample_rate))
    mix = np.zeros(n, np.float64)
    for _ in range(n_talkers):
        profile = SpeechProfile(
            f0_hz=float(rng.uniform(90.0, 240.0)),
            f0_span=float(rng.uniform(0.2, 0.5)),
            tract_scale=float(rng.uniform(0.85, 1.2)),
            rate_hz=float(rng.uniform(2.2, 4.5)),
            breathiness=float(rng.uniform(0.04, 0.14)),
            tilt=float(rng.uniform(0.7, 1.3)),
        )
        talker, _ = synthesize_utterance(rng, seconds, profile, sample_rate)
        # random onset offset so syllables decorrelate
        shift = int(rng.integers(0, max(n // 4, 1)))
        mix += np.roll(talker.astype(np.float64), shift)
    rms = float(np.sqrt(np.mean(mix * mix)))
    return (mix / max(rms, 1e-9)).astype(np.float32)


def tone_confounder(rng, seconds: float, kind: str,
                    sample_rate: int = SAMPLE_RATE) -> np.ndarray:
    """Unit-RMS NON-speech confounders that energy/pitch detectors
    misclassify: harmonic tones with and without syllabic AM, and mains
    hum with harmonics. These are negatives for the VAD gates."""
    if kind not in TONE_CONFOUNDER_KINDS:
        raise ValueError(f"unknown confounder kind {kind!r}")
    n = int(round(seconds * sample_rate))
    t = np.arange(n) / float(sample_rate)
    f0 = float(rng.uniform(110.0, 230.0))
    x = np.zeros(n)
    if kind == "steady":
        for k in (1, 2, 3, 4, 6):
            x += np.sin(2 * np.pi * f0 * k * t + rng.uniform(0, 6.28)) / k
    elif kind == "am_harmonic":
        rate = float(rng.uniform(1.8, 3.6))
        am = 0.5 * (1.0 + np.sin(2 * np.pi * rate * t + rng.uniform(0, 6.28)))
        for k in (1, 2, 3, 4, 6):
            x += np.sin(2 * np.pi * f0 * k * t + rng.uniform(0, 6.28)) / k
        x *= np.where(am > 0.45, am, 0.0)
    else:  # hum_harmonics
        for k in (1, 2, 3, 5):
            x += np.sin(2 * np.pi * 50.4 * k * t + rng.uniform(0, 6.28)) / k
        x += 0.05 * rng.normal(size=n)
    rms = float(np.sqrt(np.mean(x * x)))
    return (x / max(rms, 1e-9)).astype(np.float32)


def synthesize_plain_voice(rng, seconds: float,
                           sample_rate: int = SAMPLE_RATE):
    """Clean "recording-booth" pulse-train voice: a rectangular glottal
    source with slow vibrato through three *static* formant resonances,
    near-noiseless, gated by a slow utterance envelope.

    This family sits exactly between :func:`synthesize_utterance` (rich
    syllabic speech) and :func:`tone_confounder` (steady harmonic
    complexes): strongly periodic, spectrally static, but still speech.
    The analysis layer's voiced-capture validation exercises signals of
    this family, so the VAD trainer includes them as explicit positives —
    a discriminator trained with harmonic-tone hard negatives alone
    learns "static harmonic complex => not speech" and silently breaks
    Auto-EQ's voiced-window selection (round-4 regression).

    Returns ``(audio float32 peak ~0.2, active bool mask per sample)``.
    """
    n = int(round(seconds * sample_rate))
    t = np.arange(n) / float(sample_rate)
    f0_base = float(rng.uniform(100.0, 210.0))
    vib_rate = float(rng.uniform(0.4, 1.2))
    vib_depth = float(rng.uniform(8.0, 28.0))
    f0 = f0_base + vib_depth * np.sin(2.0 * np.pi * vib_rate * t
                                      + rng.uniform(0.0, 6.28))
    phase = np.cumsum(f0) / float(sample_rate)
    duty = float(rng.uniform(0.3, 0.5))
    glottal = (np.mod(phase, 1.0) < duty).astype(np.float64) - duty
    formants = (
        float(rng.uniform(420.0, 640.0)),
        float(rng.uniform(1250.0, 1800.0)),
        float(rng.uniform(2200.0, 2900.0)),
    )
    bws = (
        float(rng.uniform(60.0, 110.0)),
        float(rng.uniform(90.0, 160.0)),
        float(rng.uniform(140.0, 220.0)),
    )
    x = glottal
    for fc, bw in zip(formants, bws):
        x = _resonator(x, fc, bw, float(sample_rate))
    x = x + float(rng.uniform(0.01, 0.05)) * rng.standard_normal(n)
    # slow utterance gating: speech bursts with pauses
    env_rate = float(rng.uniform(0.7, 1.4))
    env_duty = float(rng.uniform(0.5, 0.8))
    env_phase = float(rng.uniform(0.0, 1.0))
    env = (np.mod(t * env_rate + env_phase, 1.0) < env_duty)
    x = x * env.astype(np.float64)
    peak = float(np.max(np.abs(x)))
    x = float(rng.uniform(0.12, 0.3)) * x / max(peak, 1e-9)
    return x.astype(np.float32), env


def synthesize_test_voice(duration_s: float = 4.0, seed: int = 0,
                          shape_filter=None,
                          sample_rate: int = SAMPLE_RATE) -> np.ndarray:
    """The analysis suite's canonical speech-like capture: a rectangular
    glottal pulse train with slow vibrato through three fixed formant
    resonances, light noise, and a 0.65-duty utterance envelope.

    This is the exact signal family `tests/test_analysis.py` drives
    Auto-EQ with, exported here so the VAD trainer's downstream
    voiced-capture gate exercises the SAME family the tests validate —
    a checkpoint can only ship if Auto-EQ still accepts these captures
    (the round-4 regression shipped because the trainer's corpus and the
    analysis tests used different clean-voice families).
    """
    from scipy.signal import lfilter

    rng = np.random.default_rng(seed)
    n = int(sample_rate * duration_s)
    t = np.arange(n) / sample_rate
    f0 = 120.0 + 20.0 * np.sin(2 * np.pi * 0.7 * t)
    phase = np.cumsum(f0) / sample_rate
    x = (np.mod(phase, 1.0) < 0.4).astype(np.float64) - 0.4
    for fc, bw in ((500, 80), (1500, 120), (2500, 180)):
        r = np.exp(-np.pi * bw / sample_rate)
        a = [1, -2 * r * np.cos(2 * np.pi * fc / sample_rate), r * r]
        x = lfilter([1 - r], a, x)
    x += 0.02 * rng.standard_normal(n)
    env = ((t % 1.0) < 0.65).astype(np.float64)
    x = x * env
    x = 0.2 * x / np.max(np.abs(x))
    if shape_filter is not None:
        x = shape_filter(x)
    return x.astype(np.float32)
