"""Voice spectrum estimation for Auto-EQ and Voice Setup.

Behavioural contract mirrors `python/mic_eq/analysis/spectrum.py`:

- Welch/Hamming (nperseg 4096, 50 % overlap) is the production estimator
  (`spectrum.py:110-164`); a DPSS multi-taper multi-resolution estimator is
  retained as an explicit non-production experiment (`spectrum.py:2-7`).
- Voiced-frame selection by an RMS percentile gate (floor p20 + 0.6*spread,
  >= -48 dB) optionally fused with Silero posteriors interpolated onto
  analysis-frame centres (`spectrum.py:17-31,69-107,172-220`).
- Robust median shape with MAD outlier rejection (`spectrum.py:252-291`),
  per-bin repeatability/uncertainty from independent window blocks,
  phonetic-coverage and effective-block estimates, spectral SNR against a
  noise reference (explicit capture > validated override > credible
  in-capture non-speech frames).
- 1/N-octave energy smoothing per IEC 61260-style band edges and the
  voice-aware perceptual smoothing blend (`spectrum.py:892-974`).

The implementation is fully vectorised (batched FFTs over the frame matrix,
cumulative-sum band averaging) rather than the reference's per-frame loops.
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np
from scipy import signal as sp_signal

VOICE_FRAME_RMS_GATE_DB = -48.0
VOICE_FRAME_FLOOR_PERCENTILE = 20.0
VOICE_FRAME_PEAK_PERCENTILE = 95.0
VOICE_FRAME_GATE_FRACTION = 0.60
VOICE_FRAME_MIN_SPREAD_DB = 6.0
MIN_VOICED_FRAME_RATIO = 0.15
MIN_VOICED_FRAMES = 3
SILERO_WINDOW_SAMPLES = 512
SILERO_SAMPLE_RATE = 16000
UNCERTAINTY_BLOCK_FRAMES = 3
UNCERTAINTY_SCALE_DB = 2.5
PHONETIC_COVERAGE_TARGET_BLOCKS = 12
VAD_SPEECH_EVIDENCE_THRESHOLD = 0.40
VAD_STRONG_SPEECH_THRESHOLD = 0.65
SPECTRUM_ESTIMATOR_POLICY = "welch_hamming"

__all__ = [
    "VoiceSpectrumResult",
    "compute_voice_spectrum",
    "analyze_voice_spectrum",
    "smooth_spectrum_octave",
    "smooth_spectrum_perceptual",
    "find_octave_spaced_peaks",
]


@dataclass(frozen=True)
class VoiceSpectrumResult:
    """Rich spectrum result consumed by the Auto-EQ solver
    (`spectrum.py:33-56`)."""

    freqs: np.ndarray
    median_spectrum_db: np.ndarray
    window_spectra_db: np.ndarray
    voiced_window_ratio: float
    snr_db: float
    spectral_repeatability: np.ndarray
    spectral_tilt_db_per_octave: float
    residual_confidence: float
    used_single_spectrum_fallback: bool
    measurement_coverage: float = 1.0
    outlier_rejection_ratio: float = 0.0
    vad_probability_used: bool = False
    vad_active_window_ratio: float = 0.0
    spectral_snr_db: np.ndarray | None = None
    noise_spectrum_db: np.ndarray | None = None
    noise_reference_source: str = "unavailable"
    measurement_uncertainty_db: np.ndarray | None = None
    phonetic_coverage: float = 0.0
    effective_measurement_blocks: float = 0.0


def _frames_of(audio: np.ndarray, nperseg: int, hop: int) -> np.ndarray:
    if len(audio) < nperseg:
        return np.zeros((0, nperseg))
    return np.lib.stride_tricks.sliding_window_view(audio, nperseg)[::hop]


def _frame_rms_db(frames: np.ndarray) -> np.ndarray:
    return 10.0 * np.log10(np.mean(frames * frames, axis=1) + 1e-12)


def _batched_window_spectra_db(frames: np.ndarray, fs: float):
    """All frame spectra in one batched FFT (mean-removed, Hamming,
    window-energy normalised — `spectrum.py:293-301`)."""
    frames = np.asarray(frames, float)
    frames = frames - frames.mean(axis=1, keepdims=True)
    window = np.hamming(frames.shape[1])
    spec = np.fft.rfft(frames * window, axis=1)
    psd = (spec.real**2 + spec.imag**2) / max(float(np.sum(window * window)), 1e-12)
    freqs = np.fft.rfftfreq(frames.shape[1], d=1.0 / fs)
    return freqs, 10.0 * np.log10(psd + 1e-12)


def _interpolate_vad(vad_probabilities, frame_starts, frame_size, sample_rate):
    """Map Silero-window posteriors onto analysis-frame centres
    (`spectrum.py:172-197`)."""
    if vad_probabilities is None:
        return None
    p = np.asarray(vad_probabilities, float).reshape(-1)
    if p.size == 0 or frame_starts.size == 0 or sample_rate <= 0:
        return None
    vad_win = max(1, int(np.ceil(sample_rate * SILERO_WINDOW_SAMPLES / SILERO_SAMPLE_RATE)))
    centres = frame_starts.astype(float) + frame_size * 0.5
    vad_centres = (np.arange(p.size) + 0.5) * vad_win
    pc = np.clip(p, 0.0, 1.0)
    return np.interp(centres, vad_centres, pc, left=pc[0], right=pc[-1])


def _voiced_mask(frame_rms_db, posterior):
    """Energy gate fused with posterior evidence (`spectrum.py:200-245`)."""
    floor_db = float(np.percentile(frame_rms_db, VOICE_FRAME_FLOOR_PERCENTILE))
    peak_db = float(np.percentile(frame_rms_db, VOICE_FRAME_PEAK_PERCENTILE))
    spread = peak_db - floor_db
    gate_db = max(
        VOICE_FRAME_RMS_GATE_DB,
        floor_db + VOICE_FRAME_GATE_FRACTION * max(spread, VOICE_FRAME_MIN_SPREAD_DB),
    )
    energy_mask = (
        np.ones_like(frame_rms_db, bool)
        if spread < VOICE_FRAME_MIN_SPREAD_DB
        else frame_rms_db >= gate_db
    )
    if posterior is None or posterior.shape != frame_rms_db.shape:
        return energy_mask
    supported = frame_rms_db >= max(
        VOICE_FRAME_RMS_GATE_DB,
        floor_db + 0.25 * max(spread, VOICE_FRAME_MIN_SPREAD_DB),
    )
    combined = ((posterior >= VAD_SPEECH_EVIDENCE_THRESHOLD) & supported) | (
        posterior >= VAD_STRONG_SPEECH_THRESHOLD
    )
    if int(np.count_nonzero(combined)) >= MIN_VOICED_FRAMES:
        return combined
    return energy_mask


def compute_voice_spectrum(audio, fs=48000, nperseg=4096):
    """Welch/Hamming production estimator over energy-gated voiced samples
    (`spectrum.py:110-164`)."""
    if len(audio) < nperseg:
        raise ValueError(
            f"Audio too short for FFT: need {nperseg} samples, "
            f"got {len(audio)} ({len(audio)/fs:.2f} seconds)"
        )
    audio = np.asarray(audio, float)
    hop = max(1, nperseg // 2)
    frames = _frames_of(audio, nperseg, hop)
    rms = _frame_rms_db(frames)
    mask = _voiced_mask(rms, None)
    n_voiced = int(np.count_nonzero(mask))
    use = audio
    if (
        n_voiced >= MIN_VOICED_FRAMES
        and n_voiced / max(1, frames.shape[0]) >= MIN_VOICED_FRAME_RATIO
    ):
        starts = np.arange(frames.shape[0]) * hop
        sample_mask = np.zeros(len(audio), bool)
        for s in starts[mask]:
            sample_mask[s : s + nperseg] = True
        voiced = audio[sample_mask]
        if len(voiced) >= nperseg:
            use = voiced
    freqs, psd = sp_signal.welch(
        use, fs=fs, window="hamming", nperseg=nperseg,
        noverlap=nperseg // 2, detrend="constant",
    )
    return freqs, 10.0 * np.log10(psd + 1e-12)


def _spectral_snr_db(speech_db, noise_db):
    """Per-bin SNR from matched total/noise spectra (`spectrum.py:333-345`)."""
    total = np.power(10.0, np.asarray(speech_db, float) / 10.0)
    noise = np.maximum(np.power(10.0, np.asarray(noise_db, float) / 10.0), 1e-18)
    sig = np.maximum(total - noise, noise * 1e-6)
    return 10.0 * np.log10(sig / noise)


def _integrated_snr_db(freqs, spectrum_db, noise_db):
    if noise_db is None:
        return 0.0
    mask = (freqs >= 80.0) & (freqs <= 8000.0)
    if not np.any(mask):
        mask = np.ones_like(freqs, bool)
    total = np.power(10.0, np.asarray(spectrum_db, float)[mask] / 10.0)
    noise = np.power(10.0, np.asarray(noise_db, float)[mask] / 10.0)
    nsum = max(float(noise.sum()), 1e-18)
    ssum = max(float((total - noise).sum()), nsum * 1e-6)
    return float(10.0 * np.log10(ssum / nsum))


def _tilt_db_per_octave(freqs, spectrum_db):
    mask = (freqs >= 100.0) & (freqs <= 8000.0)
    if np.count_nonzero(mask) < 2:
        return 0.0
    x = np.log2(freqs[mask])
    y = np.asarray(spectrum_db, float)[mask]
    xc = x - x.mean()
    denom = float(np.dot(xc, xc))
    return float(np.dot(xc, y - y.mean()) / denom) if denom > 0 else 0.0


def _robust_median_spectrum(freqs, spectra_db):
    """Level-normalised shape median with RMS-MAD outlier rejection
    (`spectrum.py:252-291`)."""
    if spectra_db.shape[0] < 3:
        return np.median(spectra_db, axis=0), 1.0
    vmask = (freqs >= 100.0) & (freqs <= 8000.0)
    if not np.any(vmask):
        vmask = np.ones(freqs.shape, bool)
    levels = np.median(spectra_db[:, vmask], axis=1)
    normalized = spectra_db - levels[:, None]
    centre = np.median(normalized, axis=0)
    err = normalized[:, vmask] - centre[vmask]
    dist = np.sqrt(np.mean(err * err, axis=1))
    med = float(np.median(dist))
    mad = float(np.median(np.abs(dist - med)))
    inliers = dist <= med + 4.0 * max(mad, 0.25)
    need = max(3, int(np.ceil(spectra_db.shape[0] * 0.50)))
    if int(np.count_nonzero(inliers)) < need:
        inliers = np.zeros(spectra_db.shape[0], bool)
        inliers[np.argsort(dist)[:need]] = True
    shape = np.median(normalized[inliers], axis=0)
    level = float(np.median(levels[inliers]))
    return shape + level, float(np.count_nonzero(inliers) / max(1, spectra_db.shape[0]))


def _phonetic_coverage(freqs, normalized_spectra_db):
    """Band-level diversity score (`spectrum.py:384-414`)."""
    bands = (
        (100.0, 350.0, 3.0),
        (350.0, 1000.0, 4.0),
        (1000.0, 2500.0, 5.0),
        (2500.0, 4500.0, 6.0),
        (4500.0, 8000.0, 7.0),
    )
    scores = []
    for lo, hi, target in bands:
        mask = (freqs >= lo) & (freqs < hi)
        if not np.any(mask):
            continue
        level = np.median(normalized_spectra_db[:, mask], axis=1)
        spread = float(np.percentile(level, 90) - np.percentile(level, 10))
        scores.append(float(np.clip(spread / target, 0.0, 1.0)))
    return float(np.mean(scores)) if scores else 0.0


def _effective_blocks(blocks):
    """Lag-1 autocorrelation-corrected effective sample count
    (`spectrum.py:416-430`)."""
    n = int(blocks.shape[0])
    if n <= 1:
        return float(n)
    centered = blocks - np.median(blocks, axis=0, keepdims=True)
    left = centered[:-1].ravel()
    right = centered[1:].ravel()
    denom = float(np.linalg.norm(left) * np.linalg.norm(right))
    lag1 = 0.95 if denom <= 1e-12 else float(np.clip(np.dot(left, right) / denom, 0.0, 0.95))
    return float(np.clip(n * (1 - lag1) / (1 + lag1), 1.0, float(n)))


def _measurement_reliability(freqs, spectra_db, frame_starts, frame_size):
    """Per-bin uncertainty/repeatability from independent window blocks
    (`spectrum.py:433-494`)."""
    smoothed = np.stack(
        [smooth_spectrum_perceptual(freqs, s) for s in spectra_db]
    )
    vmask = (freqs >= 100.0) & (freqs <= 8000.0)
    lvl = (
        smoothed[:, vmask].mean(axis=1, keepdims=True)
        if np.any(vmask)
        else smoothed.mean(axis=1, keepdims=True)
    )
    normalized = smoothed - lvl
    # greedy non-overlapping window selection (50 % overlap isn't independent)
    keep, next_start = [], -1
    for i, s in enumerate(np.asarray(frame_starts, int)):
        if int(s) >= next_start:
            keep.append(i)
            next_start = int(s) + int(frame_size)
    independent = normalized[np.asarray(keep, int)]
    rows = [
        np.median(independent[i : i + UNCERTAINTY_BLOCK_FRAMES], axis=0)
        for i in range(0, independent.shape[0] - UNCERTAINTY_BLOCK_FRAMES + 1,
                       UNCERTAINTY_BLOCK_FRAMES)
    ]
    if not rows and independent.shape[0] > 0:
        rows = [np.median(independent, axis=0)]
    blocks = np.asarray(rows, float)
    eff = _effective_blocks(blocks)
    if blocks.shape[0] < 2:
        uncertainty = np.full(freqs.shape, np.inf)
        reliability = np.zeros(freqs.shape)
    else:
        centre = np.median(blocks, axis=0)
        sigma = 1.4826 * np.median(np.abs(blocks - centre), axis=0)
        uncertainty = (1.253 * sigma + 0.35) / np.sqrt(max(eff, 1.0))
        reliability = np.exp(-np.square(uncertainty / UNCERTAINTY_SCALE_DB))
    diversity = _phonetic_coverage(freqs, independent)
    duration = float(np.clip(eff / PHONETIC_COVERAGE_TARGET_BLOCKS, 0.0, 1.0))
    coverage = float(np.sqrt(diversity * duration))
    return np.clip(reliability, 0.0, 1.0), smoothed, uncertainty, coverage, eff


def analyze_voice_spectrum(
    audio, fs=48000, nperseg=4096, *, vad_probabilities=None, noise_audio=None,
    noise_spectrum_override=None, noise_reference_source_override=None,
) -> VoiceSpectrumResult:
    """VAD-masked, repeatability-aware robust voice spectrum
    (`spectrum.py:508-744`)."""
    if len(audio) < nperseg:
        raise ValueError(
            f"Audio too short for FFT: need {nperseg} samples, "
            f"got {len(audio)} ({len(audio)/fs:.2f} seconds)"
        )
    audio_arr = np.asarray(audio, float)
    hop = max(1, nperseg // 2)
    frames = _frames_of(audio_arr, nperseg, hop)
    rms = _frame_rms_db(frames)
    starts = np.arange(frames.shape[0], dtype=int) * hop
    posterior = _interpolate_vad(vad_probabilities, starts, nperseg, fs)
    mask = _voiced_mask(rms, posterior)
    voiced_ratio = float(np.mean(mask)) if mask.size else 0.0
    voiced = frames[mask]
    vad_active_ratio = (
        float(np.mean(posterior >= VAD_SPEECH_EVIDENCE_THRESHOLD))
        if posterior is not None
        else 0.0
    )
    vad_used = posterior is not None

    # noise reference priority: validated override > explicit capture >
    # credible in-capture non-speech frames (`spectrum.py:556-584`)
    noise_ref = None
    noise_source = "unavailable"
    if noise_spectrum_override is not None:
        of = np.asarray(noise_spectrum_override[0], float)
        os_ = np.asarray(noise_spectrum_override[1], float)
        if (
            of.ndim == 1 and os_.shape == of.shape and of.size >= 2
            and np.all(np.isfinite(of)) and np.all(np.isfinite(os_))
        ):
            noise_ref = (of, os_)
            noise_source = (
                str(noise_reference_source_override)
                if noise_reference_source_override
                else "validated_conservative"
            )
    if noise_ref is None and noise_audio is not None:
        na = np.asarray(noise_audio, float).reshape(-1)
        if na.size >= nperseg:
            nf = _frames_of(na, nperseg, hop)
            fr, sp = _batched_window_spectra_db(nf, fs)
            noise_ref = (fr, np.median(sp, axis=0))
            noise_source = "explicit_capture"
    speech_ref = None
    if voiced.shape[0] > 0:
        fr, sp = _batched_window_spectra_db(voiced, fs)
        speech_ref = (fr, np.median(sp, axis=0))
    if noise_ref is None:
        unvoiced = frames[~mask]
        if unvoiced.shape[0] >= MIN_VOICED_FRAMES and voiced.shape[0] > 0:
            if float(np.median(rms[mask])) - float(np.median(rms[~mask])) >= 3.0:
                fr, sp = _batched_window_spectra_db(unvoiced, fs)
                noise_ref = (fr, np.median(sp, axis=0))
                noise_source = "in_capture_non_speech"

    noise_db = None
    spectral_snr = None
    if speech_ref is not None and noise_ref is not None:
        rf, rs = speech_ref
        noise_db = np.interp(rf, noise_ref[0], noise_ref[1],
                             left=float(noise_ref[1][0]), right=float(noise_ref[1][-1]))
        spectral_snr = _spectral_snr_db(rs, noise_db)

    if voiced.shape[0] < MIN_VOICED_FRAMES or voiced_ratio < MIN_VOICED_FRAME_RATIO:
        freqs, spectrum_db = compute_voice_spectrum(audio_arr, fs, nperseg)
        aligned_noise = aligned_snr = None
        if speech_ref is not None and noise_db is not None:
            rf, rs = speech_ref
            aligned_noise = np.interp(freqs, rf, noise_db)
            aligned_snr = _spectral_snr_db(np.interp(freqs, rf, rs), aligned_noise)
        return VoiceSpectrumResult(
            freqs=freqs,
            median_spectrum_db=spectrum_db,
            window_spectra_db=np.asarray([spectrum_db]),
            voiced_window_ratio=max(voiced_ratio, 1.0 / max(1, frames.shape[0])),
            snr_db=_integrated_snr_db(freqs, spectrum_db, aligned_noise),
            spectral_repeatability=np.zeros_like(freqs),
            spectral_tilt_db_per_octave=_tilt_db_per_octave(freqs, spectrum_db),
            residual_confidence=0.0,
            used_single_spectrum_fallback=True,
            measurement_coverage=0.45,
            outlier_rejection_ratio=0.0,
            vad_probability_used=vad_used,
            vad_active_window_ratio=vad_active_ratio,
            spectral_snr_db=aligned_snr,
            noise_spectrum_db=aligned_noise,
            noise_reference_source=noise_source,
            measurement_uncertainty_db=np.full_like(freqs, np.inf),
            phonetic_coverage=0.0,
            effective_measurement_blocks=0.0,
        )

    freqs, spectra_arr = _batched_window_spectra_db(voiced, fs)
    reliability, smoothed, uncertainty, coverage_ph, eff = _measurement_reliability(
        freqs, spectra_arr, starts[mask], nperseg
    )
    median_spectrum, inlier_ratio = _robust_median_spectrum(freqs, smoothed)
    if noise_db is not None and speech_ref is not None:
        noise_db = np.interp(freqs, speech_ref[0], noise_db)
        spectral_snr = _spectral_snr_db(median_spectrum, noise_db)
    snr_db = _integrated_snr_db(freqs, median_spectrum, noise_db)
    snr_conf = (
        float(np.clip((snr_db - 3.0) / 15.0, 0.0, 1.0)) if noise_db is not None else None
    )
    vmask = (freqs >= 100.0) & (freqs <= 8000.0)
    repeat_score = float(
        np.median(reliability[vmask]) if np.any(vmask) else np.median(reliability)
    )
    duration = float(np.clip(eff / PHONETIC_COVERAGE_TARGET_BLOCKS, 0.0, 1.0))
    coverage = float(
        np.clip(0.45 * inlier_ratio + 0.35 * coverage_ph + 0.20 * duration, 0.0, 1.0)
    )
    if snr_conf is None:
        residual = float(np.clip(0.5625 * repeat_score + 0.4375 * coverage_ph, 0.0, 0.70))
    else:
        residual = float(
            np.clip(0.45 * repeat_score + 0.35 * coverage_ph + 0.20 * snr_conf, 0.0, 1.0)
        )
    residual = float(np.clip(residual * (0.75 + 0.25 * coverage), 0.0, 1.0))
    return VoiceSpectrumResult(
        freqs=freqs,
        median_spectrum_db=median_spectrum,
        window_spectra_db=spectra_arr,
        voiced_window_ratio=voiced_ratio,
        snr_db=snr_db,
        spectral_repeatability=reliability,
        spectral_tilt_db_per_octave=_tilt_db_per_octave(freqs, median_spectrum),
        residual_confidence=residual,
        used_single_spectrum_fallback=False,
        measurement_coverage=coverage,
        outlier_rejection_ratio=1.0 - inlier_ratio,
        vad_probability_used=vad_used,
        vad_active_window_ratio=vad_active_ratio,
        spectral_snr_db=spectral_snr,
        noise_spectrum_db=noise_db,
        noise_reference_source=noise_source,
        measurement_uncertainty_db=uncertainty,
        phonetic_coverage=coverage_ph,
        effective_measurement_blocks=eff,
    )


def _octave_band_edges(fraction: int):
    """IEC 61260-style centres/edges covering 20 Hz - 24 kHz."""
    k = np.arange(-int(np.ceil(fraction * np.log2(1000.0 / 20.0))),
                  int(np.ceil(fraction * np.log2(24000.0 / 1000.0))) + 1)
    centres = 1000.0 * np.power(2.0, k / fraction)
    half = np.power(2.0, 1.0 / (2.0 * fraction))
    return centres, centres / half, centres * half


def smooth_spectrum_octave(freqs, spectrum_db, fraction=6):
    """Fractional-octave ENERGY smoothing (linear-domain power averaging),
    interpolated back to the FFT grid (`spectrum.py:892-947`). Vectorised
    with a cumulative-sum over band edges."""
    freqs = np.asarray(freqs, float)
    spectrum_db = np.asarray(spectrum_db, float)
    centres, lower, upper = _octave_band_edges(int(fraction))
    power = np.power(10.0, spectrum_db / 10.0)
    csum = np.concatenate([[0.0], np.cumsum(power)])
    lo_idx = np.searchsorted(freqs, lower, side="left")
    hi_idx = np.searchsorted(freqs, upper, side="right")
    counts = hi_idx - lo_idx
    sums = csum[hi_idx] - csum[lo_idx]
    with np.errstate(divide="ignore", invalid="ignore"):
        band_db = 10.0 * np.log10(sums / np.maximum(counts, 1))
    valid = counts > 0
    if not np.any(valid):
        return spectrum_db.copy()
    return np.interp(freqs, centres[valid], band_db[valid],
                     left=band_db[valid][0], right=band_db[valid][-1])


def smooth_spectrum_perceptual(freqs, spectrum_db, strength="balanced"):
    """Voice-aware region-dependent smoothing blend (`spectrum.py:949-974`)."""
    freqs = np.asarray(freqs, float)
    spectrum_db = np.asarray(spectrum_db, float)
    strength = str(strength or "balanced").lower()
    wide = smooth_spectrum_octave(freqs, spectrum_db, 3)
    medium = smooth_spectrum_octave(freqs, spectrum_db, 6)
    fine = smooth_spectrum_octave(freqs, spectrum_db, 12)
    very_wide = smooth_spectrum_octave(freqs, spectrum_db, 2)
    out = medium.copy()
    low = freqs < 180.0
    mid = (freqs >= 180.0) & (freqs < 3500.0)
    sib = (freqs >= 3500.0) & (freqs <= 9000.0)
    high = freqs > 9000.0
    out[low] = wide[low]
    out[mid] = medium[mid]
    out[sib] = fine[sib]
    out[high] = wide[high]
    if strength == "conservative":
        out[mid] = 0.65 * medium[mid] + 0.35 * wide[mid]
        out[sib] = 0.60 * fine[sib] + 0.40 * medium[sib]
        out = 0.85 * out + 0.15 * very_wide
    elif strength == "broad":
        out = 0.50 * out + 0.50 * very_wide
    return out


def find_octave_spaced_peaks(spectrum_db, freqs, octave_fraction=3):
    """Peak picking on a uniform log2-frequency grid so minimum spacing is a
    true octave fraction (`spectrum.py:977-1054`). Returns
    ``(peak_freqs, peak_values)``."""
    freqs = np.asarray(freqs, float)
    spectrum_db = np.asarray(spectrum_db, float)
    usable = freqs > 0
    f = freqs[usable]
    s = spectrum_db[usable]
    if f.size < 8:
        return np.array([]), np.array([])
    logf = np.log2(f)
    grid = np.linspace(logf[0], logf[-1], 4096)
    resampled = np.interp(grid, logf, s)
    step = grid[1] - grid[0]
    distance = max(1, int(round((1.0 / octave_fraction) / step)))
    peaks, _ = sp_signal.find_peaks(resampled, distance=distance)
    return np.power(2.0, grid[peaks]), resampled[peaks]
