"""Route-aware latency calibration: coded probes + robust correlation.

Behavioural contract mirrors `python/mic_eq/analysis/latency_calibration.py`:

- Probe: repeated Barker-13 coded wideband bursts (0.5 ms chips, Hann
  windowed, mean-removed, >= 6 ms spacing, 4 repetitions by default),
  normalised to the requested amplitude (`latency_calibration.py:17-116`).
- Analysis: energy-normalised cross-correlation per repetition with an
  earliest-strong-peak picker and parabolic sub-sample refinement, a
  GCC-PHAT lag hint as corroborating evidence, repetition agreement and
  ambiguity scoring (`latency_calibration.py:125-444`).
- The measured delay is the selected output->input ROUTE latency and is
  applied directly, never halved (`latency_calibration.py:236-247`).
- ``result_to_profile`` persists the per-route profile
  (`latency_calibration.py:518-556`).
"""

from __future__ import annotations

from dataclasses import dataclass
from datetime import datetime, timezone

import numpy as np
from scipy.signal import correlate, correlation_lags

BARKER_13 = np.array([1, 1, 1, 1, 1, -1, -1, 1, 1, -1, 1, -1, 1], np.float64)
DEFAULT_REPETITIONS = 4

__all__ = [
    "BARKER_13",
    "LatencyCalibrationResult",
    "generate_probe_signal",
    "analyze_latency",
    "result_to_profile",
]


@dataclass
class LatencyCalibrationResult:
    success: bool
    measured_round_trip_ms: float
    estimated_one_way_ms: float
    applied_compensation_ms: float
    confidence: float
    peak_sample_offset: int
    message: str = ""
    repetition_count: int = 0
    agreement_ms: float = 0.0
    ambiguity_score: float = 0.0
    sub_sample_offset: float = 0.0
    route_latency_ms: float = 0.0
    directional_latency_ms: float | None = None
    route_kind: str = "output_to_input"
    compensation_basis: str = "measured_output_to_input_route"


def _burst_and_offsets(sample_rate, total_samples, repetitions=DEFAULT_REPETITIONS):
    """One Hann-windowed Barker burst + repetition start offsets
    (`latency_calibration.py:76-116`)."""
    repetitions = max(1, int(repetitions))
    chip = max(4, int(round(sample_rate * 0.0005)))
    spacing_min = max(chip, int(round(sample_rate * 0.006)))
    while chip > 4:
        burst_len = BARKER_13.size * chip
        if repetitions * burst_len + (repetitions - 1) * spacing_min <= total_samples:
            break
        chip -= 1
    burst = np.repeat(BARKER_13, chip) * np.hanning(BARKER_13.size * chip)
    burst -= burst.mean()
    peak = float(np.max(np.abs(burst)))
    if peak > 0:
        burst /= peak
    if repetitions == 1 or total_samples <= burst.size:
        return burst[:total_samples], [0]
    gap = max(0, total_samples - repetitions * burst.size)
    spacing = max(spacing_min, gap // (repetitions - 1))
    offsets, cursor = [], 0
    for _ in range(repetitions):
        if cursor + burst.size > total_samples:
            break
        offsets.append(cursor)
        cursor += burst.size + spacing
    return burst, offsets or [0]


def generate_probe_signal(sample_rate=48000, duration_ms=80.0, start_freq_hz=1500.0,
                          end_freq_hz=9000.0, amplitude=0.8):
    """Deterministic repeated Barker-coded probe
    (`latency_calibration.py:45-74`). The chirp parameters are accepted for
    API compatibility only."""
    del start_freq_hz, end_freq_hz
    total = max(1, int(sample_rate * duration_ms / 1000.0))
    burst, offsets = _burst_and_offsets(sample_rate, total)
    probe = np.zeros(total)
    for off in offsets:
        end = min(total, off + burst.size)
        if end > off:
            probe[off:end] += burst[: end - off]
    peak = float(np.max(np.abs(probe)))
    if peak > 0:
        probe = probe / peak * float(amplitude)
    return probe.astype(np.float32)


def _norm_scores(rec, ref, min_lag, max_lag):
    """Window-energy-normalised correlation magnitudes over a lag range
    (`latency_calibration.py:137-169`)."""
    corr = correlate(rec, ref, mode="full", method="fft")
    lags = correlation_lags(rec.size, ref.size, mode="full")
    mask = (lags >= min_lag) & (lags <= max_lag)
    if not np.any(mask):
        return np.empty(0, np.int64), np.empty(0)
    lag_w = lags[mask]
    corr_w = corr[mask]
    ok = (lag_w >= 0) & ((lag_w + ref.size) <= rec.size)
    if not np.any(ok):
        return np.empty(0, np.int64), np.empty(0)
    lag_w, corr_w = lag_w[ok], np.abs(corr_w[ok])
    ref_e = float(np.sum(ref * ref) + 1e-12)
    prefix = np.concatenate([[0.0], np.cumsum(rec * rec)])
    win_e = prefix[lag_w + ref.size] - prefix[lag_w]
    return lag_w, corr_w / np.sqrt(np.maximum(win_e, 1e-12) * ref_e)


def _phat_hint(rec, ref, min_lag, max_lag):
    """GCC-PHAT argmax inside the search range
    (`latency_calibration.py:172-200`)."""
    if rec.size < ref.size or ref.size < 2:
        return None
    n = 1
    while n < rec.size + ref.size:
        n <<= 1
    cross = np.fft.rfft(rec, n) * np.conj(np.fft.rfft(ref, n))
    cross /= np.maximum(np.abs(cross), 1e-12)
    corr = np.fft.irfft(cross, n)
    wrapped = np.arange(corr.size)
    wrapped = np.where(wrapped > n // 2, wrapped - n, wrapped)
    mask = (wrapped >= min_lag) & (wrapped <= max_lag)
    if not np.any(mask):
        return None
    return int(wrapped[mask][int(np.argmax(np.abs(corr[mask])))])


def _pick(lags, scores, bias):
    """Earliest strong peak + sub-sample refinement + ambiguity
    (`latency_calibration.py:203-231`)."""
    if lags.size == 0:
        return 0.0, 0.0, 0.0, 1.0
    imax = int(np.argmax(scores))
    strong = np.flatnonzero(scores >= float(scores[imax]) * bias)
    i = int(strong[0]) if strong.size else imax
    # parabolic refinement
    off = 0.0
    if 0 < i < scores.size - 1:
        l, c, r = float(scores[i - 1]), float(scores[i]), float(scores[i + 1])
        denom = l - 2 * c + r
        if abs(denom) > 1e-12:
            off = float(np.clip(0.5 * (l - r) / denom, -0.5, 0.5))
    lag = float(lags[i]) + off
    score = float(scores[i])
    radius = max(1, min(128, scores.size // 50))
    mask = np.ones(scores.size, bool)
    mask[max(0, i - radius): i + radius + 1] = False
    second = float(np.max(scores[mask])) if np.any(mask) else 0.0
    margin = max(0.0, 1.0 - second / (score + 1e-6))
    ambiguity = float(np.clip(second / (score + 1e-6), 0.0, 1.0))
    return lag, score, margin, ambiguity


def _fail(message, route_kind="output_to_input"):
    return LatencyCalibrationResult(
        success=False, measured_round_trip_ms=0.0, estimated_one_way_ms=0.0,
        applied_compensation_ms=0.0, confidence=0.0, peak_sample_offset=0,
        message=message, route_kind=route_kind,
    )


def analyze_latency(
    reference_probe, recorded_signal, sample_rate=48000,
    min_search_ms=5.0, max_search_ms=500.0,
    expected_playback_start_ms=None, expected_playback_jitter_ms=None,
    expected_latency_min_ms=None, expected_latency_max_ms=None,
    route_kind="output_to_input",
) -> LatencyCalibrationResult:
    """Estimate the output->input route latency
    (`latency_calibration.py:232-516`). The measured route delay is applied
    directly — never divided by two."""
    route_kind = str(route_kind or "output_to_input").strip().lower()
    if route_kind != "output_to_input":
        return _fail("Unsupported latency route; expected output_to_input.", route_kind)
    if reference_probe is None or recorded_signal is None:
        return _fail("Missing probe or recording.")

    ref = np.asarray(reference_probe, np.float64).ravel()
    rec = np.asarray(recorded_signal, np.float64).ravel()
    ref = ref - (ref.mean() if ref.size else 0.0)
    rec = rec - (rec.mean() if rec.size else 0.0)
    if ref.size < 16 or rec.size < ref.size:
        return _fail("Recording too short for reliable correlation.")

    min_lag = int(min_search_ms / 1000.0 * sample_rate)
    max_lag = int(max_search_ms / 1000.0 * sample_rate)
    expected_used = expected_playback_start_ms is not None
    exp_min = expected_latency_min_ms if expected_latency_min_ms is not None else min_search_ms
    exp_max = expected_latency_max_ms if expected_latency_max_ms is not None else max_search_ms
    pb_min = pb_max = 0.0
    if expected_used:
        jitter = max(0.0, expected_playback_jitter_ms or 0.0)
        pb_min = max(0.0, expected_playback_start_ms - jitter)
        pb_max = max(pb_min, expected_playback_start_ms + jitter)
        min_lag = int((pb_min + exp_min) / 1000.0 * sample_rate)
        max_lag = int((pb_max + exp_max) / 1000.0 * sample_rate)
    if max_lag <= min_lag:
        return _fail("Search window is outside valid lag range.")

    burst, offsets = _burst_and_offsets(sample_rate, ref.size)
    if burst.size < 16 or not offsets:
        burst, offsets = ref, [0]

    full_lags, full_scores = _norm_scores(rec, ref, min_lag, max_lag)
    if full_lags.size == 0:
        return _fail("Search window does not overlap captured audio.")
    coarse, full_peak, full_margin, full_amb = _pick(full_lags, full_scores, 0.985)
    radius = max(int(round(sample_rate * 0.010)), burst.size)

    estimates: list[float] = []
    peaks = [full_peak]
    margins = [full_margin]
    ambiguities = [full_amb]
    phat_scores: list[float] = []
    for off in offsets:
        expected = coarse + float(off)
        lo = max(min_lag + off, int(round(expected - radius)))
        hi = min(max_lag + off, int(round(expected + radius)))
        lw, sc = _norm_scores(rec, burst, lo, hi)
        if lw.size == 0:
            continue
        lag, val, margin, amb = _pick(lw, sc, 0.94)
        if val < 0.035:
            continue
        start = lag - float(off)
        estimates.append(start)
        peaks.append(val)
        margins.append(margin)
        ambiguities.append(amb)
        hint = _phat_hint(rec, burst, lo, hi)
        if hint is not None:
            phat_scores.append(
                max(0.0, 1.0 - abs(float(hint - off) - start) / max(1.0, sample_rate * 0.006))
            )

    if not estimates:
        lw, sc = _norm_scores(rec, ref, min_lag, max_lag)
        if lw.size == 0:
            return _fail("Search window does not overlap captured audio.")
        lag, val, margin, amb = _pick(lw, sc, 0.985)
        estimates, peaks, margins, ambiguities = [lag], [val], [margin], [amb]

    est = np.asarray(estimates)
    median_start = float(np.median(est))
    agreement_ms = float(np.percentile(np.abs(est - median_start), 75)) * 1000.0 / sample_rate
    measured_ms = median_start * 1000.0 / sample_rate
    if expected_used:
        measured_ms = max(0.0, measured_ms - expected_playback_start_ms)

    peak_med = float(np.median(peaks))
    margin_med = float(np.median(margins))
    amb_med = float(np.median(ambiguities))
    phat_med = float(np.median(phat_scores)) if phat_scores else 0.5

    confidence = (
        0.24 * float(np.clip((peak_med - 0.06) / 0.24, 0, 1))
        + 0.24 * float(np.clip(1.0 - agreement_ms / 4.0, 0, 1))
        + 0.18 * float(np.clip(len(estimates) / min(3, max(1, len(offsets))), 0, 1))
        + 0.14 * float(np.clip(margin_med / 0.28, 0, 1))
        + 0.12 * float(np.clip(1.0 - amb_med, 0, 1))
        + 0.08 * phat_med
    )
    if expected_used:
        center_ms = 0.5 * (pb_min + pb_max + exp_min + exp_max)
        center = int(center_ms / 1000.0 * sample_rate)
        half = max(1, (max_lag - min_lag) // 2)
        align = max(0.0, 1.0 - abs(median_start - center) / float(half))
        confidence = 0.88 * confidence + 0.12 * align

    success = (
        confidence >= 0.32
        and measured_ms > 0.0
        and peak_med >= 0.07
        and amb_med < 0.90
        and len(estimates) >= min(2, len(offsets))
        and agreement_ms <= 6.0
    )
    if success:
        message = "ok"
    elif agreement_ms > 6.0 and len(estimates) > 1:
        message = "Repeated probes disagree; echoes or bleed make latency ambiguous."
    elif amb_med > 0.82:
        message = "Echo ambiguity: competing correlation peaks are too close."
    else:
        message = "Low confidence or ambiguous coded-probe correlation."

    return LatencyCalibrationResult(
        success=success,
        measured_round_trip_ms=measured_ms,
        estimated_one_way_ms=0.0,
        applied_compensation_ms=measured_ms,
        confidence=confidence,
        peak_sample_offset=int(round(median_start)),
        message=message,
        repetition_count=len(estimates),
        agreement_ms=agreement_ms,
        ambiguity_score=amb_med,
        sub_sample_offset=median_start,
        route_latency_ms=measured_ms,
        directional_latency_ms=None,
        route_kind=route_kind,
        compensation_basis="measured_output_to_input_route",
    )


def result_to_profile(result, sample_rate=48000, *, engine_latency_ms=0.0,
                      engine_config_signature=""):
    """Persisted per-route profile dict (`latency_calibration.py:518-556`)."""
    route_ms = float(result.route_latency_ms)
    if route_ms <= 0.0:
        route_ms = max(0.0, float(result.measured_round_trip_ms),
                       float(result.applied_compensation_ms))
    engine_latency_ms = max(0.0, float(engine_latency_ms))
    return {
        "measured_round_trip_ms": float(result.measured_round_trip_ms),
        "estimated_one_way_ms": float(result.estimated_one_way_ms),
        "applied_compensation_ms": float(result.applied_compensation_ms),
        "route_latency_ms": route_ms,
        "directional_latency_ms": (
            float(result.directional_latency_ms)
            if result.directional_latency_ms is not None else None
        ),
        "route_kind": str(result.route_kind),
        "compensation_basis": str(result.compensation_basis),
        "confidence": float(result.confidence),
        "agreement_ms": float(result.agreement_ms),
        "ambiguity_score": float(result.ambiguity_score),
        "repetition_count": int(result.repetition_count),
        "sample_rate": int(sample_rate),
        "engine_latency_ms": engine_latency_ms,
        "total_latency_ms": route_ms + engine_latency_ms,
        "engine_config_signature": str(engine_config_signature),
        "timestamp_utc": datetime.now(timezone.utc).isoformat(),
    }
