"""Constrained least-squares Auto-EQ: targets, dynamic bands, optimizer,
pipeline.

Behavioural contract mirrors `python/mic_eq/analysis/auto_eq_parts/`:

- Constants: gains ±12 dB, Q 0.3-6 (prior 4.33), 256-point dense log grid,
  regularizer weights, adjacency <= 6 dB and slope <= 12 dB/oct, SNR gates
  3-18 dB, dynamic band role ranges, abstention thresholds
  (`constants.py:13-51`).
- Adaptive voice-aware bounded targets (`target.py:19-104`).
- Dynamic band-layout selection with tilt fit and SNR-aware gain upper
  bounds (`dynamic_bands.py`).
- `calculate_eq_bands`: two-stage solve (gain-only then joint gain+Q+centre
  with curvature/tilt/coupling regularizers), band confidence, local
  abstention, SLSQP-constrained refinement, validation-and-attenuate ladder,
  overall/capture/eq/validation confidences and the apply/reduced/abstain
  recommendation machine (`optimizer.py:76-1152`).
- `analyze_auto_eq` pipeline orchestration (`pipeline.py:7-207`).

The response prediction is fully vectorised over bands (no per-band loop)
so headroom sweeps and candidate searches can batch.
"""

from __future__ import annotations

import numpy as np
from scipy.optimize import least_squares, minimize

from ..config import AUTO_EQ_DEFAULT_Q, EQ_FREQUENCIES, TARGET_CURVES

SAMPLE_RATE = 48000.0
NUM_EQ_BANDS = 10
GAIN_MIN_DB = -12.0
GAIN_MAX_DB = 12.0
Q_PRIOR = AUTO_EQ_DEFAULT_Q
Q_MIN = 0.3
Q_MAX = 6.0
LOW_BAND_Q_MAX = 2.5
LOW_BAND_Q_MAX_HZ = 250.0
UNKNOWN_EVIDENCE_Q_MAX = 2.8
UNKNOWN_EVIDENCE_MAX_BOOST_DB = 3.0
DENSE_GRID_POINTS = 256
VOICE_WEIGHT = 2.0
OUT_OF_BAND_WEIGHT = 0.8
LAMBDA_Q = 10.0
LAMBDA_G = 0.35
LAMBDA_CENTER = 16.0
LAMBDA_TILT = 0.08
LAMBDA_COUPLING = 8.0
MAX_ADJ_GAIN_DIFF_DB = 6.0
MAX_GAIN_SLOPE_DB_PER_OCTAVE = 12.0
TILT_FIT_MIN_HZ = 100.0
TILT_FIT_MAX_HZ = 8000.0
TILT_MIN_FIT_R2 = 0.65
SNR_MIN_DB = 3.0
SNR_FULL_DB = 18.0
SNR_LOW_RELIABILITY_WEIGHT = 0.35
SNR_LOW_RELIABILITY_MAX_BOOST_DB = 1.5
DYNAMIC_LOW_SHELF_RANGE_HZ = (55.0, 180.0)
DYNAMIC_PEAK_RANGE_HZ = (200.0, 9000.0)
DYNAMIC_HIGH_SHELF_RANGE_HZ = (9500.0, 18000.0)
DYNAMIC_CENTER_REFINE_PCT = 0.25
DYNAMIC_SHELF_CENTER_REFINE_PCT = 0.18
DYNAMIC_PEAK_MIN_SEPARATION_OCT = 0.34
DYNAMIC_MEANINGFUL_CORRECTION_DB = 0.75
LOCAL_ABSTENTION_CONFIDENCE_THRESHOLD = 0.45
CROSS_TAKE_ABSTENTION_CONFIDENCE_THRESHOLD = 0.45
GLOBAL_CAPTURE_CONFIDENCE_THRESHOLD = 0.35
REDUCED_RECOMMENDATION_CONFIDENCE_THRESHOLD = 0.725

__all__ = [
    "AnalysisCancelled",
    "predict_eq_response",
    "get_target_curve",
    "calculate_eq_bands",
    "analyze_auto_eq",
    "NUM_EQ_BANDS",
    "GAIN_MIN_DB",
    "GAIN_MAX_DB",
]


class AnalysisCancelled(Exception):
    """Raised when a progress callback requests cancellation
    (the reference worker's stop-event poll, `ui/analysis_worker.py:60-83`)."""


# ---------------------------------------------------------------------------
# Response prediction (vectorised over bands) — `response.py:27-102`
# ---------------------------------------------------------------------------


def _band_filter_types(n: int) -> np.ndarray:
    """0 = low shelf, 1 = peak, 2 = high shelf (first/last are shelves)."""
    types = np.ones(n, int)
    if n:
        types[0] = 0
        types[-1] = 2
    return types


def predict_eq_response(freqs, gains, qs, center_freqs, filter_types=None):
    """Combined dB response of the 10-band EQ on ``freqs``.

    Vectorised over bands: per-band RBJ coefficients are computed as arrays
    and all band responses multiply in one pass. Bands with |gain| < 0.01 dB
    contribute exactly 0 dB (`response.py:88-90`).
    """
    freqs = np.asarray(freqs, float)
    g = np.asarray(gains, float)
    q = np.asarray(qs, float)
    fc = np.asarray(center_freqs, float)
    if not (g.size == q.size == fc.size):
        raise ValueError("gain, Q, and center frequency arrays must have the same length")
    types = (
        _band_filter_types(g.size)
        if filter_types is None
        else np.asarray(
            [0 if t == "low_shelf" else 2 if t == "high_shelf" else 1 for t in filter_types]
        )
    )
    if types.size != g.size:
        raise ValueError("filter_types length must match gains")
    if g.size == 0:
        return np.zeros_like(freqs)

    A = np.power(10.0, g / 40.0)
    w0 = 2.0 * np.pi * fc / SAMPLE_RATE
    alpha = np.sin(w0) / (2.0 * q)
    cw = np.cos(w0)
    sa = 2.0 * np.sqrt(A) * alpha

    # stack per-type coefficients, then select by band type
    def shelf(sign):
        b0 = A * ((A + 1) - sign * (A - 1) * cw + sa)
        b1 = sign * 2.0 * A * ((A - 1) - sign * (A + 1) * cw)
        b2 = A * ((A + 1) - sign * (A - 1) * cw - sa)
        a0 = (A + 1) + sign * (A - 1) * cw + sa
        a1 = -sign * 2.0 * ((A - 1) + sign * (A + 1) * cw)
        a2 = (A + 1) + sign * (A - 1) * cw - sa
        return np.stack([b0, b1, b2, a0, a1, a2])

    low = shelf(+1.0)
    high = shelf(-1.0)
    peak = np.stack([
        1.0 + alpha * A, -2.0 * cw, 1.0 - alpha * A,
        1.0 + alpha / A, -2.0 * cw, 1.0 - alpha / A,
    ])
    coeffs = np.where(types == 0, low, np.where(types == 2, high, peak))  # (6, n)

    w = 2.0 * np.pi * freqs / SAMPLE_RATE
    z1 = np.exp(-1j * w)[:, None]  # (F, 1)
    z2 = z1 * z1
    num = coeffs[0] + coeffs[1] * z1 + coeffs[2] * z2
    den = coeffs[3] + coeffs[4] * z1 + coeffs[5] * z2
    mag = np.abs(num / den)  # (F, n)
    active = np.abs(g) >= 0.01
    mag = np.where(active, mag, 1.0)
    response = np.prod(mag, axis=1)
    return 20.0 * np.log10(np.maximum(response, 1e-12))


# ---------------------------------------------------------------------------
# Target curves — `target.py`
# ---------------------------------------------------------------------------


def _band_mean(freqs, values, lo, hi):
    mask = (freqs >= lo) & (freqs <= hi)
    return float(np.mean(values[mask])) if np.any(mask) else float(np.mean(values))


def _adaptive_offsets(freqs, measured_db, preset):
    """Bounded identity-preserving offsets from measured voice balance
    (`target.py:19-64`)."""
    if measured_db.size == 0:
        return np.zeros_like(freqs)
    body = _band_mean(freqs, measured_db, 180.0, 800.0)
    presence = _band_mean(freqs, measured_db, 1200.0, 3500.0)
    sibilance = _band_mean(freqs, measured_db, 5500.0, 8500.0)
    low_mid = np.clip((body - presence) / 8.0, -1.0, 1.0)
    sib_ratio = np.clip((sibilance - presence) / 7.0, -1.0, 1.0)

    x = np.log10(np.clip(freqs, 20.0, None))
    vmask = (freqs >= 100.0) & (freqs <= 8000.0)
    tilt = 0.0
    if np.count_nonzero(vmask) >= 2:
        xv = x[vmask]
        yv = measured_db[vmask]
        xc = xv - xv.mean()
        denom = float(np.dot(xc, xc))
        if denom > 0:
            tilt = float(np.dot(xc, yv - yv.mean()) / denom)
    tilt_norm = np.clip(tilt * np.log10(2.0) / 4.0, -1.0, 1.0)

    offsets = np.zeros_like(freqs)
    if preset == "flat":
        offsets += np.clip(-0.60 * tilt_norm, -0.8, 0.8) * np.interp(
            freqs, [100.0, 1000.0, 8000.0], [-1.0, 0.0, 1.0]
        )
        return np.clip(offsets, -1.0, 1.0)
    warmth = np.clip(-0.9 * low_mid, -1.2, 1.2)
    presence_off = np.clip(0.8 * low_mid - 0.5 * tilt_norm, -1.5, 1.5)
    sib_off = np.clip(-1.2 * sib_ratio, -1.8, 1.2)
    sf = np.clip(freqs, 20.0, None)
    offsets += warmth * np.exp(-np.square(np.log2(sf / 350.0)) / (2 * 0.8**2))
    offsets += presence_off * np.exp(-np.square(np.log2(sf / 2200.0)) / (2 * 0.9**2))
    offsets += sib_off * np.exp(-np.square(np.log2(sf / 7000.0)) / (2 * 0.65**2))
    return np.clip(offsets, -2.0, 2.0)


def get_target_curve(freqs, target_preset="broadcast", measured_db=None, target_mode="adaptive"):
    """Target dB at ``freqs`` (`target.py:67-104`)."""
    if target_preset not in TARGET_CURVES:
        raise ValueError(f"Unknown target preset: {target_preset}")
    target_mode = str(target_mode or "adaptive").strip().lower()
    if target_mode not in {"adaptive", "static"}:
        raise ValueError(f"Unknown target mode: {target_mode}")
    freqs = np.asarray(freqs, float)
    curve = TARGET_CURVES[target_preset]
    target_db = np.interp(
        freqs, EQ_FREQUENCIES, curve.band_targets,
        left=curve.band_targets[0], right=curve.band_targets[-1],
    )
    if target_mode == "adaptive" and measured_db is not None:
        m = np.asarray(measured_db, float)
        if m.shape == freqs.shape:
            target_db = target_db + _adaptive_offsets(freqs, m, target_preset)
    return target_db


# ---------------------------------------------------------------------------
# Dynamic band layout and reliability helpers — `dynamic_bands.py`
# ---------------------------------------------------------------------------


def _dense_log_grid(freqs):
    lo = max(20.0, float(np.min(freqs)))
    hi = min(20000.0, float(np.max(freqs)))
    if hi <= lo:
        hi = max(lo * 1.001, lo + 1.0)
    return np.logspace(np.log10(lo), np.log10(hi), DENSE_GRID_POINTS)


def _voice_weights(freqs):
    w = np.full_like(freqs, OUT_OF_BAND_WEIGHT, dtype=float)
    w[(freqs >= 100.0) & (freqs <= 8000.0)] = VOICE_WEIGHT
    return w


def _q_bounds(centers):
    q_lo = np.full(NUM_EQ_BANDS, Q_MIN)
    q_hi = np.where(np.asarray(centers) < LOW_BAND_Q_MAX_HZ, LOW_BAND_Q_MAX, Q_MAX)
    return q_lo, q_hi


def _role_limits():
    lo = np.full(NUM_EQ_BANDS, DYNAMIC_PEAK_RANGE_HZ[0])
    hi = np.full(NUM_EQ_BANDS, DYNAMIC_PEAK_RANGE_HZ[1])
    lo[0], hi[0] = DYNAMIC_LOW_SHELF_RANGE_HZ
    lo[-1], hi[-1] = DYNAMIC_HIGH_SHELF_RANGE_HZ
    return lo, hi


def _center_bounds(base_centers):
    role_lo, role_hi = _role_limits()
    pct = np.full(NUM_EQ_BANDS, DYNAMIC_CENTER_REFINE_PCT)
    pct[0] = pct[-1] = DYNAMIC_SHELF_CENTER_REFINE_PCT
    lo = np.maximum(role_lo, base_centers * (1.0 - pct))
    hi = np.minimum(role_hi, base_centers * (1.0 + pct))
    # geometric midpoints keep band roles ordered (`dynamic_bands.py:79-88`)
    for i in range(NUM_EQ_BANDS - 1):
        mid = float(np.sqrt(base_centers[i] * base_centers[i + 1]))
        hi[i] = min(hi[i], mid * 0.999)
        lo[i + 1] = max(lo[i + 1], mid * 1.001)
    for i, c in enumerate(base_centers):
        if lo[i] >= hi[i]:
            lo[i] = max(role_lo[i], c * 0.995)
            hi[i] = min(role_hi[i], c * 1.005)
    return lo, hi


def _best_in_range(freqs, scores, lo, hi, fallback):
    mask = (freqs >= lo) & (freqs <= hi)
    if not np.any(mask):
        return float(fallback)
    return float(freqs[mask][int(np.argmax(scores[mask]))])


def _separated(candidate, existing, min_oct):
    return all(abs(np.log2(candidate / e)) >= min_oct for e in existing)


def _estimate_q(dense_freqs, residual_db, center, q_lo, q_hi, fallback):
    """Half-max span Q estimate around the residual peak
    (`dynamic_bands.py:154-190`)."""
    idx = int(np.argmin(np.abs(dense_freqs - center)))
    peak = float(residual_db[idx])
    if abs(peak) < DYNAMIC_MEANINGFUL_CORRECTION_DB:
        return float(np.clip(fallback, q_lo, q_hi))
    sign = 1.0 if peak >= 0 else -1.0
    threshold = max(abs(peak) * 0.5, DYNAMIC_MEANINGFUL_CORRECTION_DB)
    left = right = idx
    while left > 0:
        v = float(residual_db[left - 1])
        if v * sign <= 0.0 or abs(v) < threshold:
            break
        left -= 1
    while right < dense_freqs.size - 1:
        v = float(residual_db[right + 1])
        if v * sign <= 0.0 or abs(v) < threshold:
            break
        right += 1
    bw = max(float(dense_freqs[right] - dense_freqs[left]), center * 0.04)
    return float(np.clip(center / bw, q_lo, q_hi))


def _select_band_layout(dense_freqs, residual_db, weights):
    """Choose 10 dynamic band centers + Q priors (`dynamic_bands.py:192-276`)."""
    scores = np.abs(residual_db) * weights
    low_c = _best_in_range(dense_freqs, scores, *DYNAMIC_LOW_SHELF_RANGE_HZ, EQ_FREQUENCIES[0])
    high_c = _best_in_range(dense_freqs, scores, *DYNAMIC_HIGH_SHELF_RANGE_HZ, EQ_FREQUENCIES[-1])

    pk_mask = (dense_freqs >= DYNAMIC_PEAK_RANGE_HZ[0]) & (dense_freqs <= DYNAMIC_PEAK_RANGE_HZ[1])
    idxs = np.flatnonzero(pk_mask)
    local_max = [
        int(i) for i in idxs
        if 0 < i < scores.size - 1 and scores[i] >= scores[i - 1] and scores[i] >= scores[i + 1]
    ] or [int(i) for i in idxs]
    local_max.sort(key=lambda i: float(scores[i]), reverse=True)

    peaks: list[float] = []
    for i in local_max:
        c = float(dense_freqs[i])
        if abs(float(residual_db[i])) >= DYNAMIC_MEANINGFUL_CORRECTION_DB and _separated(
            c, peaks, DYNAMIC_PEAK_MIN_SEPARATION_OCT
        ):
            peaks.append(c)
        if len(peaks) >= NUM_EQ_BANDS - 2:
            break

    if len(peaks) < NUM_EQ_BANDS - 2:
        # geometric-edge fillers at relaxed separation (`dynamic_bands.py:118-150`)
        edges = np.geomspace(*DYNAMIC_PEAK_RANGE_HZ, NUM_EQ_BANDS)
        for lo, hi in zip(edges[:-1], edges[1:]):
            c = _best_in_range(dense_freqs, scores, float(lo), float(hi), float(np.sqrt(lo * hi)))
            if _separated(c, peaks, DYNAMIC_PEAK_MIN_SEPARATION_OCT * 0.75):
                peaks.append(c)
            if len(peaks) >= NUM_EQ_BANDS - 2:
                break
    if len(peaks) < NUM_EQ_BANDS - 2:
        for c in np.geomspace(*DYNAMIC_PEAK_RANGE_HZ, NUM_EQ_BANDS - 2):
            c = float(c)
            if _separated(c, peaks, DYNAMIC_PEAK_MIN_SEPARATION_OCT * 0.5):
                peaks.append(c)
            if len(peaks) >= NUM_EQ_BANDS - 2:
                break
    if len(peaks) < NUM_EQ_BANDS - 2:
        for c in np.geomspace(*DYNAMIC_PEAK_RANGE_HZ, NUM_EQ_BANDS - 2):
            c = float(c)
            if not any(abs(np.log2(c / e)) < 0.02 for e in peaks):
                peaks.append(c)
            if len(peaks) >= NUM_EQ_BANDS - 2:
                break

    centers = np.asarray([low_c, *sorted(peaks[: NUM_EQ_BANDS - 2]), high_c], float)
    role_lo, role_hi = _role_limits()
    centers = np.clip(centers, role_lo, role_hi)
    centers[1:-1] = np.sort(centers[1:-1])
    q_lo, q_hi = _q_bounds(centers)
    fallback = np.clip(np.full(NUM_EQ_BANDS, Q_PRIOR), q_lo, q_hi)
    q_prior = np.asarray(
        [
            _estimate_q(dense_freqs, residual_db, float(c), float(q_lo[i]),
                        float(q_hi[i]), float(fallback[i]))
            for i, c in enumerate(centers)
        ]
    )
    return centers, q_prior


def _tilt_fit(freqs, measured_db):
    """`dynamic_bands.py:308-345`: dB-per-decade fit with R² gate."""
    mask = (freqs >= TILT_FIT_MIN_HZ) & (freqs <= TILT_FIT_MAX_HZ)
    zeros = np.zeros_like(measured_db)
    if np.sum(mask) < 2:
        return zeros, 0.0, 0.0
    x = np.log10(freqs[mask])
    y = measured_db[mask]
    xc = x - x.mean()
    denom = float(np.dot(xc, xc))
    if denom <= 0:
        return zeros, 0.0, 0.0
    slope = float(np.dot(xc, y) / denom)
    fit = slope * xc + y.mean()
    ss_tot = float(np.sum(np.square(y - y.mean())))
    if ss_tot <= 1e-12:
        return zeros, 0.0, 0.0
    r2 = 1.0 - float(np.sum(np.square(y - fit))) / ss_tot
    if not np.isfinite(r2) or r2 < TILT_MIN_FIT_R2:
        return zeros, 0.0, max(0.0, float(r2))
    component = slope * (np.log10(np.clip(freqs, 1e-6, None)) - x.mean())
    return component, slope, float(np.clip(r2, 0.0, 1.0))


def _snr_reliability(snr_db):
    return np.clip((snr_db - SNR_MIN_DB) / (SNR_FULL_DB - SNR_MIN_DB), 0.0, 1.0)


def _snr_gain_upper(snr_db):
    return SNR_LOW_RELIABILITY_MAX_BOOST_DB + _snr_reliability(snr_db) * (
        GAIN_MAX_DB - SNR_LOW_RELIABILITY_MAX_BOOST_DB
    )


def _band_snr(dense_freqs, spectral_snr_dense, centers):
    """Median matched SNR within ±1/6 octave of each center
    (`dynamic_bands.py:369-401`)."""
    if spectral_snr_dense is None or spectral_snr_dense.shape != dense_freqs.shape:
        return np.full(centers.size, np.nan)
    half = 2.0 ** (1.0 / 6.0)
    out = np.empty(centers.size)
    for i, fc in enumerate(centers):
        mask = (dense_freqs >= fc / half) & (dense_freqs <= fc * half)
        if np.any(mask):
            vals = spectral_snr_dense[mask]
            vals = vals[np.isfinite(vals)]
            out[i] = float(np.median(vals)) if vals.size else np.nan
        else:
            out[i] = float(np.interp(fc, dense_freqs, spectral_snr_dense))
    return out


# ---------------------------------------------------------------------------
# Optimizer internals — `optimizer.py`
# ---------------------------------------------------------------------------


def _adjacent_limits(centers):
    spacing = np.maximum(np.diff(np.log2(np.clip(centers, 1e-6, None))), 1e-6)
    return np.minimum(MAX_ADJ_GAIN_DIFF_DB, MAX_GAIN_SLOPE_DB_PER_OCTAVE * spacing)


def _gain_curvature(gains, centers):
    """Quadrature-weighted log-frequency curvature (`optimizer.py:92-113`)."""
    g = np.asarray(gains, float)
    lc = np.log2(np.clip(np.asarray(centers, float), 1e-6, None))
    if g.size < 3 or lc.size != g.size:
        return np.empty(0)
    spacing = np.maximum(np.diff(lc), 1e-6)
    slopes = np.diff(g) / spacing
    span = 0.5 * (spacing[:-1] + spacing[1:])
    curvature = np.diff(slopes) / span
    quad = span / max(float(span.sum()), 1e-6)
    return curvature * np.sqrt(quad)


def _tilt_slope(gains, centers):
    lc = np.log10(np.clip(centers, 1e-6, None))
    xc = lc - lc.mean()
    denom = float(np.dot(xc, xc))
    return float(np.dot(xc, gains) / denom) if denom > 0 else 0.0


def weighted_target_error(freqs, measured_db, target_db, gains, qs, centers, weights=None):
    """Weighted RMS target error after the EQ (`eq_quality.py:199-220`)."""
    response = predict_eq_response(freqs, gains, qs, centers)
    err = np.asarray(target_db) - (np.asarray(measured_db) + response)
    if weights is None:
        return float(np.sqrt(np.mean(err * err)))
    w = np.asarray(weights, float)
    denom = float(w.sum())
    if denom <= 0:
        return float(np.sqrt(np.mean(err * err)))
    return float(np.sqrt(np.sum(w * err * err) / denom))


def _band_confidence(dense_freqs, centers, residual_db, band_snr_db, voiced_ratio,
                     repeatability_dense, active_gains=None, *, snr_available=True,
                     phonetic_coverage=None):
    """`optimizer.py:167-215`."""
    resid = np.abs(np.interp(centers, dense_freqs, residual_db))
    active = (resid >= 0.75) if active_gains is None else (np.abs(active_gains) >= 0.25)
    support = np.where(active, np.clip(resid / 2.0, 0.55, 1.0), 0.55)
    coverage = (
        float(np.clip(phonetic_coverage, 0.0, 1.0))
        if phonetic_coverage is not None
        else float(np.clip(voiced_ratio / 0.55, 0.0, 1.0))
    )
    conf = 0.25 * support + 0.15 * coverage
    evidence = 0.40
    if snr_available:
        conf = conf + 0.25 * np.clip((band_snr_db - 3.0) / 10.0, 0.0, 1.0)
        evidence += 0.25
    if repeatability_dense is not None:
        rep = np.interp(centers, dense_freqs, repeatability_dense,
                        left=float(repeatability_dense[0]),
                        right=float(repeatability_dense[-1]))
        conf = conf + 0.35 * rep
        evidence += 0.35
    return np.clip(conf / evidence, 0.0, 1.0)


def _confidence_q_upper(q_hi, gains, centers, confidence):
    """`optimizer.py:300-329`."""
    out = np.asarray(q_hi, float).copy()
    for i, g in enumerate(gains):
        if abs(g) < 0.25:
            continue
        if confidence is None:
            out[i] = min(out[i], UNKNOWN_EVIDENCE_Q_MAX)
        else:
            out[i] = min(out[i], 1.0 + float(np.clip(confidence[i], 0, 1)) * 3.2)
        if centers[i] < 250.0:
            out[i] = min(out[i], 1.8 if g > 0 else 2.2)
    for i in range(1, out.size):
        if gains[i - 1] > 2.0 and gains[i] > 2.0:
            if abs(float(np.log2(centers[i] / centers[i - 1]))) < 0.45:
                out[i - 1] = min(out[i - 1], 2.5)
                out[i] = min(out[i], 2.5)
    return out


def _smooth_log(freqs, values, width_oct):
    """Gaussian smoothing on log2-frequency — vectorised
    (`optimizer.py:343-365`)."""
    lf = np.log2(np.clip(np.asarray(freqs, float), 20.0, None))
    values = np.asarray(values, float)
    d = (lf[:, None] - lf[None, :]) / max(float(width_oct), 1e-3)
    w = np.exp(-0.5 * d * d)
    return (w @ values) / np.maximum(w.sum(axis=1), 1e-12)


def _regularize_residual(dense_freqs, residual_db, strength):
    """`optimizer.py:368-406`."""
    s = str(strength or "conservative").strip().lower()
    if s not in {"off", "balanced", "conservative", "broad"}:
        s = "conservative"
    residual_db = np.asarray(residual_db, float)
    if s == "off":
        mx = float(np.max(np.abs(residual_db)))
        return residual_db.copy(), {
            "smoothing_strength": "off",
            "max_requested_correction_db": mx,
            "max_regularized_correction_db": mx,
            "max_narrow_residual_db": 0.0,
        }
    medium = _smooth_log(dense_freqs, residual_db, 0.16)
    broad_w = 0.40 if s == "conservative" else 0.55 if s == "broad" else 0.28
    broad = _smooth_log(dense_freqs, residual_db, broad_w)
    max_exc = 3.0 if s == "conservative" else 2.0 if s == "broad" else 5.0
    blend = 0.35 if s == "conservative" else 0.55 if s == "broad" else 0.18
    local = np.clip(residual_db - medium, -max_exc, max_exc)
    regularized = (1.0 - blend) * (medium + local) + blend * broad
    return regularized, {
        "smoothing_strength": s,
        "max_requested_correction_db": float(np.max(np.abs(residual_db))),
        "max_regularized_correction_db": float(np.max(np.abs(regularized))),
        "max_narrow_residual_db": float(np.max(np.abs(residual_db - broad))),
    }


def _constrained_refinement(gains, dense_freqs, measured, target, qs, centers,
                            weights, lower, upper):
    """SLSQP projection + constrained re-solve (`optimizer.py:218-298`)."""
    g0 = np.clip(np.asarray(gains, float), lower, upper)
    limits = _adjacent_limits(centers)
    margin = 1e-7

    def objective(c):
        resp = predict_eq_response(dense_freqs, c, qs, centers)
        err = target - (measured + resp)
        curv = _gain_curvature(c, centers)
        t = _tilt_slope(c, centers)
        return float(np.sum(weights * err * err) + LAMBDA_G * np.sum(curv * curv)
                     + LAMBDA_TILT * t * t)

    def slack(c):
        return limits - margin - np.abs(np.diff(c))

    bounds = list(zip(lower.tolist(), upper.tolist()))
    cons = ({"type": "ineq", "fun": slack},)
    proj = minimize(lambda c: float(np.sum(np.square(c - g0))), g0, method="SLSQP",
                    bounds=bounds, constraints=cons,
                    options={"ftol": 1e-9, "maxiter": 120, "disp": False})
    projected = (
        np.asarray(proj.x, float)
        if proj.success and np.all(np.isfinite(proj.x))
        and np.all(np.abs(np.diff(proj.x)) <= limits + 1e-9)
        else np.zeros_like(g0)
    )
    res = minimize(objective, projected, method="SLSQP", bounds=bounds,
                   constraints=cons, options={"ftol": 1e-7, "maxiter": 120, "disp": False})
    if res.success and np.all(np.isfinite(res.x)):
        cand = np.asarray(res.x, float)
        if np.all(np.abs(np.diff(cand)) <= limits + 1e-9):
            return cand, True
    return projected, False


def _validation_confidence(before, after, scale):
    if before <= 1e-9:
        improvement = 1.0
    else:
        improvement = float(np.clip(max(0.0, (before - after) / before) / 0.20, 0.0, 1.0))
    return float(np.clip(0.35 + 0.35 * improvement + 0.30 * float(scale), 0.0, 1.0))


def _validate_and_attenuate(dense_freqs, measured, target, gains, qs, centers, weights):
    """Uniform-attenuation validation ladder (`optimizer.py:408-487`)."""
    from .eq_quality import evaluate_eq_quality

    before = weighted_target_error(dense_freqs, measured, target,
                                   np.zeros_like(gains), qs, centers, weights)
    best_g = gains.copy()
    best_err = float("inf")
    best_scale = 1.0
    best_metrics = evaluate_eq_quality(centers, best_g, qs).to_dict()
    for scale in (1.0, 0.85, 0.70, 0.55, 0.40, 0.25):
        cand = gains * scale
        metrics = evaluate_eq_quality(centers, cand, qs)
        after = weighted_target_error(dense_freqs, measured, target, cand, qs, centers, weights)
        if after < best_err and metrics.risk_score < 1.8:
            best_err, best_g, best_scale = after, cand, scale
            best_metrics = metrics.to_dict()
        if after <= before * 0.98 and metrics.risk_score < 1.0:
            return cand, before, after, scale, metrics.to_dict()
    if not np.isfinite(best_err) or best_err > before:
        flat = np.zeros_like(gains)
        return flat, before, before, 0.0, evaluate_eq_quality(centers, flat, qs).to_dict()
    return best_g, before, best_err, best_scale, best_metrics


def _overall_confidence(band_conf, gains, capture_conf, validation_conf):
    active = np.abs(gains) >= 0.25
    eq_conf = float(np.mean(band_conf[active]) if np.any(active) else np.mean(band_conf))
    cap = float(capture_conf) if capture_conf is not None else 1.0
    overall = float(np.clip(0.55 * eq_conf + 0.25 * cap + 0.20 * validation_conf, 0, 1))
    return overall, eq_conf, cap


def _unit(value, label):
    try:
        v = float(value)
    except (TypeError, ValueError) as exc:
        raise ValueError(f"{label} must be a finite number in [0, 1]") from exc
    if not np.isfinite(v) or not 0.0 <= v <= 1.0:
        raise ValueError(f"{label} must be a finite number in [0, 1]")
    return v


def _series(values, label, expected_shape=None):
    try:
        a = np.asarray(values, float)
    except (TypeError, ValueError) as exc:
        raise ValueError(f"{label} must be a one-dimensional numeric array") from exc
    if a.ndim != 1 or (expected_shape is not None and a.shape != expected_shape):
        raise ValueError(f"{label} must be a one-dimensional numeric array")
    return a


def calculate_eq_bands(
    freqs, measured_db, target_db, *,
    spectral_repeatability=None, spectral_uncertainty_db=None,
    cross_take_confidence=None, phonetic_coverage=None, voiced_window_ratio=1.0,
    analysis_confidence=None, global_snr_db=None, spectral_snr_db=None,
    noise_reference_source="unavailable", noise_reference_quality=1.0,
    noise_reference_status="usable", noise_reference_reasons=None,
    target_profile="static", used_spectrum_fallback=False,
    smoothing_strength="conservative", tilt_policy="preserve",
):
    """Optimal 10-band EQ via constrained least squares
    (`optimizer.py:490-1152`). Returns the reference's settings dict."""
    freqs = _series(freqs, "frequency grid")
    measured_db = _series(measured_db, "measured spectrum", freqs.shape)
    target_db = _series(target_db, "target spectrum", freqs.shape)
    if freqs.size < 3:
        raise ValueError("frequency grid must contain at least three points")
    if not np.all(np.isfinite(freqs)) or np.any(freqs < 0) or np.any(np.diff(freqs) <= 0):
        raise ValueError("frequency grid must be finite, non-negative, and strictly increasing")
    if not np.all(np.isfinite(measured_db)):
        raise ValueError("measured spectrum must be finite")
    if not np.all(np.isfinite(target_db)):
        raise ValueError("target spectrum must be finite")
    voiced_window_ratio = _unit(voiced_window_ratio, "voiced window ratio")
    if analysis_confidence is not None:
        analysis_confidence = _unit(analysis_confidence, "analysis confidence")
    if phonetic_coverage is not None:
        phonetic_coverage = _unit(phonetic_coverage, "phonetic coverage")
    noise_reference_quality = _unit(noise_reference_quality, "noise-reference quality")
    reference_status = str(noise_reference_status or "unavailable").strip().lower()
    if reference_status not in {"usable", "questionable", "invalid", "unavailable"}:
        raise ValueError(f"unknown noise-reference status: {noise_reference_status!r}")
    if global_snr_db is not None:
        global_snr_db = float(global_snr_db)
        if not np.isfinite(global_snr_db):
            raise ValueError("global SNR must be finite when provided")
    if spectral_repeatability is not None:
        rep = _series(spectral_repeatability, "spectral repeatability", freqs.shape)
        if not np.all(np.isfinite(rep)):
            raise ValueError("spectral repeatability must be finite")
        spectral_repeatability = np.clip(rep, 0.0, 1.0)
    if spectral_uncertainty_db is not None:
        unc = _series(spectral_uncertainty_db, "spectral uncertainty", freqs.shape)
        # +inf is the explicit "insufficient evidence" sentinel
        if np.any(np.isnan(unc)) or np.any(unc < 0):
            raise ValueError(
                "spectral uncertainty must be non-negative and may use +infinity "
                "only for unavailable evidence"
            )
        spectral_uncertainty_db = unc
    if spectral_snr_db is not None:
        ssnr = _series(spectral_snr_db, "spectral SNR", freqs.shape)
        if np.any(np.isinf(ssnr)):
            raise ValueError("spectral SNR may contain finite values or NaN, not infinity")
        spectral_snr_db = ssnr

    # level-normalise to the voice-band average (`optimizer.py:626-644`)
    vmask = (freqs >= 100) & (freqs <= 8000)
    voice_avg = float(np.mean(measured_db[vmask]) if np.any(vmask) else np.mean(measured_db))
    measured_db = measured_db - voice_avg

    tilt_policy = str(tilt_policy or "preserve").strip().lower()
    if tilt_policy not in {"preserve", "detrend"}:
        raise ValueError(f"Unknown spectral tilt policy: {tilt_policy}")
    tilt_component, tilt_slope, tilt_r2 = _tilt_fit(freqs, measured_db)
    if tilt_policy == "detrend":
        measured_db = measured_db - tilt_component

    dense = _dense_log_grid(freqs)
    measured_dense = np.interp(dense, freqs, measured_db)
    target_dense = np.interp(dense, freqs, target_db)
    residual, residual_reg = _regularize_residual(
        dense, target_dense - measured_dense, smoothing_strength
    )
    target_dense = measured_dense + residual

    repeat_dense = (
        np.interp(dense, freqs, spectral_repeatability)
        if spectral_repeatability is not None else None
    )
    cross_dense = None
    if cross_take_confidence is not None:
        ct = np.asarray(cross_take_confidence, float)
        if ct.shape != freqs.shape or not np.all(np.isfinite(ct)):
            raise ValueError("cross-take confidence must be finite and match the frequency grid")
        cross_dense = np.interp(dense, freqs, np.clip(ct, 0, 1))
    snr_dense = (
        np.interp(dense, freqs, spectral_snr_db) if spectral_snr_db is not None else None
    )

    base_centers, q_init = _select_band_layout(
        dense, target_dense - measured_dense, _voice_weights(dense)
    )
    band_snr_db = _band_snr(dense, snr_dense, base_centers)
    snr_available = bool(np.any(np.isfinite(band_snr_db)))
    eff_snr = np.where(np.isfinite(band_snr_db), band_snr_db, 18.0)
    metadata = bool(
        spectral_repeatability is not None or spectral_uncertainty_db is not None
        or cross_dense is not None or analysis_confidence is not None
        or phonetic_coverage is not None
    )
    prelim_conf = _band_confidence(
        dense, base_centers, target_dense - measured_dense, eff_snr,
        voiced_window_ratio, repeat_dense, snr_available=snr_available,
        phonetic_coverage=phonetic_coverage,
    )

    g_hi = _snr_gain_upper(eff_snr) if snr_available else np.full(NUM_EQ_BANDS, GAIN_MAX_DB)
    if reference_status == "invalid":
        g_hi = np.minimum(g_hi, 0.0)
    elif reference_status == "questionable":
        g_hi = np.minimum(g_hi, max(0.0, 2.0 * noise_reference_quality))
    elif noise_reference_quality < 0.75:
        g_hi = np.minimum(g_hi, 1.5 + 3.0 * noise_reference_quality)
    g_lo = np.full(NUM_EQ_BANDS, GAIN_MIN_DB)
    if metadata:
        g_hi = np.minimum(g_hi, 0.35 + prelim_conf * prelim_conf * (GAIN_MAX_DB - 0.35))
        g_lo = np.maximum(g_lo, -(1.0 + prelim_conf * (abs(GAIN_MIN_DB) - 1.0)))
        if not snr_available:
            g_hi = np.minimum(g_hi, UNKNOWN_EVIDENCE_MAX_BOOST_DB)
    elif not snr_available:
        g_hi = np.minimum(g_hi, UNKNOWN_EVIDENCE_MAX_BOOST_DB)

    band_cross = cross_scale = None
    if cross_dense is not None:
        band_cross = np.interp(base_centers, dense, cross_dense)
        cross_scale = np.clip(
            (band_cross - CROSS_TAKE_ABSTENTION_CONFIDENCE_THRESHOLD)
            / (1.0 - CROSS_TAKE_ABSTENTION_CONFIDENCE_THRESHOLD),
            0.02, 1.0,
        )
        g_hi = np.minimum(g_hi, GAIN_MAX_DB * cross_scale)
        g_lo = np.maximum(g_lo, GAIN_MIN_DB * cross_scale)

    weights = _voice_weights(dense)
    if snr_available:
        band_scale = SNR_LOW_RELIABILITY_WEIGHT + _snr_reliability(eff_snr) * (
            1.0 - SNR_LOW_RELIABILITY_WEIGHT
        )
        weights = weights * np.interp(dense, base_centers, band_scale,
                                      left=float(band_scale[0]), right=float(band_scale[-1]))

    desired = np.interp(base_centers, dense, target_dense) - np.interp(
        base_centers, dense, measured_dense
    )
    g0 = np.clip(desired, g_lo, g_hi)

    # Stage 1: gain-only (`optimizer.py:819-840`)
    def res_gain(g):
        resp = predict_eq_response(dense, g, q_init, base_centers)
        return np.sqrt(weights) * (target_dense - (measured_dense + resp))

    stage1 = least_squares(res_gain, g0, bounds=(g_lo, g_hi), method="trf",
                           ftol=1e-4, xtol=1e-4, gtol=1e-6, max_nfev=120)

    # Stage 2: joint gains + Q + centres (`optimizer.py:842-875`)
    q_lo, role_q_hi = _q_bounds(base_centers)
    q_hi = _confidence_q_upper(role_q_hi, stage1.x, base_centers,
                               prelim_conf if metadata else None)
    c_lo, c_hi = _center_bounds(base_centers)
    q_prior = np.clip(q_init, q_lo, q_hi)

    def res_joint(p):
        g = p[:NUM_EQ_BANDS]
        q = p[NUM_EQ_BANDS:2 * NUM_EQ_BANDS]
        c = p[2 * NUM_EQ_BANDS:]
        resp = predict_eq_response(dense, g, q, c)
        err = target_dense - (measured_dense + resp)
        coupling = np.maximum(0.0, np.abs(np.diff(g)) - _adjacent_limits(c))
        return np.concatenate([
            np.sqrt(weights) * err,
            np.sqrt(LAMBDA_Q) * np.log(q / q_prior),
            np.sqrt(LAMBDA_G) * _gain_curvature(g, c),
            np.sqrt(LAMBDA_CENTER) * np.log(c / base_centers),
            np.sqrt(LAMBDA_COUPLING) * coupling,
            np.array([np.sqrt(LAMBDA_TILT) * _tilt_slope(g, c)]),
        ])

    p0 = np.concatenate([stage1.x, q_prior, base_centers])
    stage2 = least_squares(
        res_joint, p0,
        bounds=(np.concatenate([g_lo, q_lo, c_lo]), np.concatenate([g_hi, q_hi, c_hi])),
        method="trf", ftol=1e-4, xtol=1e-4, gtol=1e-6, max_nfev=180,
    )
    gains = stage2.x[:NUM_EQ_BANDS]
    qs = stage2.x[NUM_EQ_BANDS:2 * NUM_EQ_BANDS]
    centers = stage2.x[2 * NUM_EQ_BANDS:]
    band_conf = _band_confidence(
        dense, centers, target_dense - measured_dense, eff_snr, voiced_window_ratio,
        repeat_dense, active_gains=gains, snr_available=snr_available,
        phonetic_coverage=phonetic_coverage,
    )

    # local abstention + constrained refinement (`optimizer.py:909-961`)
    pre_abst = gains.copy()
    abst_mask = (
        (np.abs(gains) >= 0.25) & (band_conf < LOCAL_ABSTENTION_CONFIDENCE_THRESHOLD)
        if metadata else np.zeros(NUM_EQ_BANDS, bool)
    )
    f_lo, f_hi = g_lo.copy(), g_hi.copy()
    f_lo[abst_mask] = 0.0
    f_hi[abst_mask] = 0.0
    gains = np.clip(gains, f_lo, f_hi)
    gains, cons_ok = _constrained_refinement(
        gains, dense, measured_dense, target_dense, qs, centers, weights, f_lo, f_hi
    )
    inactive = np.abs(gains) < 0.25
    if np.any(inactive):
        gains = gains.copy()
        gains[inactive] = 0.0
        i_lo, i_hi = f_lo.copy(), f_hi.copy()
        i_lo[inactive] = 0.0
        i_hi[inactive] = 0.0
        gains, ok2 = _constrained_refinement(
            gains, dense, measured_dense, target_dense, qs, centers, weights, i_lo, i_hi
        )
        cons_ok = bool(cons_ok and ok2)

    gains, before_err, after_err, vscale, quality = _validate_and_attenuate(
        dense, measured_dense, target_dense, gains, qs, centers, weights
    )
    vconf = _validation_confidence(before_err, after_err, vscale)
    overall, eq_conf, cap_conf = _overall_confidence(band_conf, gains,
                                                     analysis_confidence, vconf)

    from .eq_quality import evaluate_eq_quality

    status = "apply"
    abst_reasons: list[str] = []
    reduced_reasons: list[str] = []
    nonlinear_ok = bool(stage1.success and stage2.success)
    if used_spectrum_fallback:
        abst_reasons.append("insufficient repeatable voiced windows")
    if not cons_ok and np.max(np.abs(gains)) < 0.25:
        abst_reasons.append("constrained gain solve produced no safe correction")
    if vscale <= 0.0:
        abst_reasons.append("no validated correction improved the target safely")
    if analysis_confidence is not None and analysis_confidence < GLOBAL_CAPTURE_CONFIDENCE_THRESHOLD:
        abst_reasons.append("capture quality score is too low")
    if snr_available and np.nanmedian(band_snr_db) < 3.0:
        abst_reasons.append("noise-referenced SNR is too low")
    if reference_status == "invalid" or noise_reference_quality < 0.30:
        abst_reasons.append("room-noise reference is invalid")
    if abst_reasons:
        status = "abstain"
        gains = np.zeros_like(gains)
        after_err = before_err
        vscale = 0.0
        quality = evaluate_eq_quality(centers, gains, qs).to_dict()
        vconf = _validation_confidence(before_err, after_err, vscale)
        overall, eq_conf, cap_conf = _overall_confidence(band_conf, gains,
                                                         analysis_confidence, vconf)
    elif (overall < REDUCED_RECOMMENDATION_CONFIDENCE_THRESHOLD or vscale < 0.70
          or reference_status == "questionable" or not nonlinear_ok or not cons_ok):
        status = "reduced"
        if overall < REDUCED_RECOMMENDATION_CONFIDENCE_THRESHOLD:
            reduced_reasons.append("overall confidence is below full-strength threshold")
        if vscale < 0.70:
            reduced_reasons.append("validation reduced the fitted correction")
        if reference_status == "questionable":
            reduced_reasons.append("room-noise reference is questionable")
        if not nonlinear_ok:
            reduced_reasons.append("nonlinear EQ solve used its bounded best estimate")
        if not cons_ok:
            reduced_reasons.append("constrained gain solve used its feasible projection")

    return {
        "band_gains": gains.tolist(),
        "band_qs": qs.tolist(),
        "band_freqs": centers.tolist(),
        "band_confidences": band_conf.tolist(),
        "pre_abstention_band_gains": pre_abst.tolist(),
        "band_snr_db": [float(v) if np.isfinite(v) else None for v in band_snr_db],
        "noise_referenced_snr_db": (
            float(global_snr_db) if snr_available and global_snr_db is not None else None
        ),
        "analysis_confidence": overall,
        "eq_confidence": eq_conf,
        "capture_confidence": cap_conf,
        "validation_confidence": vconf,
        "low_confidence_active_bands": int(np.count_nonzero(abst_mask)),
        "active_band_count": int(np.sum(np.abs(gains) >= 0.25)),
        "recommendation_status": status,
        "apply_recommended": status != "abstain",
        "abstention_reasons": abst_reasons,
        "recommendation_reasons": reduced_reasons,
        "confidence_semantics": "bounded_quality_score",
        "snr_reference_available": snr_available,
        "noise_reference_source": str(noise_reference_source) if snr_available else "unavailable",
        "noise_reference_quality": noise_reference_quality,
        "noise_reference_status": reference_status,
        "noise_reference_reasons": list(noise_reference_reasons or []),
        "noise_reference_boost_cap_db": float(np.max(g_hi)),
        "q_confidence_binding_location": "joint_solver_bounds",
        "q_upper_bounds": q_hi.tolist(),
        "local_abstained_band_indices": np.flatnonzero(abst_mask).tolist(),
        "spectral_uncertainty_available": bool(spectral_uncertainty_db is not None),
        "cross_take_confidence_available": bool(band_cross is not None),
        "cross_take_band_confidences": band_cross.tolist() if band_cross is not None else None,
        "cross_take_gain_feasibility_scale": (
            cross_scale.tolist() if cross_scale is not None else None
        ),
        "cross_take_abstention_threshold": (
            CROSS_TAKE_ABSTENTION_CONFIDENCE_THRESHOLD if band_cross is not None else None
        ),
        "phonetic_coverage": (
            float(np.clip(phonetic_coverage, 0, 1)) if phonetic_coverage is not None else None
        ),
        "spectral_tilt_policy": tilt_policy,
        "spectral_tilt_slope_db_per_decade": tilt_slope,
        "spectral_tilt_fit_r2": tilt_r2,
        "nonlinear_solver_success": nonlinear_ok,
        "constraint_solver_success": cons_ok,
        "max_adjacent_gain_difference_db": float(np.max(np.abs(np.diff(gains)))),
        "max_adjacent_gain_slope_db_per_octave": float(
            np.max(np.abs(np.diff(gains)) / np.maximum(
                np.diff(np.log2(np.clip(centers, 1e-6, None))), 1e-6))
        ),
        "validation_before_error_db": before_err,
        "validation_after_error_db": after_err,
        "validation_gain_scale": vscale,
        "target_profile": target_profile,
        "smoothing_strength": residual_reg["smoothing_strength"],
        "residual_regularization": residual_reg,
        "used_spectrum_fallback": bool(used_spectrum_fallback),
        "eq_quality": quality,
    }


def analyze_auto_eq(
    audio_data, sample_rate, target_preset="broadcast", *, target_mode="adaptive",
    smoothing_strength="conservative", chain_settings=None, vad_probabilities=None,
    noise_audio=None, noise_spectrum_override=None, noise_reference_quality=1.0,
    noise_reference_status="usable", noise_reference_reasons=None,
    tilt_policy="preserve", progress_callback=None,
):
    """Full Auto-EQ pipeline (`pipeline.py:7-207`). Returns
    ``(eq_settings, ValidationResult)``; raises ``ValueError`` with a generic
    message when validation fails. ``progress_callback(step) -> bool`` is
    called at stage boundaries (voice_activity/spectrum/target/optimize/
    headroom); returning False cancels the analysis with
    ``AnalysisCancelled`` (the reference worker's stop-event poll,
    `ui/analysis_worker.py:60-83`)."""
    from .failure_detection import validate_analysis
    from .headroom import apply_headroom_validation
    from .spectrum import analyze_voice_spectrum, smooth_spectrum_perceptual
    from .vad import analyze_offline_vad

    def _step(name: str) -> None:
        if progress_callback is not None and progress_callback(name) is False:
            raise AnalysisCancelled(name)

    _step("voice_activity")
    vad_backend = "provided"
    if vad_probabilities is None:
        vad_probabilities, vad_backend = analyze_offline_vad(audio_data, int(sample_rate))

    _step("spectrum")
    spectrum_result = analyze_voice_spectrum(
        audio_data, sample_rate,
        vad_probabilities=vad_probabilities,
        noise_audio=noise_audio,
        noise_spectrum_override=noise_spectrum_override,
        noise_reference_source_override=(
            "validated_conservative" if noise_spectrum_override is not None else None
        ),
    )
    freqs = spectrum_result.freqs
    spectrum_smoothed = smooth_spectrum_perceptual(
        freqs, spectrum_result.median_spectrum_db, strength=smoothing_strength
    )
    target_profile = (
        f"{target_preset}:{target_mode}"
        if not spectrum_result.used_single_spectrum_fallback
        else f"{target_preset}:{target_mode}:fallback"
    )
    _step("target")
    target_db = get_target_curve(freqs, target_preset, measured_db=spectrum_smoothed,
                                 target_mode=target_mode)
    _step("optimize")
    eq_settings = calculate_eq_bands(
        freqs, spectrum_smoothed, target_db,
        spectral_repeatability=spectrum_result.spectral_repeatability,
        spectral_uncertainty_db=spectrum_result.measurement_uncertainty_db,
        phonetic_coverage=spectrum_result.phonetic_coverage,
        voiced_window_ratio=spectrum_result.voiced_window_ratio,
        analysis_confidence=spectrum_result.residual_confidence,
        global_snr_db=spectrum_result.snr_db,
        spectral_snr_db=spectrum_result.spectral_snr_db,
        noise_reference_source=spectrum_result.noise_reference_source,
        noise_reference_quality=noise_reference_quality,
        noise_reference_status=noise_reference_status,
        noise_reference_reasons=noise_reference_reasons,
        target_profile=target_profile,
        used_spectrum_fallback=spectrum_result.used_single_spectrum_fallback,
        smoothing_strength=smoothing_strength,
        tilt_policy=tilt_policy,
    )
    eq_settings["target_mode"] = target_mode
    eq_settings["measurement_coverage"] = spectrum_result.measurement_coverage
    eq_settings["measurement_outlier_rejection_ratio"] = spectrum_result.outlier_rejection_ratio
    eq_settings["measurement_phonetic_coverage"] = spectrum_result.phonetic_coverage
    eq_settings["measurement_effective_blocks"] = spectrum_result.effective_measurement_blocks
    eq_settings["measurement_vad_backend"] = (
        "silero" if spectrum_result.vad_probability_used else vad_backend
    )
    eq_settings["measurement_vad_active_window_ratio"] = spectrum_result.vad_active_window_ratio
    eq_settings["measurement_noise_reference_source"] = spectrum_result.noise_reference_source
    eq_settings["measurement_noise_reference_quality"] = float(noise_reference_quality)
    eq_settings["measurement_noise_reference_status"] = str(noise_reference_status)

    _step("headroom")
    eq_settings = apply_headroom_validation(
        audio_data, sample_rate, eq_settings, chain_settings=chain_settings
    )

    validation = validate_analysis(eq_settings, spectrum_smoothed, freqs)
    validation.details.update({
        "voiced_window_ratio": spectrum_result.voiced_window_ratio,
        "spectrum_snr_db": spectrum_result.snr_db,
        "noise_reference_source": spectrum_result.noise_reference_source,
        "noise_reference_quality": eq_settings.get("noise_reference_quality"),
        "noise_reference_status": eq_settings.get("noise_reference_status"),
        "noise_reference_reasons": eq_settings.get("noise_reference_reasons"),
        "snr_reference_available": spectrum_result.spectral_snr_db is not None,
        "spectral_tilt_db_per_octave": spectrum_result.spectral_tilt_db_per_octave,
        "used_single_spectrum_fallback": spectrum_result.used_single_spectrum_fallback,
        "analysis_confidence": spectrum_result.residual_confidence,
        "measurement_coverage": spectrum_result.measurement_coverage,
        "measurement_outlier_rejection_ratio": spectrum_result.outlier_rejection_ratio,
        "measurement_phonetic_coverage": spectrum_result.phonetic_coverage,
        "measurement_effective_blocks": spectrum_result.effective_measurement_blocks,
        "measurement_vad_backend": eq_settings.get("measurement_vad_backend"),
        "measurement_vad_active_window_ratio": spectrum_result.vad_active_window_ratio,
        "capture_confidence": eq_settings.get("capture_confidence"),
        "eq_confidence": eq_settings.get("eq_confidence"),
        "validation_confidence": eq_settings.get("validation_confidence"),
        "validation_before_error_db": eq_settings.get("validation_before_error_db"),
        "validation_after_error_db": eq_settings.get("validation_after_error_db"),
        "validation_gain_scale": eq_settings.get("validation_gain_scale"),
        "target_mode": eq_settings.get("target_mode"),
        "smoothing_strength": eq_settings.get("smoothing_strength"),
        "residual_regularization": eq_settings.get("residual_regularization"),
        "headroom_validation": eq_settings.get("headroom_validation"),
        "headroom_safe": eq_settings.get("headroom_safe"),
        "headroom_gain_scale": eq_settings.get("headroom_gain_scale"),
        "recommendation_status": eq_settings.get("recommendation_status"),
        "apply_recommended": eq_settings.get("apply_recommended"),
        "abstention_reasons": eq_settings.get("abstention_reasons"),
        "spectral_tilt_policy": eq_settings.get("spectral_tilt_policy"),
        "spectral_tilt_slope_db_per_decade": eq_settings.get("spectral_tilt_slope_db_per_decade"),
        "constraint_solver_success": eq_settings.get("constraint_solver_success"),
    })
    if not validation.passed:
        raise ValueError(validation.reason)
    return eq_settings, validation
