"""Headroom-aware Auto-EQ validation via native chain simulation.

Mirrors `python/mic_eq/analysis/auto_eq_parts/headroom.py`:

- ``simulate_candidate_chain`` renders a candidate EQ through the full
  native deterministic chain (`headroom.py:251-275`); the native result is
  authoritative, the pure-numpy fallback is explicitly advisory
  (`headroom.py:14-17`).
- ``apply_headroom_validation`` sweeps candidate gain scales
  (1.0 .. 0.0) and keeps the first scale meeting the safety gates:
  pre-limiter true-peak headroom >= 1 dB, limiter GR <= 1 dB, true-peak GR
  <= 0.5 dB (`headroom.py:17-21,99-120,277-339`).

In this framework the native simulator is always available (it IS the
framework), and the sweep can run all scales as one vmapped batch.
"""

from __future__ import annotations

from copy import deepcopy

import numpy as np
from scipy.signal import lfilter, resample_poly

HEADROOM_TARGET_DB = 1.0
LIMITER_GAIN_REDUCTION_WARN_DB = 1.0
TRUE_PEAK_GAIN_REDUCTION_WARN_DB = 0.5
HEADROOM_SCALES = (1.0, 0.85, 0.70, 0.55, 0.40, 0.25, 0.0)

NUM_EQ_BANDS = 10

__all__ = [
    "HEADROOM_SCALES",
    "simulate_candidate_chain",
    "apply_headroom_validation",
]


def _db(v):
    return float(20.0 * np.log10(max(float(v), 1e-12)))


def _f(value, default):
    try:
        parsed = float(value)
    except (TypeError, ValueError):
        return default
    return parsed if np.isfinite(parsed) else default


def _b(value, default):
    return value if isinstance(value, bool) else default


def _flatten_chain_settings(chain_settings):
    """Nested UI-style settings -> flat simulator settings
    (`headroom.py:42-88`)."""
    cs = chain_settings or {}
    de = cs.get("deesser") or {}
    comp = cs.get("compressor") or {}
    lim = cs.get("limiter") or {}
    return {
        "return_output_audio": _b(cs.get("return_output_audio"), False),
        "deesser_enabled": _b(de.get("enabled"), False),
        "deesser_auto_enabled": _b(de.get("auto_enabled"), True),
        "deesser_auto_amount": _f(de.get("auto_amount"), 0.5),
        "deesser_low_cut_hz": _f(de.get("low_cut_hz"), 4000.0),
        "deesser_high_cut_hz": _f(de.get("high_cut_hz"), 11000.0),
        "deesser_threshold_db": _f(de.get("threshold_db"), -28.0),
        "deesser_ratio": _f(de.get("ratio"), 4.0),
        "deesser_attack_ms": _f(de.get("attack_ms"), 2.0),
        "deesser_release_ms": _f(de.get("release_ms"), 80.0),
        "deesser_max_reduction_db": _f(de.get("max_reduction_db"), 6.0),
        "compressor_enabled": _b(comp.get("enabled"), True),
        "compressor_threshold_db": _f(comp.get("threshold_db"), -20.0),
        "compressor_ratio": _f(comp.get("ratio"), 4.0),
        "compressor_attack_ms": _f(comp.get("attack_ms"), 10.0),
        "compressor_release_ms": _f(comp.get("release_ms"), 200.0),
        "compressor_makeup_gain_db": _f(comp.get("makeup_gain_db"), 0.0),
        "compressor_adaptive_release": _b(comp.get("adaptive_release"), False),
        "compressor_base_release_ms": _f(comp.get("base_release_ms"), 50.0),
        "compressor_auto_makeup_enabled": _b(comp.get("auto_makeup_enabled"), False),
        "compressor_target_lufs": _f(comp.get("target_lufs"), -18.0),
        "compressor_sidechain_highpass_enabled": _b(
            comp.get("sidechain_highpass_enabled"), True
        ),
        "limiter_enabled": _b(lim.get("enabled"), True),
        "limiter_ceiling_db": _f(lim.get("ceiling_db"), -0.5),
        "limiter_release_ms": _f(lim.get("release_ms"), 50.0),
        "limiter_careful_output_enabled": _b(lim.get("careful_output_enabled"), True),
    }


def _bands_from_settings(eq_settings):
    freqs = list(eq_settings.get("band_freqs") or [])
    gains = list(eq_settings.get("band_gains") or [])
    qs = list(eq_settings.get("band_qs") or [])
    if not (len(freqs) == len(gains) == len(qs) == NUM_EQ_BANDS):
        raise ValueError(
            "Auto-EQ settings must contain 10 frequencies, gains, and Q values"
        )
    return [
        (_f(f, 1000.0), _f(g, 0.0), _f(q, 1.41)) for f, g, q in zip(freqs, gains, qs)
    ]


def simulate_candidate_chain(audio_data, sample_rate, eq_settings, chain_settings=None):
    """Authoritative native chain render of a candidate EQ
    (`headroom.py:251-275`)."""
    bands = _bands_from_settings(eq_settings)
    flat = _flatten_chain_settings(chain_settings)
    try:
        from ..api import simulate_auto_eq_chain

        audio = np.ascontiguousarray(audio_data, np.float32)
        result = dict(simulate_auto_eq_chain(audio, float(sample_rate), bands, flat))
        result["simulation_backend"] = "native"
        result["safety_authority"] = "authoritative"
        return result
    except Exception:
        fallback = _simulate_fallback(
            np.asarray(audio_data, np.float32), sample_rate, bands, flat
        )
        fallback["simulation_backend"] = "python"
        fallback["safety_authority"] = "advisory"
        fallback["limitations"] = [
            "de-esser behavior is not simulated",
            "compression uses whole-capture RMS instead of the live envelope",
            "the live lookahead limiter is not simulated",
        ]
        return fallback


def _simulate_fallback(audio, sample_rate, bands, flat):
    """Advisory pure-numpy approximation (`headroom.py:196-249`)."""
    from .auto_eq import predict_eq_response  # noqa: F401 (same coefficients)

    out = np.asarray(audio, np.float64).copy()
    for index, (fhz, g, q) in enumerate(bands):
        kind = "low_shelf" if index == 0 else "high_shelf" if index == NUM_EQ_BANDS - 1 else "peaking"
        b, a = _biquad_ba(kind, fhz, g, q, float(sample_rate))
        out = lfilter(b, a, out)
    processed = out.copy()
    comp_gr = 0.0
    if flat.get("compressor_enabled", True):
        rms_db = _db(float(np.sqrt(np.mean(np.square(processed)))) if processed.size else 0.0)
        over = max(0.0, rms_db - _f(flat.get("compressor_threshold_db"), -20.0))
        ratio = max(_f(flat.get("compressor_ratio"), 4.0), 1.0)
        comp_gr = over * (1.0 - 1.0 / ratio)
        makeup = _f(flat.get("compressor_makeup_gain_db"), 0.0)
        processed *= 10.0 ** ((makeup - comp_gr) / 20.0)
    careful = bool(flat.get("limiter_careful_output_enabled", True))
    ceiling_db = _f(flat.get("limiter_ceiling_db"), -0.5)
    eff_db = min(ceiling_db, -1.5) if careful else min(ceiling_db, 0.0)
    pre_tp = _true_peak_db(processed)
    lim_gr = tp_gr = 0.0
    limited = 0
    if flat.get("limiter_enabled", True) and pre_tp > eff_db:
        tp_gr = pre_tp - eff_db
        lim_gr = max(0.0, _db(float(np.max(np.abs(processed)))) - eff_db)
        limited = 1
        processed *= 10.0 ** (-tp_gr / 20.0)
        c = 10.0 ** (eff_db / 20.0)
        processed = np.clip(processed, -c, c)
    out_pk = _db(float(np.max(np.abs(processed))) if processed.size else 0.0)
    out_tp = _true_peak_db(processed)
    result = {
        "input_sample_peak_db": _db(float(np.max(np.abs(audio))) if audio.size else 0.0),
        "input_rms_db": _db(float(np.sqrt(np.mean(np.square(audio)))) if audio.size else 0.0),
        "output_sample_peak_db": out_pk,
        "pre_limiter_true_peak_db": pre_tp,
        "output_true_peak_db": out_tp,
        "output_rms_db": _db(float(np.sqrt(np.mean(np.square(processed)))) if processed.size else 0.0),
        "limiter_effective_ceiling_db": eff_db,
        "sample_headroom_db": eff_db - out_pk,
        "pre_limiter_true_peak_headroom_db": eff_db - pre_tp,
        "true_peak_headroom_db": eff_db - out_tp,
        "limiter_gain_reduction_db": lim_gr,
        "true_peak_limiter_gain_reduction_db": tp_gr,
        "true_peak_limited_events": limited,
        "compressor_gain_reduction_db": comp_gr,
        "deesser_gain_reduction_db": 0.0,
        "compressor_gain_reduction_median_db": comp_gr,
        "compressor_gain_reduction_p95_db": comp_gr,
        "compressor_gain_reduction_active_ratio": float(comp_gr >= 0.10),
        "deesser_gain_reduction_median_db": 0.0,
        "deesser_gain_reduction_p95_db": 0.0,
        "processed_samples": int(processed.size),
    }
    if flat.get("return_output_audio", False):
        result["output_audio"] = processed.astype(np.float32).tolist()
    return result


def _biquad_ba(kind, fhz, gain_db, q, fs):
    w0 = 2.0 * np.pi * np.clip(fhz, 20.0, fs * 0.45) / fs
    sw, cw = np.sin(w0), np.cos(w0)
    q = max(float(q), 1e-6)
    alpha = sw / (2.0 * q)
    A = 10.0 ** (gain_db / 40.0)
    if kind == "peaking":
        b = [1 + alpha * A, -2 * cw, 1 - alpha * A]
        a = [1 + alpha / A, -2 * cw, 1 - alpha / A]
    else:
        sa = 2.0 * np.sqrt(A) * alpha
        s = 1.0 if kind == "low_shelf" else -1.0
        b = [
            A * ((A + 1) - s * (A - 1) * cw + sa),
            s * 2 * A * ((A - 1) - s * (A + 1) * cw),
            A * ((A + 1) - s * (A - 1) * cw - sa),
        ]
        a = [
            (A + 1) + s * (A - 1) * cw + sa,
            -s * 2 * ((A - 1) + s * (A + 1) * cw),
            (A + 1) + s * (A - 1) * cw - sa,
        ]
    b = np.asarray(b, float) / a[0]
    return b, np.asarray([1.0, a[1] / a[0], a[2] / a[0]])


def _true_peak_db(samples):
    if np.asarray(samples).size == 0:
        return -120.0
    up = resample_poly(np.asarray(samples, np.float64), 4, 1)
    return _db(float(np.max(np.abs(up))) if up.size else 0.0)


def _is_safe(sim):
    pre = _f(sim.get("pre_limiter_true_peak_headroom_db"),
             _f(sim.get("true_peak_headroom_db"), 120.0))
    return (
        pre >= HEADROOM_TARGET_DB
        and _f(sim.get("limiter_gain_reduction_db"), 0.0) <= LIMITER_GAIN_REDUCTION_WARN_DB
        and _f(sim.get("true_peak_limiter_gain_reduction_db"), 0.0)
        <= TRUE_PEAK_GAIN_REDUCTION_WARN_DB
    )


def apply_headroom_validation(audio_data, sample_rate, eq_settings, chain_settings=None):
    """Scale Auto-EQ gains down until the native chain predicts safe
    headroom (`headroom.py:292-339`)."""
    audio = np.asarray(audio_data, np.float32)
    result = deepcopy(eq_settings)
    gains = np.asarray(result.get("band_gains", []), float)
    if gains.size != NUM_EQ_BANDS:
        return result

    before = simulate_candidate_chain(audio, sample_rate, result, chain_settings)
    selected, sel_scale, sel_gains = before, 1.0, gains.copy()
    if not _is_safe(before):
        for scale in HEADROOM_SCALES[1:]:
            cand = deepcopy(result)
            cand["band_gains"] = (gains * scale).tolist()
            sim = simulate_candidate_chain(audio, sample_rate, cand, chain_settings)
            selected, sel_scale = sim, scale
            sel_gains = np.asarray(cand["band_gains"], float)
            if _is_safe(sim):
                break

    result["band_gains"] = sel_gains.tolist()
    result["validation_gain_scale"] = float(
        _f(result.get("validation_gain_scale"), 1.0) * sel_scale
    )
    meets = _is_safe(selected)
    authoritative = selected.get("simulation_backend") == "native"
    safe = bool(meets and authoritative)
    if not safe:
        result["validation_confidence"] = float(
            min(_f(result.get("validation_confidence"), 1.0), 0.42)
        )
        result["analysis_confidence"] = float(
            min(_f(result.get("analysis_confidence"), 1.0), 0.58)
        )
    elif sel_scale < 1.0:
        result["validation_confidence"] = float(
            min(_f(result.get("validation_confidence"), 1.0), 0.72)
        )
    result["headroom_validation"] = {
        "safe": safe,
        "authoritative": authoritative,
        "advisory": not authoritative,
        "meets_advisory_thresholds": meets,
        "gain_scale": sel_scale,
        "before": before,
        "after": selected,
        "status": "safe" if safe else "risk" if authoritative else "advisory",
    }
    result["headroom_safe"] = safe
    result["headroom_advisory"] = not authoritative
    result["headroom_gain_scale"] = sel_scale
    return result
