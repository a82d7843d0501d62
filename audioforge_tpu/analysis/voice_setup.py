"""Auto Voice Setup: one-shot full-chain recommendation from room tone +
speech.

Behavioural contract mirrors `python/mic_eq/analysis/voice_setup.py`:

- Duration gates: noise >= 1.5 s, speech >= 3 s (`voice_setup.py:42-44,
  1099-1102`); offline Silero posteriors for speech AND noise; noise
  reference -> conservative spectrum; VAD-masked speech features
  (K-weighted loudness windows, frame percentiles p20/p60/p95, band
  energies, sibilance frame evidence) (`voice_setup.py:161-458`).
- Capture confidence: weighted geometric quality score with hard caps
  (`voice_setup.py:1167-1190`).
- Recommenders: gate (`:468`), de-esser with the calibrated soft-fusion
  model (`:505`), compressor by intensity profile Gentle/Balanced/Dense/
  Custom (`:627`), then Auto-EQ, then the bounded 4-parameter compressor
  search (68-candidate budget, Halton + incumbent prior + local refinement,
  Huber multi-objective, hard rejects on true-peak/peak-GR violations)
  (`voice_setup.py:699-1080`).
- Second-passage verification -> accept / reduce / retry / rollback
  (`voice_setup.py:1468-1668`).

TPU-native: every candidate evaluation in the compressor search runs through
the batched chain (`api.simulate_auto_eq_chain_batched`), collapsing the
reference's 68 serial native calls into ~3 vmapped device calls.
"""

from __future__ import annotations

import time
from typing import Any

import numpy as np
from scipy.signal import lfilter, resample_poly

from ..config import EQ_FREQUENCIES
from .auto_eq import analyze_auto_eq, get_target_curve
from .deesser_fusion import (
    CLIP_FEATURE_NAMES,
    ENABLE_PROBABILITY_THRESHOLD,
    MODEL_VERSION as DEESSER_MODEL_VERSION,
    predict_clip_probability,
    predict_frame_probabilities,
)
from .headroom import simulate_candidate_chain
from .noise_reference import MIN_NOISE_DURATION_S, analyze_noise_reference
from .spectrum import (
    VAD_SPEECH_EVIDENCE_THRESHOLD,
    VAD_STRONG_SPEECH_THRESHOLD,
    _interpolate_vad,
    analyze_voice_spectrum,
    smooth_spectrum_perceptual,
)
from .vad import analyze_offline_vad

NOISE_MIN_DURATION_S = MIN_NOISE_DURATION_S
SPEECH_MIN_DURATION_S = 3.0
FRAME_MS = 40.0
HOP_MS = 20.0

GATE_MODE_LABELS = {0: "Threshold Only", 1: "VAD Assisted", 2: "VAD Only"}
TARGET_LUFS_BY_CURVE = {
    "broadcast": -16.0,
    "streaming": -16.0,
    "podcast": -17.0,
    "flat": -18.0,
}
DYNAMICS_PROFILES = {
    "gentle": {"target_p95_db": 2.0, "target_median_db": 0.7, "peak_cap_db": 6.0,
               "ratio_scale": 0.82},
    "balanced": {"target_p95_db": 3.5, "target_median_db": 1.4, "peak_cap_db": 8.0,
                 "ratio_scale": 1.0},
    "dense": {"target_p95_db": 5.5, "target_median_db": 2.5, "peak_cap_db": 10.0,
              "ratio_scale": 1.22},
}

__all__ = [
    "DYNAMICS_PROFILES",
    "GATE_MODE_LABELS",
    "analyze_voice_setup",
    "validate_voice_setup_verification",
]


def _clamp(v, lo, hi):
    return float(max(lo, min(hi, v)))


def _quality(components):
    """Weighted geometric mean so one weak prerequisite stays visible
    (`voice_setup.py:86-100`)."""
    if not components:
        return 0.0
    vals = np.clip([v for v, _ in components], 0.0, 1.0)
    wts = np.asarray([max(0.0, w) for _, w in components])
    if wts.sum() <= 0:
        return 0.0
    wts = wts / wts.sum()
    return float(np.exp(np.sum(wts * np.log(np.maximum(vals, 0.03)))))


def _rms_db(x):
    x = np.asarray(x, float)
    if x.size == 0:
        return -120.0
    return float(20.0 * np.log10(np.sqrt(np.mean(x * x)) + 1e-9))


def _peak_db(x):
    x = np.asarray(x, float)
    if x.size == 0:
        return -120.0
    return float(20.0 * np.log10(np.max(np.abs(x)) + 1e-9))


def _k_weighted_48k(audio, sample_rate):
    """BS.1770 K-weighted signal at 48 kHz (`voice_setup.py:127-141`)."""
    x = np.asarray(audio, np.float64)
    if sample_rate != 48000:
        g = int(np.gcd(int(sample_rate), 48000))
        x = resample_poly(x, 48000 // g, sample_rate // g)
    x = lfilter([1.53512485958697, -2.69169618940638, 1.19839281085285],
                [1.0, -1.69065929318241, 0.73248077421585], x)
    return lfilter([1.0, -2.0, 1.0], [1.0, -1.99004745483398, 0.99007225036621], x)


def _active_windows_lufs(weighted, mask, window, hop):
    """Windowed loudness over mostly-active windows — vectorised
    (`voice_setup.py:143-158`)."""
    n = weighted.size
    if n < window:
        return np.empty(0)
    starts = np.arange(0, n - window + 1, hop)
    sq_prefix = np.concatenate([[0.0], np.cumsum(weighted * weighted)])
    m_prefix = np.concatenate([[0.0], np.cumsum(mask.astype(np.float64))])
    act = (m_prefix[starts + window] - m_prefix[starts]) / window
    ms = (sq_prefix[starts + window] - sq_prefix[starts]) / window
    keep = act >= 0.55
    return -0.691 + 10.0 * np.log10(ms[keep] + 1e-12)


def _vad_masked_speech_features(speech, sample_rate, noise_rms_db,
                                vad_probabilities=None, noise_audio=None):
    """Posterior/energy-masked loudness, range, band and sibilance-frame
    features (`voice_setup.py:161-458`). Frame FFTs are batched."""
    signal = np.asarray(speech, np.float64)
    frame = max(256, int(sample_rate * FRAME_MS / 1000.0))
    hop = max(128, int(sample_rate * HOP_MS / 1000.0))
    if signal.size < frame:
        frames = signal[None, :]
        starts = np.asarray([0])
    else:
        frames = np.lib.stride_tricks.sliding_window_view(signal, frame)[::hop]
        starts = np.arange(frames.shape[0]) * hop
    frame_db = 10.0 * np.log10(np.mean(frames * frames, axis=1) + 1e-12)
    floor = max(noise_rms_db + 6.0, float(np.percentile(frame_db, 30.0)) + 2.0)
    energy_active = frame_db >= floor
    fvad = _interpolate_vad(vad_probabilities, starts, frame, sample_rate)
    active = energy_active
    if fvad is not None:
        supported = frame_db >= max(noise_rms_db + 2.0, floor - 4.0)
        posterior_active = (
            ((fvad >= VAD_SPEECH_EVIDENCE_THRESHOLD) & supported)
            | (fvad >= VAD_STRONG_SPEECH_THRESHOLD)
        )
        if int(np.count_nonzero(posterior_active)) >= 6:
            active = posterior_active
    if active.size >= 3:
        active = np.convolve(active.astype(int), np.ones(3, int), mode="same") > 0

    sample_mask = np.zeros(signal.size, bool)
    for s, a in zip(starts, active):
        if a:
            sample_mask[s: min(signal.size, s + frame)] = True
    active_duration_s = float(np.count_nonzero(sample_mask) / max(sample_rate, 1))
    active_ratio = float(np.mean(sample_mask)) if sample_mask.size else 0.0

    weighted = _k_weighted_48k(signal, sample_rate)
    if sample_rate == 48000:
        wmask = sample_mask
    else:
        g = int(np.gcd(int(sample_rate), 48000))
        wmask = resample_poly(sample_mask.astype(np.float64), 48000 // g,
                              sample_rate // g) >= 0.5
    if wmask.size < weighted.size:
        wmask = np.pad(wmask, (0, weighted.size - wmask.size))
    else:
        wmask = wmask[: weighted.size]
    momentary = _active_windows_lufs(weighted, wmask, int(0.4 * 48000), int(0.1 * 48000))
    short_term = _active_windows_lufs(weighted, wmask, int(3.0 * 48000), int(1.0 * 48000))
    if momentary.size == 0:
        aw = weighted[wmask]
        ms = float(np.mean(np.square(aw))) if aw.size else 0.0
        momentary = np.asarray([-0.691 + 10.0 * np.log10(ms + 1e-12)])
    if short_term.size == 0:
        short_term = momentary
    spread_db = (
        float(np.percentile(momentary, 95) - np.percentile(momentary, 10))
        if momentary.size >= 4 else 0.0
    )

    window = np.hanning(frame)
    freqs = np.fft.rfftfreq(frame, 1.0 / sample_rate)
    # sibilants are often unvoiced; keep energy-supported frames in the
    # spectral analysis (`voice_setup.py:265-270`)
    spectral_active = active | energy_active
    idxs = np.flatnonzero(spectral_active)
    band_ranges = {
        "low": (80.0, 250.0),
        "body": (250.0, 2000.0),
        "presence": (2000.0, 5000.0),
        "sibilance": (5000.0, min(10000.0, sample_rate * 0.45)),
    }
    robust_bands = {k: -120.0 for k in band_ranges}
    evidence = {
        "available": False, "confidence": 0.0,
        "frame_probabilities": np.empty(0),
        "frame_feature_rows": np.empty((0, 6)),
        "frame_indices": np.empty(0, int),
        "excess_p90_db": -120.0, "temporal_contrast_db": 0.0,
        "candidate_frame_ratio": 0.0, "candidate_snr_db": 0.0, "peak_hz": 6500.0,
    }
    if idxs.size:
        act_frames = frames[idxs]
        centered = act_frames - act_frames.mean(axis=1, keepdims=True)
        power = np.square(np.abs(np.fft.rfft(centered * window, axis=1))) + 1e-18
        for name, (lo, hi) in band_ranges.items():
            m = (freqs >= lo) & (freqs <= hi)
            vals = 10.0 * np.log10(power[:, m].sum(axis=1) + 1e-18)
            robust_bands[name] = float(np.median(vals)) if vals.size else -120.0

        vref_mask = (freqs >= 250.0) & (freqs <= 4500.0)
        sib_mask = (freqs >= 5000.0) & (freqs <= min(9500.0, sample_rate * 0.45))
        if np.any(vref_mask) and np.any(sib_mask):
            vref_rows = 10.0 * np.log10(power[:, vref_mask].sum(axis=1) + 1e-18)
            sib_rows = 10.0 * np.log10(power[:, sib_mask].sum(axis=1) + 1e-18)
            excess = sib_rows - vref_rows
            noise_sib_db = float(np.percentile(sib_rows, 10.0))
            narr = (
                np.asarray(noise_audio, float).reshape(-1)
                if noise_audio is not None else np.empty(0)
            )
            if narr.size >= frame:
                nf = np.lib.stride_tricks.sliding_window_view(narr, frame)[::hop]
                nc = nf - nf.mean(axis=1, keepdims=True)
                npow = np.square(np.abs(np.fft.rfft(nc * window, axis=1))) + 1e-18
                levels = 10.0 * np.log10(npow[:, sib_mask].sum(axis=1) + 1e-18)
                if levels.size:
                    noise_sib_db = float(np.median(levels))
            sib_snr = sib_rows - noise_sib_db
            excess_med = float(np.median(excess))
            excess_p90 = float(np.percentile(excess, 90.0))
            contrast = max(0.0, excess_p90 - excess_med)
            local_db = 10.0 * np.log10(np.maximum(power[:, sib_mask], 1e-18))
            local_freqs = freqs[sib_mask]
            peak_freqs = local_freqs[np.argmax(power[:, sib_mask], axis=1)]
            prominence = local_db.max(axis=1) - np.median(local_db, axis=1)
            unvoiced = (
                1.0 - np.clip(fvad[idxs], 0.0, 1.0)
                if fvad is not None else np.full(excess.shape, 0.5)
            )
            loc_score = np.exp(
                -0.5 * np.square(np.log2(np.maximum(peak_freqs, 1.0) / 6500.0) / 0.70)
            )
            rows = np.column_stack([
                np.clip((excess - 0.50) / 5.0, 0, 1),
                np.clip((excess - excess_med - 0.20) / 3.0, 0, 1),
                np.clip((sib_snr - 3.0) / 15.0, 0, 1),
                unvoiced,
                np.clip((prominence - 1.0) / 8.0, 0, 1),
                np.clip(loc_score, 0, 1),
            ])
            probs = predict_frame_probabilities(rows)
            psum = max(float(probs.sum()), 1e-9)
            cand_spec = np.average(power, axis=0, weights=np.maximum(probs, 1e-6))
            top = max(1, int(np.ceil(probs.size * 0.10)))
            evidence = {
                "available": True,
                "confidence": float(np.percentile(probs, 90)),
                "frame_probabilities": probs,
                "frame_feature_rows": rows,
                "frame_indices": idxs,
                "frame_probability_p90": float(np.percentile(probs, 90)),
                "frame_probability_top_mean": float(
                    np.mean(np.partition(probs, -top)[-top:])
                ),
                "temporal_score": _clamp((contrast - 0.50) / 2.5, 0, 1),
                "absolute_hf_strength_p90": float(np.percentile(rows[:, 0], 90)),
                "noise_reliability_p90": float(np.percentile(rows[:, 2], 90)),
                "excess_p90_db": excess_p90,
                "temporal_contrast_db": contrast,
                "candidate_frame_ratio": float(np.mean(probs)),
                "candidate_snr_db": float(np.dot(probs, sib_snr) / psum),
                "peak_hz": float(local_freqs[int(np.argmax(cand_spec[sib_mask]))]),
            }

    return {
        "frame_db": frame_db,
        "active_frame_mask": active,
        "active_duration_s": active_duration_s,
        "active_ratio": active_ratio,
        "vad_probability_used": fvad is not None,
        "vad_active_frame_ratio": (
            float(np.mean(fvad >= VAD_SPEECH_EVIDENCE_THRESHOLD)) if fvad is not None else 0.0
        ),
        "short_term_lufs": float(np.median(short_term)),
        "short_term_window_count": int(short_term.size),
        "momentary_lufs": float(np.median(momentary)),
        "active_loudness_spread_db": spread_db,
        "loudness_range_db": spread_db,  # compatibility key (not EBU LRA)
        "loudness_window_count": int(momentary.size),
        "band_energy_db": robust_bands,
        "sibilance_excess_db": robust_bands["sibilance"] - robust_bands["presence"],
        "deesser_frame_evidence": evidence,
    }


def _band_mean(freqs, spectrum_db, lo, hi):
    m = (freqs >= lo) & (freqs <= hi)
    return float(np.mean(spectrum_db[m])) if np.any(m) else float(np.mean(spectrum_db))


def _recommend_gate(*, vad_available, noise_rms_db, speech_floor_db, speech_body_db,
                    speech_snr_db, speech_dynamic_range_db):
    """`voice_setup.py:468-503`."""
    margin = _clamp(speech_floor_db - noise_rms_db - 3.0, 4.0, 12.0)
    return {
        "enabled": True,
        "threshold_db": _clamp(noise_rms_db + margin, -80.0, -10.0),
        "attack_ms": 5.0,
        "release_ms": 120.0,
        "gate_mode": 1 if vad_available else 0,
        "vad_threshold": _clamp(0.46 - (speech_snr_db - 10.0) / 800.0, 0.42, 0.50),
        "vad_hold_time_ms": _clamp(140.0 + speech_dynamic_range_db * 6.0, 140.0, 260.0),
        "vad_pre_gain": _clamp(
            10.0 ** (max(0.0, -22.0 - speech_body_db) / 20.0), 1.0, 3.0
        ),
        "auto_threshold_enabled": bool(vad_available),
        "gate_margin_db": margin,
    }


def _recommend_deesser(*, freqs, spectrum_db, capture_confidence,
                       noise_reference_quality=1.0, noise_reference_status="usable",
                       robust_sibilance_excess_db=None, frame_evidence=None):
    """Calibrated soft-fusion de-esser recommendation
    (`voice_setup.py:505-625`)."""
    presence = _band_mean(freqs, spectrum_db, 2500.0, 4500.0)
    sibilance = _band_mean(freqs, spectrum_db, 5000.0, 9000.0)
    sm = (freqs >= 4500.0) & (freqs <= 9500.0)
    peak_hz = (
        float(freqs[sm][int(np.argmax(spectrum_db[sm]))]) if np.any(sm) else 6500.0
    )
    spectral_excess = sibilance - presence
    aggregate = (
        spectral_excess if robust_sibilance_excess_db is None
        else float(0.35 * spectral_excess + 0.65 * robust_sibilance_excess_db)
    )
    fd = frame_evidence or {}
    available = bool(fd.get("available"))
    excess_db = float(fd.get("excess_p90_db", aggregate)) if available else aggregate
    if available:
        peak_hz = float(fd.get("peak_hz", peak_hz))
    clip_vals = np.asarray([
        float(fd.get("frame_probability_p90", 0.0)),
        float(fd.get("frame_probability_top_mean", 0.0)),
        float(fd.get("candidate_frame_ratio", 0.0)),
        float(fd.get("temporal_score", 0.0)),
        float(fd.get("absolute_hf_strength_p90", 0.0)),
        float(fd.get("noise_reliability_p90", 0.0)),
    ])
    detection = 0.0
    evidence_conf = 0.0
    if available:
        detection = predict_clip_probability(clip_vals)
        evidence_conf = _quality([
            (detection, 0.70),
            (noise_reference_quality, 0.20),
            (capture_confidence, 0.10),
        ])
    invalid = bool(
        not available
        or str(noise_reference_status).strip().lower() == "invalid"
        or not np.isfinite(clip_vals).all()
    )
    enabled = bool(not invalid and detection >= ENABLE_PROBABILITY_THRESHOLD)
    low_cut = _clamp(peak_hz - 1700.0, 3500.0, 7000.0)
    settings = {
        "enabled": enabled,
        "auto_enabled": True,
        "auto_amount": _clamp(
            0.18 + 0.55 * detection + 0.12 * _clamp(excess_db / 6.0, 0, 1), 0.20, 0.85
        ),
        "low_cut_hz": low_cut,
        "high_cut_hz": _clamp(peak_hz + 2100.0, low_cut + 1500.0, 11000.0),
        "threshold_db": -28.0,
        "ratio": _clamp(2.5 + max(0.0, excess_db) * 0.45, 2.0, 5.5),
        "attack_ms": 2.0,
        "release_ms": 80.0,
        "max_reduction_db": _clamp(3.5 + max(0.0, excess_db) * 0.65, 3.0, 8.0),
    }
    diagnostics = {
        "enabled": enabled,
        "sibilance_excess_db": float(excess_db),
        "peak_hz": peak_hz,
        "frame_evidence_available": available,
        "frame_evidence_confidence": evidence_conf,
        "detection_probability": detection,
        "enable_probability_threshold": ENABLE_PROBABILITY_THRESHOLD,
        "model_version": DEESSER_MODEL_VERSION,
        "clip_features": dict(zip(CLIP_FEATURE_NAMES, [float(v) for v in clip_vals])),
        "invalid_evidence": invalid,
        "temporal_contrast_db": float(fd.get("temporal_contrast_db", 0.0)),
        "candidate_frame_ratio": float(fd.get("candidate_frame_ratio", 0.0)),
        "candidate_snr_db": float(fd.get("candidate_snr_db", 0.0)),
    }
    return settings, diagnostics


def _recommend_compressor(*, target_preset, speech_body_db, speech_loudness_lufs,
                          loudness_range_db, speech_snr_db, capture_confidence,
                          dynamics_intensity, custom_target_p95_db, custom_peak_cap_db):
    """Intensity-profile compressor recommendation (`voice_setup.py:627-697`)."""
    name = dynamics_intensity.lower()
    if name == "custom":
        p95 = _clamp(custom_target_p95_db, 1.0, 8.0)
        profile = {
            "target_p95_db": p95,
            "target_median_db": _clamp(p95 * 0.42, 0.3, 4.0),
            "peak_cap_db": _clamp(custom_peak_cap_db, p95 + 0.5, 12.0),
            "ratio_scale": _clamp(0.72 + p95 / 12.5, 0.8, 1.35),
        }
    else:
        name = name if name in DYNAMICS_PROFILES else "balanced"
        profile = DYNAMICS_PROFILES[name]
    target_lufs = TARGET_LUFS_BY_CURVE.get(target_preset, -18.0)
    auto_makeup = bool(capture_confidence >= 0.55 and speech_snr_db >= 10.0)
    settings = {
        "enabled": True,
        "threshold_db": _clamp(speech_body_db - 5.5, -48.0, -14.0),
        "ratio": _clamp((2.2 + loudness_range_db / 5.0) * profile["ratio_scale"], 1.8, 5.5),
        "attack_ms": _clamp(11.0 - loudness_range_db / 2.5, 4.0, 12.0),
        "release_ms": _clamp(135.0 + loudness_range_db * 11.0, 120.0, 260.0),
        "makeup_gain_db": (
            0.0 if auto_makeup else _clamp(target_lufs - speech_loudness_lufs, 0.0, 6.0)
        ),
        "adaptive_release": True,
        "base_release_ms": _clamp(50.0 + loudness_range_db * 6.0, 50.0, 140.0),
        "auto_makeup_enabled": auto_makeup,
        "target_lufs": target_lufs,
        "sidechain_highpass_enabled": True,
        "measured_short_term_lufs": speech_loudness_lufs,
        "measured_loudness_range_db": loudness_range_db,
        "dynamics_intensity": name,
        "target_p95_reduction_db": profile["target_p95_db"],
        "peak_reduction_cap_db": profile["peak_cap_db"],
    }
    diagnostics = {
        "auto_makeup_enabled": auto_makeup,
        "target_lufs": target_lufs,
        "dynamics_intensity": name,
        "target_p95_reduction_db": profile["target_p95_db"],
        "target_median_reduction_db": profile["target_median_db"],
        "peak_reduction_cap_db": profile["peak_cap_db"],
    }
    return settings, diagnostics


# ---------------------------------------------------------------------------
# Bounded compressor search (`voice_setup.py:699-1080`), batched on device
# ---------------------------------------------------------------------------

_SEARCH_BUDGET = 68
_SEARCH_BOUNDS = {
    "threshold_db": (-55.0, -6.0),
    "ratio": (1.5, 6.0),
    "attack_ms": (3.0, 25.0),
    "release_ms": (60.0, 320.0),
}
_OBJECTIVE_NORMALIZERS = {
    "loudness_error_db": 2.0,
    "median_gr_error_db": 1.0,
    "p95_gr_error_db": 1.0,
    "headroom_shortfall_db": 1.0,
    "pumping_score_db": 1.0,
    "silence_gain_excess_db": 1.0,
    "activity_ratio_deficit": 0.20,
}
_OBJECTIVE_WEIGHTS = {
    "loudness": 1.00, "median_gr": 0.35, "p95_gr": 0.90, "headroom": 0.45,
    "pumping": 0.30, "silence_gain": 1.50, "activity": 0.25, "prior": 0.08,
}


def _huber(v):
    m = abs(float(v))
    return 0.5 * m * m if m <= 1.0 else m - 0.5


def _halton(index, base):
    out, scale = 0.0, 1.0
    while index > 0:
        scale /= base
        out += scale * (index % base)
        index //= base
    return out


def _search_settings_dict(calibrated, deesser_settings, eq_settings):
    sim_comp = dict(calibrated)
    if sim_comp.get("auto_makeup_enabled", False):
        sim_comp["auto_makeup_enabled"] = False
        sim_comp["makeup_gain_db"] = 0.0
    from .headroom import _flatten_chain_settings

    flat = _flatten_chain_settings({
        "deesser": deesser_settings,
        "compressor": sim_comp,
        "limiter": {
            "enabled": True, "ceiling_db": -1.5, "release_ms": 80.0,
            "careful_output_enabled": True,
        },
    })
    bands = [
        (float(f), float(g), float(q))
        for f, g, q in zip(eq_settings["band_freqs"], eq_settings["band_gains"],
                           eq_settings["band_qs"])
    ]
    return flat, bands


def _score_simulation(sim, calibrated, incumbent, candidate, target_p95, target_median,
                      peak_cap):
    """Huber multi-objective score; inf = hard reject
    (`voice_setup.py:826-915`)."""
    peak = float(sim.get("compressor_gain_reduction_db", 0.0))
    median = float(sim.get("compressor_gain_reduction_median_db", peak))
    p95 = float(sim.get("compressor_gain_reduction_p95_db", peak))
    active_ratio = float(sim.get("compressor_gain_reduction_active_ratio", 0.0))
    active_gain = float(sim.get("active_output_gain_db", 0.0))
    target_lufs = float(calibrated.get("target_lufs", -18.0))
    output_lufs = (
        target_lufs if calibrated.get("auto_makeup_enabled", False)
        else float(calibrated.get("measured_short_term_lufs", -18.0)) + active_gain
    )
    out_tp = float(sim.get("output_true_peak_db", 120.0))
    ceiling = float(sim.get("limiter_effective_ceiling_db", -1.5))
    headroom = float(sim.get("pre_limiter_true_peak_headroom_db", -120.0))
    pumping = float(sim.get("compressor_pumping_score_db", 120.0))
    silence_gain = float(sim.get("silence_output_gain_db", 120.0))
    non_finite = bool(sim.get("non_finite_output", True))
    values = np.asarray([peak, median, p95, active_ratio, output_lufs, out_tp,
                         headroom, pumping, silence_gain])
    if (non_finite or not np.isfinite(values).all()
            or out_tp > ceiling + 0.10 or peak > peak_cap + 1e-6):
        return float("inf")
    prior = np.mean([
        ((float(candidate[k]) - incumbent[k]) / (hi - lo)) ** 2
        for k, (lo, hi) in _SEARCH_BOUNDS.items()
    ])
    n = _OBJECTIVE_NORMALIZERS
    terms = {
        "loudness": _huber((output_lufs - target_lufs) / n["loudness_error_db"]),
        "median_gr": _huber((median - target_median) / n["median_gr_error_db"]),
        "p95_gr": _huber((p95 - target_p95) / n["p95_gr_error_db"]),
        "headroom": _huber(max(0.0, 1.0 - headroom) / n["headroom_shortfall_db"]),
        "pumping": _huber(pumping / n["pumping_score_db"]),
        "silence_gain": _huber(max(0.0, silence_gain - 0.25) / n["silence_gain_excess_db"]),
        "activity": _huber(max(0.0, 0.20 - active_ratio) / n["activity_ratio_deficit"]),
        "prior": float(prior),
    }
    return float(sum(_OBJECTIVE_WEIGHTS[k] * v for k, v in terms.items()))


def _calibrate_compressor(*, speech_audio, sample_rate, eq_settings, deesser_settings,
                          compressor_settings, target_p95_db, target_median_db,
                          peak_cap_db, mesh=None):
    """Bounded 4-parameter search, candidates evaluated in batched device
    calls (`voice_setup.py:742-1080`)."""
    from ..api import simulate_auto_eq_chain_batched

    calibrated = dict(compressor_settings)
    diagnostics: dict[str, Any] = {
        "backend": "unavailable",
        "objective": "bounded_multi_objective_compressor_search_v1",
        "target_p95_gain_reduction_db": target_p95_db,
        "target_median_gain_reduction_db": target_median_db,
        "peak_gain_reduction_cap_db": peak_cap_db,
        "measured_p95_gain_reduction_db": 0.0,
        "measured_median_gain_reduction_db": 0.0,
        "measured_peak_gain_reduction_db": 0.0,
        "iterations": 0,
        "candidate_budget": _SEARCH_BUDGET,
        "objective_normalizers": dict(_OBJECTIVE_NORMALIZERS),
        "objective_weights": dict(_OBJECTIVE_WEIGHTS),
    }
    started = time.perf_counter()
    incumbent = {
        k: _clamp(float(calibrated[k]), *_SEARCH_BOUNDS[k]) for k in _SEARCH_BOUNDS
    }
    flat, bands = _search_settings_dict(calibrated, deesser_settings, eq_settings)
    speech = np.asarray(speech_audio, np.float32)

    def key_for(c):
        return tuple(round(float(c[k]), 6) for k in _SEARCH_BOUNDS)

    evaluated: dict[tuple, tuple[float, dict, dict]] = {}

    def batch_evaluate(cands):
        fresh = []
        for c in cands:
            cc = {k: _clamp(float(c[k]), *_SEARCH_BOUNDS[k]) for k in _SEARCH_BOUNDS}
            if key_for(cc) not in evaluated and len(evaluated) + len(fresh) < _SEARCH_BUDGET - 1:
                if all(key_for(cc) != key_for(f) for f in fresh):
                    fresh.append(cc)
        if not fresh:
            return
        sims = simulate_auto_eq_chain_batched(speech, sample_rate, bands, flat,
                                              fresh, mesh=mesh)
        for cc, sim in zip(fresh, sims):
            score = _score_simulation(sim, calibrated, incumbent, cc,
                                      target_p95_db, target_median_db, peak_cap_db)
            evaluated[key_for(cc)] = (score, sim, cc)

    # wave 1: incumbent + threshold sweep + Halton space fill
    wave1 = [incumbent]
    for thr in np.linspace(-55.0, -6.0, 33):
        wave1.append(dict(incumbent, threshold_db=float(thr)))
    for i in range(1, 17):
        wave1.append({
            k: lo + _halton(i, b) * (hi - lo)
            for (k, (lo, hi)), b in zip(_SEARCH_BOUNDS.items(), (2, 3, 5, 7))
        })
    batch_evaluate(wave1)

    feasible = sorted(
        (e for e in evaluated.values() if np.isfinite(e[0])),
        key=lambda e: (e[0], key_for(e[2])),
    )
    if not feasible:
        diagnostics["iterations"] = len(evaluated)
        diagnostics["search_runtime_ms"] = (time.perf_counter() - started) * 1000.0
        return calibrated, diagnostics

    # wave 2: local refinement around the best + best multi-parameter seed
    steps = {"threshold_db": 3.0, "ratio": 0.5, "attack_ms": 3.0, "release_ms": 25.0}
    seeds = [feasible[0]]
    multi = next(
        (e for e in feasible
         if any(abs(e[2][k] - incumbent[k]) > 1e-6
                for k in ("ratio", "attack_ms", "release_ms"))),
        None,
    )
    if multi is not None and key_for(multi[2]) != key_for(seeds[0][2]):
        seeds.append(multi)
    else:
        seeds.extend(feasible[1:2])
    wave2 = []
    for _, _, seed in seeds:
        for k, step in steps.items():
            for d in (-1.0, 1.0):
                c = dict(seed)
                c[k] += d * step
                wave2.append(c)
    batch_evaluate(wave2)

    feasible = sorted(
        (e for e in evaluated.values() if np.isfinite(e[0])),
        key=lambda e: (e[0], key_for(e[2])),
    )
    threshold_only = min(
        (e for e in feasible
         if all(abs(e[2][k] - incumbent[k]) <= 1e-6
                for k in ("ratio", "attack_ms", "release_ms"))),
        key=lambda e: (e[0], key_for(e[2])),
        default=None,
    )
    expanded = feasible[0]
    if threshold_only is None:
        expanded_selected = True
        best_score, best_sim, best_vals = expanded
    else:
        tie_break = max(0.001, 0.01 * threshold_only[0])
        expanded_selected = bool(threshold_only[0] - expanded[0] > tie_break)
        best_score, best_sim, best_vals = expanded if expanded_selected else threshold_only
    calibrated.update(best_vals)

    # winner verification render
    verify = simulate_candidate_chain(
        speech, sample_rate, eq_settings,
        {
            "deesser": deesser_settings,
            "compressor": {
                **calibrated,
                **({"auto_makeup_enabled": False, "makeup_gain_db": 0.0}
                   if calibrated.get("auto_makeup_enabled", False) else {}),
            },
            "limiter": {"enabled": True, "ceiling_db": -1.5, "release_ms": 80.0,
                        "careful_output_enabled": True},
        },
    )
    if verify.get("simulation_backend") == "native":
        best_sim = verify
    median = float(best_sim["compressor_gain_reduction_median_db"])
    p95 = float(best_sim["compressor_gain_reduction_p95_db"])
    peak = float(best_sim["compressor_gain_reduction_db"])
    thr_scores = [
        s for s, _, v in evaluated.values()
        if all(abs(v[k] - incumbent[k]) <= 1e-6 for k in ("ratio", "attack_ms", "release_ms"))
    ]
    inc_entry = evaluated.get(key_for(incumbent))
    diagnostics.update({
        "backend": "native",
        "measured_median_gain_reduction_db": median,
        "measured_p95_gain_reduction_db": p95,
        "measured_peak_gain_reduction_db": peak,
        "active_reduction_ratio": float(best_sim["compressor_gain_reduction_active_ratio"]),
        "peak_cap_passed": peak <= peak_cap_db + 1e-6,
        "total_objective": best_score,
        "incumbent_objective": inc_entry[0] if inc_entry is not None else float("inf"),
        "threshold_only_objective": min(thr_scores, default=float("inf")),
        "expanded_candidate_objective": expanded[0],
        "expanded_search_selected": expanded_selected,
        "active_output_gain_db": float(best_sim.get("active_output_gain_db", 0.0)),
        "silence_output_gain_db": float(best_sim.get("silence_output_gain_db", 0.0)),
        "compressor_pumping_score_db": float(
            best_sim.get("compressor_pumping_score_db", 0.0)
        ),
        "output_true_peak_db": float(best_sim.get("output_true_peak_db", -120.0)),
        "pre_limiter_true_peak_headroom_db": float(
            best_sim.get("pre_limiter_true_peak_headroom_db", 0.0)
        ),
        "search_runtime_ms": (time.perf_counter() - started) * 1000.0,
        "candidate_count": len(evaluated) + 1,
        "iterations": len(evaluated) + 1,
        # compatibility aliases
        "target_gain_reduction_db": target_p95_db,
        "measured_gain_reduction_db": p95,
        "threshold_db": calibrated["threshold_db"],
        "ratio": calibrated["ratio"],
        "attack_ms": calibrated["attack_ms"],
        "release_ms": calibrated["release_ms"],
    })
    return calibrated, diagnostics


def analyze_voice_setup(
    noise_audio, speech_audio, sample_rate, target_preset="broadcast", *,
    vad_available=True, dynamics_intensity="balanced", custom_target_p95_db=3.5,
    custom_peak_cap_db=8.0, noise_metadata=None, speech_metadata=None,
    mesh=None,
):
    """Full Auto Voice Setup (`voice_setup.py:1082-1444`).

    ``mesh``: optional :class:`jax.sharding.Mesh`; shards the candidate
    axis of the compressor search over a fleet
    (:mod:`audioforge_tpu.parallel.fleet`)."""
    noise_arr = np.asarray(noise_audio, float)
    speech_arr = np.asarray(speech_audio, float)
    if noise_arr.size < int(sample_rate * NOISE_MIN_DURATION_S):
        raise ValueError("Room-noise capture was too short for setup.")
    if speech_arr.size < int(sample_rate * SPEECH_MIN_DURATION_S):
        raise ValueError("Voice capture was too short for setup.")

    noise_rms_db = _rms_db(noise_arr)
    noise_peak_db = _peak_db(noise_arr)
    speech_rms_db = _rms_db(speech_arr)
    speech_peak_db = _peak_db(speech_arr)

    vad_probabilities = noise_vad = None
    vad_backend = noise_vad_backend = "energy_fallback"
    if vad_available:
        vad_probabilities, vad_backend = analyze_offline_vad(speech_arr, sample_rate)
        noise_vad, noise_vad_backend = analyze_offline_vad(noise_arr, sample_rate)

    noise_ref = analyze_noise_reference(
        noise_arr, speech_arr, sample_rate,
        noise_metadata=noise_metadata, speech_metadata=speech_metadata,
        noise_vad_probabilities=noise_vad, speech_vad_probabilities=vad_probabilities,
    )
    conservative = (noise_ref.frequencies, noise_ref.conservative_spectrum_db)
    cons_rms = noise_ref.conservative_noise_rms_db

    features = _vad_masked_speech_features(
        speech_arr, sample_rate, cons_rms,
        vad_probabilities=vad_probabilities, noise_audio=noise_arr,
    )
    frame_rms = np.asarray(features["frame_db"], float)
    active_frames = frame_rms[np.asarray(features["active_frame_mask"], bool)]
    if active_frames.size < 6:
        active_frames = frame_rms
    speech_floor_db = float(np.percentile(active_frames, 20.0))
    speech_body_db = float(np.percentile(active_frames, 60.0))
    frame_peak_db = float(np.percentile(active_frames, 95.0))
    frame_dr_db = max(0.0, frame_peak_db - speech_floor_db)
    speech_dr_db = float(features["loudness_range_db"])
    speech_snr_db = speech_body_db - cons_rms

    spectrum_result = analyze_voice_spectrum(
        speech_arr, sample_rate,
        vad_probabilities=vad_probabilities, noise_audio=noise_arr,
        noise_spectrum_override=conservative,
        noise_reference_source_override="validated_conservative",
    )
    smoothed = smooth_spectrum_perceptual(
        spectrum_result.freqs, spectrum_result.median_spectrum_db
    )
    spectral_conf = float(spectrum_result.residual_confidence)
    nr_snr_db = float(spectrum_result.snr_db)
    snr_conf = _clamp((nr_snr_db - 6.0) / 12.0, 0, 1)
    dur_conf = _clamp(float(features["active_duration_s"]) / 3.0, 0, 1)
    loud_conf = _clamp(float(features["loudness_window_count"]) / 8.0, 0, 1)
    capture_confidence = _quality([
        (spectral_conf, 0.30), (snr_conf, 0.22), (noise_ref.quality_score, 0.23),
        (dur_conf, 0.17), (loud_conf, 0.08),
    ])
    if nr_snr_db < 6.0:
        capture_confidence = min(capture_confidence, 0.40)
    if float(features["active_duration_s"]) < 2.0:
        capture_confidence = min(capture_confidence, 0.45)
    if spectrum_result.used_single_spectrum_fallback:
        capture_confidence = min(capture_confidence, 0.40)
    if noise_ref.status == "questionable":
        capture_confidence = min(capture_confidence, 0.49)
    elif noise_ref.status == "invalid":
        capture_confidence = min(capture_confidence, 0.20)

    gate_settings = _recommend_gate(
        vad_available=vad_available, noise_rms_db=cons_rms,
        speech_floor_db=speech_floor_db, speech_body_db=speech_body_db,
        speech_snr_db=speech_snr_db, speech_dynamic_range_db=speech_dr_db,
    )
    deesser_settings, deesser_diag = _recommend_deesser(
        freqs=spectrum_result.freqs, spectrum_db=smoothed,
        capture_confidence=capture_confidence,
        noise_reference_quality=noise_ref.quality_score,
        noise_reference_status=noise_ref.status,
        robust_sibilance_excess_db=float(features["sibilance_excess_db"]),
        frame_evidence=features["deesser_frame_evidence"],
    )
    compressor_settings, comp_diag = _recommend_compressor(
        target_preset=target_preset, speech_body_db=speech_body_db,
        speech_loudness_lufs=float(features["short_term_lufs"]),
        loudness_range_db=speech_dr_db, speech_snr_db=speech_snr_db,
        capture_confidence=capture_confidence,
        dynamics_intensity=dynamics_intensity,
        custom_target_p95_db=custom_target_p95_db,
        custom_peak_cap_db=custom_peak_cap_db,
    )
    compressor_settings["noise_reference_reliability"] = float(
        np.clip(noise_ref.quality_score, 0.0, 1.0)
    )

    eq_settings = None
    eq_error = None
    try:
        eq_settings, _validation = analyze_auto_eq(
            speech_arr, sample_rate, target_preset,
            vad_probabilities=vad_probabilities, noise_audio=noise_arr,
            noise_spectrum_override=conservative,
            noise_reference_quality=noise_ref.quality_score,
            noise_reference_status=noise_ref.status,
            noise_reference_reasons=noise_ref.reasons,
        )
    except Exception as exc:
        eq_error = str(exc)

    comp_calibration: dict[str, Any] = {
        "backend": "unavailable",
        "target_gain_reduction_db": 0.0,
        "measured_gain_reduction_db": 0.0,
        "iterations": 0,
    }
    if eq_settings is not None:
        compressor_settings, comp_calibration = _calibrate_compressor(
            speech_audio=speech_arr, sample_rate=sample_rate,
            eq_settings=eq_settings, deesser_settings=deesser_settings,
            compressor_settings=compressor_settings,
            target_p95_db=float(comp_diag["target_p95_reduction_db"]),
            target_median_db=float(comp_diag["target_median_reduction_db"]),
            peak_cap_db=float(comp_diag["peak_reduction_cap_db"]),
            mesh=mesh,
        )

    dynamics_conf = _clamp(speech_dr_db / 8.0, 0, 1)
    quiet_conf = _clamp((-32.0 - cons_rms) / 18.0, 0, 1)
    eq_conf = (
        float(eq_settings.get("analysis_confidence", capture_confidence))
        if eq_settings else capture_confidence
    )
    gate_conf = float(np.clip(0.55 * capture_confidence + 0.45 * snr_conf, 0, 1))
    deesser_conf = _quality([
        (capture_confidence, 0.55),
        (float(deesser_diag["frame_evidence_confidence"]), 0.45),
    ])
    comp_conf = float(np.clip(0.55 * capture_confidence + 0.45 * dynamics_conf, 0, 1))
    setup_confidence = _quality([
        (eq_conf, 0.35),
        (gate_conf, 0.25),
        (
            max(deesser_conf, 0.50) if not deesser_diag["enabled"] else deesser_conf,
            0.15,
        ),
        (comp_conf, 0.15),
        (quiet_conf, 0.10),
    ])

    sim_eq = eq_settings or {
        "band_freqs": list(EQ_FREQUENCIES),
        "band_gains": [0.0] * len(EQ_FREQUENCIES),
        "band_qs": [1.41] * len(EQ_FREQUENCIES),
    }
    offline_validation = None
    offline_ok = False
    try:
        offline_validation = simulate_candidate_chain(
            speech_arr.astype(np.float32), sample_rate, sim_eq,
            {
                "deesser": deesser_settings,
                "compressor": compressor_settings,
                "limiter": {"enabled": True, "ceiling_db": -1.5, "release_ms": 80.0,
                            "careful_output_enabled": True},
            },
        )
        otp = float(offline_validation.get("output_true_peak_db", 120.0))
        ceil = float(offline_validation.get("limiter_effective_ceiling_db", -1.5))
        cgr = float(offline_validation.get("compressor_gain_reduction_db", 120.0))
        cp95 = float(offline_validation.get("compressor_gain_reduction_p95_db", cgr))
        dgr = float(offline_validation.get("deesser_gain_reduction_db", 120.0))
        offline_ok = bool(
            np.isfinite([otp, cgr, dgr]).all()
            and otp <= ceil + 0.15
            and cgr <= float(comp_diag["peak_reduction_cap_db"]) + 0.25
            and cp95 <= float(comp_diag["target_p95_reduction_db"]) + 1.25
            and dgr <= 10.0
        )
    except Exception as exc:
        offline_validation = {"error": str(exc), "simulation_backend": "unavailable"}

    uncertainty: list[str] = list(noise_ref.reasons)
    if float(features["active_duration_s"]) < 2.0:
        uncertainty.append("too little VAD-active speech")
    if nr_snr_db < 8.0:
        uncertainty.append("speech-to-noise ratio is weak")
    if capture_confidence < 0.50:
        uncertainty.append("spectral feature stability is weak")
    if not offline_ok:
        uncertainty.append("offline DSP validation did not pass")
    if offline_validation and offline_validation.get("simulation_backend") != "native":
        uncertainty.append("offline DSP validation is advisory without the native chain")
        setup_confidence *= 0.90
    weak_capture = bool(
        float(features["active_duration_s"]) < 2.0
        or nr_snr_db < 8.0
        or capture_confidence < 0.50
        or noise_ref.status != "usable"
    )
    eq_apply = bool(eq_settings is not None and eq_settings.get("apply_recommended", True))
    if not eq_apply:
        uncertainty.append("Auto-EQ abstained from this capture")
    apply_recommended = bool(not weak_capture and eq_apply and offline_ok)
    if weak_capture:
        setup_confidence = min(setup_confidence, 0.49)
    setup_confidence = float(np.clip(setup_confidence, 0.0, 1.0))

    return {
        "eq_settings": eq_settings,
        "eq_error": eq_error,
        "gate_settings": gate_settings,
        "deesser_settings": deesser_settings,
        "compressor_settings": compressor_settings,
        "diagnostics": {
            "setup_confidence": setup_confidence,
            "recommendation_uncertainty": 1.0 - setup_confidence,
            "confidence_semantics": "bounded_quality_score",
            "uncertainty_reasons": uncertainty,
            "weak_capture": weak_capture,
            "apply_recommended": apply_recommended,
            "capture_confidence": capture_confidence,
            "eq_confidence": eq_conf,
            "gate_confidence": gate_conf,
            "deesser_confidence": deesser_conf,
            "compressor_confidence": comp_conf,
            "noise_rms_db": noise_rms_db,
            "conservative_noise_rms_db": cons_rms,
            "noise_reference_quality": noise_ref.diagnostics(),
            "noise_peak_db": noise_peak_db,
            "speech_rms_db": speech_rms_db,
            "speech_peak_db": speech_peak_db,
            "speech_floor_db": speech_floor_db,
            "speech_body_db": speech_body_db,
            "speech_dynamic_range_db": speech_dr_db,
            "speech_frame_dynamic_range_db": frame_dr_db,
            "speech_snr_db": speech_snr_db,
            "noise_referenced_snr_db": nr_snr_db,
            "noise_reference_source": spectrum_result.noise_reference_source,
            "vad_active_duration_s": features["active_duration_s"],
            "vad_active_ratio": features["active_ratio"],
            "short_term_lufs": features["short_term_lufs"],
            "short_term_loudness_window_count": features["short_term_window_count"],
            "momentary_lufs": features["momentary_lufs"],
            "active_loudness_spread_db": features["active_loudness_spread_db"],
            "loudness_range_db": features["loudness_range_db"],
            "robust_band_energy_db": features["band_energy_db"],
            "gate_mode_label": GATE_MODE_LABELS[gate_settings["gate_mode"]],
            "sibilance_excess_db": deesser_diag["sibilance_excess_db"],
            "sibilance_peak_hz": deesser_diag["peak_hz"],
            "deesser_enabled": deesser_diag["enabled"],
            "deesser_detection_probability": deesser_diag["detection_probability"],
            "deesser_enable_probability_threshold": deesser_diag[
                "enable_probability_threshold"
            ],
            "deesser_model_version": deesser_diag["model_version"],
            "deesser_clip_features": deesser_diag["clip_features"],
            "deesser_frame_evidence_confidence": deesser_diag[
                "frame_evidence_confidence"
            ],
            "deesser_temporal_contrast_db": deesser_diag["temporal_contrast_db"],
            "deesser_candidate_frame_ratio": deesser_diag["candidate_frame_ratio"],
            "deesser_candidate_snr_db": deesser_diag["candidate_snr_db"],
            "compressor_auto_makeup_enabled": comp_diag["auto_makeup_enabled"],
            "compressor_target_lufs": comp_diag["target_lufs"],
            "dynamics_intensity": comp_diag["dynamics_intensity"],
            "compressor_calibration": comp_calibration,
            "vad_available": bool(vad_available),
            "vad_analysis_backend": vad_backend,
            "noise_vad_analysis_backend": noise_vad_backend,
            "vad_probability_used": bool(features["vad_probability_used"]),
            "vad_active_frame_ratio": float(features["vad_active_frame_ratio"]),
            "offline_validation_passed": offline_ok,
            "offline_validation": offline_validation,
        },
    }


def _shape_error_db(freqs, measured_db, target_preset):
    """Level-invariant voice-band error vs the house curve
    (`voice_setup.py:1446-1466`)."""
    mask = (freqs >= 80.0) & (freqs <= 12000.0)
    if np.count_nonzero(mask) < 8:
        return float("inf")
    m = np.asarray(measured_db, float)[mask]
    f = np.asarray(freqs, float)[mask]
    t = np.asarray(get_target_curve(f, target_preset, m, target_mode="adaptive"))
    m = m - float(np.median(m))
    t = t - float(np.median(t))
    return float(np.sqrt(np.mean(np.square(m - t))))


def validate_voice_setup_verification(noise_audio, original_speech_audio,
                                      verification_speech_audio, sample_rate,
                                      setup_result, target_preset):
    """Second-passage verification: accept / reduce / retry / rollback
    (`voice_setup.py:1468-1668`)."""
    noise = np.asarray(noise_audio, np.float32)
    original = np.asarray(original_speech_audio, np.float32)
    verification = np.asarray(verification_speech_audio, np.float32)
    if verification.size < int(sample_rate * SPEECH_MIN_DURATION_S):
        return {"decision": "retry",
                "reasons": ["verification passage was too short"],
                "perceptual_validation": False}
    if not np.isfinite(verification).all() or float(np.max(np.abs(verification))) >= 0.999:
        return {"decision": "retry",
                "reasons": ["verification passage was non-finite or clipped"],
                "perceptual_validation": False}

    eq_settings = dict(setup_result.get("eq_settings") or {}) or {
        "band_freqs": list(EQ_FREQUENCIES),
        "band_gains": [0.0] * len(EQ_FREQUENCIES),
        "band_qs": [1.41] * len(EQ_FREQUENCIES),
    }
    chain = {
        "deesser": dict(setup_result.get("deesser_settings") or {}),
        "compressor": dict(setup_result.get("compressor_settings") or {}),
        "limiter": {"enabled": True, "ceiling_db": -1.5, "release_ms": 80.0,
                    "careful_output_enabled": True},
        "return_output_audio": True,
    }
    processed = simulate_candidate_chain(verification, sample_rate, eq_settings, chain)
    processed_noise = simulate_candidate_chain(noise, sample_rate, eq_settings, chain)
    if (processed.get("simulation_backend") != "native"
            or "output_audio" not in processed
            or "output_audio" not in processed_noise):
        return {"decision": "retry",
                "reasons": ["native verification renderer is unavailable"],
                "simulation_backend": processed.get("simulation_backend", "unavailable"),
                "perceptual_validation": False}

    rendered = np.asarray(processed.pop("output_audio"), np.float32)
    rendered_noise = np.asarray(processed_noise.pop("output_audio"), np.float32)
    original_spec = analyze_voice_spectrum(original, sample_rate)
    before_spec = analyze_voice_spectrum(verification, sample_rate, noise_audio=noise)
    after_spec = analyze_voice_spectrum(rendered, sample_rate, noise_audio=rendered_noise)
    before_err = _shape_error_db(before_spec.freqs, before_spec.median_spectrum_db,
                                 target_preset)
    after_err = _shape_error_db(after_spec.freqs, after_spec.median_spectrum_db,
                                target_preset)
    original_shape = np.interp(before_spec.freqs, original_spec.freqs,
                               original_spec.median_spectrum_db)
    rmask = (before_spec.freqs >= 80.0) & (before_spec.freqs <= 12000.0)
    delta = before_spec.median_spectrum_db[rmask] - original_shape[rmask]
    delta -= float(np.median(delta))
    shape_delta = float(np.sqrt(np.mean(np.square(delta))))

    before_features = _vad_masked_speech_features(
        verification, sample_rate, _rms_db(noise), noise_audio=noise
    )
    after_features = _vad_masked_speech_features(
        rendered, sample_rate, _rms_db(rendered_noise), noise_audio=rendered_noise
    )
    comp = setup_result.get("compressor_settings") or {}
    target_p95 = float(comp.get("target_p95_reduction_db", 3.5))
    peak_cap = float(comp.get("peak_reduction_cap_db", 8.0))
    measured_p95 = float(processed.get("compressor_gain_reduction_p95_db", 120.0))
    measured_peak = float(processed.get("compressor_gain_reduction_db", 120.0))
    otp = float(processed.get("output_true_peak_db", 120.0))
    ceiling = float(processed.get("limiter_effective_ceiling_db", -1.5))
    limiter_events = int(processed.get("true_peak_limited_events", 0))
    noise_change = _rms_db(rendered_noise) - _rms_db(noise)
    speech_gain = float(processed.get("output_rms_db", _rms_db(rendered))) - float(
        processed.get("input_rms_db", _rms_db(verification))
    )
    rel_noise = noise_change - speech_gain
    snr_change = float(after_spec.snr_db - before_spec.snr_db)

    reasons: list[str] = []
    if abs(_rms_db(verification) - _rms_db(original)) > 8.0 or shape_delta > 5.0:
        decision = "retry"
        reasons.append("verification delivery differs too much from the setup passage")
    elif (after_err > before_err + 1.0 or rel_noise > 4.0 or snr_change < -4.0
          or measured_peak > peak_cap + 0.25 or otp > ceiling + 0.15):
        decision = "rollback"
        reasons.append("candidate chain worsened the target or exceeded a safety limit")
    elif (measured_p95 > target_p95 + 0.75 or limiter_events > 0 or rel_noise > 3.0
          or float(processed.get("deesser_gain_reduction_p95_db", 0.0))
          > float((setup_result.get("deesser_settings") or {}).get("max_reduction_db", 6.0)) * 0.9):
        decision = "reduce"
        reasons.append("processing is safe but stronger than the selected intensity")
    else:
        decision = "accept"
        reasons.append("repeatability and native-chain constraints passed")

    snr_bands = {}
    if after_spec.spectral_snr_db is not None:
        for name, lo, hi in (("low", 80.0, 250.0), ("body", 250.0, 1000.0),
                             ("presence", 1000.0, 4500.0), ("sibilance", 4500.0, 10000.0)):
            m = (after_spec.freqs >= lo) & (after_spec.freqs < hi)
            if np.any(m):
                snr_bands[name] = float(np.median(after_spec.spectral_snr_db[m]))

    return {
        "decision": decision,
        "reasons": reasons,
        "perceptual_validation": False,
        "evidence_scope": "repeatability_and_exact_native_chain_constraints",
        "spectral_target_error_before_db": before_err,
        "spectral_target_error_after_db": after_err,
        "frequency_dependent_snr_db": snr_bands,
        "loudness_variation_before_db": float(before_features["active_loudness_spread_db"]),
        "loudness_variation_after_db": float(after_features["active_loudness_spread_db"]),
        "noise_floor_change_db": noise_change,
        "relative_noise_floor_change_db": rel_noise,
        "snr_change_db": snr_change,
        "compressor_gain_reduction_median_db": float(
            processed.get("compressor_gain_reduction_median_db", 0.0)
        ),
        "compressor_gain_reduction_p95_db": measured_p95,
        "compressor_gain_reduction_peak_db": measured_peak,
        "deesser_gain_reduction_median_db": float(
            processed.get("deesser_gain_reduction_median_db", 0.0)
        ),
        "deesser_gain_reduction_p95_db": float(
            processed.get("deesser_gain_reduction_p95_db", 0.0)
        ),
        "output_true_peak_db": otp,
        "limiter_activity_events": limiter_events,
        "clipped": bool(np.max(np.abs(rendered)) >= 1.0),
        "simulation_backend": processed.get("simulation_backend"),
    }
