"""Downward compressor with blended detection and speech-aware auto makeup.

Behavioural contract mirrors `rust-core/src/dsp/compressor.rs`:

- Blended detector: 0.6*peak + 0.4*RMS in the linear domain
  (`compressor.rs:7-8,690-696`), peak envelope AR-smoothed in dB, RMS with a
  fixed 20 ms one-pole.
- Soft knee: quadratic transition across ``knee_db`` (`compressor.rs:666-688`).
- Adaptive release: fast (50 ms) + slow (charge 250 ms / release 400 ms)
  envelopes, slow path triggered above 3 dB GR, release time morphs
  50 -> 400 ms through a syllabic score (`compressor.rs:9-12,462-515`).
- Speech-aware auto makeup at block cadence: EBU momentary LUFS toward a
  target, speech activity fused from RMS window -55..-6 dBFS, VAD
  probability/reliability and noise-floor-relative smoothstep (+3..+15 dB
  over floor), reliability caps, 1.5 s silence relax, headroom cap fed back
  from the limiter GR x2 (`compressor.rs:13-20,517-663`).
- Sidechain high-pass 120 Hz one-pole plus 3-band plosive discrimination:
  low/voiced ratio 1.25 -> 5.0 maps the detector weight down to a 0.35 floor
  (`compressor.rs:21-25,399-460`).

TPU-native design: the per-sample recurrences (sidechain, envelopes,
adaptive release, GR smoothing) run as ONE fused ``lax.scan``; the
auto-makeup controller is pure block-level math; the loudness meter is the
block-cadence K-weighted ring from :mod:`.loudness`. Batch axes vectorise —
this scan is the core of the vmapped 68-candidate compressor search
(`voice_setup.py:699-1080`).
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from . import loudness, util
from . import scan as scan_ops

__all__ = [
    "CompressorConfig",
    "compressor_params",
    "compressor_init",
    "compressor_reset",
    "compressor_process",
]

DETECTOR_PEAK_WEIGHT = 0.6
DETECTOR_RMS_WEIGHT = 0.4
ADAPTIVE_FAST_RELEASE_MS = 50.0
ADAPTIVE_SLOW_CHARGE_MS = 250.0
ADAPTIVE_SLOW_RELEASE_MS = 400.0
SLOW_RELEASE_TRIGGER_DB = 3.0
SPEECH_ACTIVE_RMS_MIN_DB = -55.0
SPEECH_ACTIVE_RMS_MAX_DB = -6.0
AUTO_MAKEUP_ACTIVE_MIN = 0.20
AUTO_MAKEUP_RELIABILITY_MIN = 0.35
AUTO_MAKEUP_ACTIVITY_SMOOTH_MS = 200.0
NOISE_RELATIVE_ACTIVITY_START_DB = 3.0
NOISE_RELATIVE_ACTIVITY_FULL_DB = 15.0
MAKEUP_SILENCE_RELAX_MS = 1500.0
# The smoothed activity score must stay below AUTO_MAKEUP_ACTIVE_MIN for
# this long before the silence-relax branch engages; during shorter dips
# the makeup gain is held. The reference relaxes immediately
# (`compressor.rs:635-639`), which is fine for its real-narration
# posteriors (sustained near 1.0 through utterances), but with
# syllable-resolved posteriors the score crosses the threshold at the
# 2-8 Hz speech cadence and immediate relax/re-track flapping puts the
# makeup trace's energy exactly in the pumping band — the r4 evaluation
# measured the candidate WORSE than the RMS-only fallback (0.1185 vs
# 0.0712 median pumping). The hold removes the flapping while leaving
# genuine pauses (>= hold) relaxing exactly as the reference does; this
# is the same hold-before-act pattern (and the same 700 ms constant) the
# reference's own gate uses for its VAD auto-relax (`gate.rs:22-32`).
MAKEUP_SILENCE_HOLD_MS = 700.0
# Slew-rate limit on the AUTO makeup gain (dB per second). A leveler
# should move over seconds; the reference's 200 ms one-pole alone admits
# ~0.6 dB/block slews, and with a VAD-gated loudness meter the active
# branch's target flickers at speech cadence, putting candidate trace
# energy exactly in the 2-8 Hz pumping band (r4 evaluation: candidate
# worse than the RMS fallback). 6 dB/s clips that ripple to < 0.25 dB at
# 4 Hz while leaving the fallback's slow (<0.5 Hz) loudness
# convergence untouched; an 8 dB step converges in ~2.7 s. Applied only
# in the auto-makeup branch — the manual-makeup path keeps exact
# reference smoothing semantics (`compressor.rs:615-627`).
MAKEUP_MAX_SLEW_DB_PER_S = 3.0
# The loudness the auto-makeup targets is additionally smoothed over this
# window. The momentary meter only advances on activity-gated blocks, so
# with VAD gating its readout flickers at speech cadence (the gate opens
# and closes per syllable); targeting the raw readout re-injects 2-8 Hz
# energy that the slew limit then has to fight. The reference targets the
# raw momentary loudness (`compressor.rs:630,646`) — acceptable with its
# continuously-fed meter, pumping-prone with a gated one.
MAKEUP_LUFS_SMOOTH_MS = 600.0
SIDECHAIN_HIGHPASS_DEFAULT_HZ = 120.0
SIDECHAIN_BAND_ENV_MS = 18.0
PLOSIVE_RATIO_START = 1.25
PLOSIVE_RATIO_FULL = 5.0
PLOSIVE_MIN_DETECTOR_GAIN = 0.35


@dataclass(frozen=True)
class CompressorConfig:
    """Static structure flags (changing these re-specialises the step)."""

    sample_rate: float = 48000.0
    enabled: bool = True
    adaptive_release: bool = False
    auto_makeup_enabled: bool = False
    sidechain_highpass_enabled: bool = False
    block_samples: int = 480


def _coeff(ms: float, fs: float) -> float:
    return util.time_constant_to_coeff(ms / 1000.0, fs)


def compressor_params(
    config: CompressorConfig,
    threshold_db: float = -20.0,
    ratio: float = 4.0,
    attack_ms: float = 10.0,
    release_ms: float = 200.0,
    makeup_gain_db: float = 0.0,
    knee_db: float = 0.0,
    target_lufs: float = -18.0,
    noise_reference_reliability: float = 0.0,
    sidechain_highpass_hz: float = SIDECHAIN_HIGHPASS_DEFAULT_HZ,
    detector_release_ms: float | None = None,
):
    """Traced numeric parameters (control changes never recompile).

    ``detector_release_ms``: the peak-detector release is pinned at
    construction time in the reference (`compressor.rs:155` sets
    ``detector_release_coeff`` from the constructor's release and no setter
    updates it); defaults to ``release_ms``.
    """
    fs = config.sample_rate
    cutoff = min(max(sidechain_highpass_hz, 20.0), fs * 0.45)
    omega = 2.0 * np.pi * cutoff / max(fs, 1.0)
    det_rel = release_ms if detector_release_ms is None else detector_release_ms
    return {
        "threshold_db": jnp.float32(threshold_db),
        "ratio": jnp.float32(max(ratio, 1.0)),
        "attack_coeff": jnp.float32(_coeff(attack_ms, fs)),
        "detector_release_coeff": jnp.float32(_coeff(det_rel, fs)),
        "base_release_ms": jnp.float32(release_ms),
        "makeup_gain_db": jnp.float32(makeup_gain_db),
        "knee_db": jnp.float32(max(knee_db, 0.0)),
        "target_lufs": jnp.float32(target_lufs),
        "noise_reference_reliability": jnp.float32(noise_reference_reliability),
        "sidechain_hp_coeff": jnp.float32(1.0 / (1.0 + omega)),
    }


def compressor_init(config: CompressorConfig, params=None, batch_shape=()):
    f = lambda v: jnp.full(batch_shape, v, jnp.float32)
    state = {
        "peak_envelope_db": f(-120.0),
        "rms_envelope_sq": f(0.0),
        "current_gr_db": f(0.0),
        "fast_release_env_db": f(0.0),
        "slow_release_env_db": f(0.0),
        "current_release_ms": f(200.0),
        "sc_prev_in": f(0.0),
        "sc_prev_out": f(0.0),
        "low_band_env_sq": f(0.0),
        "voiced_band_env_sq": f(0.0),
        "presence_band_env_sq": f(0.0),
        "plosive_ratio": f(0.0),
        "smoothed_makeup_gain": f(0.0),
        "speech_activity_score": f(0.0),
        "activity_reliability": f(0.0),
        "silence_run_ms": f(0.0),
        "makeup_lufs_smoothed": f(-100.0),
        "current_lufs": f(-100.0),
        "limiter_feedback_gr_db": f(0.0),
        "meter": loudness.meter_init(
            config.sample_rate, config.block_samples, batch_shape
        ),
    }
    if params is not None:
        state["current_release_ms"] = jnp.broadcast_to(
            params["base_release_ms"], batch_shape
        ).astype(jnp.float32)
        # `compressor.rs:174` — smoothed makeup starts at the manual value
        state["smoothed_makeup_gain"] = jnp.broadcast_to(
            params["makeup_gain_db"], batch_shape
        ).astype(jnp.float32)
    return state


def compressor_reset(config: CompressorConfig, state, params):
    """`compressor.rs:786-808`."""
    return compressor_init(config, params, state["current_gr_db"].shape)


def _smoothstep(edge0, edge1, value):
    """`compressor.rs:530-537` (degenerate edges -> 0)."""
    span = edge1 - edge0
    t = jnp.clip((value - edge0) / jnp.where(span <= 0, 1.0, span), 0.0, 1.0)
    return jnp.where(span <= 0, 0.0, t * t * (3.0 - 2.0 * t))


def _speech_activity_from_rms_db(rms_db):
    """`compressor.rs:517-528`."""
    onset = jnp.clip((rms_db - SPEECH_ACTIVE_RMS_MIN_DB) / 12.0, 0.0, 1.0)
    overload = jnp.clip((SPEECH_ACTIVE_RMS_MAX_DB - rms_db) / 6.0, 0.0, 1.0)
    inside = (rms_db >= SPEECH_ACTIVE_RMS_MIN_DB) & (rms_db <= SPEECH_ACTIVE_RMS_MAX_DB)
    return jnp.where(inside, jnp.minimum(onset, overload), 0.0)


def _finite_unit(v):
    return jnp.where(jnp.isfinite(v), jnp.clip(v, 0.0, 1.0), 0.0)


def _estimate_activity(params, rms_db, evidence):
    """`compressor.rs:539-592`. ``evidence`` is None or a dict with keys
    vad_probability, vad_reliability, noise_floor_db, live_noise_reliability
    (each broadcastable to the batch shape)."""
    absolute = _speech_activity_from_rms_db(rms_db)
    if evidence is None:
        return absolute, jnp.ones_like(absolute)

    vad_prob_raw = jnp.asarray(evidence["vad_probability"], jnp.float32)
    vad_rel = _finite_unit(jnp.asarray(evidence["vad_reliability"], jnp.float32))
    vad_rel = jnp.where(jnp.isfinite(vad_prob_raw), vad_rel, 0.0)
    vad_prob = _finite_unit(vad_prob_raw)
    configured = _finite_unit(params["noise_reference_reliability"])
    live = _finite_unit(jnp.asarray(evidence["live_noise_reliability"], jnp.float32))
    noise_rel = jnp.where(configured > 0.0, jnp.minimum(live, configured), live)
    floor_db = jnp.asarray(evidence["noise_floor_db"], jnp.float32)
    floor_ok = jnp.isfinite(floor_db) & (floor_db >= -120.0) & (floor_db <= 0.0)
    relative = jnp.where(
        floor_ok,
        _smoothstep(
            floor_db + NOISE_RELATIVE_ACTIVITY_START_DB,
            floor_db + NOISE_RELATIVE_ACTIVITY_FULL_DB,
            rms_db,
        ),
        0.0,
    )
    noise_rel = jnp.where(floor_ok, noise_rel, 0.0)
    fallback = noise_rel * relative + (1.0 - noise_rel) * absolute
    activity = vad_rel * vad_prob + (1.0 - vad_rel) * fallback
    reliability = jnp.maximum(vad_rel, 0.75 * noise_rel)
    return jnp.clip(activity, 0.0, 1.0), jnp.clip(reliability, 0.0, 1.0)


def _compute_gain_reduction(params, detector_db):
    """Soft-knee static curve (`compressor.rs:666-688`)."""
    comp = 1.0 - 1.0 / params["ratio"]
    thr = params["threshold_db"]
    knee = params["knee_db"]
    hard = jnp.where(detector_db <= thr, 0.0, (detector_db - thr) * comp)
    half = knee / 2.0
    x = detector_db - (thr - half)
    soft = jnp.where(
        detector_db <= thr - half,
        0.0,
        jnp.where(
            detector_db >= thr + half,
            (detector_db - thr) * comp,
            comp * x * x / (2.0 * jnp.maximum(knee, 1e-9)),
        ),
    )
    return jnp.where(knee <= 0.0, hard, soft)


_SCAN_BLOCK_KEYS = ("meter", "smoothed_makeup_gain", "speech_activity_score",
                    "silence_run_ms", "makeup_lufs_smoothed",
                    "activity_reliability", "current_lufs",
                    "limiter_feedback_gr_db")


def make_sample_step(config: CompressorConfig, params, makeup_lin):
    """Per-sample compressor step for the stage scan or a chain-level fused
    scan. The carry is ``state`` minus the block-cadence keys
    (``_SCAN_BLOCK_KEYS``); returns ``step(s, x_t) -> (s', y_t)``."""
    fs = config.sample_rate
    rms_c = jnp.float32(_coeff(20.0, fs))
    band_c = jnp.float32(_coeff(SIDECHAIN_BAND_ENV_MS, fs))
    rel_smooth_c = jnp.float32(_coeff(100.0, fs))
    fast_c = jnp.float32(_coeff(ADAPTIVE_FAST_RELEASE_MS, fs))
    charge_c = jnp.float32(_coeff(ADAPTIVE_SLOW_CHARGE_MS, fs))
    slow_c = jnp.float32(_coeff(ADAPTIVE_SLOW_RELEASE_MS, fs))
    # Loop-invariant: the peak-detector release coefficient is pinned at
    # construction time (`compressor.rs:155`), independent of release edits.
    base_rel_c = params["detector_release_coeff"]

    def step(s, x_t):
        # ---- sidechain high-pass (`compressor.rs:417-428`)
        if config.sidechain_highpass_enabled:
            det_in = params["sidechain_hp_coeff"] * (
                s["sc_prev_out"] + x_t - s["sc_prev_in"]
            )
            sc_prev_in, sc_prev_out = x_t, det_in
            # ---- 3-band plosive metrics (`compressor.rs:430-460`)
            low_c = x_t - det_in
            voiced_c = det_in
            presence_c = 0.65 * det_in + 0.35 * (det_in - low_c)
            low_env = band_c * s["low_band_env_sq"] + (1 - band_c) * low_c * low_c
            voiced_env = band_c * s["voiced_band_env_sq"] + (1 - band_c) * voiced_c * voiced_c
            pres_env = band_c * s["presence_band_env_sq"] + (1 - band_c) * presence_c * presence_c
            low_rms = jnp.sqrt(low_env)
            voiced_rms = jnp.maximum(jnp.sqrt(voiced_env), 1e-8)
            pres_rms = jnp.sqrt(pres_env)
            plosive_ratio = jnp.clip(low_rms / voiced_rms, 0.0, 32.0)
            plosive_amount = jnp.clip(
                (plosive_ratio - PLOSIVE_RATIO_START)
                / (PLOSIVE_RATIO_FULL - PLOSIVE_RATIO_START),
                0.0,
                1.0,
            )
            penalty = 1.0 - plosive_amount * (1.0 - PLOSIVE_MIN_DETECTOR_GAIN)
            pres_ratio = jnp.clip(pres_rms / voiced_rms, 0.0, 4.0)
            pres_weight = 1.0 + 0.18 * jnp.clip(pres_ratio - 0.75, 0.0, 1.0)
            det_weight = jnp.clip(
                penalty * pres_weight, PLOSIVE_MIN_DETECTOR_GAIN, 1.15
            )
        else:
            det_in = x_t
            sc_prev_in, sc_prev_out = s["sc_prev_in"], s["sc_prev_out"]
            low_env, voiced_env, pres_env = (
                s["low_band_env_sq"], s["voiced_band_env_sq"], s["presence_band_env_sq"],
            )
            plosive_ratio = jnp.zeros_like(x_t)
            det_weight = jnp.ones_like(x_t)

        # ---- detectors (`compressor.rs:742-760`)
        inst_peak_db = util.linear_to_db(jnp.maximum(jnp.abs(det_in), 1e-10), -200.0)
        peak_c = jnp.where(inst_peak_db > s["peak_envelope_db"], params["attack_coeff"], base_rel_c)
        peak_env = peak_c * s["peak_envelope_db"] + (1 - peak_c) * inst_peak_db
        rms_env = rms_c * s["rms_envelope_sq"] + (1 - rms_c) * det_in * det_in
        # blend in the linear domain without the RMS dB round-trip:
        # 10^(20*log10(sqrt(rms))/20) == sqrt(rms); and folding det_weight
        # into the argument saves one log10 — exact same math per sample
        blended = (
            DETECTOR_PEAK_WEIGHT * jnp.power(10.0, peak_env / 20.0)
            + DETECTOR_RMS_WEIGHT * jnp.maximum(jnp.sqrt(rms_env), 1e-10)
        )
        detector_db = util.linear_to_db(
            jnp.maximum(blended, 1e-10) * jnp.maximum(det_weight, 1e-10),
            -200.0,
        )

        # ---- adaptive release meter (`compressor.rs:462-477`)
        if config.adaptive_release:
            sustained = jnp.clip(
                s["slow_release_env_db"] / (SLOW_RELEASE_TRIGGER_DB + 3.0), 0.0, 1.0
            )
            transient = jnp.clip(
                (s["fast_release_env_db"] - s["slow_release_env_db"])
                / (SLOW_RELEASE_TRIGGER_DB + 4.0),
                0.0,
                1.0,
            )
            syllabic = jnp.clip(sustained * sustained * (1.0 - 0.35 * transient), 0.0, 1.0)
            target_rel_ms = ADAPTIVE_FAST_RELEASE_MS + syllabic * (
                ADAPTIVE_SLOW_RELEASE_MS - ADAPTIVE_FAST_RELEASE_MS
            )
        else:
            target_rel_ms = params["base_release_ms"]
        diff = target_rel_ms - s["current_release_ms"]
        cur_rel_ms = jnp.where(
            jnp.abs(diff) > 1.0,
            rel_smooth_c * s["current_release_ms"] + (1 - rel_smooth_c) * target_rel_ms,
            target_rel_ms,
        )
        # exp(x) for x in [-4.2e-4, 0) (release 50..400 ms at 48 kHz):
        # the 2nd-order Taylor differs from exp by ~x^3/6 < 2e-11 — below
        # f32 resolution, so this is exact at f32 and skips a per-sample
        # transcendental
        rx = -1000.0 / (jnp.maximum(cur_rel_ms, 1e-6) * fs)
        rel_c = 1.0 + rx + 0.5 * rx * rx

        # ---- static curve + GR smoothing (`compressor.rs:479-515,773-775`)
        target_gr = _compute_gain_reduction(params, detector_db)
        if config.adaptive_release:
            attacking = target_gr > s["current_gr_db"]
            fast_env = jnp.where(
                attacking,
                params["attack_coeff"] * s["current_gr_db"]
                + (1 - params["attack_coeff"]) * target_gr,
                fast_c * s["fast_release_env_db"] + (1 - fast_c) * target_gr,
            )
            slow_env = jnp.where(
                target_gr > SLOW_RELEASE_TRIGGER_DB,
                charge_c * s["slow_release_env_db"] + (1 - charge_c) * target_gr,
                slow_c * s["slow_release_env_db"],
            )
            cur_gr = jnp.maximum(fast_env, slow_env)
        else:
            gr_c = jnp.where(target_gr > s["current_gr_db"], params["attack_coeff"], rel_c)
            cur_gr = gr_c * s["current_gr_db"] + (1 - gr_c) * target_gr
            fast_env = cur_gr
            slow_env = jnp.zeros_like(cur_gr)

        y_t = x_t * jnp.power(10.0, -cur_gr / 20.0) * makeup_lin

        new_s = dict(
            s,
            peak_envelope_db=peak_env,
            rms_envelope_sq=rms_env,
            current_gr_db=cur_gr,
            fast_release_env_db=fast_env,
            slow_release_env_db=slow_env,
            current_release_ms=cur_rel_ms,
            sc_prev_in=sc_prev_in,
            sc_prev_out=sc_prev_out,
            low_band_env_sq=low_env,
            voiced_band_env_sq=voiced_env,
            presence_band_env_sq=pres_env,
            plosive_ratio=plosive_ratio,
        )
        return new_s, y_t

    return step


def finalize_block(config, params, state, final, y, T, activity,
                   reliability, lim_fb):
    """Block-cadence epilogue shared by the stage path and fused chain scans:
    activity-gated loudness metering and the speech-aware auto-makeup
    controller (`compressor.rs:608-663`). ``final`` is the scan carry after
    the per-sample pass; ``y`` the compressed block."""
    fs = config.sample_rate
    # ---- loudness meter fed with the compressed block only when activity
    # gates pass (`compressor.rs:745-752` block path)
    meter_gate = (activity > AUTO_MAKEUP_ACTIVE_MIN) & (
        reliability >= AUTO_MAKEUP_RELIABILITY_MIN
    )
    new_meter, lufs_if_fed = loudness.meter_process(state["meter"], y)
    meter = {}
    for k, new in new_meter.items():
        old = state["meter"][k]
        if k == "coeffs":  # shared K-weighting constants, never gated
            meter[k] = old
            continue
        cond = meter_gate.reshape(
            meter_gate.shape + (1,) * (new.ndim - meter_gate.ndim)
        )
        meter[k] = jnp.where(cond, new, old)

    # ---- auto makeup control (`compressor.rs:608-663`), block cadence
    elapsed = T
    makeup_c = jnp.float32(_coeff(200.0, fs) ** elapsed)
    silence_c = jnp.float32(_coeff(MAKEUP_SILENCE_RELAX_MS, fs) ** elapsed)
    activity_c = jnp.float32(_coeff(AUTO_MAKEUP_ACTIVITY_SMOOTH_MS, fs) ** elapsed)

    smg = state["smoothed_makeup_gain"]
    if not config.auto_makeup_enabled:
        target = params["makeup_gain_db"]
        diff = target - smg
        new_smg = jnp.where(
            jnp.abs(diff) > 0.1, makeup_c * smg + (1 - makeup_c) * target, target
        )
        new_score = state["speech_activity_score"]
        new_rel = state["activity_reliability"]
        cur_lufs = state["current_lufs"]
        new_silence_run = jnp.zeros_like(state["silence_run_ms"])
        new_lufs_sm = state["makeup_lufs_smoothed"]
    else:
        # current momentary LUFS from the gated meter
        n_ring = meter["ring"].shape[-1]
        mpow = jnp.mean(meter["ring"], axis=-1)
        cur_lufs = jnp.where(
            meter["filled"] >= n_ring,
            -0.691 + 10.0 * jnp.log10(jnp.maximum(mpow, 1e-30)),
            -100.0,
        )
        new_score = activity_c * state["speech_activity_score"] + (
            1 - activity_c
        ) * jnp.clip(activity, 0.0, 1.0)
        new_rel = jnp.clip(reliability, 0.0, 1.0)

        # smoothed loudness target (see MAKEUP_LUFS_SMOOTH_MS): EMA of the
        # momentary readout, seeded by the first valid reading
        lufs_c = jnp.float32(_coeff(MAKEUP_LUFS_SMOOTH_MS, fs) ** elapsed)
        prev_lufs = state["makeup_lufs_smoothed"]
        have_reading = cur_lufs > -99.0
        have_prev = prev_lufs > -99.0
        new_lufs_sm = jnp.where(
            have_reading,
            jnp.where(have_prev,
                      lufs_c * prev_lufs + (1 - lufs_c) * cur_lufs,
                      cur_lufs),
            prev_lufs,
        )

        silence = new_score < AUTO_MAKEUP_ACTIVE_MIN
        # silence-entry hold (see MAKEUP_SILENCE_HOLD_MS): relax only once
        # the score has stayed below the threshold for the full hold;
        # during shorter dips the makeup gain is frozen instead of
        # flapping between the relax and track targets at speech cadence
        block_ms = jnp.float32(elapsed * 1000.0 / fs)
        new_silence_run = jnp.where(
            silence, state["silence_run_ms"] + block_ms, 0.0)
        silence_engaged = new_silence_run >= MAKEUP_SILENCE_HOLD_MS
        relaxed_smg = silence_c * smg + (1 - silence_c) * params["makeup_gain_db"]
        silence_smg = jnp.where(silence_engaged, relaxed_smg, smg)

        low_rel = new_rel < AUTO_MAKEUP_RELIABILITY_MIN
        cap = params["makeup_gain_db"] + 3.0 * (new_rel / AUTO_MAKEUP_RELIABILITY_MIN)
        lowrel_smg = jnp.where(smg > cap, makeup_c * smg + (1 - makeup_c) * cap, smg)

        # ``required`` is measured POST-makeup (the meter is fed the
        # compressed+made-up block), so it is the REMAINING deficit and
        # the absolute-gain target is current makeup + deficit. The
        # reference targets ``required`` directly (`compressor.rs:646`),
        # whose loop fixed point smg* = required(smg*) delivers only HALF
        # the deficit (measured r5: smg* = (target - LUFS_in + GR)/2,
        # exactly the observed 3.5 dB on a 7 dB deficit); the incremental
        # target converges speech fully to target_lufs. The reliability/
        # headroom caps still bound the TOTAL gain.
        required = params["target_lufs"] - jnp.where(
            have_prev | have_reading, new_lufs_sm, cur_lufs)
        rel_cap = jnp.clip(12.0 * new_rel, 3.0, 12.0)
        head_cap = jnp.clip(12.0 - lim_fb * 2.0, 0.0, rel_cap)
        clamped = jnp.clip(smg + required, 0.0, head_cap)
        diff = clamped - smg
        active_smg = jnp.where(
            jnp.abs(diff) > 0.1, makeup_c * smg + (1 - makeup_c) * clamped, clamped
        )
        new_smg = jnp.where(silence, silence_smg, jnp.where(low_rel, lowrel_smg, active_smg))
        max_slew = jnp.float32(MAKEUP_MAX_SLEW_DB_PER_S * elapsed / fs)
        new_smg = jnp.clip(new_smg, smg - max_slew, smg + max_slew)

    new_state = dict(
        final,
        meter=meter,
        smoothed_makeup_gain=new_smg,
        speech_activity_score=new_score,
        activity_reliability=new_rel,
        silence_run_ms=new_silence_run,
        makeup_lufs_smoothed=new_lufs_sm,
        current_lufs=cur_lufs,
        limiter_feedback_gr_db=lim_fb,
    )
    metrics = {
        "gain_reduction_db": final["current_gr_db"],
        "makeup_gain_db": new_smg,
        "lufs": cur_lufs,
        "activity": activity,
        "reliability": reliability,
        "plosive_ratio": final["plosive_ratio"],
    }
    return new_state, metrics

@partial(jax.jit, static_argnames=("config", "has_evidence"))
def _compressor_block(config, params, state, x, evidence, limiter_feedback_db,
                      has_evidence):
    fs = config.sample_rate
    T = x.shape[-1]

    lim_fb = jnp.broadcast_to(
        jnp.clip(jnp.asarray(limiter_feedback_db, jnp.float32), 0.0, 24.0),
        state["limiter_feedback_gr_db"].shape,
    )

    # ---- block-level activity estimate on the INPUT block
    power = jnp.mean(x * x, axis=-1)
    block_rms_db = util.linear_to_db(jnp.maximum(jnp.sqrt(power), 1e-10), -200.0)
    activity, reliability = _estimate_activity(
        params, block_rms_db, evidence if has_evidence else None
    )

    makeup_db = state["smoothed_makeup_gain"]
    makeup_lin = jnp.power(10.0, makeup_db / 20.0)
    step = make_sample_step(config, params, makeup_lin)

    xt = jnp.moveaxis(x, -1, 0)

    scan_state = {k: v for k, v in state.items()
                  if k not in _SCAN_BLOCK_KEYS}
    final, yt = jax.lax.scan(step, scan_state, xt,
                             unroll=scan_ops.seq_unroll())
    y = jnp.moveaxis(yt, 0, -1)

    new_state, metrics = finalize_block(
        config, params, state, final, y, T, activity, reliability, lim_fb
    )
    return new_state, y, metrics


def compressor_process(config, params, state, x, evidence=None, limiter_feedback_db=0.0):
    """Compress a block ``x: [..., T]``. Returns ``(new_state, y, metrics)``.

    ``evidence`` (optional dict) carries the non-realtime VAD/noise inputs of
    `AutoMakeupActivityInput` (`compressor.rs:31-37`); ``limiter_feedback_db``
    is the previous block's limiter GR (`compressor.rs:393-397`).
    """
    if not config.enabled:
        new_state = dict(state, current_gr_db=jnp.zeros_like(state["current_gr_db"]))
        metrics = {
            "gain_reduction_db": new_state["current_gr_db"],
            "makeup_gain_db": state["smoothed_makeup_gain"],
            "lufs": state["current_lufs"],
            "activity": jnp.zeros_like(state["current_gr_db"]),
            "reliability": jnp.zeros_like(state["current_gr_db"]),
            "plosive_ratio": state["plosive_ratio"],
        }
        return new_state, x, metrics
    if evidence is None:
        evidence = {
            "vad_probability": jnp.float32(0.0),
            "vad_reliability": jnp.float32(0.0),
            "noise_floor_db": jnp.float32(jnp.nan),
            "live_noise_reliability": jnp.float32(0.0),
        }
        has_evidence = False
    else:
        has_evidence = True
    return _compressor_block(
        config, params, state, x, evidence, limiter_feedback_db, has_evidence
    )
