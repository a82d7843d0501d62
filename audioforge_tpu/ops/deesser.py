"""Dynamic-EQ de-esser with 3-band sibilance detection.

Behavioural contract mirrors `rust-core/src/dsp/deesser.rs`:

- Detector band 4-11 kHz split into 3 equal sub-bands, each with HP+LP
  Q=0.707 biquad sidechains and an attack/release envelope follower
  (`deesser.rs:29-32,34-85,405-433`).
- "Voice body" reference = broadband envelope - 0.6 * total sibilance
  envelope (`deesser.rs:19,436-439`).
- Per-band confidence target mixes spectral-ratio / level / voice /
  narrowness terms with broadband penalty and narrow-sibilance support
  (`deesser.rs:171-220`).
- Auto mode maps amount -> {trigger offset 8->0.8 dB, slope 0.08->1.9, cap
  0.8->14 dB, confidence floor 0.28->0.06} with an attack/release-asymmetric
  baseline-excess tracker (`deesser.rs:26-28,446-519`); manual mode is a
  threshold/ratio gain computer (`deesser.rs:502-516`).
- Total target reduction rescaled to ``max_reduction_db``
  (`deesser.rs:521-526`); applied as 3 dynamic peaking biquads at the
  geometric band centers with Q from bandwidth (`deesser.rs:257-266,528-546`).

TPU-native design (three phases, maximally parallel):

1. The 6 constant-coefficient detector biquads filter the whole block with
   parallel associative scans (no dependence on the gain path).
2. ONE fused ``lax.scan`` carries the 13 envelope/confidence/baseline/
   reduction states (the only genuinely sequential part).
3. The per-sample band reductions become per-sample peaking-EQ coefficients
   (center/Q static, only the gain varies), applied as 3 time-varying
   associative-scan biquads.
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from . import biquad, util
from . import scan as scan_ops

__all__ = [
    "DeEsserConfig",
    "deesser_init",
    "deesser_reset",
    "deesser_process",
    "detector_filter_block",
    "make_envelope_step",
    "dynamic_band_constants",
    "dynamic_peaking_coeffs",
]

VOICE_REFERENCE_SIDECHAIN_DISCOUNT = 0.6
DETECTOR_RATIO_GATE_DB = 1.5
DETECTOR_RATIO_FULL_DB = 10.0
DETECTOR_LEVEL_GATE_DB = -62.0
DETECTOR_LEVEL_FULL_DB = -24.0
DETECTOR_VOICE_GATE_DB = -58.0
DETECTOR_VOICE_FULL_DB = -34.0
AUTO_BASELINE_FALL_MS = 13.88
AUTO_BASELINE_RISE_MS = 34.72
AUTO_BASELINE_INACTIVE_DECAY_MS = 20.82
BAND_COUNT = 3
DEFAULT_LOW_CUT_HZ = 4000.0
DEFAULT_HIGH_CUT_HZ = 11000.0
BROADBAND_NARROWNESS_GATE = 0.34
BROADBAND_NARROWNESS_FULL = 0.68


@dataclass(frozen=True)
class DeEsserConfig:
    sample_rate: float = 48000.0
    enabled: bool = False
    auto_enabled: bool = True
    auto_amount: float = 0.5
    threshold_db: float = -28.0
    ratio: float = 4.0
    max_reduction_db: float = 6.0
    low_cut_hz: float = 4000.0
    high_cut_hz: float = DEFAULT_HIGH_CUT_HZ

    def band_bounds(self):
        """Equal three-way split of the detector span (`deesser.rs:229-245`)."""
        low = min(max(self.low_cut_hz, 2000.0), 12000.0)
        high = self.high_cut_hz
        if high <= low + 200.0:
            high = min(max(low + 200.0, 2200.0), 16000.0)
        span = max(high - low, 600.0)
        a = low + span / 3.0
        b = low + span * 2.0 / 3.0
        return [(low, a), (a, b), (b, high)]

    def band_centers_qs(self):
        centers, qs = [], []
        for lo, hi in self.band_bounds():
            c = float(np.sqrt(lo * hi))
            bw = max(hi - lo, 200.0)
            centers.append(c)
            qs.append(float(np.clip(c / bw, 0.5, 6.0)))
        return centers, qs


def _coeff(ms, fs):
    return util.time_constant_to_coeff(ms / 1000.0, fs)


def _detector_coeffs(config: DeEsserConfig) -> np.ndarray:
    """``(3, 2, 5)`` HP+LP sidechain coefficients per band."""
    out = np.zeros((BAND_COUNT, 2, 5), np.float64)
    for i, (lo, hi) in enumerate(config.band_bounds()):
        out[i, 0] = biquad.design(biquad.HIGH_PASS, lo, 0.0, 0.707, config.sample_rate)
        out[i, 1] = biquad.design(biquad.LOW_PASS, hi, 0.0, 0.707, config.sample_rate)
    return out


def deesser_init(config: DeEsserConfig, batch_shape=()):
    f = lambda shape=(): jnp.zeros(batch_shape + shape, jnp.float32)
    return {
        "det_z": f((BAND_COUNT, 2, 2)),  # HP/LP states per band
        "band_env": f((BAND_COUNT,)),
        "band_confidence": f((BAND_COUNT,)),
        "baseline_excess_db": f((BAND_COUNT,)),
        "reduction_db": f((BAND_COUNT,)),
        "broadband_env": f(),
        "current_reduction_db": f(),
        "detector_confidence": f(),
        "dyn_z": f((BAND_COUNT, 2)),  # dynamic EQ biquad states
    }


def deesser_reset(config: DeEsserConfig, state):
    return deesser_init(config, state["broadband_env"].shape)


def _normalize_range(value, start, end):
    return jnp.clip((value - start) / (end - start), 0.0, 1.0)


def _lerp(a, b, t):
    return a + (b - a) * t


def detector_filter_block(config: DeEsserConfig, det_z, x):
    """Phase 1: constant-coefficient sidechain filters, fully parallel.

    Bands filtered one at a time: batching the 3-band axis through the
    blocked scan produces (..., 3, chunks)-shaped intermediates that
    trigger an XLA:TPU fusion-transform CHECK failure (fusion_util.cc
    "TransformWindow: Loop will not make progress").
    Returns ``(det_z_out, side_abs [..., 3, T], broad_abs [..., T])``."""
    det_c = jnp.asarray(_detector_coeffs(config), jnp.float32)  # (3,2,5)
    side_list, hp_zs, lp_zs = [], [], []
    # plain f32: the detector band sits at 4-11 kHz (pole radius far from 1
    # at 48 kHz) where the f32 blocked scan is ~1e-6 accurate, and it only
    # feeds envelope followers — the compensated scan's ~10x flops buy
    # nothing here
    for b in range(BAND_COUNT):
        hp_y, hp_z = biquad.apply(det_c[b, 0, :], det_z[..., b, 0, :], x,
                                  compensated=False)
        lp_y, lp_z = biquad.apply(det_c[b, 1, :], det_z[..., b, 1, :], hp_y,
                                  compensated=False)
        side_list.append(jnp.abs(lp_y))
        hp_zs.append(hp_z)
        lp_zs.append(lp_z)
    det_z_out = jnp.stack(
        [jnp.stack([hp_zs[b], lp_zs[b]], axis=-2) for b in range(BAND_COUNT)],
        axis=-3,
    )
    return det_z_out, jnp.stack(side_list, axis=-2), jnp.abs(x)


def dynamic_band_constants(config: DeEsserConfig):
    """Static (cos w0, alpha) per dynamic-EQ band (`deesser.rs:257-266`)."""
    centers, qs = config.band_centers_qs()
    fs = config.sample_rate
    out = []
    for c_hz, q in zip(centers, qs):
        w0 = 2.0 * np.pi * c_hz / fs
        out.append((float(np.cos(w0)), float(np.sin(w0) / (2.0 * q))))
    return out


def dynamic_peaking_coeffs(reduction_db, cos_w: float, alpha: float):
    """Per-sample peaking-cut coefficients: only the gain varies
    (`deesser.rs:528-546`). ``reduction_db``: any shape; returns
    ``[..., 5]``."""
    A = jnp.power(10.0, -reduction_db / 40.0)
    a0 = 1.0 + alpha / A
    neg2cos = jnp.broadcast_to(jnp.float32(-2.0 * cos_w), A.shape)
    return jnp.stack(
        [(1.0 + alpha * A) / a0, neg2cos / a0, (1.0 - alpha * A) / a0,
         neg2cos / a0, (1.0 - alpha / A) / a0],
        axis=-1,
    )


def make_envelope_step(config: DeEsserConfig):
    """Phase 2 step factory: the fused envelope/confidence/baseline/
    reduction recurrence, reusable by the stage scan and chain-level fused
    scans. ``step(s, (side_abs_t, broad_abs_t)) -> (s_next, reduction_t)``."""
    fs = config.sample_rate
    det_atk = jnp.float32(_coeff(1.5, fs))
    det_rel = jnp.float32(_coeff(60.0, fs))
    atk = jnp.float32(_coeff(2.0, fs))
    rel = jnp.float32(_coeff(80.0, fs))
    base_fall = jnp.float32(_coeff(AUTO_BASELINE_FALL_MS, fs))
    base_rise = jnp.float32(_coeff(AUTO_BASELINE_RISE_MS, fs))
    base_decay = jnp.float32(_coeff(AUTO_BASELINE_INACTIVE_DECAY_MS, fs))

    amount = float(np.clip(config.auto_amount, 0.0, 1.0))
    trigger_offset = _lerp(8.0, 0.8, amount)
    slope = _lerp(0.08, 1.9, amount)
    auto_cap = min(_lerp(0.8, 14.0, amount), config.max_reduction_db * 0.75)
    conf_floor = _lerp(0.28, 0.06, amount) if config.auto_enabled else 0.22
    conf_floor = float(np.clip(conf_floor, 0.0, 0.95))
    max_red = jnp.float32(config.max_reduction_db)
    thr = jnp.float32(config.threshold_db)
    ratio_thr = float(np.clip((config.threshold_db + 60.0) * 0.10, 0.0, 6.0))
    comp_factor = 1.0 - 1.0 / max(config.ratio, 1.0)

    def smooth(prev, inp, a_c, r_c):
        c = jnp.where(inp > prev, a_c, r_c)
        return c * prev + (1.0 - c) * inp

    def step(s, inputs):
        sb, bb = inputs  # sb: [..., 3], bb: [...]
        broad_env = smooth(s["broadband_env"], bb, det_atk, det_rel)
        band_env = smooth(s["band_env"], sb, det_atk, det_rel)
        total_env = jnp.sum(band_env, axis=-1)
        max_env = jnp.max(band_env, axis=-1)
        band_db = util.linear_to_db(jnp.maximum(band_env, 1e-10), -200.0)
        voice_ref = jnp.maximum(
            broad_env - total_env * VOICE_REFERENCE_SIDECHAIN_DISCOUNT, 1e-8
        )
        voice_db = util.linear_to_db(voice_ref, -200.0)
        narrowness = jnp.where(total_env > 1e-10, max_env / jnp.maximum(total_env, 1e-30), 0.0)

        spectral_ratio = jnp.maximum(band_db - voice_db[..., None], 0.0)
        dominance = jnp.where(
            (max_env > 1e-10)[..., None],
            jnp.sqrt(band_env / jnp.maximum(max_env[..., None], 1e-30)),
            0.0,
        )
        # confidence target (`deesser.rs:171-220`)
        ratio_conf = _normalize_range(
            spectral_ratio, DETECTOR_RATIO_GATE_DB, DETECTOR_RATIO_FULL_DB
        )
        level_conf = _normalize_range(
            band_db, DETECTOR_LEVEL_GATE_DB, DETECTOR_LEVEL_FULL_DB
        )
        voice_conf = _normalize_range(
            voice_db, DETECTOR_VOICE_GATE_DB, DETECTOR_VOICE_FULL_DB
        )[..., None]
        narrow_support = jnp.where(
            (spectral_ratio > 6.0) & (band_db > -45.0), 0.75, 0.0
        )
        voice_support = jnp.maximum(voice_conf, narrow_support)
        balance_conf = jnp.where(
            ratio_conf > 0.12, jnp.maximum(ratio_conf, voice_support * 0.65), ratio_conf
        )
        broadband_penalty = _lerp(0.35, 1.0, balance_conf)
        narrow_gain = _lerp(
            0.35,
            1.0,
            _normalize_range(
                narrowness, BROADBAND_NARROWNESS_GATE, BROADBAND_NARROWNESS_FULL
            ),
        )[..., None]
        conf_target = (
            (0.62 * ratio_conf + 0.18 * level_conf + 0.20 * voice_support)
            * broadband_penalty
            * narrow_gain
        ) * dominance
        confidence = smooth(
            s["band_confidence"], jnp.clip(conf_target, 0.0, 1.0), det_atk, det_rel
        )

        if config.auto_enabled:
            voice_active = (voice_db > -55.0)[..., None] | (band_db > -55.0)
            baseline_target = jnp.clip(spectral_ratio * 0.45, 0.0, 24.0)
            bc = jnp.where(
                baseline_target < s["baseline_excess_db"], base_fall, base_rise
            )
            baseline_active = bc * s["baseline_excess_db"] + (1 - bc) * baseline_target
            baseline = jnp.where(
                voice_active, baseline_active, s["baseline_excess_db"] * base_decay
            )
            conf_gain = _normalize_range(confidence, conf_floor, 1.0)
            over = jnp.maximum(spectral_ratio - baseline - trigger_offset, 0.0)
            target_red = jnp.clip(over * slope * conf_gain, 0.0, auto_cap)
        else:
            baseline = s["baseline_excess_db"]
            conf_gain = _normalize_range(confidence, 0.22, 1.0)
            level_over = band_db - thr
            ratio_over = spectral_ratio - ratio_thr
            over = jnp.minimum(level_over, ratio_over)
            target_red = jnp.where(
                (band_db > thr) & (ratio_over > 0.0),
                jnp.clip(comp_factor * over * conf_gain, 0.0, max_red * 0.75),
                0.0,
            )

        total_target = jnp.sum(target_red, axis=-1, keepdims=True)
        scale = jnp.where(
            total_target > jnp.maximum(max_red, 0.0),
            max_red / jnp.maximum(total_target, 1e-30),
            1.0,
        )
        target_red = target_red * scale

        reduction = smooth(s["reduction_db"], target_red, atk, rel)
        total_reduction = jnp.minimum(jnp.sum(reduction, axis=-1), max_red)
        agg_conf = jnp.clip(jnp.max(confidence, axis=-1), 0.0, 1.0)

        new_s = {
            "broadband_env": broad_env,
            "band_env": band_env,
            "band_confidence": confidence,
            "baseline_excess_db": baseline,
            "reduction_db": reduction,
            "current_reduction_db": total_reduction,
            "detector_confidence": agg_conf,
        }
        return new_s, reduction

    return step


@partial(jax.jit, static_argnames=("config",))
def deesser_process(config: DeEsserConfig, state, x):
    """De-ess a block ``x: [..., T]``. Returns ``(new_state, y, metrics)``."""
    if not config.enabled:
        new_state = dict(
            state,
            current_reduction_db=jnp.zeros_like(state["current_reduction_db"]),
            detector_confidence=jnp.zeros_like(state["detector_confidence"]),
        )
        metrics = {
            "reduction_db": new_state["current_reduction_db"],
            "confidence": new_state["detector_confidence"],
            "band_reduction_db": state["reduction_db"],
        }
        return new_state, x, metrics


    T = x.shape[-1]

    # phase 1: parallel sidechain filtering
    det_z_out, side_abs, broad_abs = detector_filter_block(
        config, state["det_z"], x
    )

    # phase 2: the fused sequential recurrence (only genuinely serial part)
    step = make_envelope_step(config)
    side_t = jnp.moveaxis(side_abs, -1, 0)  # (T, ..., 3)
    broad_t = jnp.moveaxis(broad_abs, -1, 0)  # (T, ...)
    scan_state = {
        k: state[k]
        for k in (
            "broadband_env",
            "band_env",
            "band_confidence",
            "baseline_excess_db",
            "reduction_db",
            "current_reduction_db",
            "detector_confidence",
        )
    }
    final, red_t = jax.lax.scan(step, scan_state, (side_t, broad_t), unroll=scan_ops.seq_unroll())
    reductions = jnp.moveaxis(red_t, 0, -1)  # [..., 3, T]

    # phase 3: per-sample peaking coefficients (only gain varies) and
    # 3 time-varying biquads in cascade (`deesser.rs:528-546`)
    band_consts = dynamic_band_constants(config)
    y = x
    dyn_z = []
    for b in range(BAND_COUNT):
        cos_w, alpha = band_consts[b]
        coeffs_t = dynamic_peaking_coeffs(reductions[..., b, :], cos_w, alpha)
        # plain f32: band centers >= ~4.6 kHz, same argument as the detector
        y, z_out = biquad.apply(coeffs_t, state["dyn_z"][..., b, :], y,
                                compensated=False)
        dyn_z.append(z_out)
    new_state = dict(
        final,
        det_z=det_z_out,
        dyn_z=jnp.stack(dyn_z, axis=-2),
    )
    metrics = {
        "reduction_db": final["current_reduction_db"],
        "confidence": final["detector_confidence"],
        "band_reduction_db": final["reduction_db"],
    }
    return new_state, y, metrics
