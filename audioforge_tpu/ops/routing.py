"""Input conditioning: DC block, fixed/adaptive high-pass, hum tracking.

Behavioural contract mirrors `rust-core/src/audio/processor/routing.rs`:

- Processing paths RawMonitor / Bypass / Full (`routing.rs:1-6,680-694`).
- DC blocker ``y = x - x1 + 0.995*y1`` (`routing.rs:8-12,826-843`, coeff
  `processor.rs:72`); fixed 80 Hz high-pass Q 0.707 (`processor.rs:73-74`).
- AdaptiveInputCleanupState: 13 oscillator bins at 1 Hz spacing over
  49-61 Hz plus 13 harmonic bins, analysed over 250 ms windows
  (`routing.rs:54-110,221-299`); candidate gating on power+ratio thresholds
  per mode (`routing.rs:405-453`); log-power parabolic interpolation of the
  coarse bank plus phase-continuity frequency estimation with +-32-alias
  disambiguation, blended 0.75 spectral / 0.25 phase, 0.35 IIR toward the
  measurement (`routing.rs:454-531`).
- Hum applied as two SmoothNotches (Q 36, 20 ms parallel-state retune
  crossfade, `routing.rs:156-215`) with mode-dependent strengths (gentle
  0.55 primary only; strong 0.85 + 0.60 harmonic) (`routing.rs:556-585`).
- Rumble detector (150 Hz one-pole envelope burst/dominance ratios) raises
  the owned high-pass 80 -> 100/120 Hz with hold (`routing.rs:336-403,
  539-554`) — "one selected HP, never cascaded" (`routing.rs:217-220`).
- Sanitise/clamp helpers with clip metrics (`routing.rs:696-823`) and meter
  block stats incl. crest factor (`routing.rs:705-752`).

TPU-native design: the oscillator bank becomes two masked ``[T] x [T, 26]``
dot products per block (MXU work) with exact phase tracking; window-finish
logic is branch-free block-level math; the rumble envelopes are one small
``lax.scan``; the notches and the owned high-pass are crossfaded biquad
units evaluated with compensated associative scans (the reference runs these
in f32 but our parallel scan needs the extra word at Q=36 / 50 Hz).
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from . import biquad, util

__all__ = [
    "CLEANUP_OFF",
    "CLEANUP_GENTLE",
    "CLEANUP_STRONG",
    "RoutingConfig",
    "routing_init",
    "routing_reset",
    "sanitize_and_clamp_input",
    "sanitize_and_clamp_output",
    "meter_block_stats",
    "routing_process",
]

CLEANUP_OFF = 0
CLEANUP_GENTLE = 1
CLEANUP_STRONG = 2
CLEANUP_MODE_IDS = {CLEANUP_OFF: "off", CLEANUP_GENTLE: "gentle", CLEANUP_STRONG: "strong"}

DC_BLOCK_COEFF = 0.995
PREFILTER_HZ = 80.0
PREFILTER_Q = 0.707

HUM_MIN_HZ = 49.0
HUM_MAX_HZ = 61.0
HUM_TRACK_STEP_HZ = 1.0
HUM_TRACK_BINS = 13
NOTCH_Q = 36.0
HUM_WINDOW_S = 0.25
NOTCH_FADE_S = 0.020

_HP_CHOICES_HZ = (PREFILTER_HZ, 100.0, 120.0)


@dataclass(frozen=True)
class RoutingConfig:
    sample_rate: float = 48000.0
    cleanup_mode: int = CLEANUP_OFF

    @property
    def window_samples(self) -> int:
        return max(1, int(round(self.sample_rate * HUM_WINDOW_S)))

    @property
    def notch_fade_samples(self) -> int:
        return max(1, int(round(self.sample_rate * NOTCH_FADE_S)))


def _notch_coeffs_traced(freq_hz, q, sample_rate):
    """Traced f32 notch design (`routing.rs:124-140`), shape [..., 5]."""
    omega = 2.0 * np.pi * freq_hz / max(sample_rate, 1.0)
    sin_w = jnp.sin(omega)
    cos_w = jnp.cos(omega)
    alpha = sin_w / (2.0 * max(q, 1.0))
    a0 = 1.0 + alpha
    return jnp.stack(
        [
            1.0 / a0,
            -2.0 * cos_w / a0,
            1.0 / a0,
            -2.0 * cos_w / a0,
            (1.0 - alpha) / a0,
        ],
        axis=-1,
    ).astype(jnp.float32)


def _smooth_notch_init(freq_hz, sample_rate, batch_shape=()):
    """SmoothNotch state (`routing.rs:157-215`): dual lanes with pending
    filter starting from CLEARED state (unlike the EQ biquad crossfade)."""
    c = _notch_coeffs_traced(jnp.full(batch_shape, freq_hz, jnp.float32), NOTCH_Q, sample_rate)
    return {
        "coeffs": jnp.stack([c, c], axis=-2),  # [..., 2, 5]
        "z": jnp.zeros(batch_shape + (2, 2), jnp.float32),
        "freq": jnp.full(batch_shape, freq_hz, jnp.float32),
        "pending_freq": jnp.full(batch_shape, freq_hz, jnp.float32),
        "fade_remaining": jnp.zeros(batch_shape, jnp.int32),
    }


def _smooth_notch_retune(state, freq_hz, sample_rate, fade_total):
    """`routing.rs:183-192`: retune only when the target moved >= 0.15 Hz;
    pending filter starts from zero state."""
    freq = jnp.clip(freq_hz, 20.0, sample_rate * 0.45)
    need = jnp.abs(freq - state["pending_freq"]) >= 0.15
    new_c = _notch_coeffs_traced(freq, NOTCH_Q, sample_rate)
    nd = need[..., None]
    coeffs = state["coeffs"].at[..., 1, :].set(
        jnp.where(nd, new_c, state["coeffs"][..., 1, :])
    )
    z = state["z"].at[..., 1, :].set(
        jnp.where(nd, 0.0, state["z"][..., 1, :])
    )
    return {
        "coeffs": coeffs,
        "z": z,
        "freq": state["freq"],
        "pending_freq": jnp.where(need, freq, state["pending_freq"]),
        "fade_remaining": jnp.where(need, fade_total, state["fade_remaining"]),
    }


def _smooth_notch_process(state, x, fade_total):
    """Dual-lane fade like the biquad unit but with zero-seeded pending state
    and the active lane held when idle (`routing.rs:194-209`)."""
    T = x.shape[-1]
    lanes_c = state["coeffs"]
    lanes_z = state["z"]
    xl = jnp.broadcast_to(x[..., None, :], lanes_z.shape[:-1] + (T,))
    y_lanes, z_out = biquad.apply(lanes_c, lanes_z, xl, compensated=True)

    remaining = state["fade_remaining"]
    t_idx = jnp.arange(T, dtype=jnp.float32)
    pos = (fade_total - remaining)[..., None].astype(jnp.float32) + 1.0 + t_idx
    w = jnp.clip(pos / float(fade_total), 0.0, 1.0)
    w = jnp.where((remaining > 0)[..., None], w, 0.0)
    # While idle the pending lane must not advance (its state is only seeded
    # at retune time); emulate by restoring old pending state when idle.
    idle = (remaining <= 0)[..., None]
    pend_z = jnp.where(idle, lanes_z[..., 1, :], z_out[..., 1, :])
    y = y_lanes[..., 0, :] + (y_lanes[..., 1, :] - y_lanes[..., 0, :]) * w

    new_remaining = jnp.maximum(remaining - T, 0)
    promoted = (remaining > 0) & (new_remaining == 0)
    pm = promoted[..., None]
    active_c = jnp.where(pm, lanes_c[..., 1, :], lanes_c[..., 0, :])
    active_z = jnp.where(pm, pend_z, z_out[..., 0, :])
    new_state = {
        "coeffs": jnp.stack([active_c, lanes_c[..., 1, :]], axis=-2),
        "z": jnp.stack([active_z, pend_z], axis=-2),
        "freq": jnp.where(promoted, state["pending_freq"], state["freq"]),
        "pending_freq": state["pending_freq"],
        "fade_remaining": new_remaining,
    }
    return new_state, y


def routing_init(config: RoutingConfig, batch_shape=()):
    fs = config.sample_rate
    f = lambda v: jnp.full(batch_shape, v, jnp.float32)
    i = lambda v: jnp.full(batch_shape, v, jnp.int32)
    hp80 = biquad.design(biquad.HIGH_PASS, PREFILTER_HZ, 0.0, PREFILTER_Q, fs)
    return {
        "dc_x1": f(0.0),
        "dc_y1": f(0.0),
        # fixed 80 Hz pre-filter used when cleanup is off (plain DF2T state;
        # the static coefficients live in the compiled apply_fixed operator)
        "prefilter_z": jnp.zeros(batch_shape + (2,), jnp.float32),
        # adaptive path
        "lowpass_state": f(0.0),
        "low_env": f(0.0),
        "slow_low_env": f(0.0),
        "broadband_env": f(0.0),
        "rumble_hold": i(0),
        "iq": jnp.zeros(batch_shape + (2, HUM_TRACK_BINS, 2), jnp.float32),
        "bin_phase": jnp.zeros(batch_shape + (2, HUM_TRACK_BINS), jnp.float32),
        "window_pos": i(0),
        "windows_observed": i(0),
        "candidate_windows": i(0),
        "total_energy": f(0.0),
        "hum_hold": i(0),
        "hum_line_hz": f(0.0),
        "prev_abs_phase": f(0.0),
        "phase_valid": jnp.zeros(batch_shape, jnp.bool_),
        "hum_strength": f(0.0),
        "harmonic_strength": f(0.0),
        "adaptive_hp": biquad.unit_init(jnp.asarray(hp80, jnp.float32), batch_shape),
        "adaptive_hp_hz": f(PREFILTER_HZ),
        "hum_notch": _smooth_notch_init(55.0, fs, batch_shape),
        "harmonic_notch": _smooth_notch_init(110.0, fs, batch_shape),
        "hum_detected": jnp.zeros(batch_shape, jnp.bool_),
        "rumble_detected": jnp.zeros(batch_shape, jnp.bool_),
        "selected_hp_hz": f(PREFILTER_HZ),
        "meter_rms_acc": f(0.0),
    }


def routing_reset(config: RoutingConfig, state):
    return routing_init(config, state["dc_x1"].shape)


def sanitize_and_clamp_input(x):
    """`routing.rs:801-823`. Returns (y, clip_count, clip_peak_db)."""
    finite = jnp.isfinite(x)
    x = jnp.where(finite, x, 0.0)
    amp = jnp.abs(x)
    clipped = amp > 1.0
    count = jnp.sum(clipped, axis=-1).astype(jnp.int32)
    peak = jnp.max(jnp.where(clipped, amp, 0.0), axis=-1)
    peak_db = jnp.where(peak > 0, 20.0 * jnp.log10(jnp.maximum(peak, 1e-30)), -jnp.inf)
    return jnp.clip(x, -1.0, 1.0), count, peak_db


def sanitize_and_clamp_output(x, ceiling_linear):
    """`routing.rs:766-799`. Returns (y, clip_count, clip_peak_db)."""
    ceiling = jnp.clip(jnp.asarray(ceiling_linear, jnp.float32), 0.0, 1.0)
    finite = jnp.isfinite(x)
    x = jnp.where(finite, x, 0.0)
    amp = jnp.abs(x)
    clipped = finite & (amp > ceiling)
    count = jnp.sum(clipped, axis=-1).astype(jnp.int32)
    peak = jnp.max(jnp.where(clipped, amp, 0.0), axis=-1)
    peak_db = jnp.where(peak > 0, 20.0 * jnp.log10(jnp.maximum(peak, 1e-30)), -jnp.inf)
    return jnp.clip(x, -ceiling, ceiling), count, peak_db


def meter_block_stats(x, rms_acc, meter_coeff):
    """`routing.rs:705-752`: per-block peak/rms/crest with a carried
    one-pole mean-square accumulator. Returns (stats dict, new_rms_acc)."""
    peak = jnp.max(jnp.abs(x), axis=-1)
    # the accumulator integrates per sample: acc' = c^T acc + (1-c)*sum(c^k x^2)
    # -> evaluate exactly with a parallel first-order affine scan
    c = jnp.asarray(meter_coeff, jnp.float32)
    T = x.shape[-1]
    powers = x * x
    # acc_t = c*acc_{t-1} + (1-c)*p_t ; closed form via cumulative weights
    k = jnp.arange(T, dtype=jnp.float32)
    wts = jnp.power(c, T - 1.0 - k) * (1.0 - c)
    acc_final = jnp.power(c, float(T)) * rms_acc + jnp.sum(powers * wts, axis=-1)
    peak_db = jnp.where(peak > 0, 20.0 * jnp.log10(jnp.maximum(peak, 1e-30)), -120.0)
    rms_db = jnp.where(
        acc_final > 0, 10.0 * jnp.log10(jnp.maximum(acc_final, 1e-30)), -120.0
    )
    stats = {
        "peak_db": peak_db,
        "rms_db": rms_db,
        "crest_factor_db": jnp.clip(peak_db - rms_db, 0.0, 80.0),
        "mean_power": jnp.mean(powers, axis=-1),
    }
    return stats, acc_final


def _wrap_phase(p):
    return jnp.mod(p + np.pi, 2.0 * np.pi) - np.pi


@partial(jax.jit, static_argnames=("config",))
def routing_process(config: RoutingConfig, state, x):
    """DC block + input cleanup for one block ``x: [..., T]``.

    Runs the reference order: adaptive analysis on the raw (sanitised) block
    (`dsp_loop.rs:1235-1244`), then DC block, then either the fixed 80 Hz
    pre-filter (cleanup off) or notches + owned adaptive high-pass
    (`routing.rs:826-843,534-596`). Returns ``(new_state, y, metrics)``.
    """
    fs = config.sample_rate
    T = x.shape[-1]
    lead = x.shape[:-1]
    mode = config.cleanup_mode
    W = config.window_samples
    assert T <= W, "block longer than hum analysis window"

    new_state = dict(state)

    if mode != CLEANUP_OFF:
        # ==== analyze_input (`routing.rs:336-403`) ====
        # --- oscillator bank: masked dot products with exact bin phases
        freqs = HUM_MIN_HZ + HUM_TRACK_STEP_HZ * np.arange(HUM_TRACK_BINS)
        omegas = np.concatenate([freqs, 2.0 * freqs]) * (2.0 * np.pi / fs)  # (26,)
        omegas_j = jnp.asarray(omegas, jnp.float32)
        t_idx = jnp.arange(T, dtype=jnp.float32)
        phase0 = state["bin_phase"].reshape(lead + (2 * HUM_TRACK_BINS,))
        angles = phase0[..., None] + omegas_j[..., None] * t_idx  # [..., 26, T]
        cos_b = jnp.cos(angles)
        sin_b = jnp.sin(angles)

        pos0 = state["window_pos"]
        boundary = W - pos0  # samples until window completes (> 0)
        pre_mask = (t_idx < boundary[..., None]).astype(jnp.float32)  # [..., T]
        post_mask = 1.0 - pre_mask

        def iq_sums(mask):
            xm = x * mask
            i_acc = jnp.einsum("...t,...bt->...b", xm, cos_b)
            q_acc = jnp.einsum("...t,...bt->...b", xm, sin_b)
            return i_acc, q_acc

        i_pre, q_pre = iq_sums(pre_mask)
        i_post, q_post = iq_sums(post_mask)
        energy_pre = jnp.sum(x * x * pre_mask, axis=-1)
        energy_post = jnp.sum(x * x * post_mask, axis=-1)

        iq0 = state["iq"].reshape(lead + (2 * HUM_TRACK_BINS, 2))
        i_win = iq0[..., 0] + i_pre
        q_win = iq0[..., 1] + q_pre

        crosses = (pos0 + T) >= W  # window completes inside this block

        # ==== finish_hum_window (`routing.rs:405-531`), gated on `crosses`
        n = float(W)
        power = (i_win**2 + q_win**2) * (2.0 / (n * n))  # [..., 26]
        p_primary = power[..., :HUM_TRACK_BINS]
        p_harm = power[..., HUM_TRACK_BINS:]
        meas_phase = jnp.arctan2(q_win, i_win)  # [..., 26]

        total_power = (state["total_energy"] + energy_pre) / n + 1e-9
        score = p_primary + 0.65 * p_harm
        best_idx = jnp.argmax(score, axis=-1)
        take = lambda arr: jnp.take_along_axis(arr, best_idx[..., None], axis=-1)[..., 0]
        best_pp = take(p_primary)
        best_hp = take(p_harm)
        best_phase = take(meas_phase[..., :HUM_TRACK_BINS])
        best_freq = HUM_MIN_HZ + best_idx.astype(jnp.float32) * HUM_TRACK_STEP_HZ

        primary_ratio = best_pp / total_power
        harmonic_ratio = best_hp / total_power
        if mode == CLEANUP_GENTLE:
            ratio_thr, power_thr = 0.075, 1.8e-5
        else:
            ratio_thr, power_thr = 0.040, 8.0e-6
        candidate = (
            ((best_pp > power_thr) | (best_hp > power_thr * 0.70))
            & ((primary_ratio > ratio_thr) | (harmonic_ratio > ratio_thr * 0.85))
            & (best_freq > 0.0)
        )
        cand_windows = jnp.where(
            crosses,
            jnp.where(candidate, jnp.minimum(state["candidate_windows"] + 1, 3), 0),
            state["candidate_windows"],
        )
        phase_valid0 = jnp.where(
            crosses & ~candidate, False, state["phase_valid"]
        )
        confirmed = crosses & (cand_windows >= 2)

        # log-power parabolic interpolation
        logp = jnp.log(jnp.maximum(p_primary, 1e-12))
        idx_ok = (best_idx > 0) & (best_idx < HUM_TRACK_BINS - 1)
        idx_c = jnp.clip(best_idx, 1, HUM_TRACK_BINS - 2)
        gather = lambda off: jnp.take_along_axis(
            logp, (idx_c + off)[..., None], axis=-1
        )[..., 0]
        left, center, right = gather(-1), gather(0), gather(1)
        denom = left - 2.0 * center + right
        offset = jnp.where(
            idx_ok & (jnp.abs(denom) > 1e-6),
            jnp.clip(0.5 * (left - right) / jnp.where(jnp.abs(denom) > 1e-6, denom, 1.0), -0.5, 0.5),
            0.0,
        )
        spectral_freq = jnp.clip(
            best_freq + offset * HUM_TRACK_STEP_HZ, HUM_MIN_HZ, HUM_MAX_HZ
        )

        # phase continuity with alias disambiguation (`routing.rs:483-520`)
        win_s = W / fs
        bin_phase_at_center = _wrap_phase(
            jnp.take_along_axis(
                state["bin_phase"][..., 0, :], best_idx[..., None], axis=-1
            )[..., 0]
            + jnp.take_along_axis(
                jnp.broadcast_to(omegas_j[:HUM_TRACK_BINS], lead + (HUM_TRACK_BINS,)),
                best_idx[..., None],
                axis=-1,
            )[..., 0]
            # phase advance from window start to window centre, minus the part
            # of the window already consumed before this block
            * (W / 2.0 - pos0.astype(jnp.float32))
        )
        abs_phase = _wrap_phase(-best_phase + bin_phase_at_center)
        phase_delta = _wrap_phase(abs_phase - state["prev_abs_phase"])
        base_freq = phase_delta / (2.0 * np.pi * win_s)
        alias = jnp.arange(-32, 33, dtype=jnp.float32) / win_s
        cands = base_freq[..., None] + alias
        err = jnp.abs(cands - spectral_freq[..., None])
        best_alias = jnp.take_along_axis(
            cands, jnp.argmin(err, axis=-1)[..., None], axis=-1
        )[..., 0]
        phase_freq = jnp.clip(best_alias, HUM_MIN_HZ, HUM_MAX_HZ)
        measured = jnp.where(
            phase_valid0,
            0.75 * spectral_freq + 0.25 * phase_freq,
            spectral_freq,
        )
        new_line = jnp.clip(
            jnp.where(
                state["hum_line_hz"] <= 0.0,
                measured,
                state["hum_line_hz"] + 0.35 * (measured - state["hum_line_hz"]),
            ),
            HUM_MIN_HZ,
            HUM_MAX_HZ,
        )
        hum_line = jnp.where(confirmed, new_line, state["hum_line_hz"])
        prev_abs_phase = jnp.where(confirmed, abs_phase, state["prev_abs_phase"])
        phase_valid = jnp.where(confirmed, True, phase_valid0)
        hold_set = jnp.int32(round(fs * 0.75))
        # hum hold: decrements per sample; set at the boundary when confirmed
        hold0 = state["hum_hold"]
        boundary_i = jnp.minimum(boundary, T)
        hold_at_boundary = jnp.maximum(hold0 - boundary_i, 0)
        hold_after = jnp.where(confirmed, hold_set, hold_at_boundary)
        hum_hold_end = jnp.where(
            crosses,
            jnp.maximum(hold_after - (T - boundary_i), 0),
            jnp.maximum(hold0 - T, 0),
        )

        windows_observed = state["windows_observed"] + crosses.astype(jnp.int32)
        window_pos = jnp.where(crosses, pos0 + T - W, pos0 + T)
        total_energy = jnp.where(crosses, energy_post, state["total_energy"] + energy_pre)
        # When the window did not complete, post_mask is all-zero so the
        # post sums vanish and the window accumulators keep growing.
        iq_new = jnp.where(
            crosses[..., None, None],
            jnp.stack([i_post, q_post], axis=-1),
            jnp.stack([i_win, q_win], axis=-1),
        )
        bin_phase = _wrap_phase(
            state["bin_phase"] + omegas_j.reshape(2, HUM_TRACK_BINS) * float(T)
        )

        # ==== rumble envelope scan (`routing.rs:360-399`)
        lp_c = float(np.clip(2.0 * np.pi * 150.0 / fs, 0.0, 1.0))
        if mode == CLEANUP_GENTLE:
            env_thr, burst_thr, rumble_hold_set = 0.055, 2.8, int(round(fs * 0.18))
        else:
            env_thr, burst_thr, rumble_hold_set = 0.035, 2.1, int(round(fs * 0.30))

        # per-sample context arrays (window-level states change at `boundary`)
        t_ar = jnp.arange(T, dtype=jnp.int32)
        in_pre = t_ar < boundary[..., None]
        hold_t = jnp.where(
            in_pre,
            jnp.maximum(hold0[..., None] - t_ar, 0),
            jnp.maximum(hold_after[..., None] - (t_ar - boundary_i[..., None]), 0),
        )
        cand_t = jnp.where(in_pre, state["candidate_windows"][..., None], cand_windows[..., None])
        wobs_t = jnp.where(in_pre, state["windows_observed"][..., None], windows_observed[..., None])

        xt = jnp.moveaxis(x, -1, 0)
        holdt = jnp.moveaxis(hold_t, -1, 0)
        candt = jnp.moveaxis(cand_t, -1, 0)
        wobst = jnp.moveaxis(wobs_t, -1, 0)

        def rumble_step(s, inp):
            x_t, hh, cw, wo = inp
            lps = s["lowpass_state"] + lp_c * (x_t - s["lowpass_state"])
            la = jnp.abs(lps)
            lc = jnp.where(la > s["low_env"], 0.08, 0.006)
            low_env = s["low_env"] + lc * (la - s["low_env"])
            slow = s["slow_low_env"] + 0.0012 * (la - s["slow_low_env"])
            broad = s["broadband_env"] + 0.02 * (jnp.abs(x_t) - s["broadband_env"])
            burst = low_env / jnp.maximum(slow, 0.006)
            dom = low_env / jnp.maximum(broad, 0.01)
            startup = (wo == 0) & (low_env > 0.45)
            established = (wo > 0) & (slow > 0.012)
            trigger = (
                (startup | established)
                & (hh == 0)
                & (cw == 0)
                & (low_env > env_thr)
                & (burst > burst_thr)
                & (dom > 0.62)
            )
            rh = jnp.where(
                trigger, rumble_hold_set, jnp.maximum(s["rumble_hold"] - 1, 0)
            ).astype(jnp.int32)
            return (
                {
                    "lowpass_state": lps,
                    "low_env": low_env,
                    "slow_low_env": slow,
                    "broadband_env": broad,
                    "rumble_hold": rh,
                },
                None,
            )

        rumble_state = {
            k: state[k]
            for k in ("lowpass_state", "low_env", "slow_low_env", "broadband_env", "rumble_hold")
        }
        rumble_final, _ = jax.lax.scan(rumble_step, rumble_state, (xt, holdt, candt, wobst))

        new_state.update(rumble_final)
        new_state.update(
            iq=iq_new.reshape(lead + (2, HUM_TRACK_BINS, 2)),
            bin_phase=bin_phase,
            window_pos=window_pos.astype(jnp.int32),
            windows_observed=windows_observed,
            candidate_windows=cand_windows.astype(jnp.int32),
            total_energy=total_energy,
            hum_hold=hum_hold_end.astype(jnp.int32),
            hum_line_hz=hum_line,
            prev_abs_phase=prev_abs_phase,
            phase_valid=phase_valid,
        )

    # ==== DC blocker (`routing.rs:826-843`): y = x - x1 + 0.995*y1. The
    # coefficients are static, so the whole block is one host-precomputed
    # IR/state matmul (biquad form b=[1,-1,0], a=[1,-0.995,0]; DF2T state
    # z1 = 0.995*y1 - x1, z2 = 0) — pure MXU work instead of a scan.
    dc_z = jnp.stack(
        [DC_BLOCK_COEFF * state["dc_y1"] - state["dc_x1"],
         jnp.zeros(lead, jnp.float32)],
        axis=-1,
    )
    y, _ = biquad.apply_fixed(
        (1.0, -1.0, 0.0, -DC_BLOCK_COEFF, 0.0), dc_z, x
    )
    new_state["dc_x1"] = x[..., -1]
    new_state["dc_y1"] = y[..., -1]

    if mode == CLEANUP_OFF:
        # fixed 80 Hz pre-filter: static coefficients -> same matmul form
        hp80 = biquad.design(
            biquad.HIGH_PASS, PREFILTER_HZ, 0.0, PREFILTER_Q, fs
        )
        y, pre_z = biquad.apply_fixed(tuple(hp80), state["prefilter_z"], y)
        new_state["prefilter_z"] = pre_z
        metrics = {
            "hum_detected": jnp.zeros(lead, jnp.bool_),
            "rumble_detected": jnp.zeros(lead, jnp.bool_),
            "hum_line_hz": state["hum_line_hz"],
            "hum_strength": jnp.zeros(lead, jnp.float32),
            "selected_hp_hz": jnp.full(lead, PREFILTER_HZ, jnp.float32),
        }
        return new_state, y, metrics

    # ==== process_block (`routing.rs:534-596`) ====
    hum_detected = new_state["hum_hold"] > 0
    rumble_detected = new_state["rumble_hold"] > 0
    raised_hz = 100.0 if mode == CLEANUP_GENTLE else 120.0
    # strong f32 so the state leaf signature is stable across jit calls
    selected_hp = jnp.where(
        rumble_detected, jnp.float32(raised_hz), jnp.float32(PREFILTER_HZ)
    )

    retune_hp = jnp.abs(selected_hp - state["adaptive_hp_hz"]) > 0.5
    hp_lo = jnp.asarray(
        biquad.design(biquad.HIGH_PASS, PREFILTER_HZ, 0.0, PREFILTER_Q, fs), jnp.float32
    )
    hp_hi = jnp.asarray(
        biquad.design(biquad.HIGH_PASS, raised_hz, 0.0, PREFILTER_Q, fs), jnp.float32
    )
    target_hp_c = jnp.where(
        (selected_hp > PREFILTER_HZ)[..., None], hp_hi, hp_lo
    )
    fade = biquad.crossfade_samples(fs)
    scheduled = biquad.unit_schedule(state["adaptive_hp"], target_hp_c, fade)
    hp_unit = jax.tree_util.tree_map(
        lambda a, b: jnp.where(
            retune_hp.reshape(retune_hp.shape + (1,) * (a.ndim - retune_hp.ndim)), a, b
        ),
        scheduled,
        state["adaptive_hp"],
    )

    hum_attack = 0.22 if mode == CLEANUP_GENTLE else 0.34
    hum_release = 0.035
    target_hum = jnp.where(
        hum_detected, 0.55 if mode == CLEANUP_GENTLE else 0.85, 0.0
    )
    target_harm = jnp.where(
        hum_detected, 0.0 if mode == CLEANUP_GENTLE else 0.60, 0.0
    )

    def smooth_toward(cur, tgt):
        c = jnp.where(tgt > cur, hum_attack, hum_release)
        return cur + c * (tgt - cur)

    hum_strength = smooth_toward(state["hum_strength"], target_hum)
    harm_strength = smooth_toward(state["harmonic_strength"], target_harm)

    fade_n = config.notch_fade_samples
    line_ok = new_state["hum_line_hz"] > 0.0
    notch1 = _smooth_notch_retune(
        state["hum_notch"],
        jnp.where(line_ok, new_state["hum_line_hz"], state["hum_notch"]["pending_freq"]),
        fs,
        fade_n,
    )
    notch2 = _smooth_notch_retune(
        state["harmonic_notch"],
        jnp.where(line_ok, new_state["hum_line_hz"] * 2.0, state["harmonic_notch"]["pending_freq"]),
        fs,
        fade_n,
    )

    notch1, n1y = _smooth_notch_process(notch1, y, fade_n)
    y = y + (n1y - y) * jnp.clip(hum_strength, 0.0, 1.0)[..., None]
    notch2, n2y = _smooth_notch_process(notch2, y, fade_n)
    y = y + (n2y - y) * jnp.clip(harm_strength, 0.0, 1.0)[..., None]
    hp_unit, y = biquad.unit_process(hp_unit, y)

    new_state.update(
        hum_notch=notch1,
        harmonic_notch=notch2,
        adaptive_hp=hp_unit,
        adaptive_hp_hz=selected_hp,
        hum_strength=hum_strength,
        harmonic_strength=harm_strength,
        hum_detected=hum_detected,
        rumble_detected=rumble_detected,
        selected_hp_hz=selected_hp,
    )
    metrics = {
        "hum_detected": hum_detected,
        "rumble_detected": rumble_detected,
        "hum_line_hz": new_state["hum_line_hz"],
        "hum_strength": hum_strength,
        "selected_hp_hz": selected_hp,
    }
    return new_state, y, metrics
