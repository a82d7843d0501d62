"""Smart noise gate: downward expander with VAD fusion.

Behavioural contract mirrors the reference gate (`rust-core/src/dsp/gate.rs`):

- Downward expander 4:1 with 36 dB range (`gate.rs:13-14`), 8 ms RMS
  detector, 4 dB hysteresis, 50 ms hold (`gate.rs:15-17,266-285`),
  attack/release one-pole gain smoothing (`gate.rs:626-635`).
- Chatter detection: 4 effective-state transitions inside a 500 ms window
  raise an event, 1 s cooldown (`gate.rs:18-20,590-623`); in VAD modes a
  chatter event triggers a 700 ms auto-relax that narrows the range to 24 dB
  and widens the close margin (`gate.rs:22-32,287-295`).
- Probabilistic 5-state machine Closed/Opening/Open/Uncertain/Releasing
  (`gate.rs:53-61,376-483`).
- Fused level+VAD open score with weights 0.55/0.45/0.10, open >= 0.55,
  close <= 0.35 (`gate.rs:316-366`).
- Continuous posterior attenuation: cubic smoothstep of a 35 ms-smoothed
  posterior, scaled 0.30 (assisted) / 0.45 (VAD-only)
  (`gate.rs:40-51,485-553`).

TPU-native design: the gain smoother feeds back into the state machine, so
the recurrence is genuinely sequential; it runs as ONE fused ``lax.scan``
over samples whose body is a branch-free ``jnp.where`` lattice. All leading
axes are batch (vmapped streams / calibration candidates) and vectorise on
the VPU. The VAD posterior arrives as a per-block control input at the
worker cadence (`dsp_loop.rs:1371-1435`), not per sample.
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import partial

import jax
import jax.numpy as jnp

from . import scan as scan_ops
from . import util

__all__ = [
    "gate_params",
    "THRESHOLD_ONLY",
    "VAD_ASSISTED",
    "VAD_ONLY",
    "GateConfig",
    "gate_init",
    "gate_reset",
    "gate_process",
]

THRESHOLD_ONLY = 0
VAD_ASSISTED = 1
VAD_ONLY = 2

MIN_LEVEL_LINEAR = 1e-10
EXPANDER_RATIO = 4.0
EXPANDER_RANGE_DB = 36.0
DETECTOR_RMS_MS = 8.0
DETECTOR_HYSTERESIS_DB = 4.0
DETECTOR_HOLD_MS = 50.0
CHATTER_WINDOW_MS = 500.0
CHATTER_COOLDOWN_MS = 1000.0
CHATTER_TRANSITION_THRESHOLD = 4
CHATTER_AUTO_RELAX_MS = 700.0
AUTO_RELAX_CLOSE_MARGIN = 0.20
NORMAL_CLOSE_MARGIN = 0.12
VAD_ONSET_VELOCITY = 0.08
UNCERTAIN_LEVEL_SCORE = 0.22
AUTO_RELAX_RANGE_DB = 24.0
FUSED_GATE_OPEN_SCORE = 0.55
FUSED_GATE_CLOSE_SCORE = 0.35
VAD_CONTINUOUS_SMOOTH_MS = 35.0
VAD_CONTINUOUS_CLOSE_MARGIN = 0.20
VAD_ASSISTED_CONTINUOUS_SCALE = 0.30
VAD_ONLY_CONTINUOUS_SCALE = 0.45

# 5-state machine codes
_CLOSED, _OPENING, _OPEN, _UNCERTAIN, _RELEASING = range(5)


@dataclass(frozen=True)
class GateConfig:
    threshold_db: float = -40.0
    attack_ms: float = 5.0
    release_ms: float = 100.0
    sample_rate: float = 48000.0
    mode: int = THRESHOLD_ONLY  # static: specialises the compiled step
    enabled: bool = True

    @property
    def attack_coeff(self) -> float:
        return util.time_constant_to_coeff(self.attack_ms / 1000.0, self.sample_rate)

    @property
    def release_coeff(self) -> float:
        return util.time_constant_to_coeff(self.release_ms / 1000.0, self.sample_rate)

    @property
    def rms_coeff(self) -> float:
        return util.time_constant_to_coeff(DETECTOR_RMS_MS / 1000.0, self.sample_rate)

    @property
    def hold_samples(self) -> int:
        return int(round(self.sample_rate * DETECTOR_HOLD_MS / 1000.0))

    @property
    def chatter_window_samples(self) -> int:
        return int(round(self.sample_rate * CHATTER_WINDOW_MS / 1000.0))

    @property
    def chatter_cooldown_samples(self) -> int:
        return int(round(self.sample_rate * CHATTER_COOLDOWN_MS / 1000.0))

    @property
    def auto_relax_samples(self) -> int:
        return int(round(self.sample_rate * CHATTER_AUTO_RELAX_MS / 1000.0))

    @property
    def vad_smooth_coeff(self) -> float:
        return util.time_constant_to_coeff(
            VAD_CONTINUOUS_SMOOTH_MS / 1000.0, self.sample_rate
        )


def gate_init(batch_shape=()):
    f = lambda v: jnp.full(batch_shape, v, jnp.float32)
    i = lambda v: jnp.full(batch_shape, v, jnp.int32)
    b = lambda v: jnp.full(batch_shape, v, jnp.bool_)
    return {
        "rms_envelope_sq": f(0.0),
        "detector_level_db": f(-120.0),
        "hold_remaining": i(0),
        "current_gain": f(0.0),
        "is_open": b(False),
        "effective_gate_open": b(False),
        "has_effective_gate_state": b(False),
        "chatter_window_remaining": i(0),
        "chatter_transition_count": i(0),
        "chatter_cooldown": i(0),
        "chatter_event_count": i(0),
        "gate_state": i(_CLOSED),
        "fused_gate_score": f(0.0),
        "fused_gate_open": b(False),
        "vad_smoothed_probability": f(0.0),
        "previous_vad_probability": f(0.0),
        "auto_relax_remaining": i(0),
        "peak_level": f(-1e30),
    }


def gate_reset(state):
    """`gate.rs:762-790` — full state reset (auto-relax timer included)."""
    return gate_init(state["current_gain"].shape)


def _level_open_score(level_db, threshold_db):
    closed_db = threshold_db - DETECTOR_HYSTERESIS_DB
    return jnp.clip((level_db - closed_db) / DETECTOR_HYSTERESIS_DB, 0.0, 1.0)


def gate_params(config: GateConfig, threshold_db=None, attack_ms=None,
                release_ms=None):
    """Traced numeric parameters so live control edits never recompile."""
    threshold_db = config.threshold_db if threshold_db is None else threshold_db
    attack_ms = config.attack_ms if attack_ms is None else attack_ms
    release_ms = config.release_ms if release_ms is None else release_ms
    fs = config.sample_rate
    return {
        "threshold_db": jnp.float32(threshold_db),
        "attack_coeff": jnp.float32(
            util.time_constant_to_coeff(attack_ms / 1000.0, fs)
        ),
        "release_coeff": jnp.float32(
            util.time_constant_to_coeff(release_ms / 1000.0, fs)
        ),
    }


@partial(jax.jit, static_argnames=("config",))
def gate_process(
    config: GateConfig,
    state,
    x,
    vad_probability=None,
    vad_available=None,
    vad_gate_open=None,
    vad_threshold=None,
    params=None,
):
    """Gate a block ``x: [..., T]``. Returns ``(new_state, y, metrics)``.

    VAD control inputs are per-block scalars (broadcast over batch), matching
    the worker cadence of the reference (`gate.rs:662-676`): the posterior is
    constant within a block; only its 35 ms smoothing runs at sample rate.
    """
    if not config.enabled:
        metrics = {
            "is_open": state["is_open"],
            "gain": state["current_gain"],
            "chatter_events": state["chatter_event_count"],
            "fused_score": state["fused_gate_score"],
            "auto_relax_active": state["auto_relax_remaining"] > 0,
        }
        return state, x, metrics

    T = x.shape[-1]
    lead = x.shape[:-1]
    mode = config.mode
    if params is None:
        thr = jnp.float32(config.threshold_db)
        atk_c = jnp.float32(config.attack_coeff)
        rel_c = jnp.float32(config.release_coeff)
    else:
        thr = params["threshold_db"]
        atk_c = params["attack_coeff"]
        rel_c = params["release_coeff"]
    rms_c = jnp.float32(config.rms_coeff)
    sm_c = jnp.float32(config.vad_smooth_coeff)

    vad_in_use = mode != THRESHOLD_ONLY and vad_probability is not None
    if vad_in_use:
        prob = jnp.broadcast_to(jnp.asarray(vad_probability, jnp.float32), lead)
        avail = jnp.broadcast_to(jnp.asarray(vad_available, jnp.bool_), lead)
        held = jnp.broadcast_to(jnp.asarray(vad_gate_open, jnp.bool_), lead)
        vthr = jnp.clip(
            jnp.broadcast_to(jnp.asarray(vad_threshold, jnp.float32), lead), 0.05, 0.95
        )
        prob_delta = prob - state["previous_vad_probability"]
    else:
        prob = avail = held = vthr = prob_delta = None

    xt = jnp.moveaxis(x, -1, 0)

    def step(s, x_t):
        x64 = x_t
        # ---- detector (`gate.rs:266-292`)
        rms = rms_c * s["rms_envelope_sq"] + (1.0 - rms_c) * x64 * x64
        level_db = util.linear_to_db(
            jnp.maximum(jnp.sqrt(rms), MIN_LEVEL_LINEAR), floor_db=-200.0
        )
        above = level_db >= thr
        hold = jnp.where(
            above,
            config.hold_samples,
            jnp.maximum(s["hold_remaining"] - 1, 0),
        )
        holding = (~above) & (s["hold_remaining"] > 0)
        below_hyst = level_db <= thr - DETECTOR_HYSTERESIS_DB
        is_open = jnp.where(
            above, True, jnp.where(holding, True, jnp.where(below_hyst, False, s["is_open"]))
        )
        peak_level = jnp.maximum(s["peak_level"], level_db)

        auto_relax = s["auto_relax_remaining"] > 0
        range_db = jnp.where(auto_relax, AUTO_RELAX_RANGE_DB, EXPANDER_RANGE_DB)
        level_score = _level_open_score(level_db, thr)
        detector_gr = jnp.where(
            is_open,
            0.0,
            jnp.clip((thr - level_db) * (1.0 - 1.0 / EXPANDER_RATIO), 0.0, range_db),
        )

        gain_prev = s["current_gain"]

        if vad_in_use:
            # ---- 35 ms posterior smoothing (`gate.rs:701-707`)
            smoothed = jnp.clip(
                sm_c * s["vad_smoothed_probability"] + (1.0 - sm_c) * prob, 0.0, 1.0
            )
            # ---- fused open score (`gate.rs:316-366`)
            vad_score = jnp.clip(prob, 0.0, 1.0)
            recent = jnp.where(s["fused_gate_open"] | (gain_prev > 0.35), 1.0, 0.0)
            if mode == VAD_ASSISTED:
                blended = jnp.clip(
                    0.55 * level_score + 0.45 * vad_score + 0.10 * recent, 0.0, 1.0
                )
                fused_score = jnp.where(
                    avail,
                    jnp.maximum(jnp.maximum(level_score, vad_score), blended),
                    0.85 * level_score + 0.15 * recent,
                )
            else:  # VAD_ONLY
                fused_score = jnp.where(
                    avail,
                    jnp.where(held, jnp.maximum(vad_score, FUSED_GATE_OPEN_SCORE), vad_score),
                    jnp.where(held, FUSED_GATE_OPEN_SCORE, 0.0),
                )
            fused_open = jnp.where(
                fused_score >= FUSED_GATE_OPEN_SCORE,
                True,
                jnp.where(fused_score <= FUSED_GATE_CLOSE_SCORE, False, s["fused_gate_open"]),
            )

            # ---- probabilistic state machine (`gate.rs:376-483`)
            close_margin = jnp.where(
                auto_relax, AUTO_RELAX_CLOSE_MARGIN, NORMAL_CLOSE_MARGIN
            )
            open_thr = vthr
            close_thr = jnp.clip(open_thr - close_margin, 0.02, open_thr)
            vad_open = avail & (
                (prob >= open_thr)
                | ((prob_delta >= VAD_ONSET_VELOCITY) & (prob >= close_thr))
            )
            vad_uncertain = avail & (prob >= close_thr)
            level_open = is_open | (level_score >= FUSED_GATE_OPEN_SCORE)
            level_uncertain = (level_score >= UNCERTAIN_LEVEL_SCORE) | (gain_prev > 0.12)
            cand_ok = (~avail) | vad_uncertain | (gain_prev > 0.20)
            level_cand = level_open & cand_ok
            fused_cand = fused_open & cand_ok
            hold_cand = held & cand_ok
            if mode == VAD_ASSISTED:
                strong_open = level_cand | fused_cand | hold_cand | vad_open
                sustain = (
                    strong_open
                    | vad_uncertain
                    | level_uncertain
                    | (auto_relax & (level_score > 0.08))
                )
            else:  # VAD_ONLY
                strong_open = held | vad_open
                sustain = strong_open | vad_uncertain | (auto_relax & (gain_prev > 0.12))
            releasing_sustain = sustain | ((gain_prev > 0.20) & (vad_uncertain | auto_relax))

            gs = s["gate_state"]
            # next-state given (strong_open, sustain, releasing_sustain)
            from_closed = jnp.where(strong_open, _OPENING, _CLOSED)
            from_opening = jnp.where(
                strong_open, _OPEN, jnp.where(sustain, _UNCERTAIN, _CLOSED)
            )
            common = jnp.where(
                strong_open,
                _OPENING,
                jnp.where(
                    sustain,
                    _UNCERTAIN,
                    jnp.where(releasing_sustain, _RELEASING, _CLOSED),
                ),
            )
            from_open = jnp.where(
                strong_open,
                _OPEN,
                jnp.where(
                    sustain,
                    _UNCERTAIN,
                    jnp.where(releasing_sustain, _RELEASING, _CLOSED),
                ),
            )
            new_gs = jnp.where(
                gs == _CLOSED,
                from_closed,
                jnp.where(
                    gs == _OPENING,
                    from_opening,
                    jnp.where(gs == _OPEN, from_open, common),
                ),
            ).astype(jnp.int32)
            prob_open = new_gs != _CLOSED
            force_close = ~prob_open

            # ---- continuous posterior attenuation (`gate.rs:485-553`)
            c_close = jnp.clip(
                open_thr - VAD_CONTINUOUS_CLOSE_MARGIN,
                0.02,
                jnp.maximum(open_thr - 0.02, 0.02),
            )
            span = jnp.maximum(open_thr - c_close, 1e-3)
            normalized = jnp.clip((smoothed - c_close) / span, 0.0, 1.0)
            speech_conf = normalized * normalized * (3.0 - 2.0 * normalized)
            closure = 1.0 - speech_conf
            closure = jnp.where(
                held & (smoothed >= vthr - VAD_CONTINUOUS_CLOSE_MARGIN),
                jnp.minimum(closure, 0.80),
                closure,
            )
            scale = (
                VAD_ASSISTED_CONTINUOUS_SCALE
                if mode == VAD_ASSISTED
                else VAD_ONLY_CONTINUOUS_SCALE
            )
            posterior_gr = jnp.where(avail, range_db * closure * scale, 0.0)
            target_gr = jnp.where(
                force_close, range_db, jnp.maximum(detector_gr, posterior_gr)
            )
            effective_open = prob_open
        else:
            smoothed = s["vad_smoothed_probability"]
            fused_score = level_score
            fused_open = s["fused_gate_open"]
            new_gs = s["gate_state"]
            target_gr = detector_gr
            effective_open = is_open

        # ---- chatter tracking (`gate.rs:574-623`)
        first = ~s["has_effective_gate_state"]
        transitioned = (~first) & (effective_open != s["effective_gate_open"])
        window_fresh = s["chatter_window_remaining"] == 0
        win = jnp.where(
            transitioned,
            jnp.where(
                window_fresh, config.chatter_window_samples, s["chatter_window_remaining"]
            ),
            s["chatter_window_remaining"],
        )
        cnt = jnp.where(
            transitioned,
            jnp.where(window_fresh, 1, s["chatter_transition_count"] + 1),
            s["chatter_transition_count"],
        )
        chatter_fire = (
            transitioned
            & (cnt >= CHATTER_TRANSITION_THRESHOLD)
            & (s["chatter_cooldown"] == 0)
        )
        events = s["chatter_event_count"] + chatter_fire.astype(jnp.int32)
        cooldown = jnp.where(
            chatter_fire, config.chatter_cooldown_samples, s["chatter_cooldown"]
        )
        relax = s["auto_relax_remaining"]
        if mode != THRESHOLD_ONLY:
            relax = jnp.where(chatter_fire, config.auto_relax_samples, relax)
        win = jnp.where(chatter_fire, 0, win)
        cnt = jnp.where(chatter_fire, 0, cnt)
        # advance timers (`gate.rs:574-588`)
        relax = jnp.maximum(relax - 1, 0)
        win_next = jnp.maximum(win - 1, 0)
        cnt = jnp.where((win > 0) & (win_next == 0), 0, cnt)
        cooldown = jnp.maximum(cooldown - 1, 0)

        # ---- gain smoothing (`gate.rs:626-635`)
        target_gain = jnp.power(10.0, -target_gr / 20.0)
        coeff = jnp.where(target_gain > gain_prev, atk_c, rel_c)
        gain = coeff * gain_prev + (1.0 - coeff) * target_gain
        y_t = (x64 * gain).astype(x_t.dtype)

        new_s = {
            "rms_envelope_sq": rms,
            "detector_level_db": level_db,
            "hold_remaining": hold.astype(jnp.int32),
            "current_gain": gain,
            "is_open": is_open,
            "effective_gate_open": jnp.where(
                first | transitioned, effective_open, s["effective_gate_open"]
            ),
            "has_effective_gate_state": jnp.full_like(first, True),
            "chatter_window_remaining": win_next.astype(jnp.int32),
            "chatter_transition_count": cnt.astype(jnp.int32),
            "chatter_cooldown": cooldown.astype(jnp.int32),
            "chatter_event_count": events,
            "gate_state": new_gs,
            "fused_gate_score": fused_score.astype(jnp.float32),
            "fused_gate_open": fused_open,
            "vad_smoothed_probability": smoothed,
            "previous_vad_probability": s["previous_vad_probability"],
            "auto_relax_remaining": relax.astype(jnp.int32),
            "peak_level": peak_level,
        }
        return new_s, y_t

    final, yt = jax.lax.scan(step, state, xt, unroll=scan_ops.seq_unroll())
    if vad_in_use:
        final = dict(final)
        final["previous_vad_probability"] = prob
    y = jnp.moveaxis(yt, 0, -1)
    metrics = {
        "is_open": final["is_open"],
        "gain": final["current_gain"],
        "chatter_events": final["chatter_event_count"],
        "fused_score": final["fused_gate_score"],
        "gate_state": final["gate_state"],
        "detector_level_db": final["detector_level_db"],
        "auto_relax_active": final["auto_relax_remaining"] > 0,
    }
    return final, y, metrics
