"""VAD auto-gate controller: hold/debounce + auto noise-floor tracking.

Behavioural contract mirrors ``VadAutoGate`` (`rust-core/src/dsp/vad.rs`):

- Hold timer (default 200 ms) with 50 ms closed-time debounce before a
  rising edge may restart the timer (`vad.rs:600-615,931-972`); the closed
  counter starts "matured" so the first utterance opens immediately
  (`vad.rs:655-657`).
- Auto noise-floor tracker: a 250-frame circular history of low-posterior
  (< 0.3) frame RMS values with an incremental 61-bin 1 dB histogram;
  the 20th-percentile bin is the candidate floor, slewed +0.5 / -0.1 dB per
  frame and clamped to [-80, -20] dB (`vad.rs:56-63,734-808`).
- ``noise_floor_reliability`` = maturity x stationarity where stationarity
  is a smoothstep of the p80-p20 spread (`vad.rs:810-827`).
- Gate threshold = floor + margin (default 10 dB), clamped [-80, -10]
  (`vad.rs:640-646,918-929`); manual mode honours the user threshold.
- Open decision per mode: ThresholdOnly -> level, VadAssisted -> level OR
  posterior > threshold, VadOnly -> posterior only (`vad.rs:855-905`).
- ``without_backend`` consumption of external worker posteriors
  (`vad.rs:668-732`) is the native mode here: the posterior always arrives
  as a per-block input (the Silero model runs as batched XLA inference off
  the hot path, mirroring `processor/vad_worker.rs`).

Everything is block-cadence ``jnp.where`` math — no per-sample state — so a
vmapped batch of streams costs one VPU pass per block.
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

__all__ = ["VadGateConfig", "vad_gate_init", "vad_gate_reset", "vad_gate_process"]

NOISE_FLOOR_HISTORY_FRAMES = 250
NOISE_FLOOR_BIN_COUNT = 61
NOISE_FLOOR_BIN_MIN_DB = -80.0
NOISE_FLOOR_BIN_STEP_DB = 1.0
NOISE_FLOOR_ELIGIBLE_PROB_MAX = 0.3
NOISE_FLOOR_UP_SLEW_DB_PER_FRAME = 0.5
NOISE_FLOOR_DOWN_SLEW_DB_PER_FRAME = 0.1

THRESHOLD_ONLY = 0
VAD_ASSISTED = 1
VAD_ONLY = 2


@dataclass(frozen=True)
class VadGateConfig:
    sample_rate: int = 48000
    gate_mode: int = THRESHOLD_ONLY
    vad_threshold: float = 0.5
    margin_db: float = 10.0
    min_threshold_db: float = -80.0
    max_threshold_db: float = -10.0
    manual_threshold_db: float = -40.0
    auto_threshold_enabled: bool = True
    hold_time_ms: float = 200.0
    debounce_time_ms: float = 50.0
    enabled: bool = True


def vad_gate_init(config: VadGateConfig, batch_shape=()):
    f = lambda v: jnp.full(batch_shape, v, jnp.float32)
    return {
        "noise_floor": f(-60.0),
        "hold_timer": f(0.0),
        "timer_running": jnp.zeros(batch_shape, jnp.bool_),
        "prev_gate_open": jnp.zeros(batch_shape, jnp.bool_),
        # matured so the first utterance opens immediately (`vad.rs:655-657`)
        "closed_counter": f(config.sample_rate * 0.05),
        "hist": jnp.zeros(batch_shape + (NOISE_FLOOR_HISTORY_FRAMES,), jnp.float32),
        "hist_len": jnp.zeros(batch_shape, jnp.int32),
        "hist_cursor": jnp.zeros(batch_shape, jnp.int32),
        "bins": jnp.zeros(batch_shape + (NOISE_FLOOR_BIN_COUNT,), jnp.int32),
        "current_probability": f(0.0),
    }


def vad_gate_reset(config: VadGateConfig, state):
    return vad_gate_init(config, state["noise_floor"].shape)


def _bin_index(sample_db):
    raw = jnp.round((sample_db - NOISE_FLOOR_BIN_MIN_DB) / NOISE_FLOOR_BIN_STEP_DB)
    return jnp.clip(raw, 0, NOISE_FLOOR_BIN_COUNT - 1).astype(jnp.int32)


def _percentile_from_bins(bins, hist_len, percentile):
    """Bounded percentile extraction (`vad.rs:793-807`). Returns the bin's
    dB value; callers gate on ``hist_len > 0``."""
    target = jnp.minimum(
        jnp.floor(hist_len.astype(jnp.float32) * percentile).astype(jnp.int32),
        jnp.maximum(hist_len - 1, 0),
    )
    cum = jnp.cumsum(bins, axis=-1)
    hit = cum > target[..., None]
    # first bin where cumulative > target
    idx = jnp.argmax(hit, axis=-1)
    found = jnp.any(hit, axis=-1)
    value = NOISE_FLOOR_BIN_MIN_DB + idx.astype(jnp.float32) * NOISE_FLOOR_BIN_STEP_DB
    return value, found


def noise_floor_reliability(state):
    """`vad.rs:810-827`."""
    hist_len = state["hist_len"]
    maturity = jnp.clip(
        hist_len.astype(jnp.float32) / NOISE_FLOOR_HISTORY_FRAMES, 0.0, 1.0
    )
    p20, _ = _percentile_from_bins(state["bins"], hist_len, 0.20)
    p80, _ = _percentile_from_bins(state["bins"], hist_len, 0.80)
    spread = jnp.maximum(p80 - p20, 0.0)
    t = jnp.clip((spread - 3.0) / 7.0, 0.0, 1.0)
    stationarity = 1.0 - t * t * (3.0 - 2.0 * t)
    rel = jnp.clip(maturity * stationarity, 0.0, 1.0)
    return jnp.where(hist_len > 0, rel, 0.0)


@partial(jax.jit, static_argnames=("config", "block_samples"))
def vad_gate_process(config: VadGateConfig, state, rms_db, probability,
                     probability_available, block_samples: int, params=None):
    """One control-block update.

    ``rms_db``: block RMS in dBFS (per stream); ``probability``: external
    worker posterior (clamped), ``probability_available``: freshness flag.
    Returns ``(new_state, outputs)`` where outputs carry
    {gate_open, probability, threshold_db, noise_floor_db, reliability}.
    ``params`` may carry traced overrides for the continuous knobs
    {vad_threshold, margin_db, hold_time_ms} so live edits never recompile.
    """
    vad_threshold = config.vad_threshold
    margin_db = config.margin_db
    hold_time_ms = config.hold_time_ms
    if params is not None:
        vad_threshold = params.get("vad_threshold", vad_threshold)
        margin_db = params.get("margin_db", margin_db)
        hold_time_ms = params.get("hold_time_ms", hold_time_ms)
    if not config.enabled:
        out = {
            "gate_open": jnp.zeros_like(state["prev_gate_open"]),
            "probability": jnp.zeros_like(state["current_probability"]),
            "threshold_db": jnp.full_like(state["noise_floor"], config.manual_threshold_db),
            "noise_floor_db": state["noise_floor"],
            "reliability": jnp.zeros_like(state["noise_floor"]),
        }
        return state, out

    prob = jnp.clip(jnp.asarray(probability, jnp.float32), 0.0, 1.0)
    avail = jnp.asarray(probability_available, jnp.bool_)
    prob = jnp.where(avail, prob, 0.0)
    rms_db = jnp.asarray(rms_db, jnp.float32)

    # ---- noise floor update (`vad.rs:734-760`)
    eligible = (
        config.auto_threshold_enabled
        & (prob < NOISE_FLOOR_ELIGIBLE_PROB_MAX)
        & (rms_db > -100.0)
    )
    bin_idx = _bin_index(rms_db)
    hist_len = state["hist_len"]
    full = hist_len >= NOISE_FLOOR_HISTORY_FRAMES
    write_idx = jnp.where(full, state["hist_cursor"], hist_len)
    old_val = jnp.take_along_axis(state["hist"], write_idx[..., None], axis=-1)[..., 0]
    old_bin = _bin_index(old_val)

    one_hot_new = jax.nn.one_hot(bin_idx, NOISE_FLOOR_BIN_COUNT, dtype=jnp.int32)
    one_hot_old = jax.nn.one_hot(old_bin, NOISE_FLOOR_BIN_COUNT, dtype=jnp.int32)
    bins_delta = one_hot_new - jnp.where(full[..., None], one_hot_old, 0)
    new_bins = jnp.where(eligible[..., None], state["bins"] + bins_delta, state["bins"])
    # scatter the new value at write_idx (batched)
    scatter_mask = (
        jnp.arange(NOISE_FLOOR_HISTORY_FRAMES) == write_idx[..., None]
    )
    new_hist = jnp.where(
        eligible[..., None] & scatter_mask, rms_db[..., None], state["hist"]
    )
    new_len = jnp.where(
        eligible, jnp.minimum(hist_len + 1, NOISE_FLOOR_HISTORY_FRAMES), hist_len
    )
    new_cursor = jnp.where(
        eligible & full,
        (state["hist_cursor"] + 1) % NOISE_FLOOR_HISTORY_FRAMES,
        state["hist_cursor"],
    )

    cand, found = _percentile_from_bins(new_bins, new_len, 0.20)
    delta = cand - state["noise_floor"]
    slewed = state["noise_floor"] + jnp.clip(
        delta, -NOISE_FLOOR_DOWN_SLEW_DB_PER_FRAME, NOISE_FLOOR_UP_SLEW_DB_PER_FRAME
    )
    new_floor = jnp.where(
        eligible & found & (new_len > 0),
        jnp.clip(slewed, -80.0, -20.0),
        state["noise_floor"],
    )

    # ---- threshold + raw open decision (`vad.rs:855-929`)
    if config.auto_threshold_enabled:
        threshold = jnp.clip(
            new_floor + margin_db, config.min_threshold_db, config.max_threshold_db
        )
    else:
        threshold = jnp.full_like(
            new_floor,
            float(
                np.clip(
                    config.manual_threshold_db,
                    config.min_threshold_db,
                    config.max_threshold_db,
                )
            ),
        )
    level_open = rms_db >= threshold
    vad_speech = prob > vad_threshold
    if config.gate_mode == THRESHOLD_ONLY:
        gate_open = level_open
    elif config.gate_mode == VAD_ASSISTED:
        gate_open = level_open | vad_speech
    else:
        gate_open = vad_speech

    # ---- hold + debounce (`vad.rs:931-972`)
    debounce_samples = config.debounce_time_ms / 1000.0 * config.sample_rate
    rising = gate_open & ~state["prev_gate_open"]
    debounce_ready = state["closed_counter"] >= debounce_samples
    debounced = jnp.where(rising & ~debounce_ready, False, gate_open)

    hold_samples = hold_time_ms / 1000.0 * config.sample_rate
    hold_timer = jnp.where(debounced, hold_samples, state["hold_timer"])
    timer_running = jnp.where(debounced, True, state["timer_running"])
    closed_counter = jnp.where(
        debounced, 0.0, state["closed_counter"] + float(block_samples)
    )
    hold_timer = jnp.where(timer_running, hold_timer - float(block_samples), hold_timer)
    expired = timer_running & (hold_timer <= 0.0)
    hold_timer = jnp.where(expired, 0.0, hold_timer)
    timer_running = jnp.where(expired, False, timer_running)

    smoothed_open = debounced | timer_running

    new_state = {
        "noise_floor": new_floor,
        "hold_timer": hold_timer,
        "timer_running": timer_running,
        "prev_gate_open": debounced,
        "closed_counter": closed_counter,
        "hist": new_hist,
        "hist_len": new_len,
        "hist_cursor": new_cursor,
        "bins": new_bins,
        "current_probability": prob,
    }
    reliability = noise_floor_reliability(new_state)
    out = {
        "gate_open": smoothed_open,
        "probability": prob,
        "threshold_db": threshold,
        "noise_floor_db": new_floor,
        "reliability": reliability,
    }
    return new_state, out


def compute_rms_db(x):
    """Block RMS in dBFS (`vad.rs` compute_rms_db helper)."""
    power = jnp.mean(x * x, axis=-1)
    return jnp.where(
        power > 0, 10.0 * jnp.log10(jnp.maximum(power, 1e-30)), -100.0
    )
