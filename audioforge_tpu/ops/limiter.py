"""Lookahead hard limiter, fully parallel.

Behavioural contract mirrors the reference limiter
(`rust-core/src/dsp/limiter.rs`):

- Lookahead ``W = clamp(round(lookahead_ms/1000*fs), 1, 1024)`` samples,
  default 2 ms (`limiter.rs:101-131`); decision window is the lookahead span
  *including* the just-arrived sample (W+1 samples, `limiter.rs:282-295`).
- Target gain ``ceiling/peak`` when the window peak exceeds the ceiling
  (`limiter.rs:297-301`).
- Instant attack, one-pole release toward the target
  (`limiter.rs:303-308`).
- Output = W-delayed sample * gain, then hard clamp to +-ceiling
  (`limiter.rs:276,321-322`).
- Peak gain-reduction metering with reset (`limiter.rs:200-205`).

TPU-native design: the monotonic max queue becomes a parallel sliding-window
max (:func:`..ops.scan.sliding_window_max`), and the attack/release gain
recurrence becomes an associative max-affine scan
(:func:`..ops.scan.max_affine_scan`) — no per-sample loop anywhere.
"""

from __future__ import annotations

from dataclasses import dataclass

import jax.numpy as jnp

from . import util
from .scan import max_affine_scan, sliding_window_max

__all__ = [
    "LimiterConfig",
    "limiter_init",
    "limiter_params",
    "limiter_process",
    "limiter_reset",
]

MAX_LOOKAHEAD_SAMPLES = 1024


@dataclass(frozen=True)
class LimiterConfig:
    """Static limiter parameters. ``lookahead_ms`` is fixed at construction
    in the reference too (`limiter.rs:101-131`); changing it rebuilds the
    stage."""

    ceiling_db: float = -1.0
    release_ms: float = 50.0
    lookahead_ms: float = 2.0
    sample_rate: float = 48000.0
    enabled: bool = True

    @property
    def lookahead_samples(self) -> int:
        w = round(
            min(max(self.lookahead_ms, 0.1), 10.0) / 1000.0 * self.sample_rate
        )
        return int(min(max(w, 1), MAX_LOOKAHEAD_SAMPLES))

    @property
    def ceiling_linear(self) -> float:
        return float(util.db_to_linear(self.ceiling_db))

    @property
    def release_coeff(self) -> float:
        return float(
            util.time_constant_to_coeff(self.release_ms / 1000.0, self.sample_rate)
        )


def limiter_init(config: LimiterConfig, batch_shape=()):
    W = config.lookahead_samples
    return {
        # delay/history: the last W input samples (oldest first)
        "history": jnp.zeros(batch_shape + (W,), jnp.float32),
        "gain": jnp.ones(batch_shape, jnp.float32),
        "peak_gr_db": jnp.zeros(batch_shape, jnp.float32),
    }


def limiter_reset(state):
    return {
        "history": jnp.zeros_like(state["history"]),
        "gain": jnp.ones_like(state["gain"]),
        "peak_gr_db": jnp.zeros_like(state["peak_gr_db"]),
    }


def limiter_params(config: LimiterConfig, ceiling_db=None, release_ms=None):
    """Traced numeric parameters; live control edits never recompile
    (control = replace-params-pytree at block boundaries)."""
    ceiling_db = config.ceiling_db if ceiling_db is None else ceiling_db
    release_ms = config.release_ms if release_ms is None else release_ms
    return {
        "ceiling_linear": jnp.float32(util.db_to_linear(ceiling_db)),
        "release_coeff": jnp.float32(
            util.time_constant_to_coeff(release_ms / 1000.0, config.sample_rate)
        ),
    }


def limiter_process(config: LimiterConfig, state, x, params=None):
    """Limit a block ``x: [..., T]``. Returns ``(new_state, y, metrics)``.

    ``metrics = {"peak_gr_db": block max gain reduction in dB}``; the
    running ``peak_gr_db`` in the state accumulates until the caller resets
    it (mirrors `limiter.rs:200-205`). ``params`` (from
    :func:`limiter_params`) overrides ceiling/release as traced values.
    """
    if not config.enabled:
        return state, x, {"peak_gr_db": jnp.zeros_like(state["gain"])}

    W = config.lookahead_samples
    if params is None:
        ceiling = jnp.float32(config.ceiling_linear)
        rc = jnp.float32(config.release_coeff)
    else:
        ceiling = params["ceiling_linear"]
        rc = params["release_coeff"]

    hist = state["history"]
    ext = jnp.concatenate([hist, x], axis=-1)
    # Decision peak at sample t: max |x| over the W+1 window [t-W, t].
    peak = sliding_window_max(jnp.abs(ext), W + 1)[..., W:]
    target = jnp.where(peak > ceiling, ceiling / jnp.maximum(peak, 1e-30), 1.0)

    # Gain deficit u = 1 - g: u_t = max(1-target, rc*u_{t-1} + (1-rc)*(1-target))
    v = 1.0 - target
    u = max_affine_scan(v, rc, (1.0 - rc) * v, 1.0 - state["gain"])
    gain = 1.0 - u

    delayed = ext[..., :x.shape[-1]]
    y = jnp.clip(delayed * gain, -ceiling, ceiling)

    min_gain = jnp.min(gain, axis=-1)
    block_gr_db = jnp.where(
        min_gain < 1.0, -util.linear_to_db(jnp.maximum(min_gain, 1e-10)), 0.0
    ).astype(jnp.float32)
    new_state = {
        "history": ext[..., -W:],
        "gain": gain[..., -1],
        "peak_gr_db": jnp.maximum(state["peak_gr_db"], block_gr_db),
    }
    return new_state, y, {"peak_gr_db": block_gr_db}


def latency_samples(config: LimiterConfig) -> int:
    """Lookahead delay contributed to chain latency
    (`resampling.rs:36-79` accounting)."""
    return config.lookahead_samples if config.enabled else 0
