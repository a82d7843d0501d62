"""Shared DSP math helpers.

TPU-native re-expression of the reference utility math
(`rust-core/src/dsp/util.rs:3-20`): time-constant to one-pole coefficient and
dB <-> linear conversions. All helpers work with plain Python floats, numpy
arrays (host-side f64 coefficient computation) and jnp arrays (traced use).
"""

from __future__ import annotations

import math

import jax.numpy as jnp
import numpy as np

__all__ = [
    "time_constant_to_coeff",
    "db_to_linear",
    "linear_to_db",
    "DB_EPS",
]

# Floor used when converting linear magnitude to dB so silence stays finite.
DB_EPS = 1e-10


def time_constant_to_coeff(time_constant_s, sample_rate):
    """One-pole smoothing coefficient for a given time constant.

    ``coeff = exp(-1 / (tau * fs))``; smoothing is ``y += (1-coeff)*(x-y)``.
    Matches `rust-core/src/dsp/util.rs:3-9`.
    """
    if isinstance(time_constant_s, (float, int)) and isinstance(
        sample_rate, (float, int)
    ):
        if time_constant_s <= 0.0:
            return 0.0
        return math.exp(-1.0 / (float(time_constant_s) * float(sample_rate)))
    xp = jnp if isinstance(time_constant_s, jnp.ndarray) else np
    tau = xp.asarray(time_constant_s)
    out = xp.exp(-1.0 / (tau * sample_rate))
    return xp.where(tau <= 0.0, xp.zeros_like(out), out)


def db_to_linear(db):
    """dB -> linear amplitude (`rust-core/src/dsp/util.rs:11-14`)."""
    if isinstance(db, (float, int)):
        return 10.0 ** (float(db) / 20.0)
    xp = jnp if isinstance(db, jnp.ndarray) else np
    return xp.power(10.0, xp.asarray(db) / 20.0)


def linear_to_db(linear, floor_db=-120.0):
    """Linear amplitude -> dB with a finite floor
    (`rust-core/src/dsp/util.rs:16-20`)."""
    if isinstance(linear, (float, int)):
        return 20.0 * math.log10(max(abs(float(linear)), DB_EPS))
    xp = jnp if isinstance(linear, jnp.ndarray) else np
    mag = xp.maximum(xp.abs(xp.asarray(linear)), DB_EPS)
    out = 20.0 * xp.log10(mag)
    return xp.maximum(out, floor_db)
