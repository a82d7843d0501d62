"""ITU-R BS.1770-4 / EBU R128 loudness, implemented from the standard.

The reference wraps the ``ebur128`` crate (`rust-core/src/dsp/loudness.rs:17`,
momentary 400 ms mode for the realtime auto-makeup control and a gated mono
``integrated_loudness_lufs`` helper, `loudness.rs:48-113`). Here the meter is
built from first principles so it runs on-device:

- K-weighting prefilter: stage 1 high-shelf (+~4 dB above ~1.5 kHz), stage 2
  high-pass (~38 Hz), both derived parametrically from the BS.1770 analog
  prototypes so any whitelisted sample rate works
  (`loudness.rs:36-41` rate whitelist).
- Momentary loudness: -0.691 + 10*log10(mean square over the last 400 ms).
- Integrated loudness: 400 ms blocks at 75 % overlap, -70 LUFS absolute gate,
  then -10 LU relative gate (BS.1770-4 gating), mono channel weight 1.0.

The streaming meter keeps a ring of per-10 ms-block K-weighted energies so
momentary loudness is exact at control-block cadence without per-sample state.
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from . import biquad

__all__ = [
    "VALID_SAMPLE_RATES",
    "k_weighting_coefficients",
    "integrated_loudness_lufs",
    "momentary_slices_lufs",
    "meter_init",
    "meter_process",
]

VALID_SAMPLE_RATES = (8000, 16000, 32000, 44100, 48000, 88200, 96000)

# Analog prototype constants from the BS.1770-4 filter derivation (the
# standard tabulates the 48 kHz coefficients; these reproduce them exactly
# and generalise to other rates).
_SHELF_F0 = 1681.9744509555319
_SHELF_GAIN_DB = 3.999843853973347
_SHELF_Q = 0.7071752369554196
_HP_F0 = 38.13547087602444
_HP_Q = 0.5003270373238773


def k_weighting_coefficients(sample_rate: float) -> np.ndarray:
    """``(2, 5)`` float64 normalised biquad coefficients [b0,b1,b2,a1,a2]."""
    fs = float(sample_rate)

    # Stage 1: high shelf via bilinear transform of the analog prototype.
    db = _SHELF_GAIN_DB
    f0 = _SHELF_F0
    q = _SHELF_Q
    K = np.tan(np.pi * f0 / fs)
    Vh = 10.0 ** (db / 20.0)
    Vb = Vh ** 0.4996667741545416
    a0 = 1.0 + K / q + K * K
    b = np.array([
        (Vh + Vb * K / q + K * K) / a0,
        2.0 * (K * K - Vh) / a0,
        (Vh - Vb * K / q + K * K) / a0,
    ])
    a = np.array([1.0, 2.0 * (K * K - 1.0) / a0, (1.0 - K / q + K * K) / a0])
    shelf = np.array([b[0], b[1], b[2], a[1], a[2]])

    # Stage 2: high pass.
    K = np.tan(np.pi * _HP_F0 / fs)
    q = _HP_Q
    a0 = 1.0 + K / q + K * K
    a1 = 2.0 * (K * K - 1.0) / a0
    a2 = (1.0 - K / q + K * K) / a0
    hp = np.array([1.0, -2.0, 1.0, a1, a2])
    return np.stack([shelf, hp])


def _k_weight_np(x: np.ndarray, sample_rate: float) -> np.ndarray:
    """Host float64 K-weighting (offline helpers)."""
    from scipy.signal import lfilter

    c = k_weighting_coefficients(sample_rate)
    y = x.astype(np.float64)
    for stage in c:
        y = lfilter(stage[:3], np.concatenate([[1.0], stage[3:]]), y)
    return y


def integrated_loudness_lufs(samples, sample_rate: int) -> float:
    """Gated mono integrated loudness per BS.1770-4
    (`loudness.rs:48-75` contract: rate whitelist, finite input, finite
    result)."""
    sample_rate = int(sample_rate)
    if sample_rate not in VALID_SAMPLE_RATES:
        raise ValueError(f"invalid sample rate: {sample_rate}")
    x = np.asarray(samples, np.float64)
    if x.size == 0:
        raise ValueError("at least one sample is required")
    if not np.all(np.isfinite(x)):
        raise ValueError("samples must be finite")

    y = _k_weight_np(x, sample_rate)
    block = int(round(0.4 * sample_rate))
    hop = max(1, int(round(0.1 * sample_rate)))
    if len(y) < block:
        raise ValueError("audio did not produce a finite gated loudness")
    n_blocks = 1 + (len(y) - block) // hop
    idx = np.arange(n_blocks)[:, None] * hop + np.arange(block)[None, :]
    power = np.mean(y[idx] ** 2, axis=1)
    loud = -0.691 + 10.0 * np.log10(np.maximum(power, 1e-30))

    abs_mask = loud > -70.0
    if not np.any(abs_mask):
        raise ValueError("audio did not produce a finite gated loudness")
    rel_threshold = (
        -0.691 + 10.0 * np.log10(np.mean(power[abs_mask])) - 10.0
    )
    mask = abs_mask & (loud > rel_threshold)
    if not np.any(mask):
        raise ValueError("audio did not produce a finite gated loudness")
    return float(-0.691 + 10.0 * np.log10(np.mean(power[mask])))


def momentary_slices_lufs(samples, sample_rate: int, hop_s: float = 0.1):
    """Host helper: momentary (400 ms) loudness at ``hop_s`` cadence."""
    y = _k_weight_np(np.asarray(samples, np.float64), sample_rate)
    block = int(round(0.4 * sample_rate))
    hop = max(1, int(round(hop_s * sample_rate)))
    if len(y) < block:
        return np.empty(0)
    n = 1 + (len(y) - block) // hop
    idx = np.arange(n)[:, None] * hop + np.arange(block)[None, :]
    power = np.mean(y[idx] ** 2, axis=1)
    return -0.691 + 10.0 * np.log10(np.maximum(power, 1e-30))


# --------------------------------------------------------------------------
# Streaming momentary meter (device-side, block cadence).
# --------------------------------------------------------------------------


def meter_init(sample_rate: float = 48000.0, block_samples: int = 480, batch_shape=()):
    """State for the streaming momentary meter.

    The 400 ms momentary window is a ring of per-block K-weighted mean-square
    energies (40 blocks at 10 ms cadence).
    """
    n_ring = max(1, int(round(0.4 * sample_rate / block_samples)))
    coeffs = k_weighting_coefficients(sample_rate).astype(np.float32)
    return {
        "kz": jnp.zeros(batch_shape + (2, 2), jnp.float32),
        "ring": jnp.zeros(batch_shape + (n_ring,), jnp.float32),
        "filled": jnp.zeros(batch_shape, jnp.int32),
        "coeffs": jnp.asarray(coeffs),
    }


def meter_process(state, x):
    """Feed one block ``x: [..., T]``; returns ``(new_state, momentary_lufs)``.

    LUFS is -100 until the 400 ms window has filled (mirrors the reference's
    -100 startup value, `loudness.rs:112`).
    """
    y = x
    kz = state["kz"]
    zs = []
    for stage in range(2):
        y, z_out = biquad.apply(state["coeffs"][stage], kz[..., stage, :], y)
        zs.append(z_out)
    new_kz = jnp.stack(zs, axis=-2)

    energy = jnp.mean(y * y, axis=-1)
    ring = jnp.concatenate(
        [state["ring"][..., 1:], energy[..., None]], axis=-1
    )
    n_ring = ring.shape[-1]
    filled = jnp.minimum(state["filled"] + 1, n_ring)
    power = jnp.mean(ring, axis=-1)
    lufs = jnp.where(
        filled >= n_ring,
        -0.691 + 10.0 * jnp.log10(jnp.maximum(power, 1e-30)),
        -100.0,
    )
    return (
        {"kz": new_kz, "ring": ring, "filled": filled, "coeffs": state["coeffs"]},
        lufs,
    )
