"""RBJ biquad filters as TPU-parallel associative scans.

Behavioural contract mirrors the reference biquad
(`rust-core/src/dsp/biquad.rs`):

- RBJ Audio-EQ-Cookbook coefficients, normalised so ``a0 = 1``
  (`biquad.rs:110-182`); coefficients are designed in float64 on host and
  applied in float32 on device.
- Direct Form II Transposed recurrence (`biquad.rs:262-274`)::

      y  = b0*x + z1
      z1' = b1*x - a1*y + z2
      z2' = b2*x - a2*y

- Live coefficient edits crossfade over 1.5 ms by running a *pending* filter
  lane (seeded from the active lane's state) in parallel and linearly
  blending, then promoting the pending lane (`biquad.rs:288-327`).
- ``reset`` commits the target coefficients immediately and clears state
  (`biquad.rs:341-347`).

TPU-native design: instead of a per-sample loop, the recurrence is rewritten
in state-space form ``z_t = A z_{t-1} + B x_t`` with

    A = [[-a1, 1], [-a2, 0]],  B = [b1 - a1*b0, b2 - a2*b0]

and evaluated for a whole block with one associative scan
(:func:`audioforge_tpu.ops.scan.affine_scan_2x2`). Both crossfade lanes are
stacked on a lane axis so a unit is always branch-free; when no crossfade is
active the two lanes are identical by construction.
"""

from __future__ import annotations

from functools import lru_cache, partial

import numpy as np
import jax
import jax.numpy as jnp

from .scan import affine_scan_2x2, affine_scan_2x2_compensated

__all__ = [
    "BYPASS",
    "LOW_SHELF",
    "HIGH_SHELF",
    "PEAKING",
    "NOTCH",
    "HIGH_PASS",
    "LOW_PASS",
    "MIN_BIQUAD_Q",
    "COEFF_CROSSFADE_MS",
    "MAX_COEFF_CROSSFADE_SAMPLES",
    "crossfade_samples",
    "design",
    "magnitude_response_db",
    "apply",
    "unit_init",
    "unit_schedule",
    "unit_set_immediate",
    "unit_reset_state",
    "unit_process",
]

# Filter type codes (stable across config/persistence, independent of the
# reference's Rust enum ordering).
BYPASS = 0
LOW_SHELF = 1
HIGH_SHELF = 2
PEAKING = 3
NOTCH = 4
HIGH_PASS = 5
LOW_PASS = 6

MIN_BIQUAD_Q = 1e-6
COEFF_CROSSFADE_MS = 1.5
MAX_COEFF_CROSSFADE_SAMPLES = 4096


def crossfade_samples(sample_rate: float) -> int:
    """Crossfade length in samples (`biquad.rs:12-19`)."""
    samples = round(float(sample_rate) * COEFF_CROSSFADE_MS / 1000.0)
    if not np.isfinite(samples):
        return 1
    return int(min(max(samples, 1), MAX_COEFF_CROSSFADE_SAMPLES))


def design(filter_type, frequency, gain_db, q, sample_rate, xp=np):
    """RBJ coefficients, normalised, stacked as ``[..., 5] = [b0,b1,b2,a1,a2]``.

    Vectorised and branch-free so it works with numpy (host float64 design)
    and jnp (traced, e.g. vmapped calibration sweeps). ``filter_type`` is an
    integer code array broadcastable with the float parameters
    (`biquad.rs:110-182`).
    """
    ft = xp.asarray(filter_type)
    freq = xp.asarray(frequency, dtype=xp.float64 if xp is np else None)
    gain = xp.asarray(gain_db, dtype=xp.float64 if xp is np else None)
    qv = xp.maximum(xp.asarray(q, dtype=xp.float64 if xp is np else None), MIN_BIQUAD_Q)

    omega = 2.0 * np.pi * freq / sample_rate
    sin_w = xp.sin(omega)
    cos_w = xp.cos(omega)
    alpha = sin_w / (2.0 * qv)
    a = xp.power(10.0, gain / 40.0)  # sqrt(10^(dB/20))
    sqrt_a2alpha = 2.0 * xp.sqrt(a) * alpha

    one = xp.ones_like(cos_w)
    zero = xp.zeros_like(cos_w)

    def norm(b0, b1, b2, a0, a1, a2):
        return xp.stack([b0 / a0, b1 / a0, b2 / a0, a1 / a0, a2 / a0], axis=-1)

    peaking = norm(
        1.0 + alpha * a, -2.0 * cos_w, 1.0 - alpha * a,
        1.0 + alpha / a, -2.0 * cos_w, 1.0 - alpha / a,
    )
    low_shelf = norm(
        a * ((a + 1.0) - (a - 1.0) * cos_w + sqrt_a2alpha),
        2.0 * a * ((a - 1.0) - (a + 1.0) * cos_w),
        a * ((a + 1.0) - (a - 1.0) * cos_w - sqrt_a2alpha),
        (a + 1.0) + (a - 1.0) * cos_w + sqrt_a2alpha,
        -2.0 * ((a - 1.0) + (a + 1.0) * cos_w),
        (a + 1.0) + (a - 1.0) * cos_w - sqrt_a2alpha,
    )
    high_shelf = norm(
        a * ((a + 1.0) + (a - 1.0) * cos_w + sqrt_a2alpha),
        -2.0 * a * ((a - 1.0) + (a + 1.0) * cos_w),
        a * ((a + 1.0) + (a - 1.0) * cos_w - sqrt_a2alpha),
        (a + 1.0) - (a - 1.0) * cos_w + sqrt_a2alpha,
        2.0 * ((a - 1.0) - (a + 1.0) * cos_w),
        (a + 1.0) - (a - 1.0) * cos_w - sqrt_a2alpha,
    )
    notch = norm(
        one, -2.0 * cos_w, one, 1.0 + alpha, -2.0 * cos_w, 1.0 - alpha
    )
    high_pass = norm(
        (1.0 + cos_w) / 2.0, -(1.0 + cos_w), (1.0 + cos_w) / 2.0,
        1.0 + alpha, -2.0 * cos_w, 1.0 - alpha,
    )
    low_pass = norm(
        (1.0 - cos_w) / 2.0, 1.0 - cos_w, (1.0 - cos_w) / 2.0,
        1.0 + alpha, -2.0 * cos_w, 1.0 - alpha,
    )
    bypass = xp.stack([one, zero, zero, zero, zero], axis=-1)

    ft_b = ft[..., None]
    out = bypass
    out = xp.where(ft_b == LOW_SHELF, low_shelf, out)
    out = xp.where(ft_b == HIGH_SHELF, high_shelf, out)
    out = xp.where(ft_b == PEAKING, peaking, out)
    out = xp.where(ft_b == NOTCH, notch, out)
    out = xp.where(ft_b == HIGH_PASS, high_pass, out)
    out = xp.where(ft_b == LOW_PASS, low_pass, out)
    return out


def magnitude_response_db(coeffs, frequencies, sample_rate, xp=np):
    """Exact |H| in dB at ``frequencies`` for coefficients ``[..., 5]``.

    Mirrors `biquad.rs:184-214` (`coefficient_magnitude_response_db`). The
    coefficient axis broadcasts against the frequency axis: result shape is
    ``coeffs.shape[:-1] + frequencies.shape``.
    """
    c = xp.asarray(coeffs)
    freqs = xp.asarray(frequencies)
    shape = c.shape[:-1] + (1,) * freqs.ndim
    b0 = c[..., 0].reshape(shape)
    b1 = c[..., 1].reshape(shape)
    b2 = c[..., 2].reshape(shape)
    a1 = c[..., 3].reshape(shape)
    a2 = c[..., 4].reshape(shape)
    omega = 2.0 * np.pi * freqs / sample_rate
    cw, sw = xp.cos(omega), xp.sin(omega)
    c2w, s2w = xp.cos(2.0 * omega), xp.sin(2.0 * omega)
    num_re = b0 + b1 * cw + b2 * c2w
    num_im = -b1 * sw - b2 * s2w
    den_re = 1.0 + a1 * cw + a2 * c2w
    den_im = -a1 * sw - a2 * s2w
    num_p = num_re * num_re + num_im * num_im
    den_p = den_re * den_re + den_im * den_im
    eps = 1e-30
    return 10.0 * xp.log10(xp.maximum(num_p, eps) / xp.maximum(den_p, eps))


@partial(jax.jit, static_argnames=("compensated",))
def apply(coeffs, z, x, compensated=True):
    """Filter a block through one biquad via associative scan.

    ``coeffs``: ``[..., 5]`` (static per block) or ``[..., T, 5]``
    (time-varying — used by dynamic EQ stages). ``z``: ``[..., 2]`` carried
    state ``(z1, z2)``. ``x``: ``[..., T]``. Returns ``(y, z_out)``.

    ``compensated=True`` (default) runs the scan in double-word f32 (see
    :func:`audioforge_tpu.ops.scan.affine_scan_2x2_compensated`). The
    reference keeps all biquad state in f64 precisely because f32 recursion
    is not accurate enough (`biquad.rs:2-3`): measured on white noise, a
    plain-f32 scan deviates ~7e-3 RMS for the 80 Hz high-pass and ~3e-4 for
    the Q=36 hum notch — both over the <1e-4 parity budget — while the
    compensated scan stays ~1e-5. Pass ``compensated=False`` only for
    sections proven to tolerate it.
    """
    c = jnp.asarray(coeffs, dtype=x.dtype)
    if c.shape[:-1] != x.shape:  # static coeffs: add a time axis
        c = c[..., None, :]
    b0, b1, b2, a1, a2 = (c[..., i] for i in range(5))
    p = -a1
    q = jnp.ones_like(a1)
    r = -a2
    s = jnp.zeros_like(a2)
    e1 = (b1 - a1 * b0) * x
    e2 = (b2 - a2 * b0) * x
    scan_fn = affine_scan_2x2_compensated if compensated else affine_scan_2x2
    z1, z2 = scan_fn(p, q, r, s, e1, e2, z[..., 0], z[..., 1])
    z1_pre = jnp.concatenate([z[..., 0:1], z1[..., :-1]], axis=-1)
    y = b0 * x + z1_pre
    z_out = jnp.stack([z1[..., -1], z2[..., -1]], axis=-1)
    return y, z_out


@lru_cache(maxsize=16)
def _fixed_block_matrices(coeffs: tuple, block: int):
    """Host-precomputed f64 operators turning a STATIC biquad over a
    fixed-length block into three matmuls (state-space z_t = A z_{t-1} +
    B x_t, y_t = b0 x_t + z1_{t-1}):

      y     = x @ H^T + z @ Z2Y          (H lower-triangular Toeplitz IR)
      z_out = x @ X2Z + z @ (A^block)^T

    The impulse response and state propagators are exact in f64 and only
    rounded once to f32, so accuracy beats even the compensated scan; all
    runtime work is MXU matmuls with zero sequential dependency."""
    b0, b1, b2, a1, a2 = (float(v) for v in coeffs)
    A = np.array([[-a1, 1.0], [-a2, 0.0]], np.float64)
    B = np.array([b1 - a1 * b0, b2 - a2 * b0], np.float64)
    # powers A^0 .. A^block
    powers = np.empty((block + 1, 2, 2), np.float64)
    powers[0] = np.eye(2)
    for k in range(1, block + 1):
        powers[k] = A @ powers[k - 1]
    # impulse response h[0] = b0, h[k] = e1^T A^{k-1} B
    h = np.empty(block, np.float64)
    h[0] = b0
    if block > 1:
        h[1:] = powers[: block - 1, 0, :] @ B
    i = np.arange(block)
    HT = np.zeros((block, block), np.float64)  # y = x @ HT
    rows, cols = np.meshgrid(i, i, indexing="ij")
    mask = cols >= rows
    HT[mask] = h[(cols - rows)[mask]]
    Z2Y = powers[:block, 0, :].T  # [2, block]: y_t += (A^t)_{0,:} . z
    X2Z = powers[block - 1 - i, :, :] @ B  # [block, 2]
    AT = powers[block].T
    # cache NUMPY constants (same discipline as ops/dft.py): each trace
    # re-embeds them, nothing traced is ever cached
    f32 = lambda a: np.asarray(a, np.float32)
    return f32(HT), f32(Z2Y), f32(X2Z), f32(AT)


def apply_fixed(coeffs, z, x):
    """Filter a block through one biquad with STATIC (python-constant)
    coefficients as three MXU matmuls — no scan at all. Semantics match
    :func:`apply` (DF2T state ``z: [..., 2]``) to ~1e-6; use for fixed
    utility filters in hot loops (e.g. the RNNoise input high-pass, where
    the compensated scan costs ~0.9 ms/frame at fleet 1024 and this form
    ~0.05 ms). ``coeffs``: length-5 tuple/ndarray of python floats."""
    key = tuple(float(v) for v in np.asarray(coeffs).reshape(-1))
    if len(key) != 5:
        raise ValueError("coeffs must be (b0, b1, b2, a1, a2)")
    HT, Z2Y, X2Z, AT = _fixed_block_matrices(key, x.shape[-1])
    hi = jax.lax.Precision.HIGHEST
    y = (jnp.matmul(x, HT, precision=hi)
         + jnp.matmul(z, Z2Y, precision=hi))
    z_out = (jnp.matmul(x, X2Z, precision=hi)
             + jnp.matmul(z, AT, precision=hi))
    return y, z_out


# --------------------------------------------------------------------------
# Crossfaded biquad "unit" — functional equivalent of the reference Biquad
# struct with its pending-lane crossfade (`biquad.rs:288-327`). State pytree:
#   coeffs: [..., 2, 5]   lane 0 = active, lane 1 = pending
#   z:      [..., 2, 2]   per-lane (z1, z2)
#   fade_total:     [...] int32  (0 when idle)
#   fade_remaining: [...] int32
# Invariant: when fade_remaining == 0 the two lanes are identical, so the
# blend (which then selects the pending lane) is branch-free and exact.
# --------------------------------------------------------------------------


def unit_init(coeffs, batch_shape=()):
    """State for a unit starting at ``coeffs`` (host float64 ``[..., 5]``)."""
    c = jnp.asarray(coeffs, dtype=jnp.float32)
    c = jnp.broadcast_to(c, batch_shape + c.shape[-1:]) if c.ndim == 1 else c
    lanes = jnp.stack([c, c], axis=-2)
    lead = lanes.shape[:-2]
    return {
        "coeffs": lanes,
        "z": jnp.zeros(lead + (2, 2), jnp.float32),
        "fade_total": jnp.zeros(lead, jnp.int32),
        "fade_remaining": jnp.zeros(lead, jnp.int32),
    }


def unit_schedule(state, new_coeffs, fade_samples):
    """Schedule a crossfade to ``new_coeffs`` (`biquad.rs:248-260`)."""
    new_c = jnp.broadcast_to(
        jnp.asarray(new_coeffs, jnp.float32), state["coeffs"][..., 0, :].shape
    )
    coeffs = state["coeffs"].at[..., 1, :].set(new_c)
    z = state["z"].at[..., 1, :].set(state["z"][..., 0, :])
    total = jnp.full_like(state["fade_total"], int(fade_samples))
    return {
        "coeffs": coeffs,
        "z": z,
        "fade_total": total,
        "fade_remaining": total,
    }


def unit_set_immediate(state, new_coeffs):
    """Commit coefficients with no crossfade, preserving active state
    (`biquad.rs:230-246`)."""
    new_c = jnp.broadcast_to(
        jnp.asarray(new_coeffs, jnp.float32), state["coeffs"][..., 0, :].shape
    )
    coeffs = jnp.stack([new_c, new_c], axis=-2)
    z = jnp.stack([state["z"][..., 0, :], state["z"][..., 0, :]], axis=-2)
    zeros = jnp.zeros_like(state["fade_total"])
    return {"coeffs": coeffs, "z": z, "fade_total": zeros, "fade_remaining": zeros}


def unit_reset_state(state):
    """Clear filter memory and commit any pending target (`biquad.rs:341-347`)."""
    target = state["coeffs"][..., 1, :]
    coeffs = jnp.stack([target, target], axis=-2)
    zeros = jnp.zeros_like(state["fade_total"])
    return {
        "coeffs": coeffs,
        "z": jnp.zeros_like(state["z"]),
        "fade_total": zeros,
        "fade_remaining": zeros,
    }


@partial(jax.jit, static_argnames=("compensated",))
def unit_process(state, x, compensated=True):
    """Process a block ``x: [..., T]`` through the dual-lane unit.

    Returns ``(new_state, y)``. Pure/jittable; the crossfade continues
    sample-accurately across block boundaries exactly like
    `biquad.rs:288-327`. ``compensated`` selects the double-word-f32 scan
    (see :func:`apply`).
    """
    T = x.shape[-1]
    lanes_c = state["coeffs"]  # [..., 2, 5]
    lanes_z = state["z"]  # [..., 2, 2]
    xl = x[..., None, :]  # broadcast over lane axis
    y_lanes, z_out = apply(
        lanes_c, lanes_z, jnp.broadcast_to(xl, lanes_z.shape[:-1] + (T,)),
        compensated=compensated,
    )

    total = state["fade_total"]
    remaining = state["fade_remaining"]
    t_idx = jnp.arange(T, dtype=jnp.int32)
    # fade weight at in-block sample t: (total - remaining + 1 + t) / total,
    # clipped to [0, 1]; w = 1 when idle (lanes identical => exact).
    tf = total[..., None].astype(jnp.float32)
    pos = (total - remaining)[..., None].astype(jnp.float32) + 1.0 + t_idx.astype(jnp.float32)
    w = jnp.where(tf > 0, jnp.clip(pos / jnp.maximum(tf, 1.0), 0.0, 1.0), 1.0)
    y = (1.0 - w) * y_lanes[..., 0, :] + w * y_lanes[..., 1, :]

    new_remaining = jnp.maximum(remaining - T, 0)
    promoted = (remaining > 0) & (new_remaining == 0)
    pm = promoted[..., None]  # broadcasts over the trailing coeff/state axis
    active_c = jnp.where(pm, lanes_c[..., 1, :], lanes_c[..., 0, :])
    active_z = jnp.where(pm, z_out[..., 1, :], z_out[..., 0, :])
    new_coeffs = jnp.stack([active_c, lanes_c[..., 1, :]], axis=-2)
    new_z = jnp.stack([active_z, z_out[..., 1, :]], axis=-2)
    new_total = jnp.where(promoted, 0, total)
    new_state = {
        "coeffs": new_coeffs,
        "z": new_z,
        "fade_total": new_total,
        "fade_remaining": new_remaining,
    }
    return new_state, y


# --------------------------------------------------------------------------
# Per-sample DF2T steps for fused mega-scans. The blocked parallel scans
# above are the default; these exist so a chain-level fused scan (one
# sequential pass carrying every stage's state) can advance a biquad one
# sample at a time with the same state layout.
# --------------------------------------------------------------------------


def df2t_step(coeffs, z, x_t):
    """One DF2T sample: ``coeffs [...,5]``, ``z [...,2]``, scalar-per-stream
    ``x_t``. Returns ``(y_t, z_next)``."""
    b0, b1, b2, a1, a2 = (coeffs[..., i] for i in range(5))
    y = b0 * x_t + z[..., 0]
    z1 = b1 * x_t - a1 * y + z[..., 1]
    z2 = b2 * x_t - a2 * y
    return y, jnp.stack([z1, z2], axis=-1)


def df2t_step_df32(coeffs, z_dw, x_t):
    """Compensated double-word-f32 DF2T sample step.

    ``z_dw``: ``[..., 2, 2]`` — ``z_dw[..., i, :] = (hi, lo)`` of state i.
    Matches the precision of :func:`..ops.scan.affine_scan_2x2_compensated`
    so low-frequency sections stay inside the <1e-4 parity budget when run
    sample-at-a-time inside a fused scan. Returns ``(y_t, z_dw_next)``.
    """
    from .scan import _df_add, _df_mul

    b0, b1, b2, a1, a2 = (coeffs[..., i] for i in range(5))
    zero = jnp.zeros_like(x_t)
    z1 = (z_dw[..., 0, 0], z_dw[..., 0, 1])
    z2 = (z_dw[..., 1, 0], z_dw[..., 1, 1])
    x = (x_t, zero)
    y_dw = _df_add(_df_mul((b0, zero), x), z1)
    z1n = _df_add(_df_add(_df_mul((b1, zero), x),
                          _df_mul((-a1, zero), y_dw)), z2)
    z2n = _df_add(_df_mul((b2, zero), x), _df_mul((-a2, zero), y_dw))
    z_next = jnp.stack(
        [jnp.stack([z1n[0], z1n[1]], axis=-1),
         jnp.stack([z2n[0], z2n[1]], axis=-1)],
        axis=-2,
    )
    return y_dw[0] + y_dw[1], z_next
