"""10-band parametric EQ as a fused section cascade.

Behavioural contract mirrors the reference EQ (`rust-core/src/dsp/eq.rs`):

- Band layout: band 0 low shelf @ 80 Hz, bands 1-8 bells 160 Hz - 12 kHz,
  band 9 high shelf @ 16 kHz (`eq.rs:12-23`); default Q 1.41.
- Per-band filter types {low_shelf, bell, high_shelf, notch, high_pass,
  low_pass} (`eq.rs:44-53`); pass filters are 1-4 cascaded Butterworth
  sections for 12/24/36/48 dB/oct with section Q
  ``1 / (2 cos((2k+1)π / 2N))`` (`eq.rs:203-213`).
- Validation ranges: gain ±12 dB, Q 0.1-10, frequency 20 Hz .. Nyquist-1
  (`eq.rs:36-41,141-201`).
- Live edits crossfade per-section; retired sections keep processing until
  their crossfade to bypass completes (`eq.rs:300-306`) — here retired
  sections crossfade to bypass coefficients and then stay as exact-bypass
  lanes, which is branch-free and numerically identical.
- ``magnitude_response_db`` is the exact cascaded response shared with UI and
  calibration (`eq.rs:528-541`).

TPU-native design: the EQ is a fixed ``NUM_BANDS * MAX_PASS_SECTIONS = 40``
section cascade with static shapes. Unused sections hold bypass
coefficients. The cascade runs as a ``lax.scan`` over the section axis whose
body is one dual-lane crossfaded biquad (compiled once, applied 40 times),
each evaluating its block with a parallel associative scan.
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np
import jax
import jax.numpy as jnp

from . import biquad

__all__ = [
    "NUM_BANDS",
    "MAX_PASS_SECTIONS",
    "NUM_SECTIONS",
    "DEFAULT_FREQUENCIES",
    "DEFAULT_Q",
    "SUPPORTED_PASS_SLOPES",
    "EQ_GAIN_MIN_DB",
    "EQ_GAIN_MAX_DB",
    "EQ_Q_MIN",
    "EQ_Q_MAX",
    "EQ_FREQ_MIN_HZ",
    "EQ_NYQUIST_MARGIN_HZ",
    "FILTER_TYPE_NAMES",
    "EqBandConfig",
    "default_bands",
    "validate_band",
    "band_section_design",
    "bands_to_sections",
    "eq_init",
    "eq_set_band",
    "eq_set_bands",
    "eq_reset",
    "eq_process",
    "cascade_apply",
    "magnitude_response_db",
]

NUM_BANDS = 10
MAX_PASS_SECTIONS = 4
NUM_SECTIONS = NUM_BANDS * MAX_PASS_SECTIONS

DEFAULT_FREQUENCIES = (
    80.0, 160.0, 320.0, 640.0, 1280.0, 2500.0, 5000.0, 8000.0, 12000.0, 16000.0
)
DEFAULT_Q = 1.41
SUPPORTED_PASS_SLOPES = (12, 24, 36, 48)
EQ_GAIN_MIN_DB = -12.0
EQ_GAIN_MAX_DB = 12.0
EQ_Q_MIN = 0.1
EQ_Q_MAX = 10.0
EQ_FREQ_MIN_HZ = 20.0
EQ_NYQUIST_MARGIN_HZ = 1.0

# Stable public ids shared with config schema v2 (`eq.rs:44-53`).
FILTER_TYPE_NAMES = {
    0: "low_shelf",
    1: "bell",
    2: "high_shelf",
    3: "notch",
    4: "high_pass",
    5: "low_pass",
}
_NAME_TO_ID = {v: k for k, v in FILTER_TYPE_NAMES.items()}
_PASS_TYPES = (4, 5)

_EQ_TYPE_TO_BIQUAD = {
    0: biquad.LOW_SHELF,
    1: biquad.PEAKING,
    2: biquad.HIGH_SHELF,
    3: biquad.NOTCH,
    4: biquad.HIGH_PASS,
    5: biquad.LOW_PASS,
}


@dataclass(frozen=True)
class EqBandConfig:
    """One band's realtime configuration (`eq.rs:113-120`)."""

    filter_type: int = 1  # bell
    frequency_hz: float = 1000.0
    gain_db: float = 0.0
    q: float = DEFAULT_Q
    slope_db_per_octave: int = 12
    enabled: bool = True

    @staticmethod
    def type_id(value) -> int:
        if isinstance(value, str):
            return _NAME_TO_ID[value]
        return int(value)


def default_bands() -> list[EqBandConfig]:
    """The reference's default 10-band layout (`eq.rs:12-29`)."""
    bands = []
    for i, freq in enumerate(DEFAULT_FREQUENCIES):
        if i == 0:
            ftype = 0  # low shelf
        elif i == NUM_BANDS - 1:
            ftype = 2  # high shelf
        else:
            ftype = 1  # bell
        bands.append(EqBandConfig(ftype, freq, 0.0, DEFAULT_Q, 12, True))
    return bands


def validate_band(config: EqBandConfig, sample_rate: float) -> None:
    """Range validation mirroring `eq.rs:36-41,141-201`."""
    if config.filter_type not in FILTER_TYPE_NAMES:
        raise ValueError(f"unknown filter type {config.filter_type}")
    nyquist = sample_rate / 2.0
    if not (EQ_FREQ_MIN_HZ <= config.frequency_hz <= nyquist - EQ_NYQUIST_MARGIN_HZ):
        raise ValueError(
            f"frequency {config.frequency_hz} Hz outside "
            f"[{EQ_FREQ_MIN_HZ}, {nyquist - EQ_NYQUIST_MARGIN_HZ}]"
        )
    if not (EQ_GAIN_MIN_DB <= config.gain_db <= EQ_GAIN_MAX_DB):
        raise ValueError(f"gain {config.gain_db} dB outside ±12 dB")
    if not (EQ_Q_MIN <= config.q <= EQ_Q_MAX):
        raise ValueError(f"Q {config.q} outside [{EQ_Q_MIN}, {EQ_Q_MAX}]")
    if config.filter_type in _PASS_TYPES and (
        config.slope_db_per_octave not in SUPPORTED_PASS_SLOPES
    ):
        raise ValueError(
            f"slope {config.slope_db_per_octave} dB/oct unsupported; "
            f"expected one of {SUPPORTED_PASS_SLOPES}"
        )


def _butterworth_section_q(section_index: int, section_count: int) -> float:
    """`eq.rs:203-207`."""
    order = 2 * section_count
    angle = (2 * section_index + 1) * np.pi / (2 * order)
    return 1.0 / (2.0 * np.cos(angle))


def _required_sections(config: EqBandConfig) -> int:
    if not config.enabled:
        return 0
    if config.filter_type in _PASS_TYPES:
        return config.slope_db_per_octave // 12
    return 1


def band_section_design(config: EqBandConfig, sample_rate: float) -> np.ndarray:
    """Host float64 coefficients for a band's MAX_PASS_SECTIONS slots.

    Unused slots get exact bypass. Mirrors `eq.rs:246-276` section
    parameterisation.
    """
    out = np.zeros((MAX_PASS_SECTIONS, 5), np.float64)
    out[:, 0] = 1.0  # bypass
    n = _required_sections(config)
    for k in range(n):
        if config.filter_type in _PASS_TYPES:
            btype = _EQ_TYPE_TO_BIQUAD[config.filter_type]
            gain = 0.0
            q = _butterworth_section_q(k, n)
        else:
            btype = _EQ_TYPE_TO_BIQUAD[config.filter_type]
            gain = 0.0 if config.filter_type == 3 else config.gain_db
            q = config.q
        out[k] = biquad.design(btype, config.frequency_hz, gain, q, sample_rate)
    return out


def bands_to_sections(bands, sample_rate: float) -> np.ndarray:
    """All bands -> ``(NUM_SECTIONS, 5)`` float64 coefficient matrix."""
    return np.concatenate(
        [band_section_design(b, sample_rate) for b in bands], axis=0
    )


# --------------------------------------------------------------------------
# State management. EQ state = one biquad unit state with a leading section
# axis of NUM_SECTIONS.
# --------------------------------------------------------------------------


# Bands below this index (80/160/320 Hz in the default layout) run the
# compensated double-word scan; see `eq_process`.
EQ_DF32_BANDS = 3

# Legacy full-layout constant (4 slots x first 3 bands), kept for the
# offline cascade helpers' default split.
DF32_SECTIONS = 3 * MAX_PASS_SECTIONS


def band_slot_count(config: EqBandConfig) -> int:
    """Static section-slot capacity a band occupies in the live cascade:
    pass filters keep all MAX_PASS_SECTIONS slots (slope edits up to
    48 dB/oct stay traced), every other type exactly one. The reference
    always runs 4 slots per band (`eq.rs:203-213`); compacting the live
    state to the occupied slots is a 4x throughput win at fleet scale
    (measured 11 -> ~3 ms/frame at 1024 streams) at the cost of a state
    rebuild (= topology recompile) when a band crosses the pass/non-pass
    type boundary."""
    return MAX_PASS_SECTIONS if config.filter_type in _PASS_TYPES else 1


def eq_layout(bands=None) -> tuple:
    """Per-band slot counts for the compact live cascade."""
    bands = default_bands() if bands is None else bands
    return tuple(band_slot_count(b) for b in bands)


def layout_sections(layout) -> tuple:
    """``(n_compensated, n_plain)`` section totals for a layout."""
    return (sum(layout[:EQ_DF32_BANDS]), sum(layout[EQ_DF32_BANDS:]))


def band_slot(layout, band_index: int):
    """``(group, start, count)`` locating a band inside its precision
    group ('lo' = compensated, 'hi' = plain f32)."""
    if band_index < EQ_DF32_BANDS:
        return "lo", sum(layout[:band_index]), layout[band_index]
    return (
        "hi",
        sum(layout[EQ_DF32_BANDS:band_index]),
        layout[band_index],
    )


def eq_init(bands=None, sample_rate: float = 48000.0, layout=None):
    """Compact live-cascade state: ``{"lo": unit, "hi": unit}`` biquad unit
    groups (compensated / plain-f32) with a leading section axis sized by
    ``layout`` (default :func:`eq_layout` of the bands)."""
    bands = default_bands() if bands is None else bands
    layout = eq_layout(bands) if layout is None else tuple(layout)
    if len(layout) != len(bands):
        raise ValueError("layout/bands length mismatch")
    rows_lo, rows_hi = [], []
    for i, (b, cap) in enumerate(zip(bands, layout)):
        need = _required_sections(b)
        if need > cap:
            raise ValueError(
                f"band {i} needs {need} sections but layout holds {cap}"
            )
        rows = band_section_design(b, sample_rate)[:cap]
        (rows_lo if i < EQ_DF32_BANDS else rows_hi).append(rows)
    cat = lambda rs: np.concatenate(rs, axis=0) if rs else np.zeros((0, 5))
    return {
        "lo": biquad.unit_init(jnp.asarray(cat(rows_lo), jnp.float32)),
        "hi": biquad.unit_init(jnp.asarray(cat(rows_hi), jnp.float32)),
    }


def eq_set_band(state, band_index: int, config: EqBandConfig,
                sample_rate: float, layout=None):
    """Crossfaded single-band update (`eq.rs:477-481`). ``layout`` must
    match the one the state was built with (default: the default-bands
    layout). Raises ``ValueError`` when the new config needs more slots
    than the band owns — the caller rebuilds the state with
    :func:`eq_init` (a topology recompile, like a gate-mode switch)."""
    validate_band(config, sample_rate)
    layout = eq_layout() if layout is None else tuple(layout)
    group, start, cap = band_slot(layout, band_index)
    if _required_sections(config) > cap:
        raise ValueError(
            f"band {band_index} config needs {_required_sections(config)} "
            f"sections but its layout slot holds {cap} — rebuild the EQ "
            "state with eq_init(bands)"
        )
    target = band_section_design(config, sample_rate)[:cap]
    fade = biquad.crossfade_samples(sample_rate)
    sl = slice(start, start + cap)
    sub = jax.tree_util.tree_map(lambda a: a[sl], state[group])
    sub = biquad.unit_schedule(sub, jnp.asarray(target, jnp.float32), fade)
    new_group = jax.tree_util.tree_map(
        lambda full, part: full.at[sl].set(part), state[group], sub
    )
    out = dict(state)
    out[group] = new_group
    return out


def eq_set_bands(state, bands, sample_rate: float, layout=None):
    for i, b in enumerate(bands):
        state = eq_set_band(state, i, b, sample_rate, layout=layout)
    return state


def eq_reset(state):
    return {k: biquad.unit_reset_state(v) for k, v in state.items()}


@jax.jit
def eq_process(state, x):
    """Cascade a block ``x: [..., T]`` through all occupied sections.

    ``lax.scan`` over the section axis of each precision group (the body —
    one crossfaded biquad over the block — compiles once per group).
    Sections whose filters sit at low frequency (pole radius ~1 at 48 kHz)
    need the compensated double-word-f32 scan to stay inside the <1e-4
    parity budget; the default band layout puts 80/160/320 Hz in the first
    EQ_DF32_BANDS bands, so their sections run compensated and the rest
    plain f32 (measured: plain-f32 blocked scan errs 1.9e-4 for an 80 Hz
    shelf but <1e-6 for mid/high sections). Returns ``(new_state, y)``.

    Known limitation: the live split is by band INDEX (the scan kernels are
    chosen at trace time), so retuning a band >= index EQ_DF32_BANDS below
    ~300 Hz at high Q runs it in plain f32 (~1e-3 worst case vs the
    reference's f64). The offline path has no such hole —
    :func:`compact_cascade` classifies per designed coefficient
    (:func:`_needs_df32`).
    """

    def body_df32(carry, section_state):
        new_state, y = biquad.unit_process(section_state, carry, compensated=True)
        return y, new_state

    def body_f32(carry, section_state):
        new_state, y = biquad.unit_process(section_state, carry, compensated=False)
        return y, new_state

    y = x
    out = dict(state)
    if jax.tree_util.tree_leaves(state["lo"])[0].shape[0]:
        y, out["lo"] = jax.lax.scan(body_df32, y, state["lo"])
    if jax.tree_util.tree_leaves(state["hi"])[0].shape[0]:
        y, out["hi"] = jax.lax.scan(body_f32, y, state["hi"])
    return out, y


def _is_identity_section(row) -> bool:
    """True when a designed section is the identity transfer function:
    the exact bypass slot [1,0,0,0,0], or a zero-gain design where
    numerator equals denominator (b0=1, b1=a1, b2=a2) — both pass audio
    unchanged with state decaying to zero."""
    b0, b1, b2, a1, a2 = (float(v) for v in row)
    return (
        abs(b0 - 1.0) < 1e-12
        and abs(b1 - a1) < 1e-12
        and abs(b2 - a2) < 1e-12
    )


DF32_POLE_ANGLE_RAD = 0.03     # ~230 Hz at 48 kHz
DF32_POLE_RADIUS_MARGIN = 0.0025


def _needs_df32(row) -> bool:
    """Classify a designed section's f32 safety by its poles.

    The plain-f32 blocked scan degrades when the poles sit at a small
    angle (low frequency) or very near the unit circle (narrow / boosted
    resonance). Measured on white noise vs an f64 reference:
    80 Hz Q4.33 bell diverges in f32 (pole angle 0.010), 160 Hz errs 2e-3
    (0.021), 320 Hz Q10 +12 dB errs 2e-3 via its 0.998+ radius, while every
    case outside {angle < 0.03, 1-radius < 0.0025} stays under 1e-5 —
    comfortably inside the <1e-4 parity budget (worst ±12 dB / Q 10).
    """
    _, _, _, a1, a2 = (float(v) for v in row)
    if a2 <= 0.0:
        return True  # real/degenerate poles: stay safe
    radius = np.sqrt(a2)
    if radius >= 1.0:
        return True
    cos_theta = np.clip(-a1 / (2.0 * radius), -1.0, 1.0)
    theta = np.arccos(cos_theta)
    return theta < DF32_POLE_ANGLE_RAD or (1.0 - radius) < DF32_POLE_RADIUS_MARGIN


def compact_cascade(coeffs, df32_sections: int = DF32_SECTIONS):
    """Drop identity sections from a static cascade and split the survivors
    by precision need (host-side, f64).

    Returns ``(c_lo, c_hi)``: sections classified by :func:`_needs_df32`
    for the compensated scan, and the rest for plain f32. Offline
    simulators design the whole cascade once per take, so disabled bands
    and zero-gain bells cost nothing — the default 10-band layout with a
    typical Auto-EQ curve keeps ~10 of the 40 section slots, 2-3 of them
    compensated. ``df32_sections`` is retained for signature compatibility;
    the split is per-coefficient.
    """
    del df32_sections
    coeffs = np.asarray(coeffs, np.float64)
    keep_lo, keep_hi = [], []
    for row in coeffs:
        if _is_identity_section(row):
            continue
        (keep_lo if _needs_df32(row) else keep_hi).append(row)
    c_lo = np.asarray(keep_lo, np.float64).reshape(len(keep_lo), 5)
    c_hi = np.asarray(keep_hi, np.float64).reshape(len(keep_hi), 5)
    return c_lo, c_hi


def cascade_apply_split(c_lo, z_lo, c_hi, z_hi, x):
    """Compacted static cascade: ``c_lo`` sections run the compensated
    double-word scan, ``c_hi`` the plain one. Shapes carry the (static)
    section counts, so the split needs no extra static argument.
    Returns ``(z_lo_out, z_hi_out, y)``."""

    def body_df32(carry, sec):
        c, zz = sec
        y, z_out = biquad.apply(c, zz, carry, compensated=True)
        return y, z_out

    def body_f32(carry, sec):
        c, zz = sec
        y, z_out = biquad.apply(c, zz, carry, compensated=False)
        return y, z_out

    y = x
    if c_lo.shape[0]:
        y, z_lo = jax.lax.scan(body_df32, y, (c_lo, z_lo))
    if c_hi.shape[0]:
        y, z_hi = jax.lax.scan(body_f32, y, (c_hi, z_hi))
    return z_lo, z_hi, y


def cascade_apply(coeffs, z, x, df32_sections: int = DF32_SECTIONS):
    """Single-lane static-coefficient cascade (no crossfade lanes).

    ``coeffs``: ``(NUM_SECTIONS, 5)`` (or with batch dims after the section
    axis); ``z``: ``(NUM_SECTIONS, ..., 2)``; ``x``: ``[..., T]``. Returns
    ``(z_out, y)``. Used by the offline simulators, where coefficients never
    change mid-take — half the work of the dual-lane unit path.
    """

    def body_df32(carry, sec):
        c, zz = sec
        y, z_out = biquad.apply(c, zz, carry, compensated=True)
        return y, z_out

    def body_f32(carry, sec):
        c, zz = sec
        y, z_out = biquad.apply(c, zz, carry, compensated=False)
        return y, z_out

    k = df32_sections
    y, z_lo = jax.lax.scan(body_df32, x, (coeffs[:k], z[:k]))
    y, z_hi = jax.lax.scan(body_f32, y, (coeffs[k:], z[k:]))
    return jnp.concatenate([z_lo, z_hi], axis=0), y


def magnitude_response_db(bands, frequencies, sample_rate: float) -> np.ndarray:
    """Exact cascaded magnitude response in dB (`eq.rs:528-541`), host f64."""
    coeffs = bands_to_sections(bands, sample_rate)
    per_section = biquad.magnitude_response_db(
        coeffs, np.asarray(frequencies, np.float64), sample_rate
    )
    return per_section.sum(axis=0)
