"""Offline DSP chain: the deterministic, stream-free processing graph.

Equivalent of ``OfflineDspBlockProcessor``
(`rust-core/src/audio/processor/block_processor.rs:1-173`): the
deesser <-> EQ order switch, compressor, limiter, and final true-peak
limiter (whose ceiling follows the main limiter ceiling), with per-block
stats {input/output sample peak, pre-limiter true peak, output true peak,
limiter GR, true-peak GR + limited events, compressor GR, deesser GR}.

TPU-native design: one ``chain_block`` step function composes the stage
kernels; ``chain_run`` lifts it over a whole take with ``lax.scan`` inside
one jit — and because everything is a pure function of (config, params,
state, audio), a *batch* of candidate parameterisations runs as a single
``vmap`` (the reference evaluates candidates serially through its native
simulator, `voice_setup.py:699-783`).
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import partial

import jax
import jax.numpy as jnp

from ..ops import biquad
from ..ops import compressor as comp_ops
from ..ops import deesser as des_ops
from ..ops import eq as eq_ops
from ..ops import limiter as lim_ops
from ..ops import scan as scan_ops
from ..ops import true_peak as tp_ops
from ..ops import util

__all__ = [
    "ChainConfig",
    "chain_init",
    "chain_block",
    "chain_run",
    "CAREFUL_OUTPUT_CEILING_DB",
    "effective_limiter_ceiling_db",
]

CAREFUL_OUTPUT_CEILING_DB = -1.5  # `control.rs:772`


def effective_limiter_ceiling_db(ceiling_db: float, careful_output_enabled: bool) -> float:
    """`control.rs:904-910`."""
    return min(ceiling_db, CAREFUL_OUTPUT_CEILING_DB) if careful_output_enabled else ceiling_db


@dataclass(frozen=True)
class ChainConfig:
    """Static chain structure. Numeric stage parameters (EQ bands,
    compressor params) are traced so candidate sweeps vmap without
    recompiling."""

    sample_rate: float = 48000.0
    deesser_enabled: bool = False
    eq_enabled: bool = True
    compressor_enabled: bool = False
    limiter_enabled: bool = True
    eq_before_deesser: bool = False
    deesser: des_ops.DeEsserConfig = des_ops.DeEsserConfig()
    compressor: comp_ops.CompressorConfig = comp_ops.CompressorConfig()
    limiter: lim_ops.LimiterConfig = lim_ops.LimiterConfig(
        ceiling_db=-0.5, release_ms=50.0, lookahead_ms=2.0
    )
    tp_release_ms: float = 80.0  # `true_peak.rs:285-287` default
    # Fuse deesser -> EQ -> compressor into ONE per-sample scan. Measured
    # on TPU v5e (batch 1024): the fused scan is ~3x SLOWER than the staged
    # path (1.13k vs 3.44k audio-sec/s) — XLA:TPU loop cost scales with the
    # body size, so halving the step count while tripling the per-step body
    # loses; the staged path also keeps the EQ/dynamic-EQ as parallel
    # scans. Kept selectable for future hardware where step latency
    # dominates. Output parity staged vs fused: 7e-7 RMS.
    fused: bool = False


def chain_init(config: ChainConfig, comp_params=None, eq_bands=None, batch_shape=()):
    """Fresh chain state. ``eq_bands``: list of EqBandConfig or None for the
    flat default layout.

    The offline chain never edits coefficients mid-take, so the EQ runs the
    single-lane static compacted cascade
    (:func:`..ops.eq.cascade_apply_split`) — identity sections are dropped
    at init and the crossfade lanes of the live path are skipped entirely.
    """
    full = eq_ops.bands_to_sections(
        eq_ops.default_bands() if eq_bands is None else eq_bands,
        config.sample_rate,
    )
    # identity sections (bypass slots, zero-gain bells) are compacted away
    # at init — the section counts are baked into the array shapes, so the
    # compiled cascade only runs live filters
    c_lo, c_hi = eq_ops.compact_cascade(full)
    eq_state = {
        "c_lo": jnp.asarray(c_lo, jnp.float32),
        "c_hi": jnp.asarray(c_hi, jnp.float32),
        "z_lo": jnp.zeros((c_lo.shape[0],) + batch_shape + (2,), jnp.float32),
        "z_hi": jnp.zeros((c_hi.shape[0],) + batch_shape + (2,), jnp.float32),
    }
    return {
        "deesser": des_ops.deesser_init(config.deesser, batch_shape),
        "eq": eq_state,
        "compressor": comp_ops.compressor_init(
            config.compressor, comp_params, batch_shape
        ),
        "limiter": lim_ops.limiter_init(config.limiter, batch_shape),
        "tp": tp_ops.tp_limiter_init(batch_shape),
        "tp_detector": tp_ops.detector_init(batch_shape),
    }


def _chain_tail(config: ChainConfig, new_state, y, stats):
    """Limiter -> true-peak limiter -> output metering, shared by the staged
    and fused paths."""
    zeros = jnp.zeros(y.shape[:-1], jnp.float32)
    if config.limiter_enabled:
        ls, y, lm = lim_ops.limiter_process(config.limiter, new_state["limiter"], y)
        new_state["limiter"] = ls
        stats["limiter_peak_gain_reduction_db"] = lm["peak_gr_db"]
        tp_cfg = tp_ops.TruePeakLimiterConfig(
            ceiling_db=config.limiter.ceiling_db,
            release_ms=config.tp_release_ms,
            sample_rate=config.sample_rate,
        )
        ts, y, tm = tp_ops.tp_limiter_process(
            tp_cfg, new_state["tp"], y,
            ceiling_linear=config.limiter.ceiling_linear,
        )
        new_state["tp"] = ts
        stats["true_peak_limiter_input_peak"] = tm["input_true_peak"]
        stats["true_peak_limiter_gain_reduction_db"] = tm["max_gain_reduction_db"]
        stats["true_peak_limited_events"] = tm["limited_events"]
    else:
        stats["limiter_peak_gain_reduction_db"] = zeros
        stats["true_peak_limiter_input_peak"] = zeros
        stats["true_peak_limiter_gain_reduction_db"] = zeros
        stats["true_peak_limited_events"] = jnp.zeros(y.shape[:-1], jnp.int32)

    stats["output_sample_peak"] = jnp.max(jnp.abs(y), axis=-1)
    td, otp = tp_ops.detector_process(new_state["tp_detector"], y)
    new_state["tp_detector"] = td
    stats["output_true_peak"] = otp
    return new_state, y, stats


_DES_SCAN_KEYS = (
    "broadband_env", "band_env", "band_confidence", "baseline_excess_db",
    "reduction_db", "current_reduction_db", "detector_confidence",
)


def _fused_des_eq_comp(config: ChainConfig, comp_params, state, x):
    """De-esser -> EQ -> compressor as ONE per-sample scan.

    The three stages' sequential recurrences advance together each sample:
    de-esser envelopes -> 3 dynamic peaking DF2T steps -> the compacted EQ
    cascade (compensated df32 steps for the low-frequency sections, plain
    f32 for the rest — per-sample DF2T is *more* accurate than the blocked
    parallel scan, measured 3e-5 plain / 2e-6 df32 vs the compensated
    reference on the 80 Hz high-pass) -> the compressor sample step. The
    de-esser detector filters stay outside as parallel scans, and the
    compressor's block-cadence auto-makeup runs on the accumulated block
    energy afterwards. Sequential step count per block: T instead of 2T+.
    """
    des_cfg = config.deesser
    det_z_out, side_abs, broad_abs = des_ops.detector_filter_block(
        des_cfg, state["deesser"]["det_z"], x
    )
    des_step = des_ops.make_envelope_step(des_cfg)
    band_consts = des_ops.dynamic_band_constants(des_cfg)

    comp_state = state["compressor"]
    makeup_lin = jnp.power(10.0, comp_state["smoothed_makeup_gain"] / 20.0)
    comp_step = comp_ops.make_sample_step(
        config.compressor, comp_params, makeup_lin
    )

    es = state["eq"]
    c_lo, c_hi = es["c_lo"], es["c_hi"]
    k_lo, k_hi = c_lo.shape[0], c_hi.shape[0]

    lead = x.shape[:-1]
    zeros_lead = jnp.zeros(lead, jnp.float32)
    carry = {
        "des": {k: state["deesser"][k] for k in _DES_SCAN_KEYS},
        "dyn_z": state["deesser"]["dyn_z"],
        # df32 carry for the compensated sections: (hi, lo) per state var
        "eq_lo": jnp.stack(
            [es["z_lo"], jnp.zeros_like(es["z_lo"])], axis=-1
        ),  # [k_lo, ..., 2, 2]
        "eq_hi": es["z_hi"],  # [k_hi, ..., 2]
        "comp": {k: v for k, v in comp_state.items()
                 if k not in comp_ops._SCAN_BLOCK_KEYS},
        "sum_sq": zeros_lead,  # compressor-input energy for block activity
    }

    side_t = jnp.moveaxis(side_abs, -1, 0)
    broad_t = jnp.moveaxis(broad_abs, -1, 0)
    xt = jnp.moveaxis(x, -1, 0)

    def step(c, inputs):
        sb, bb, x_t = inputs
        des_s, red = des_step(c["des"], (sb, bb))
        y = x_t
        dyn = []
        for b in range(des_ops.BAND_COUNT):
            cos_w, alpha = band_consts[b]
            coeffs = des_ops.dynamic_peaking_coeffs(red[..., b], cos_w, alpha)
            y, z_new = biquad.df2t_step(coeffs, c["dyn_z"][..., b, :], y)
            dyn.append(z_new)
        eq_lo = []
        for i in range(k_lo):
            y, z_new = biquad.df2t_step_df32(c_lo[i], c["eq_lo"][i], y)
            eq_lo.append(z_new)
        eq_hi = []
        for i in range(k_hi):
            y, z_new = biquad.df2t_step(c_hi[i], c["eq_hi"][i], y)
            eq_hi.append(z_new)
        sum_sq = c["sum_sq"] + y * y
        comp_s, y_out = comp_step(c["comp"], y)
        new_c = {
            "des": des_s,
            "dyn_z": jnp.stack(dyn, axis=-2),
            "eq_lo": jnp.stack(eq_lo, axis=0) if eq_lo else c["eq_lo"],
            "eq_hi": jnp.stack(eq_hi, axis=0) if eq_hi else c["eq_hi"],
            "comp": comp_s,
            "sum_sq": sum_sq,
        }
        return new_c, y_out

    final, yt = jax.lax.scan(
        step, carry, (side_t, broad_t, xt), unroll=scan_ops.seq_unroll()
    )
    y = jnp.moveaxis(yt, 0, -1)
    T = x.shape[-1]

    # compressor block epilogue on the accumulated pre-compressor energy
    block_rms_db = util.linear_to_db(
        jnp.maximum(jnp.sqrt(final["sum_sq"] / T), 1e-10), -200.0
    )
    activity, reliability = comp_ops._estimate_activity(
        comp_params, block_rms_db, None
    )
    lim_fb = jnp.broadcast_to(
        jnp.float32(0.0), comp_state["limiter_feedback_gr_db"].shape
    )
    new_comp, comp_metrics = comp_ops.finalize_block(
        config.compressor, comp_params, comp_state, final["comp"], y, T,
        activity, reliability, lim_fb,
    )

    new_deesser = dict(
        state["deesser"], det_z=det_z_out, dyn_z=final["dyn_z"],
        **final["des"],
    )
    new_eq = {
        "c_lo": c_lo, "c_hi": c_hi,
        "z_lo": final["eq_lo"][..., 0] + final["eq_lo"][..., 1],
        "z_hi": final["eq_hi"],
    }
    stats = {
        "deesser_gain_reduction_db": final["des"]["current_reduction_db"],
        "compressor_gain_reduction_db": comp_metrics["gain_reduction_db"],
    }
    new_state = dict(
        state, deesser=new_deesser, eq=new_eq, compressor=new_comp
    )
    return new_state, y, stats


def chain_block(config: ChainConfig, comp_params, state, x):
    """Process one block ``x: [..., T]``. Returns ``(state, y, stats)``.

    Stage order and stats mirror `block_processor.rs:111-170`; the final
    true-peak limiter ceiling tracks the main limiter ceiling
    (`block_processor.rs:152-155`).
    """
    stats = {"input_sample_peak": jnp.max(jnp.abs(x), axis=-1)}
    y = x
    new_state = dict(state)

    fuse = (
        config.fused
        and config.deesser_enabled
        and config.eq_enabled
        and config.compressor_enabled
        and not config.eq_before_deesser
    )
    if fuse:
        new_state, y, fused_stats = _fused_des_eq_comp(
            config, comp_params, state, x
        )
        new_state = dict(new_state)
        stats.update(fused_stats)
        return _chain_tail(config, new_state, y, stats)

    def run_deesser(y):
        ds, y, dm = des_ops.deesser_process(config.deesser, new_state["deesser"], y)
        new_state["deesser"] = ds
        stats["deesser_gain_reduction_db"] = dm["reduction_db"]
        return y

    def run_eq(y):
        es = new_state["eq"]
        z_lo, z_hi, y = eq_ops.cascade_apply_split(
            es["c_lo"], es["z_lo"], es["c_hi"], es["z_hi"], y
        )
        new_state["eq"] = {
            "c_lo": es["c_lo"], "c_hi": es["c_hi"], "z_lo": z_lo, "z_hi": z_hi,
        }
        return y

    zeros = jnp.zeros(x.shape[:-1], jnp.float32)
    stats["deesser_gain_reduction_db"] = zeros
    if config.eq_before_deesser:
        if config.eq_enabled:
            y = run_eq(y)
        if config.deesser_enabled:
            y = run_deesser(y)
    else:
        if config.deesser_enabled:
            y = run_deesser(y)
        if config.eq_enabled:
            y = run_eq(y)

    if config.compressor_enabled:
        cs, y, cm = comp_ops.compressor_process(
            config.compressor, comp_params, new_state["compressor"], y
        )
        new_state["compressor"] = cs
        stats["compressor_gain_reduction_db"] = cm["gain_reduction_db"]
    else:
        stats["compressor_gain_reduction_db"] = zeros

    return _chain_tail(config, new_state, y, stats)


@partial(jax.jit, static_argnames=("config", "return_audio"))
def chain_run(config: ChainConfig, comp_params, state, blocks, return_audio=True):
    """Run a whole take in one compiled call.

    ``blocks``: ``[..., n_blocks, T]`` (pre-framed audio; zero-pad the tail).
    Returns ``(final_state, output_blocks or None, stats_arrays)`` where each
    stats entry has shape ``[..., n_blocks]``. ``vmap`` over leading axes of
    ``comp_params``/``state``/``blocks`` turns a candidate sweep into one
    batched call.
    """
    nb_axis = blocks.ndim - 2
    bt = jnp.moveaxis(blocks, nb_axis, 0)  # (n_blocks, ..., T)

    def body(carry, xb):
        st = carry
        st, y, stats = chain_block(config, comp_params, st, xb)
        out = (y if return_audio else None, stats)
        return st, out

    final, (ys, stats) = jax.lax.scan(body, state, bt)
    if return_audio:
        ys = jnp.moveaxis(ys, 0, nb_axis)
    stats = jax.tree_util.tree_map(lambda a: jnp.moveaxis(a, 0, -1), stats)
    return final, ys, stats
