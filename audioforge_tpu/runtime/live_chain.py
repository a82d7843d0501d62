"""Live per-block DSP step functions for the realtime engine.

The reference DSP thread (`processor/dsp_loop.rs:916-1741`, SURVEY §3.2)
runs: sanitize → adaptive cleanup/routing → gate (external VAD posterior) →
suppressor → de-esser → EQ → compressor (+VAD evidence, limiter feedback) →
limiter → output conditioning (sanitize → true-peak → clamp).

TPU-native split: two jitted block functions —

- :func:`front_block`: input sanitising, routing/cleanup, block-cadence VAD
  auto-gate control, and the smart gate.
- :func:`back_block`: the downstream macro (`dsp_loop.rs:604-762`) plus the
  output writer's conditioning (`output_writer.rs:194-288`) and metering.

The neural suppressor runs between the halves at its own 480-sample frame
cadence from the host driver (its push/pop staging is host state; the model
itself is one jitted call) — exactly where the reference's engine sits.

Control changes never recompile: every continuous knob is a traced leaf in
the ``params`` pytree (replaced whole at block boundaries — the TPU
equivalent of the reference's seqlock control snapshots,
`processor/control.rs:5-39`). Only mode/topology switches (gate mode,
cleanup mode, stage enables) are static and cut a new compiled variant,
mirroring the reference's path reselection (`dsp_loop.rs:1052-1114`).
"""

from __future__ import annotations

from dataclasses import dataclass, field
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from ..models import vad_gate as vadm
from ..ops import compressor as comp_ops
from ..ops import deesser as des_ops
from ..ops import eq as eq_ops
from ..ops import gate as gate_ops
from ..ops import limiter as lim_ops
from ..ops import loudness as loud_ops
from ..ops import routing as route_ops
from ..ops import true_peak as tp_ops
from ..ops import util
from .chain import effective_limiter_ceiling_db

__all__ = [
    "LiveChainConfig",
    "live_init",
    "live_params",
    "front_block",
    "back_block",
    "chain_latency_samples",
]

BLOCK_SAMPLES = 480  # 10 ms at 48 kHz — the engine cadence (`processor.rs`)


@dataclass(frozen=True)
class LiveChainConfig:
    """Static topology of the live chain. Continuous values live in the
    params pytree (:func:`live_params`)."""

    sample_rate: float = 48000.0
    cleanup_mode: str = "off"
    gate_enabled: bool = True
    gate_mode: int = gate_ops.THRESHOLD_ONLY
    auto_threshold_enabled: bool = True
    deesser_enabled: bool = False
    eq_enabled: bool = True
    compressor_enabled: bool = True
    adaptive_release: bool = False
    auto_makeup_enabled: bool = False
    sidechain_highpass_enabled: bool = True
    limiter_enabled: bool = True
    careful_output_enabled: bool = True
    deesser: des_ops.DeEsserConfig = field(
        default_factory=des_ops.DeEsserConfig
    )

    @property
    def routing(self) -> route_ops.RoutingConfig:
        return route_ops.RoutingConfig(
            sample_rate=self.sample_rate, cleanup_mode=self.cleanup_mode
        )

    @property
    def gate(self) -> gate_ops.GateConfig:
        return gate_ops.GateConfig(
            sample_rate=self.sample_rate,
            mode=self.gate_mode,
            enabled=self.gate_enabled,
        )

    @property
    def vad(self) -> vadm.VadGateConfig:
        return vadm.VadGateConfig(
            sample_rate=int(self.sample_rate),
            gate_mode=self.gate_mode,
            auto_threshold_enabled=self.auto_threshold_enabled,
            enabled=self.gate_enabled,
        )

    @property
    def compressor(self) -> comp_ops.CompressorConfig:
        return comp_ops.CompressorConfig(
            sample_rate=self.sample_rate,
            enabled=self.compressor_enabled,
            adaptive_release=self.adaptive_release,
            auto_makeup_enabled=self.auto_makeup_enabled,
            sidechain_highpass_enabled=self.sidechain_highpass_enabled,
            block_samples=BLOCK_SAMPLES,
        )

    @property
    def limiter(self) -> lim_ops.LimiterConfig:
        return lim_ops.LimiterConfig(
            sample_rate=self.sample_rate, enabled=self.limiter_enabled
        )

    @property
    def tp_limiter(self) -> tp_ops.TruePeakLimiterConfig:
        return tp_ops.TruePeakLimiterConfig(sample_rate=self.sample_rate)


def live_params(
    config: LiveChainConfig,
    *,
    gate_threshold_db: float = -40.0,
    gate_attack_ms: float = 10.0,
    gate_release_ms: float = 100.0,
    vad_threshold: float = 0.48,
    vad_hold_time_ms: float = 200.0,
    gate_margin_db: float = 10.0,
    compressor_threshold_db: float = -20.0,
    compressor_ratio: float = 4.0,
    compressor_attack_ms: float = 10.0,
    compressor_release_ms: float = 200.0,
    compressor_makeup_gain_db: float = 0.0,
    compressor_target_lufs: float = -18.0,
    noise_reference_reliability: float = 0.0,
    limiter_ceiling_db: float = -1.0,
    limiter_release_ms: float = 50.0,
) -> dict:
    """The traced control pytree. Replace leaves freely — same compiled
    step."""
    ceiling_db = effective_limiter_ceiling_db(
        limiter_ceiling_db, config.careful_output_enabled
    )
    return {
        "gate": gate_ops.gate_params(
            config.gate,
            threshold_db=gate_threshold_db,
            attack_ms=gate_attack_ms,
            release_ms=gate_release_ms,
        ),
        "vad_threshold": jnp.float32(vad_threshold),
        "vad_gate": {
            "vad_threshold": jnp.float32(vad_threshold),
            "margin_db": jnp.float32(gate_margin_db),
            "hold_time_ms": jnp.float32(vad_hold_time_ms),
        },
        "compressor": comp_ops.compressor_params(
            config.compressor,
            threshold_db=compressor_threshold_db,
            ratio=compressor_ratio,
            attack_ms=compressor_attack_ms,
            release_ms=compressor_release_ms,
            makeup_gain_db=compressor_makeup_gain_db,
            target_lufs=compressor_target_lufs,
            noise_reference_reliability=noise_reference_reliability,
        ),
        "limiter": lim_ops.limiter_params(
            config.limiter,
            ceiling_db=ceiling_db,
            release_ms=limiter_release_ms,
        ),
        "limiter_ceiling_linear": jnp.float32(util.db_to_linear(ceiling_db)),
    }


def live_init(config: LiveChainConfig, eq_bands=None, batch_shape=()) -> dict:
    fs = config.sample_rate
    meter_coeff = float(np.exp(-1.0 / (0.3 * fs)))  # 300 ms RMS meters
    f = lambda v: jnp.full(batch_shape, v, jnp.float32)
    return {
        "routing": route_ops.routing_init(config.routing, batch_shape),
        "gate": gate_ops.gate_init(batch_shape),
        "vad": vadm.vad_gate_init(config.vad, batch_shape),
        "deesser": des_ops.deesser_init(config.deesser, batch_shape),
        "eq": eq_ops.eq_init(eq_bands, fs)
        if batch_shape == ()
        else jax.tree_util.tree_map(
            lambda a: jnp.broadcast_to(
                a[(None,) * len(batch_shape)], batch_shape + a.shape
            ),
            eq_ops.eq_init(eq_bands, fs),
        ),
        "compressor": comp_ops.compressor_init(
            config.compressor, batch_shape=batch_shape
        ),
        "limiter": lim_ops.limiter_init(config.limiter, batch_shape),
        "tp": tp_ops.tp_limiter_init(batch_shape),
        "input_tp": tp_ops.detector_init(batch_shape),
        "out_lufs": loud_ops.meter_init(fs, BLOCK_SAMPLES, batch_shape),
        "in_rms_acc": f(0.0),
        "out_rms_acc": f(0.0),
        "limiter_feedback_gr_db": f(0.0),
        "meter_coeff": jnp.float32(meter_coeff),
    }


def _front_impl(config: LiveChainConfig, params, state, x,
                vad_probability, vad_available):
    """Input half: sanitize → routing/cleanup → VAD auto-gate control →
    smart gate. ``x: [..., T]``; VAD inputs are per-block scalars from the
    worker. Returns ``(new_state, y, metrics)``."""
    new_state = dict(state)

    x, clip_count, clip_peak_db = route_ops.sanitize_and_clamp_input(x)
    in_stats, new_state["in_rms_acc"] = route_ops.meter_block_stats(
        x, state["in_rms_acc"], state["meter_coeff"]
    )
    new_state["input_tp"], input_tp = tp_ops.detector_process(
        state["input_tp"], x
    )

    new_state["routing"], y, route_metrics = route_ops.routing_process(
        config.routing, state["routing"], x
    )

    # Block-cadence VAD auto-gate control (`processor/vad_worker.rs` +
    # `dsp_loop.rs:1371-1435`): noise floor, auto threshold, held-open state.
    rms_db = vadm.compute_rms_db(y)
    new_state["vad"], vout = vadm.vad_gate_process(
        config.vad, state["vad"], rms_db, vad_probability, vad_available,
        BLOCK_SAMPLES, params=params["vad_gate"],
    )

    gate_params = dict(params["gate"])
    if config.auto_threshold_enabled:
        gate_params["threshold_db"] = vout["threshold_db"]
    new_state["gate"], y, gate_metrics = gate_ops.gate_process(
        config.gate, state["gate"], y,
        vad_probability=vad_probability,
        vad_available=vad_available,
        vad_gate_open=vout["gate_open"],
        vad_threshold=params["vad_threshold"],
        params=gate_params,
    )

    metrics = {
        "input_clip_count": clip_count,
        "input_clip_peak_db": clip_peak_db,
        "input_peak_db": in_stats["peak_db"],
        "input_rms_db": in_stats["rms_db"],
        "input_crest_factor_db": in_stats["crest_factor_db"],
        "input_true_peak": input_tp,
        "gate_gain": gate_metrics["gain"],
        "gate_is_open": gate_metrics["is_open"],
        "gate_chatter_events": gate_metrics["chatter_events"],
        "gate_fused_score": gate_metrics["fused_score"],
        "gate_auto_relax_active": gate_metrics["auto_relax_active"],
        "noise_floor_db": vout["noise_floor_db"],
        "noise_floor_reliability": vout["reliability"],
        "gate_threshold_db": vout["threshold_db"],
        "vad_gate_open": vout["gate_open"],
        **{f"routing_{k}": v for k, v in route_metrics.items()},
    }
    return new_state, y, metrics


front_block = partial(jax.jit, static_argnums=(0,))(_front_impl)


def _back_impl(config: LiveChainConfig, params, state, x, evidence):
    """Downstream half (`dsp_loop.rs:604-762` + `output_writer.rs:194-288`):
    de-esser → EQ → compressor (+evidence, limiter feedback) → limiter →
    sanitize → true-peak limiter at the main ceiling → clamp → metering.

    ``evidence``: dict {vad_probability, vad_reliability, noise_floor_db,
    live_noise_reliability} for speech-aware auto makeup, or None.
    Returns ``(new_state, y, metrics)``."""
    new_state = dict(state)
    zeros = jnp.zeros(x.shape[:-1], jnp.float32)
    y = x
    metrics = {}

    if config.deesser_enabled:
        new_state["deesser"], y, dm = des_ops.deesser_process(
            config.deesser, state["deesser"], y
        )
        metrics["deesser_gain_reduction_db"] = dm["reduction_db"]
        metrics["deesser_detector_confidence"] = dm["confidence"]
    else:
        metrics["deesser_gain_reduction_db"] = zeros
        metrics["deesser_detector_confidence"] = zeros

    if config.eq_enabled:
        new_state["eq"], y = eq_ops.eq_process(state["eq"], y)

    if config.compressor_enabled:
        new_state["compressor"], y, cm = comp_ops.compressor_process(
            config.compressor, params["compressor"], state["compressor"], y,
            evidence=evidence,
            limiter_feedback_db=state["limiter_feedback_gr_db"],
        )
        metrics["compressor_gain_reduction_db"] = cm["gain_reduction_db"]
        metrics["compressor_makeup_gain_db"] = cm["makeup_gain_db"]
        metrics["compressor_lufs"] = cm["lufs"]
        metrics["compressor_release_ms"] = cm.get(
            "current_release_ms", zeros
        )
    else:
        metrics["compressor_gain_reduction_db"] = zeros
        metrics["compressor_makeup_gain_db"] = zeros
        metrics["compressor_lufs"] = zeros - 100.0
        metrics["compressor_release_ms"] = zeros

    if config.limiter_enabled:
        new_state["limiter"], y, lm = lim_ops.limiter_process(
            config.limiter, state["limiter"], y, params=params["limiter"]
        )
        metrics["limiter_gain_reduction_db"] = lm["peak_gr_db"]
        # compressor headroom feedback for the next block
        # (`compressor.rs:393-397`, `dsp_loop.rs:744-757`)
        new_state["limiter_feedback_gr_db"] = jnp.broadcast_to(
            lm["peak_gr_db"], state["limiter_feedback_gr_db"].shape
        )
    else:
        metrics["limiter_gain_reduction_db"] = zeros
        new_state["limiter_feedback_gr_db"] = jnp.zeros_like(
            state["limiter_feedback_gr_db"]
        )

    # ---- output writer conditioning (`output_writer.rs:194-288`) ----
    y = jnp.where(jnp.isfinite(y), y, 0.0)
    if config.limiter_enabled:
        new_state["tp"], y, tm = tp_ops.tp_limiter_process(
            config.tp_limiter, state["tp"], y,
            ceiling_linear=params["limiter_ceiling_linear"],
        )
        metrics["output_true_peak"] = tm["output_true_peak"]
        metrics["tp_gain_reduction_db"] = tm["max_gain_reduction_db"]
        metrics["tp_limited_events"] = tm["limited_events"]
    else:
        new_state["tp"], tp_peak = tp_ops.detector_process(
            {"history": state["tp"]["in_hist"],
             "last_peak": state["tp"]["last_input_tp"]}, y
        )
        state_tp = dict(state["tp"])
        state_tp["in_hist"] = new_state["tp"]["history"]
        state_tp["last_input_tp"] = new_state["tp"]["last_peak"]
        new_state["tp"] = state_tp
        metrics["output_true_peak"] = tp_peak
        metrics["tp_gain_reduction_db"] = zeros
        metrics["tp_limited_events"] = jnp.zeros(x.shape[:-1], jnp.int32)

    y, out_clip_count, out_clip_peak_db = route_ops.sanitize_and_clamp_output(
        y, params["limiter_ceiling_linear"]
    )

    out_stats, new_state["out_rms_acc"] = route_ops.meter_block_stats(
        y, state["out_rms_acc"], state["meter_coeff"]
    )
    new_state["out_lufs"], out_lufs = loud_ops.meter_process(
        state["out_lufs"], y
    )
    metrics.update(
        output_clip_count=out_clip_count,
        output_clip_peak_db=out_clip_peak_db,
        output_peak_db=out_stats["peak_db"],
        output_rms_db=out_stats["rms_db"],
        output_crest_factor_db=out_stats["crest_factor_db"],
        output_lufs=out_lufs,
    )
    return new_state, y, metrics


back_block = partial(jax.jit, static_argnums=(0,))(_back_impl)


@partial(jax.jit, static_argnums=(0,))
def front_run(config: LiveChainConfig, params, state, xs,
              vad_probability, vad_available):
    """Fused multi-block front half: one device call scans ``xs: [k, T]``
    through the ``front_block`` body. The host drains an input backlog by
    fusing blocks into one dispatch (the reference drains by *discarding*
    above 250 ms, `dsp_loop.rs:917-950`; fusing first means the engine
    catches up without losing audio whenever per-call dispatch — not
    compute — is what fell behind). Returns stacked per-block outputs and
    metrics with a leading ``k`` axis."""
    def step(st, x):
        st, y, m = _front_impl(config, params, st, x,
                               vad_probability, vad_available)
        return st, (y, m)

    state, (ys, ms) = jax.lax.scan(step, state, xs)
    return state, ys, ms


@partial(jax.jit, static_argnums=(0,))
def back_run(config: LiveChainConfig, params, state, xs, evidence):
    """Fused multi-block downstream half over ``xs: [k, T]``. ``evidence``
    leaves carry a leading ``k`` axis (per-block auto-makeup inputs) or are
    None. Counterpart of :func:`front_run` for backlog draining."""
    def step(st, xe):
        x, ev = xe
        st, y, m = _back_impl(config, params, st, x, ev)
        return st, (y, m)

    state, (ys, ms) = jax.lax.scan(step, state, (xs, evidence))
    return state, ys, ms


def chain_latency_samples(config: LiveChainConfig,
                          suppressor_latency: int = 0) -> int:
    """Algorithmic latency of the full chain (`resampling.rs:36-79`):
    suppressor frames + limiter lookahead + true-peak limiter lookahead +
    polyphase interpolator group delay."""
    total = int(suppressor_latency)
    total += lim_ops.latency_samples(config.limiter)
    if config.limiter_enabled:
        total += tp_ops.LIMITER_LOOKAHEAD_SAMPLES
        total += (tp_ops.TAPS_PER_PHASE - 1) // 2
    return total
