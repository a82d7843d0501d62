"""Public API surface mirroring the reference native module ``mic_eq_core``.

Signatures, validation behaviour, and returned diagnostics keys follow
`rust-core/src/lib.rs:100-361` and
`rust-core/src/audio/processor/python_api.rs` so calibration/UI code written
against the reference runs unchanged. Heavy simulation happens on-device in
one compiled call per take; aggregation math is host numpy.
"""

from __future__ import annotations

import time

import jax
import jax.numpy as jnp
import numpy as np

from .ops import eq as eq_ops
from .ops import loudness as loud_ops
from .runtime import chain as chain_rt

__all__ = [
    "eq_magnitude_response",
    "eq_magnitude_response_v2",
    "simulate_eq_v2",
    "measure_integrated_loudness",
    "simulate_auto_eq_chain",
    "simulate_auto_makeup_control",
    "simulate_gate_suppressor_order",
    "compressor_pumping_score",
    "percentile",
]

NUM_BANDS = eq_ops.NUM_BANDS
_RT_PROCESS_BUFFER_CAPACITY = 4096  # `audio/rt.rs` fixed buffer capacity


def percentile(values, p: float) -> float:
    """Sorted linear-interpolated percentile (`python_api.rs:86-100`)."""
    v = np.sort(np.asarray(values, np.float32))
    if v.size == 0:
        return 0.0
    pos = (v.size - 1) * float(np.clip(p, 0.0, 1.0))
    lo = int(np.floor(pos))
    hi = int(np.ceil(pos))
    if lo == hi:
        return float(v[lo])
    frac = pos - lo
    return float(v[lo] + frac * (v[hi] - v[lo]))


def _linear_to_db(x) -> float:
    return float(20.0 * np.log10(max(abs(float(x)), 1e-10)))


def _validate_sample_rate(sample_rate):
    if not np.isfinite(sample_rate) or sample_rate <= 0:
        raise ValueError("sample_rate must be positive and finite")


def _legacy_bands(bands, sample_rate):
    """(frequency, gain, Q) triples applied to the default band types
    (`lib.rs:100-152`: legacy setters keep each band's default filter)."""
    if len(bands) != NUM_BANDS:
        raise ValueError(f"expected {NUM_BANDS} EQ bands, got {len(bands)}")
    nyquist = sample_rate / 2.0
    out = []
    defaults = eq_ops.default_bands()
    for index, (frequency_hz, gain_db, q) in enumerate(bands):
        if not np.isfinite(frequency_hz) or frequency_hz <= 0 or frequency_hz >= nyquist:
            raise ValueError(f"band {index} frequency must be between 0 Hz and Nyquist")
        if not np.isfinite(gain_db):
            raise ValueError(f"band {index} gain must be finite")
        if not np.isfinite(q) or q <= 0:
            raise ValueError(f"band {index} Q must be finite and positive")
        d = defaults[index]
        out.append(
            eq_ops.EqBandConfig(d.filter_type, float(frequency_hz), float(gain_db),
                                float(q), d.slope_db_per_octave, True)
        )
    return out


def _v2_bands(bands, sample_rate):
    """Parse (type_name, freq, gain, q, slope, enabled) tuples
    (`lib.rs:154-192`)."""
    _validate_sample_rate(sample_rate)
    if len(bands) != NUM_BANDS:
        raise ValueError(f"expected {NUM_BANDS} EQ bands, got {len(bands)}")
    out = []
    for index, (ftype, freq, gain, q, slope, enabled) in enumerate(bands):
        try:
            type_id = eq_ops.EqBandConfig.type_id(ftype)
        except KeyError:
            raise ValueError(
                f"band {index} has unsupported EQ filter type: {ftype}"
            ) from None
        cfg = eq_ops.EqBandConfig(
            type_id, float(freq), float(gain), float(q), int(slope), bool(enabled)
        )
        eq_ops.validate_band(cfg, sample_rate)
        out.append(cfg)
    return out


def _validate_response_freqs(frequencies_hz, sample_rate):
    f = np.asarray(frequencies_hz, np.float64)
    nyquist = sample_rate / 2.0
    if not np.all(np.isfinite(f)) or np.any(f < 0) or np.any(f > nyquist):
        raise ValueError(
            "response frequencies must be finite and between 0 Hz and Nyquist"
        )
    return f


def eq_magnitude_response(frequencies_hz, bands, sample_rate):
    """Exact cascaded EQ response for legacy (freq, gain, Q) bands
    (`lib.rs:100-152`)."""
    _validate_sample_rate(sample_rate)
    configs = _legacy_bands(bands, sample_rate)
    freqs = _validate_response_freqs(frequencies_hz, sample_rate)
    return list(eq_ops.magnitude_response_db(configs, freqs, sample_rate))


def eq_magnitude_response_v2(frequencies_hz, bands, sample_rate):
    """Exact cascaded EQ response for schema-v2 bands (`lib.rs:192-214`)."""
    configs = _v2_bands(bands, sample_rate)
    freqs = _validate_response_freqs(frequencies_hz, sample_rate)
    return list(eq_ops.magnitude_response_db(configs, freqs, sample_rate))


@jax.jit
def _eq_scan_run(state, blocks):
    def body(st, xb):
        st, y = eq_ops.eq_process(st, xb)
        return st, y

    return jax.lax.scan(body, state, blocks)


def _frame_blocks(audio, block):
    n = len(audio)
    nb = max(1, -(-n // block))
    padded = np.zeros(nb * block, np.float32)
    padded[:n] = audio
    return padded.reshape(nb, block), nb


def simulate_eq_v2(audio, sample_rate, bands, return_output_audio=False):
    """Render audio through the EQ alone (`lib.rs:216-289`). Returns the
    reference diagnostics dict."""
    configs = _v2_bands(bands, sample_rate)
    x = np.asarray(audio, np.float32)
    if not np.all(np.isfinite(x)):
        raise ValueError("audio must contain only finite samples")

    state = eq_ops.eq_init(configs, sample_rate)
    started = time.perf_counter()
    blocks, nb = _frame_blocks(x, 4800)
    _, ys = _eq_scan_run(state, jnp.asarray(blocks))
    output = np.asarray(ys).reshape(-1)[: len(x)]
    runtime_ms = (time.perf_counter() - started) * 1000.0

    from .ops import true_peak as tp_ops

    det_in = tp_ops.detector_init()
    det_out = tp_ops.detector_init()
    _, itp = tp_ops.detector_process(det_in, jnp.asarray(x) if len(x) else jnp.zeros(1))
    _, otp = tp_ops.detector_process(det_out, jnp.asarray(output) if len(output) else jnp.zeros(1))

    n = max(len(x), 1)
    response_frequencies = 20.0 * (20000.0 / 20.0) ** (np.arange(512) / 511.0)
    max_response_db = float(
        np.max(eq_ops.magnitude_response_db(configs, response_frequencies, sample_rate))
    )
    diagnostics = {
        "input_sample_peak": float(np.max(np.abs(x))) if len(x) else 0.0,
        "output_sample_peak": float(np.max(np.abs(output))) if len(output) else 0.0,
        "input_true_peak": float(itp),
        "output_true_peak": float(otp),
        "input_rms": float(np.sqrt(np.sum(x.astype(np.float64) ** 2) / n)),
        "output_rms": float(np.sqrt(np.sum(output.astype(np.float64) ** 2) / n)),
        "max_response_db": max_response_db,
        "runtime_ms": runtime_ms,
        "sample_count": len(x),
        "algorithmic_latency_samples": 0,
        "non_finite_output": bool(np.any(~np.isfinite(output))),
    }
    if return_output_audio:
        diagnostics["output_audio"] = output.tolist()
    return diagnostics


def measure_integrated_loudness(audio, sample_rate):
    """BS.1770 gated mono integrated loudness (`lib.rs:291-299`)."""
    return loud_ops.integrated_loudness_lufs(np.asarray(audio, np.float32), sample_rate)


def compressor_pumping_score(gr_trace_db, cadence_hz):
    """Band-passed (2-8 Hz) gain-reduction modulation score
    (`python_api.rs:102-145`)."""
    gr = np.asarray(gr_trace_db, np.float32)
    if gr.size < 3 or not np.isfinite(cadence_hz) or cadence_hz <= 0:
        return 0.0
    if not np.all(np.isfinite(gr)):
        return float("inf")
    dt = 1.0 / float(cadence_hz)
    hp_rc = 1.0 / (2.0 * np.pi * 2.0)
    lp_rc = 1.0 / (2.0 * np.pi * 8.0)
    hp_a = hp_rc / (hp_rc + dt)
    lp_a = dt / (lp_rc + dt)
    prev = gr[0]
    hp = 0.0
    bp = 0.0
    bp_abs = []
    deltas = []
    for v in gr[1:]:
        hp = hp_a * (hp + v - prev)
        bp += lp_a * (hp - bp)
        bp_abs.append(abs(bp))
        deltas.append(abs(v - prev))
        prev = v
    bp_abs = np.asarray(bp_abs, np.float32)
    robust_limit = percentile(bp_abs, 0.95)
    robust_rms = float(np.sqrt(np.mean(np.minimum(bp_abs, robust_limit) ** 2)))
    return robust_rms + percentile(np.asarray(deltas, np.float32), 0.95)


def _settings_get(settings, key, default):
    if settings is None:
        return default
    return settings.get(key, default)


def _chain_config_from_settings(sample_rate, settings):
    """Build the static ChainConfig + traced compressor params from a
    `simulate_auto_eq_chain` settings dict (`python_api.rs:443-516`)."""
    from .ops import compressor as comp_ops
    from .ops import deesser as des_ops
    from .ops import limiter as lim_ops

    deesser_enabled = bool(_settings_get(settings, "deesser_enabled", False))
    compressor_enabled = bool(_settings_get(settings, "compressor_enabled", True))
    limiter_enabled = bool(_settings_get(settings, "limiter_enabled", True))
    limiter_ceiling_db = float(_settings_get(settings, "limiter_ceiling_db", -0.5))
    careful = bool(_settings_get(settings, "limiter_careful_output_enabled", True))
    effective_ceiling_db = chain_rt.effective_limiter_ceiling_db(limiter_ceiling_db, careful)
    # `limiter.rs:139-141`: ceiling clamps to <= 0 dB
    effective_ceiling_db = min(effective_ceiling_db, 0.0)

    deesser_cfg = des_ops.DeEsserConfig(
        sample_rate=sample_rate,
        enabled=deesser_enabled,
        auto_enabled=bool(_settings_get(settings, "deesser_auto_enabled", True)),
        auto_amount=float(_settings_get(settings, "deesser_auto_amount", 0.5)),
        threshold_db=float(_settings_get(settings, "deesser_threshold_db", -28.0)),
        ratio=float(_settings_get(settings, "deesser_ratio", 4.0)),
        max_reduction_db=float(_settings_get(settings, "deesser_max_reduction_db", 6.0)),
        low_cut_hz=float(_settings_get(settings, "deesser_low_cut_hz", 4000.0)),
        high_cut_hz=float(_settings_get(settings, "deesser_high_cut_hz", 11000.0)),
    )
    comp_cfg = comp_ops.CompressorConfig(
        sample_rate=sample_rate,
        enabled=compressor_enabled,
        adaptive_release=bool(_settings_get(settings, "compressor_adaptive_release", False)),
        auto_makeup_enabled=bool(
            _settings_get(settings, "compressor_auto_makeup_enabled", False)
        ),
        sidechain_highpass_enabled=bool(
            _settings_get(settings, "compressor_sidechain_highpass_enabled", True)
        ),
        block_samples=max(1, min(int(round(sample_rate * 0.020)), _RT_PROCESS_BUFFER_CAPACITY)),
    )
    # Offline chain compressor is constructed (-18, 3, 5 ms, 100 ms, 0, knee 6)
    # then reconfigured (`block_processor.rs:55`), which pins the detector
    # release at 100 ms and the knee at 6 dB.
    comp_params = comp_ops.compressor_params(
        comp_cfg,
        threshold_db=float(_settings_get(settings, "compressor_threshold_db", -20.0)),
        ratio=float(_settings_get(settings, "compressor_ratio", 4.0)),
        attack_ms=float(_settings_get(settings, "compressor_attack_ms", 10.0)),
        release_ms=float(
            _settings_get(
                settings,
                "compressor_base_release_ms"
                if bool(_settings_get(settings, "compressor_adaptive_release", False))
                else "compressor_release_ms",
                50.0
                if bool(_settings_get(settings, "compressor_adaptive_release", False))
                else 200.0,
            )
        ),
        makeup_gain_db=float(_settings_get(settings, "compressor_makeup_gain_db", 0.0)),
        knee_db=6.0,
        target_lufs=float(_settings_get(settings, "compressor_target_lufs", -18.0)),
        detector_release_ms=100.0,
    )
    limiter_cfg = lim_ops.LimiterConfig(
        ceiling_db=effective_ceiling_db,
        release_ms=float(_settings_get(settings, "limiter_release_ms", 50.0)),
        lookahead_ms=float(_settings_get(settings, "limiter_lookahead_ms", 2.0)),
        sample_rate=sample_rate,
        enabled=limiter_enabled,
    )
    cfg = chain_rt.ChainConfig(
        sample_rate=sample_rate,
        deesser_enabled=deesser_enabled,
        eq_enabled=True,
        compressor_enabled=compressor_enabled,
        limiter_enabled=limiter_enabled,
        eq_before_deesser=bool(_settings_get(settings, "eq_before_deesser", False)),
        deesser=deesser_cfg,
        compressor=comp_cfg,
        limiter=limiter_cfg,
        tp_release_ms=float(_settings_get(settings, "limiter_release_ms", 50.0))
        if limiter_enabled
        else 80.0,
    )
    return cfg, comp_params, effective_ceiling_db


def simulate_auto_eq_chain(audio, sample_rate, bands, settings=None):
    """Render audio through deesser/EQ/compressor/limiter/true-peak and
    return the reference diagnostics dict (`python_api.rs:406-749`).

    ``bands``: 10 legacy (frequency, gain_db, q) triples, overridden by
    schema-v2 ``settings["eq_bands_v2"]`` when present.
    """
    started = time.perf_counter()
    _validate_sample_rate(sample_rate)
    sample_rate = float(sample_rate)

    if settings is not None and settings.get("eq_bands_v2") is not None:
        eq_bands = _v2_bands(settings["eq_bands_v2"], sample_rate)
    else:
        eq_bands = _legacy_bands(bands, sample_rate)

    cfg, comp_params, effective_ceiling_db = _chain_config_from_settings(
        sample_rate, settings
    )
    return_output_audio = bool(_settings_get(settings, "return_output_audio", False))

    x = np.asarray(audio, np.float32)
    x = np.where(np.isfinite(x), x, 0.0).astype(np.float32)
    analysis_block = max(1, min(int(round(sample_rate * 0.020)), _RT_PROCESS_BUFFER_CAPACITY))
    n = len(x)
    blocks, nb = _frame_blocks(x, analysis_block)
    # per-block valid sample counts (last block may be partial)
    valid = np.full(nb, analysis_block, np.int64)
    if n % analysis_block and n > 0:
        valid[-1] = n % analysis_block
    if n == 0:
        valid[:] = 0

    state = chain_rt.chain_init(cfg, comp_params, eq_bands)
    final, ys, stats = chain_rt.chain_run(
        cfg, comp_params, state, jnp.asarray(blocks), return_audio=True
    )
    out_blocks = np.asarray(ys)
    stats = {k: np.asarray(v) for k, v in stats.items()}
    output = out_blocks.reshape(-1)[:n]

    # mask the padded tail out of the partial block's energy (the reference
    # processes the exact partial block; padding zeros adds no energy)
    in_sq = (blocks.astype(np.float64) ** 2).sum(axis=1)
    out_sq = (out_blocks.astype(np.float64) ** 2).sum(axis=1)
    block_in_rms = np.sqrt(in_sq / np.maximum(valid, 1))
    block_out_rms = np.sqrt(out_sq / np.maximum(valid, 1))
    in_rows_db = 20.0 * np.log10(np.maximum(block_in_rms, 1e-10))
    out_rows_db = 20.0 * np.log10(np.maximum(block_out_rms, 1e-10))
    comp_rows = stats["compressor_gain_reduction_db"]
    des_rows = stats["deesser_gain_reduction_db"]

    non_finite_output = bool(np.any(~np.isfinite(output)))
    input_rms = float(np.sqrt(in_sq.sum() / max(n, 1)))
    output_rms = float(np.sqrt(out_sq.sum() / max(n, 1)))
    input_sample_peak = float(stats["input_sample_peak"].max(initial=0.0))
    output_sample_peak = float(stats["output_sample_peak"].max(initial=0.0))
    pre_limiter_true_peak = float(stats["true_peak_limiter_input_peak"].max(initial=0.0))
    output_true_peak = float(stats["output_true_peak"].max(initial=0.0))

    output_sample_peak_db = _linear_to_db(output_sample_peak)
    pre_limiter_true_peak_db = _linear_to_db(pre_limiter_true_peak)
    output_true_peak_db = _linear_to_db(output_true_peak)

    # active/silence split (`python_api.rs:620-668`)
    input_floor_db = percentile(in_rows_db, 0.20)
    input_p90_db = percentile(in_rows_db, 0.90)
    active_threshold_db = max(input_floor_db + 6.0, input_p90_db - 24.0, -60.0)
    active_mask = in_rows_db >= active_threshold_db
    active_comp = np.maximum(comp_rows[active_mask], 0.0)
    active_des = np.maximum(des_rows[active_mask], 0.0)
    if active_comp.size < 3:
        active_comp = np.maximum(comp_rows, 0.0)
        active_des = np.maximum(des_rows, 0.0)
    active_block_count = int(active_comp.size)
    compressor_active_ratio = (
        float(np.mean(active_comp >= 0.10)) if active_block_count else 0.0
    )
    valid_rows = in_rows_db > -100.0
    active_gain_rows = (out_rows_db - in_rows_db)[active_mask & valid_rows]
    silence_delta_rows = (out_rows_db - in_rows_db)[(~active_mask) & valid_rows]
    silence_gain_rows = -np.maximum(comp_rows[~active_mask], 0.0)

    gr_trace = np.maximum(comp_rows, 0.0)
    pumping = compressor_pumping_score(gr_trace, 50.0)

    diagnostics = {
        "input_sample_peak_db": _linear_to_db(input_sample_peak),
        "input_rms_db": _linear_to_db(input_rms),
        "output_sample_peak_db": output_sample_peak_db,
        "pre_limiter_true_peak_db": pre_limiter_true_peak_db,
        "output_true_peak_db": output_true_peak_db,
        "output_rms_db": _linear_to_db(output_rms),
        "limiter_effective_ceiling_db": float(effective_ceiling_db),
        "sample_headroom_db": float(effective_ceiling_db - output_sample_peak_db),
        "pre_limiter_true_peak_headroom_db": float(
            effective_ceiling_db - pre_limiter_true_peak_db
        ),
        "true_peak_headroom_db": float(effective_ceiling_db - output_true_peak_db),
        "limiter_gain_reduction_db": float(
            stats["limiter_peak_gain_reduction_db"].max(initial=0.0)
        ),
        "true_peak_limiter_gain_reduction_db": float(
            stats["true_peak_limiter_gain_reduction_db"].max(initial=0.0)
        ),
        "true_peak_limited_events": int(stats["true_peak_limited_events"].sum()),
        "compressor_gain_reduction_db": float(comp_rows.max(initial=0.0)),
        "deesser_gain_reduction_db": float(des_rows.max(initial=0.0)),
        "compressor_gain_reduction_median_db": percentile(active_comp, 0.50),
        "compressor_gain_reduction_p95_db": percentile(active_comp, 0.95),
        "compressor_gain_reduction_active_ratio": compressor_active_ratio,
        "active_output_gain_db": percentile(active_gain_rows, 0.50),
        "silence_output_gain_db": percentile(silence_gain_rows, 0.50),
        "silence_level_delta_db": percentile(silence_delta_rows, 0.50),
        "compressor_pumping_score_db": float(pumping),
        "non_finite_output": non_finite_output,
        "candidate_runtime_ms": (time.perf_counter() - started) * 1000.0,
        "deesser_gain_reduction_median_db": percentile(active_des, 0.50),
        "deesser_gain_reduction_p95_db": percentile(active_des, 0.95),
        "analysis_block_ms": 20.0,
        "active_analysis_threshold_db": float(active_threshold_db),
        "active_analysis_block_count": active_block_count,
        "processed_samples": int(n),
    }
    if return_output_audio:
        diagnostics["output_audio"] = output.tolist()
    return diagnostics


def simulate_auto_eq_chain_batched(audio, sample_rate, bands, settings,
                                   param_sets, mesh=None):
    """Evaluate MANY compressor parameterisations of the same chain in ONE
    vmapped device call.

    The reference evaluates its 68-candidate compressor search serially
    through the native simulator (`voice_setup.py:699-783`); here the
    candidates become a batch axis. ``param_sets`` is a list of dicts with
    keys {threshold_db, ratio, attack_ms, release_ms}; all other settings
    are shared. Returns one diagnostics dict per candidate (same keys as
    :func:`simulate_auto_eq_chain`, minus output audio).

    ``mesh``: optional :class:`jax.sharding.Mesh` — shards the candidate
    axis over its devices (collective-free fleet data parallelism; see
    :mod:`audioforge_tpu.parallel.fleet`). The candidate list is padded to
    a device-count multiple internally; results keep the original order
    and length.
    """
    from .ops import compressor as comp_ops

    started = time.perf_counter()
    _validate_sample_rate(sample_rate)
    sample_rate = float(sample_rate)
    if settings is not None and settings.get("eq_bands_v2") is not None:
        eq_bands = _v2_bands(settings["eq_bands_v2"], sample_rate)
    else:
        eq_bands = _legacy_bands(bands, sample_rate)
    cfg, base_params, effective_ceiling_db = _chain_config_from_settings(
        sample_rate, settings
    )

    B_requested = len(param_sets)
    if B_requested == 0:
        return []
    if mesh is not None:
        from .parallel.fleet import pad_candidates

        param_sets, _ = pad_candidates(
            list(param_sets), int(np.prod(mesh.devices.shape))
        )
    B = len(param_sets)

    def stack(key, fn):
        return jnp.asarray([fn(p) for p in param_sets], jnp.float32)

    comp_params = dict(base_params)
    fs = sample_rate
    comp_params["threshold_db"] = stack("threshold_db", lambda p: float(p["threshold_db"]))
    comp_params["ratio"] = stack("ratio", lambda p: max(float(p["ratio"]), 1.0))
    comp_params["attack_coeff"] = jnp.asarray(
        [
            np.exp(-1000.0 / (max(float(p["attack_ms"]), 1e-6) * fs))
            for p in param_sets
        ],
        jnp.float32,
    )
    comp_params["base_release_ms"] = stack("release_ms", lambda p: float(p["release_ms"]))
    comp_params = {
        k: (jnp.broadcast_to(v, (B,)) if np.ndim(v) == 0 else v)
        for k, v in comp_params.items()
    }

    x = np.asarray(audio, np.float32)
    x = np.where(np.isfinite(x), x, 0.0).astype(np.float32)
    analysis_block = max(1, min(int(round(sample_rate * 0.020)), _RT_PROCESS_BUFFER_CAPACITY))
    n = len(x)
    blocks, nb = _frame_blocks(x, analysis_block)
    valid = np.full(nb, analysis_block, np.int64)
    if n % analysis_block and n > 0:
        valid[-1] = n % analysis_block

    state = chain_rt.chain_init(cfg, comp_params, eq_bands, batch_shape=(B,))
    blocks_b = jnp.broadcast_to(jnp.asarray(blocks), (B, nb, analysis_block))
    if mesh is not None:
        # shard the candidate axis over the fleet; GSPMD partitions the
        # whole batched scan with no cross-device collectives
        from .parallel.fleet import shard_batched_tree

        ref_state = chain_rt.chain_init(cfg, base_params, eq_bands)
        state = shard_batched_tree(state, ref_state, mesh)
        comp_params = shard_batched_tree(comp_params, base_params, mesh)
        blocks_b = shard_batched_tree(
            blocks_b, np.zeros((nb, analysis_block), np.float32), mesh
        )
    final, ys, stats = chain_rt.chain_run(
        cfg, comp_params, state, blocks_b, return_audio=True
    )
    ys = np.asarray(ys)  # (B, nb, block)
    stats = {k: np.asarray(v) for k, v in stats.items()}  # (B, nb)

    in_sq = (blocks.astype(np.float64) ** 2).sum(axis=1)  # shared input
    in_rows_db = 20.0 * np.log10(np.maximum(np.sqrt(in_sq / np.maximum(valid, 1)), 1e-10))
    input_floor_db = percentile(in_rows_db, 0.20)
    input_p90_db = percentile(in_rows_db, 0.90)
    active_threshold_db = max(input_floor_db + 6.0, input_p90_db - 24.0, -60.0)
    active_mask = in_rows_db >= active_threshold_db
    valid_rows = in_rows_db > -100.0
    runtime_ms = (time.perf_counter() - started) * 1000.0 / B

    results = []
    for b in range(B_requested):  # pad rows (sharding) are dropped
        out_sq = (ys[b].astype(np.float64) ** 2).sum(axis=1)
        out_rows_db = 20.0 * np.log10(
            np.maximum(np.sqrt(out_sq / np.maximum(valid, 1)), 1e-10)
        )
        comp_rows = stats["compressor_gain_reduction_db"][b]
        des_rows = stats["deesser_gain_reduction_db"][b]
        output = ys[b].reshape(-1)[:n]
        a_comp = np.maximum(comp_rows[active_mask], 0.0)
        a_des = np.maximum(des_rows[active_mask], 0.0)
        if a_comp.size < 3:
            a_comp = np.maximum(comp_rows, 0.0)
            a_des = np.maximum(des_rows, 0.0)
        osp = float(stats["output_sample_peak"][b].max(initial=0.0))
        pre_tp = float(stats["true_peak_limiter_input_peak"][b].max(initial=0.0))
        otp = float(stats["output_true_peak"][b].max(initial=0.0))
        osp_db, pre_db, otp_db = _linear_to_db(osp), _linear_to_db(pre_tp), _linear_to_db(otp)
        results.append({
            "input_sample_peak_db": _linear_to_db(stats["input_sample_peak"][b].max(initial=0.0)),
            "input_rms_db": _linear_to_db(float(np.sqrt(in_sq.sum() / max(n, 1)))),
            "output_sample_peak_db": osp_db,
            "pre_limiter_true_peak_db": pre_db,
            "output_true_peak_db": otp_db,
            "output_rms_db": _linear_to_db(float(np.sqrt(out_sq.sum() / max(n, 1)))),
            "limiter_effective_ceiling_db": float(effective_ceiling_db),
            "sample_headroom_db": float(effective_ceiling_db - osp_db),
            "pre_limiter_true_peak_headroom_db": float(effective_ceiling_db - pre_db),
            "true_peak_headroom_db": float(effective_ceiling_db - otp_db),
            "limiter_gain_reduction_db": float(
                stats["limiter_peak_gain_reduction_db"][b].max(initial=0.0)
            ),
            "true_peak_limiter_gain_reduction_db": float(
                stats["true_peak_limiter_gain_reduction_db"][b].max(initial=0.0)
            ),
            "true_peak_limited_events": int(stats["true_peak_limited_events"][b].sum()),
            "compressor_gain_reduction_db": float(comp_rows.max(initial=0.0)),
            "deesser_gain_reduction_db": float(des_rows.max(initial=0.0)),
            "compressor_gain_reduction_median_db": percentile(a_comp, 0.50),
            "compressor_gain_reduction_p95_db": percentile(a_comp, 0.95),
            "compressor_gain_reduction_active_ratio": (
                float(np.mean(a_comp >= 0.10)) if a_comp.size else 0.0
            ),
            "active_output_gain_db": percentile(
                (out_rows_db - in_rows_db)[active_mask & valid_rows], 0.50
            ),
            "silence_output_gain_db": percentile(
                -np.maximum(comp_rows[~active_mask], 0.0), 0.50
            ),
            "silence_level_delta_db": percentile(
                (out_rows_db - in_rows_db)[(~active_mask) & valid_rows], 0.50
            ),
            "compressor_pumping_score_db": float(
                compressor_pumping_score(np.maximum(comp_rows, 0.0), 50.0)
            ),
            "non_finite_output": bool(np.any(~np.isfinite(output))),
            "candidate_runtime_ms": runtime_ms,
            "deesser_gain_reduction_median_db": percentile(a_des, 0.50),
            "deesser_gain_reduction_p95_db": percentile(a_des, 0.95),
            "analysis_block_ms": 20.0,
            "active_analysis_threshold_db": float(active_threshold_db),
            "active_analysis_block_count": int(a_comp.size),
            "processed_samples": int(n),
        })
    return results


def simulate_auto_makeup_control(
    audio, sample_rate, vad_probabilities, noise_floor_db, noise_reliability,
    settings=None,
):
    """Stream a capture through the production auto-makeup controller at the
    fixed 10 ms control cadence (`python_api.rs:146-304`)."""
    from .ops import compressor as comp_ops

    CONTROL_BLOCK_SIZE = 480
    _validate_sample_rate(sample_rate)
    sample_rate = float(sample_rate)
    if (
        not np.isfinite(noise_floor_db)
        or not np.isfinite(noise_reliability)
        or not (0.0 <= noise_reliability <= 1.0)
    ):
        raise ValueError(
            "noise evidence must be finite and reliability must be between 0 and 1"
        )
    probs = np.asarray(vad_probabilities, np.float64)
    if probs.size and (not np.all(np.isfinite(probs)) or np.any(probs < 0) or np.any(probs > 1)):
        raise ValueError("VAD probabilities must be finite and between 0 and 1")
    x = np.asarray(audio, np.float32)
    block_count = -(-len(x) // CONTROL_BLOCK_SIZE)
    if probs.size and probs.size != block_count:
        raise ValueError(
            f"expected {block_count} VAD probabilities at the 10 ms control "
            f"cadence, got {probs.size}"
        )
    vad_reliability = float(_settings_get(settings, "vad_reliability", 1.0))
    if not np.isfinite(vad_reliability) or not (0.0 <= vad_reliability <= 1.0):
        raise ValueError("vad_reliability must be finite and between 0 and 1")
    return_output_audio = bool(_settings_get(settings, "return_output_audio", False))

    comp_cfg = comp_ops.CompressorConfig(
        sample_rate=sample_rate,
        enabled=True,
        adaptive_release=bool(_settings_get(settings, "adaptive_release", True)),
        auto_makeup_enabled=True,
        sidechain_highpass_enabled=bool(
            _settings_get(settings, "sidechain_highpass_enabled", True)
        ),
        block_samples=CONTROL_BLOCK_SIZE,
    )
    comp_params = comp_ops.compressor_params(
        comp_cfg,
        threshold_db=float(_settings_get(settings, "threshold_db", -24.0)),
        ratio=float(_settings_get(settings, "ratio", 3.0)),
        attack_ms=float(_settings_get(settings, "attack_ms", 10.0)),
        release_ms=float(_settings_get(settings, "release_ms", 180.0)),
        makeup_gain_db=float(_settings_get(settings, "makeup_gain_db", 0.0)),
        knee_db=6.0,
        target_lufs=float(np.clip(_settings_get(settings, "target_lufs", -18.0), -24.0, -12.0)),
        noise_reference_reliability=noise_reliability,
    )

    blocks, nb = _frame_blocks(x, CONTROL_BLOCK_SIZE) if len(x) else (
        np.zeros((0, CONTROL_BLOCK_SIZE), np.float32), 0
    )
    have_evidence = probs.size > 0
    ev_probs = probs if have_evidence else np.zeros(nb)

    state = comp_ops.compressor_init(comp_cfg, comp_params)

    @jax.jit
    def run(state, blocks, ev):
        def body(st, inp):
            xb, p = inp
            evidence = {
                "vad_probability": p,
                "vad_reliability": jnp.float32(vad_reliability),
                "noise_floor_db": jnp.float32(noise_floor_db),
                "live_noise_reliability": jnp.float32(noise_reliability),
            }
            st, y, m = comp_ops.compressor_process(
                comp_cfg, comp_params, st, xb,
                evidence=evidence if have_evidence else None,
            )
            row = {
                "makeup": m["makeup_gain_db"],
                "activity": st["speech_activity_score"],
                "reliability": st["activity_reliability"],
                "gr": m["gain_reduction_db"],
            }
            return st, (y, row)

        final, (ys, rows) = jax.lax.scan(body, state, (blocks, ev))
        return final, ys, rows

    started = time.perf_counter()
    if nb:
        final, ys, rows = run(state, jnp.asarray(blocks), jnp.asarray(ev_probs, jnp.float32))
        ys = np.asarray(ys)
        rows = {k: np.asarray(v) for k, v in rows.items()}
    else:
        ys = np.zeros((0, CONTROL_BLOCK_SIZE), np.float32)
        rows = {k: np.zeros(0, np.float32) for k in ("makeup", "activity", "reliability", "gr")}
    total_ms = (time.perf_counter() - started) * 1000.0

    valid = np.full(nb, CONTROL_BLOCK_SIZE, np.int64)
    if len(x) % CONTROL_BLOCK_SIZE and len(x) > 0:
        valid[-1] = len(x) % CONTROL_BLOCK_SIZE
    in_rms = np.sqrt((blocks.astype(np.float64) ** 2).sum(axis=1) / np.maximum(valid, 1))
    out_rms = np.sqrt((ys.astype(np.float64) ** 2).sum(axis=1) / np.maximum(valid, 1))

    per_block_ms = total_ms / max(nb, 1)
    output = ys.reshape(-1)[: len(x)]
    diagnostics = {
        "control_block_size": CONTROL_BLOCK_SIZE,
        "control_cadence_hz": sample_rate / CONTROL_BLOCK_SIZE,
        "processed_samples": len(x),
        "makeup_gain_db": rows["makeup"].tolist(),
        "activity": rows["activity"].tolist(),
        "reliability": rows["reliability"].tolist(),
        "gain_reduction_db": rows["gr"].tolist(),
        "input_rms_db": [_linear_to_db(v) for v in in_rms],
        "output_rms_db": [_linear_to_db(v) for v in out_rms],
        # the chain runs as ONE fused device call; per-block runtimes are the
        # amortised wall time (keys preserved for report compatibility)
        "p95_block_runtime_ms": per_block_ms,
        "p99_block_runtime_ms": per_block_ms,
        "max_block_runtime_ms": per_block_ms,
    }
    if return_output_audio:
        diagnostics["output_audio"] = output.tolist()
    return diagnostics


# --------------------------------------------------------------------------
# Gate / suppressor ordering study (`processor/python_api.rs:316-404`)
# --------------------------------------------------------------------------

_GATE_ORDER_FRAME = 480  # RNNoise cadence at 48 kHz


def _gate_pass_over_blocks(gate_cfg, vad_cfg, vad_threshold, blocks, probs):
    """Run the VAD-assisted gate over ``blocks: [N, 480]`` with one external
    posterior per block. Single jitted scan; the per-sample gate scan nests
    inside."""
    from .models import vad_gate as vadm
    from .ops import gate as gate_ops

    gate_state = gate_ops.gate_init()
    vad_state = vadm.vad_gate_init(vad_cfg)

    def step(carry, inp):
        gs, vs = carry
        block, prob = inp
        rms_db = vadm.compute_rms_db(block)
        vs, vout = vadm.vad_gate_process(
            vad_cfg, vs, rms_db, prob, True, _GATE_ORDER_FRAME
        )
        gs, y, _ = gate_ops.gate_process(
            gate_cfg, gs, block, prob, True, vout["gate_open"],
            jnp.float32(vad_threshold),
        )
        return (gs, vs), (
            y,
            gs["current_gain"],
            vout["noise_floor_db"],
            vout["reliability"],
        )

    (gate_final, _), (out, gains, floors, rels) = jax.lax.scan(
        step, (gate_state, vad_state), (blocks, probs)
    )
    return out, gains, floors, rels, gate_final["chatter_event_count"]


def _suppressor_pass(audio, strength):
    """RNNoise over the full signal in one batched model call, with the
    engine's soft-clip PCM scaling and 15 ms strength smoothing
    (`suppression.rs` push/process/pop contract)."""
    from .models import rnnoise as rn

    state = rn.processor_init(strength=float(strength))
    state, _ = rn.processor_push(state, audio)
    state, _ = rn.processor_process(state)
    state, out = rn.processor_pop(state, len(audio))
    if len(out) < len(audio):
        out = np.concatenate([out, np.zeros(len(audio) - len(out), np.float32)])
    return out


def simulate_gate_suppressor_order(
    audio,
    vad_probabilities,
    suppressor_before_gate,
    suppressor_strength,
    settings=None,
):
    """Compare smart-gate/suppressor ordering on a recorded take
    (`processor/python_api.rs:316-404`).

    The gate never reads the suppressor's internal state (only its audio),
    so instead of the reference's interleaved per-frame loop each stage runs
    once over the whole take — the gate as one jitted block scan, RNNoise as
    one batched model call — in the requested order.
    """
    from .models import vad_gate as vadm
    from .ops import gate as gate_ops

    strength = float(suppressor_strength)
    if not np.isfinite(strength) or not 0.0 <= strength <= 1.0:
        raise ValueError("suppressor_strength must be finite and between 0 and 1")
    audio = np.ascontiguousarray(np.asarray(audio, np.float32)).ravel()
    n = len(audio)
    block_count = -(-n // _GATE_ORDER_FRAME)
    probs = np.asarray(vad_probabilities, np.float32).ravel()
    if len(probs) != block_count or not np.all(
        np.isfinite(probs) & (probs >= 0.0) & (probs <= 1.0)
    ):
        raise ValueError(
            f"expected {block_count} finite VAD probabilities at the "
            "10 ms RNNoise cadence"
        )

    threshold_db = float(_settings_get(settings, "gate_threshold_db", -40.0))
    attack_ms = float(_settings_get(settings, "gate_attack_ms", 10.0))
    release_ms = float(_settings_get(settings, "gate_release_ms", 100.0))
    vad_threshold = float(_settings_get(settings, "gate_vad_threshold", 0.48))

    gate_cfg = gate_ops.GateConfig(
        threshold_db=threshold_db,
        attack_ms=attack_ms,
        release_ms=release_ms,
        sample_rate=48000.0,
        mode=gate_ops.VAD_ASSISTED,
    )
    vad_cfg = vadm.VadGateConfig(
        gate_mode=vadm.VAD_ASSISTED,
        vad_threshold=vad_threshold,
        manual_threshold_db=threshold_db,
    )

    started = time.perf_counter()
    padded = np.zeros(block_count * _GATE_ORDER_FRAME, np.float32)
    padded[:n] = audio

    def gate_pass(x):
        blocks = jnp.asarray(x.reshape(block_count, _GATE_ORDER_FRAME))
        out, gains, floors, rels, chatter = _gate_pass_over_blocks(
            gate_cfg, vad_cfg, vad_threshold, blocks, jnp.asarray(probs)
        )
        return (
            np.asarray(out).ravel(),
            np.asarray(gains),
            float(floors[-1]),
            float(rels[-1]),
            int(chatter),
        )

    if suppressor_before_gate:
        denoised = _suppressor_pass(padded, strength)
        out, gate_gain, floor_db, reliability, chatter = gate_pass(denoised)
    else:
        gated, gate_gain, floor_db, reliability, chatter = gate_pass(padded)
        out = _suppressor_pass(gated, strength)

    from .models import rnnoise as rn

    return {
        "output_audio": np.asarray(out[:n], np.float32).tolist(),
        "gate_gain": np.asarray(gate_gain, np.float32).tolist(),
        "gate_chatter_event_count": chatter,
        "gate_noise_floor_db": floor_db,
        "gate_noise_floor_reliability": reliability,
        "suppressor_latency_samples": rn.LATENCY_SAMPLES,
        "runtime_ms": (time.perf_counter() - started) * 1000.0,
    }
