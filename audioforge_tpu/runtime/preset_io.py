"""Apply/capture presets on the live engine.

Headless equivalents of the main window's preset plumbing
(`ui/main_window.py:3256-3420`): ``apply_preset`` pushes every section of a
validated preset through the processor's control surface (noise-model
fallback to RNNoise when the requested backend is absent, unless
``require_exact``), and ``capture_preset`` reads the current control state
back into a Preset for history snapshots and save-as.
"""

from __future__ import annotations

from ..config import Preset
from ..config.settings import (
    CompressorSettings,
    DeEsserSettings,
    EQSettings,
    GateSettings,
    LimiterSettings,
    RNNoiseSettings,
)

__all__ = ["apply_preset", "capture_preset"]


def apply_preset(processor, preset: Preset, *, require_exact: bool = False):
    """Apply every preset section to the processor. Returns a warning
    string when the preset's noise model fell back to RNNoise, else None."""
    warning = None

    gate = preset.gate
    processor.set_gate_enabled(gate.enabled)
    processor.set_gate_threshold(gate.threshold_db)
    processor.set_gate_attack(gate.attack_ms)
    processor.set_gate_release(gate.release_ms)
    processor.set_gate_mode(gate.gate_mode)
    processor.set_vad_threshold(gate.vad_threshold)
    processor.set_vad_hold_time(gate.vad_hold_time_ms)
    processor.set_vad_pre_gain(gate.vad_pre_gain)
    processor.set_auto_threshold(gate.auto_threshold_enabled)
    processor.set_gate_margin(gate.gate_margin_db)

    processor.set_eq_enabled(preset.eq.enabled)
    processor.apply_eq_settings_v2([
        (b.filter_type, b.frequency_hz, b.gain_db, b.q,
         b.slope_db_per_octave, b.enabled)
        for b in preset.eq.bands
    ])

    processor.set_rnnoise_enabled(preset.rnnoise.enabled)
    processor.set_rnnoise_strength(preset.rnnoise.strength)
    model = preset.rnnoise.model
    if not processor.set_noise_model(model):
        if require_exact:
            raise RuntimeError(f"Noise model {model!r} is unavailable")
        if model != "rnnoise":
            processor.set_noise_model("rnnoise")
            warning = f"{model} was unavailable; using RNNoise"

    dee = preset.deesser
    processor.set_deesser_enabled(dee.enabled)
    processor.set_deesser_auto_enabled(dee.auto_enabled)
    processor.set_deesser_auto_amount(dee.auto_amount)
    processor.set_deesser_low_cut_hz(dee.low_cut_hz)
    processor.set_deesser_high_cut_hz(dee.high_cut_hz)
    processor.set_deesser_threshold_db(dee.threshold_db)
    processor.set_deesser_ratio(dee.ratio)
    processor.set_deesser_attack_ms(dee.attack_ms)
    processor.set_deesser_release_ms(dee.release_ms)
    processor.set_deesser_max_reduction_db(dee.max_reduction_db)

    comp = preset.compressor
    processor.set_compressor_enabled(comp.enabled)
    processor.set_compressor_threshold(comp.threshold_db)
    processor.set_compressor_ratio(comp.ratio)
    processor.set_compressor_attack(comp.attack_ms)
    processor.set_compressor_release(comp.release_ms)
    processor.set_compressor_makeup_gain(comp.makeup_gain_db)
    processor.set_compressor_adaptive_release(comp.adaptive_release)
    processor.set_compressor_base_release(comp.base_release_ms)
    processor.set_compressor_auto_makeup_enabled(comp.auto_makeup_enabled)
    processor.set_compressor_target_lufs(comp.target_lufs)
    processor.set_compressor_sidechain_highpass_enabled(
        comp.sidechain_highpass_enabled
    )

    lim = preset.limiter
    processor.set_limiter_enabled(lim.enabled)
    processor.set_limiter_ceiling(lim.ceiling_db)
    processor.set_limiter_release(lim.release_ms)
    processor.set_limiter_careful_output_enabled(lim.careful_output_enabled)

    processor.set_bypass(preset.bypass)
    return warning


def capture_preset(processor, *, name: str = "Current",
                   description: str = "") -> Preset:
    """Read the processor's control state back into a validated Preset."""
    par = processor._params
    topo = processor._topology
    dee = processor._deesser
    bands = []
    for i in range(10):
        ftype, freq, gain, q, slope, enabled = processor.get_eq_band_config(i)
        bands.append({
            "filter_type": ftype, "frequency_hz": freq, "gain_db": gain,
            "q": q, "bandwidth_mode": "q", "bandwidth_octaves": None,
            "slope_db_per_octave": slope, "stage": "combined",
            "enabled": enabled,
        })
    preset = Preset(
        name=name,
        description=description,
        gate=GateSettings(
            enabled=topo["gate_enabled"],
            threshold_db=par["gate_threshold_db"],
            attack_ms=par["gate_attack_ms"],
            release_ms=par["gate_release_ms"],
            gate_mode=topo["gate_mode"],
            vad_threshold=par["vad_threshold"],
            vad_hold_time_ms=par["vad_hold_time_ms"],
            vad_pre_gain=par["vad_pre_gain"],
            auto_threshold_enabled=topo["auto_threshold_enabled"],
            gate_margin_db=par["gate_margin_db"],
        ),
        eq=EQSettings.from_dict(
            {"schema_version": 2, "enabled": topo["eq_enabled"],
             "bands": bands}
        ),
        rnnoise=RNNoiseSettings(
            enabled=topo["suppressor_enabled"],
            strength=par["suppressor_strength"],
            model=topo["noise_model"],
        ),
        deesser=DeEsserSettings(
            enabled=topo["deesser_enabled"],
            auto_enabled=dee["auto_enabled"],
            auto_amount=dee["auto_amount"],
            low_cut_hz=dee["low_cut_hz"],
            high_cut_hz=dee["high_cut_hz"],
            threshold_db=dee["threshold_db"],
            ratio=dee["ratio"],
            attack_ms=dee["attack_ms"],
            release_ms=dee["release_ms"],
            max_reduction_db=dee["max_reduction_db"],
        ),
        compressor=CompressorSettings(
            enabled=topo["compressor_enabled"],
            threshold_db=par["compressor_threshold_db"],
            ratio=par["compressor_ratio"],
            attack_ms=par["compressor_attack_ms"],
            release_ms=par["compressor_release_ms"],
            makeup_gain_db=par["compressor_makeup_gain_db"],
            adaptive_release=topo["adaptive_release"],
            base_release_ms=par["compressor_base_release_ms"],
            auto_makeup_enabled=topo["auto_makeup_enabled"],
            target_lufs=par["compressor_target_lufs"],
            sidechain_highpass_enabled=topo["sidechain_highpass_enabled"],
        ),
        limiter=LimiterSettings(
            enabled=topo["limiter_enabled"],
            ceiling_db=par["limiter_ceiling_db"],
            release_ms=par["limiter_release_ms"],
            careful_output_enabled=topo["careful_output_enabled"],
        ),
        bypass=processor.is_bypass(),
    )
    # round-trip validation so captured state is always loadable
    return Preset.from_dict(preset.to_dict())
