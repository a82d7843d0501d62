"""Public API parity: signatures, validation, diagnostics dict keys.

Mirrors the contracts of `rust-core/src/lib.rs:100-361` and
`python_api.rs:406-749`.
"""

import numpy as np
import pytest

import audioforge_tpu as afx

FS = 48000.0

FLAT = [(f, 0.0, 1.41) for f in (80, 160, 320, 640, 1280, 2500, 5000, 8000, 12000, 16000)]

V2_FLAT = [
    ("low_shelf", 80.0, 0.0, 1.41, 12, True),
    ("bell", 160.0, 0.0, 1.41, 12, True),
    ("bell", 320.0, 0.0, 1.41, 12, True),
    ("bell", 640.0, 0.0, 1.41, 12, True),
    ("bell", 1280.0, 0.0, 1.41, 12, True),
    ("bell", 2500.0, 0.0, 1.41, 12, True),
    ("bell", 5000.0, 0.0, 1.41, 12, True),
    ("bell", 8000.0, 0.0, 1.41, 12, True),
    ("bell", 12000.0, 0.0, 1.41, 12, True),
    ("high_shelf", 16000.0, 0.0, 1.41, 12, True),
]


def test_eq_magnitude_response_flat_is_zero():
    resp = afx.eq_magnitude_response([100.0, 1000.0, 10000.0], FLAT, FS)
    np.testing.assert_allclose(resp, 0.0, atol=1e-9)


def test_eq_magnitude_response_validation():
    with pytest.raises(ValueError):
        afx.eq_magnitude_response([100.0], FLAT[:9], FS)
    with pytest.raises(ValueError):
        afx.eq_magnitude_response([100.0], [(0.0, 0.0, 1.0)] + FLAT[1:], FS)
    with pytest.raises(ValueError):
        afx.eq_magnitude_response([-5.0], FLAT, FS)
    with pytest.raises(ValueError):
        afx.eq_magnitude_response([100.0], FLAT, -1.0)


def test_eq_magnitude_response_v2_matches_legacy_bells():
    bands = list(FLAT)
    bands[4] = (1280.0, 5.0, 2.0)
    v2 = list(V2_FLAT)
    v2[4] = ("bell", 1280.0, 5.0, 2.0, 12, True)
    freqs = [200.0, 1280.0, 6000.0]
    np.testing.assert_allclose(
        afx.eq_magnitude_response(freqs, bands, FS),
        afx.eq_magnitude_response_v2(freqs, v2, FS),
        atol=1e-9,
    )


def test_eq_magnitude_response_v2_validation():
    bad = list(V2_FLAT)
    bad[0] = ("warble", 80.0, 0.0, 1.41, 12, True)
    with pytest.raises(ValueError):
        afx.eq_magnitude_response_v2([100.0], bad, FS)
    bad[0] = ("bell", 80.0, 13.0, 1.41, 12, True)
    with pytest.raises(ValueError):
        afx.eq_magnitude_response_v2([100.0], bad, FS)


def test_simulate_eq_v2_diagnostics(rng):
    x = (rng.standard_normal(9600) * 0.1).astype(np.float32)
    v2 = list(V2_FLAT)
    v2[4] = ("bell", 1280.0, 6.0, 2.0, 12, True)
    d = afx.simulate_eq_v2(x, FS, v2, return_output_audio=True)
    for key in (
        "input_sample_peak", "output_sample_peak", "input_true_peak",
        "output_true_peak", "input_rms", "output_rms", "max_response_db",
        "runtime_ms", "sample_count", "algorithmic_latency_samples",
        "non_finite_output", "output_audio",
    ):
        assert key in d, key
    assert d["sample_count"] == 9600
    assert abs(d["max_response_db"] - 6.0) < 0.1
    assert not d["non_finite_output"]
    assert len(d["output_audio"]) == 9600
    with pytest.raises(ValueError):
        afx.simulate_eq_v2(np.array([np.nan]), FS, v2)


def test_measure_integrated_loudness_api():
    t = np.arange(5 * 48000) / 48000
    x = (0.1 * np.sin(2 * np.pi * 997 * t)).astype(np.float32)
    lufs = afx.measure_integrated_loudness(x, 48000)
    assert abs(lufs - (-23.01)) < 0.1
    with pytest.raises(ValueError):
        afx.measure_integrated_loudness(x, 12345)


def test_simulate_auto_eq_chain_keys_and_sanity(rng):
    t = np.arange(2 * 48000) / 48000
    x = (0.4 * np.sin(2 * np.pi * 220 * t) * ((t % 1.0) < 0.5)).astype(np.float32)
    x += (0.002 * rng.standard_normal(len(x))).astype(np.float32)
    d = afx.simulate_auto_eq_chain(
        x, FS, FLAT,
        settings={"compressor_enabled": True, "compressor_threshold_db": -25.0},
    )
    expected_keys = {
        "input_sample_peak_db", "input_rms_db", "output_sample_peak_db",
        "pre_limiter_true_peak_db", "output_true_peak_db", "output_rms_db",
        "limiter_effective_ceiling_db", "sample_headroom_db",
        "pre_limiter_true_peak_headroom_db", "true_peak_headroom_db",
        "limiter_gain_reduction_db", "true_peak_limiter_gain_reduction_db",
        "true_peak_limited_events", "compressor_gain_reduction_db",
        "deesser_gain_reduction_db", "compressor_gain_reduction_median_db",
        "compressor_gain_reduction_p95_db",
        "compressor_gain_reduction_active_ratio", "active_output_gain_db",
        "silence_output_gain_db", "silence_level_delta_db",
        "compressor_pumping_score_db", "non_finite_output",
        "candidate_runtime_ms", "deesser_gain_reduction_median_db",
        "deesser_gain_reduction_p95_db", "analysis_block_ms",
        "active_analysis_threshold_db", "active_analysis_block_count",
        "processed_samples",
    }
    assert expected_keys <= set(d.keys())
    assert d["processed_samples"] == len(x)
    # careful output default caps the ceiling at -1.5 dB
    assert d["limiter_effective_ceiling_db"] == -1.5
    assert d["compressor_gain_reduction_db"] > 0.5
    assert not d["non_finite_output"]
    # output must respect the true-peak ceiling
    assert d["output_true_peak_db"] <= -1.4


def test_simulate_auto_eq_chain_eq_applies(rng):
    t = np.arange(48000) / 48000
    x = (0.05 * np.sin(2 * np.pi * 1280 * t)).astype(np.float32)
    bands = list(FLAT)
    bands[4] = (1280.0, -9.0, 2.0)
    d_flat = afx.simulate_auto_eq_chain(
        x, FS, FLAT, settings={"compressor_enabled": False, "limiter_enabled": False}
    )
    d_cut = afx.simulate_auto_eq_chain(
        x, FS, bands, settings={"compressor_enabled": False, "limiter_enabled": False}
    )
    assert d_flat["output_rms_db"] - d_cut["output_rms_db"] > 8.0


def test_simulate_auto_makeup_control(rng):
    t = np.arange(2 * 48000) / 48000
    speech = (0.2 * np.sin(2 * np.pi * 200 * t) * ((t % 0.6) < 0.3)).astype(np.float32)
    nb = -(-len(speech) // 480)
    probs = [0.9 if (i * 480 / 48000) % 0.6 < 0.3 else 0.05 for i in range(nb)]
    d = afx.simulate_auto_makeup_control(
        speech, FS, probs, noise_floor_db=-60.0, noise_reliability=0.8,
        settings={"threshold_db": -30.0},
    )
    for key in (
        "control_block_size", "control_cadence_hz", "processed_samples",
        "makeup_gain_db", "activity", "reliability", "gain_reduction_db",
        "input_rms_db", "output_rms_db", "p95_block_runtime_ms",
        "p99_block_runtime_ms", "max_block_runtime_ms",
    ):
        assert key in d, key
    assert d["control_block_size"] == 480
    assert len(d["makeup_gain_db"]) == nb
    assert max(d["activity"]) > 0.3
    assert max(d["makeup_gain_db"]) >= 0.0
    with pytest.raises(ValueError):
        afx.simulate_auto_makeup_control(speech, FS, [0.5], -60.0, 0.8)
    with pytest.raises(ValueError):
        afx.simulate_auto_makeup_control(speech, FS, probs, np.nan, 0.8)


def test_pumping_score_contract():
    assert afx.compressor_pumping_score([0.0, 0.0], 50.0) == 0.0
    assert afx.compressor_pumping_score([1.0, np.nan, 2.0], 50.0) == float("inf")
    # a 4 Hz GR wobble scores higher than a constant GR
    t = np.arange(200) / 50.0
    wobble = 3.0 + 2.0 * np.sin(2 * np.pi * 4.0 * t)
    steady = np.full(200, 3.0)
    assert afx.compressor_pumping_score(wobble, 50.0) > afx.compressor_pumping_score(steady, 50.0) + 0.5
