"""Analysis layer: spectrum estimation, Auto-EQ solver, validation gates.

Mirrors the reference's Auto-EQ scenario tests (`python/tests/test_auto_eq.py`):
synthetic voice-like captures with known spectral defects must produce
corrective gains in the right direction, abstention must beat fallback, and
validation must reject featureless captures.
"""

import numpy as np
import pytest

from audioforge_tpu.analysis import auto_eq, failure_detection, spectrum
from audioforge_tpu.analysis.headroom import apply_headroom_validation

FS = 48000


def synth_voice(duration_s=4.0, seed=0, shape_filter=None):
    """Speech-like synthetic: pulse train through formant-ish resonances with
    pauses, optionally spectrally shaped. Shared with the VAD trainer's
    downstream voiced-capture gate (`tools/train_silero_weights.py`) so a
    weight retrain is gated on exactly the captures these tests validate."""
    from audioforge_tpu.analysis.speech_synth import synthesize_test_voice

    return synthesize_test_voice(duration_s, seed, shape_filter, FS)


def test_spectrum_basic_contract():
    x = synth_voice()
    res = spectrum.analyze_voice_spectrum(x, FS)
    assert res.freqs.shape == res.median_spectrum_db.shape
    assert 0.0 <= res.voiced_window_ratio <= 1.0
    assert np.all(np.isfinite(res.median_spectrum_db))
    assert not res.used_single_spectrum_fallback
    # voiced selection found the speech segments
    assert res.voiced_window_ratio > 0.2


def test_spectrum_too_short_raises():
    with pytest.raises(ValueError):
        spectrum.analyze_voice_spectrum(np.zeros(1000, np.float32), FS)


def test_octave_smoothing_preserves_level():
    freqs = np.fft.rfftfreq(4096, 1 / FS)
    flat = np.full(freqs.shape, -30.0)
    sm = spectrum.smooth_spectrum_octave(freqs, flat, 6)
    np.testing.assert_allclose(sm[(freqs > 50) & (freqs < 20000)], -30.0, atol=0.1)


def test_predict_eq_response_matches_native_renderer():
    """Parity with the engine's shared magnitude renderer
    (mirrors `python/tests/test_eq_native_response.py`)."""
    from audioforge_tpu.ops import eq as eq_ops

    gains = [3.0, -2.0, 0.0, 4.0, 0.0, -5.0, 0.0, 2.0, 0.0, -1.0]
    qs = [0.9, 1.2, 1.41, 2.0, 1.41, 3.0, 1.41, 1.0, 1.41, 0.8]
    centers = [80.0, 160.0, 320.0, 640.0, 1280.0, 2500.0, 5000.0, 8000.0, 12000.0, 16000.0]
    freqs = np.logspace(np.log10(30), np.log10(20000), 64)
    pred = auto_eq.predict_eq_response(freqs, gains, qs, centers)
    bands = [
        eq_ops.EqBandConfig(
            0 if i == 0 else 2 if i == 9 else 1, centers[i], gains[i], qs[i], 12, True
        )
        for i in range(10)
    ]
    native = eq_ops.magnitude_response_db(bands, freqs, FS)
    np.testing.assert_allclose(pred, native, atol=1e-6)


def _run_auto_eq(x, **kw):
    return auto_eq.analyze_auto_eq(
        x, FS, chain_settings={"compressor": {"enabled": False}}, **kw
    )


def test_auto_eq_corrects_bassy_capture():
    """A +8 dB low-shelf colored capture should get net negative low-band
    correction (mirrors `test_auto_eq.py` bassy scenario)."""
    from scipy.signal import lfilter
    from audioforge_tpu.ops import biquad

    c = biquad.design(biquad.LOW_SHELF, 150.0, 8.0, 0.707, FS)
    shape = lambda x: lfilter(c[:3], np.concatenate([[1.0], c[3:]]), x)
    x = synth_voice(shape_filter=shape)
    settings, validation = _run_auto_eq(x)
    gains = np.asarray(settings["band_gains"])
    freqs = np.asarray(settings["band_freqs"])
    low = gains[freqs < 250]
    assert validation.passed
    if settings["recommendation_status"] != "abstain":
        assert low.sum() < 0.0, (gains.tolist(), freqs.tolist())


def test_auto_eq_gain_bounds_and_adjacency():
    x = synth_voice(seed=3)
    settings, _ = _run_auto_eq(x)
    gains = np.asarray(settings["band_gains"])
    assert np.all(gains >= auto_eq.GAIN_MIN_DB - 1e-6)
    assert np.all(gains <= auto_eq.GAIN_MAX_DB + 1e-6)
    assert settings["max_adjacent_gain_difference_db"] <= 6.0 + 1e-6
    qs = np.asarray(settings["band_qs"])
    assert np.all((qs >= auto_eq.Q_MIN - 1e-6) & (qs <= auto_eq.Q_MAX + 1e-6))


def test_auto_eq_validation_rejects_noise():
    """Featureless white noise must be rejected with the generic message
    (abstention-over-fallback, `test_auto_eq.py:191-231`)."""
    rng = np.random.default_rng(1)
    noise = (0.1 * rng.standard_normal(4 * FS)).astype(np.float32)
    with pytest.raises(ValueError, match="Recording too unclear"):
        _run_auto_eq(noise)


def test_target_curves():
    freqs = np.asarray([80.0, 1280.0, 16000.0])
    flat = auto_eq.get_target_curve(freqs, "flat", target_mode="static")
    np.testing.assert_allclose(flat, 0.0)
    b = auto_eq.get_target_curve(freqs, "broadcast", target_mode="static")
    np.testing.assert_allclose(b, [-2.0, 2.0, -1.0])
    with pytest.raises(ValueError):
        auto_eq.get_target_curve(freqs, "club")
    with pytest.raises(ValueError):
        auto_eq.get_target_curve(freqs, "flat", target_mode="wild")


def test_flatness_and_contrast():
    freqs = np.linspace(50, 8000, 512)
    tone = np.full(512, -80.0)
    tone[100] = -10.0
    assert failure_detection.calculate_spectral_flatness(tone) < 0.3
    noise = np.full(512, -30.0)
    assert failure_detection.calculate_spectral_flatness(noise) > 0.95
    # contrast = p80 of the 300-3400 Hz band vs p20 of the voice band: a
    # broad mid-band hump over a quiet floor
    speechy = np.full(512, -70.0)
    mid = (freqs >= 300) & (freqs <= 3400)
    speechy[mid] = -25.0
    assert failure_detection.calculate_spectral_contrast(freqs, speechy) > 20


def test_headroom_validation_scales_hot_eq():
    """A hot capture with large boosts must be scaled down by the native
    chain sweep (`headroom.py:292-339`)."""
    t = np.arange(2 * FS) / FS
    x = (0.5 * np.sin(2 * np.pi * 300 * t)).astype(np.float32)
    eq_settings = {
        "band_gains": [9.0] * 10,
        "band_qs": [1.41] * 10,
        "band_freqs": [80, 160, 320, 640, 1280, 2500, 5000, 8000, 12000, 16000],
    }
    out = apply_headroom_validation(x, FS, eq_settings)
    assert out["headroom_gain_scale"] < 1.0
    assert out["headroom_validation"]["authoritative"]
    assert max(out["band_gains"]) < 9.0
