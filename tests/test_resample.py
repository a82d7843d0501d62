"""Resampler quality contracts (`resampling.rs:122-272`; BASELINE alias
attenuation target -83 dB)."""

import numpy as np
import jax.numpy as jnp
import pytest

from audioforge_tpu.ops import resample as rs


def test_passband_fidelity():
    fs1, fs2 = 48000, 44100
    t = np.arange(fs1) / fs1
    x = np.sin(2 * np.pi * 1000 * t).astype(np.float32)
    y = np.asarray(rs.resample(x, fs1, fs2))
    t2 = np.arange(len(y)) / fs2
    ideal = np.sin(2 * np.pi * 1000 * t2)
    seg = slice(1000, len(y) - 1000)
    assert np.sqrt(np.mean((y[seg] - ideal[seg]) ** 2)) < 5e-4


def test_downsample_alias_rejection():
    """A 30 kHz tone at 96 kHz must not alias into 18 kHz at 48 kHz
    (reference evaluation: worst swept alias -83 dB)."""
    fs1, fs2 = 96000, 48000
    t = np.arange(fs1) / fs1
    x = np.sin(2 * np.pi * 30000 * t).astype(np.float32)
    y = np.asarray(rs.resample(x, fs1, fs2))
    X = np.abs(np.fft.rfft(y[2000:-2000] * np.hanning(len(y) - 4000)))
    f = np.fft.rfftfreq(len(y) - 4000, 1 / fs2)
    k = np.argmin(np.abs(f - 18000))
    ref = np.sin(2 * np.pi * 10000 * t).astype(np.float32)
    yr = np.asarray(rs.resample(ref, fs1, fs2))
    Xr = np.abs(np.fft.rfft(yr[2000:-2000] * np.hanning(len(yr) - 4000)))
    rejection_db = 20 * np.log10(X[k - 5 : k + 5].max() / Xr.max())
    assert rejection_db < -83.0, rejection_db


def test_simulate_product_resampler_contract():
    x = np.random.default_rng(0).standard_normal(4800)
    out, delay, expected, times = rs.simulate_product_resampler(
        list(x), 48000, 16000
    )
    assert expected == 1600
    assert len(out) >= expected + delay
    assert len(times) >= 1
    with pytest.raises(ValueError):
        rs.simulate_product_resampler([1.0], 0, 16000)
    with pytest.raises(ValueError):
        rs.simulate_product_resampler([1.0], 48000, 16000, chunk_size=99999)
    with pytest.raises(ValueError):
        rs.simulate_product_resampler([1.0], 48000, 16000, sinc_len=100)
    with pytest.raises(ValueError):
        rs.simulate_product_resampler([np.nan], 48000, 16000)
    with pytest.raises(ValueError):
        rs.simulate_product_resampler([1.0], 48000, 16000, window="hamming")


def test_product_resampler_configuration():
    assert rs.product_resampler_configuration() == (
        128, "blackman", "cubic", 256, 1024
    )


def test_decimate3_streaming():
    st = rs.decimate3_init()
    x = np.sin(2 * np.pi * 1000 * np.arange(4800) / 48000).astype(np.float32)
    outs = []
    for i in range(0, 4800, 480):
        st, y = rs.decimate3(st, jnp.asarray(x[i : i + 480]))
        outs.append(np.asarray(y))
    y = np.concatenate(outs)
    assert len(y) == 1600
    delay = (rs.VAD_DECIMATE_TAPS - 1) / 2 / 3
    t16 = (np.arange(len(y)) - delay) / 16000
    ideal = np.sin(2 * np.pi * 1000 * t16)
    assert np.sqrt(np.mean((y[200:] - ideal[200:]) ** 2)) < 2e-3
