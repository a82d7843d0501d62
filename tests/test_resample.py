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


class TestStreamingResampler:
    def test_matches_offline_and_chunk_invariant(self, rng):
        from audioforge_tpu.ops.resample import StreamingResampler, resample

        t = np.arange(44100) / 44100.0
        x = (0.5 * np.sin(2 * np.pi * 1000 * t)
             + 0.1 * rng.standard_normal(len(t))).astype(np.float32)
        sr = StreamingResampler(44100, 48000)
        ys = np.concatenate(
            [sr.process(x[i:i + 441]) for i in range(0, len(x), 441)]
        )
        yo = np.asarray(resample(x, 44100, 48000))
        n = min(len(ys), len(yo)) - 200
        assert np.sqrt(np.mean((ys[200:n] - yo[200:n]) ** 2)) < 1e-6

        sr2 = StreamingResampler(44100, 48000)
        ys2 = np.concatenate([sr2.process(c) for c in np.array_split(x, 173)])
        m = min(len(ys), len(ys2))
        np.testing.assert_allclose(ys[:m], ys2[:m], atol=1e-6)

    def test_downsample_antialias(self, rng):
        from audioforge_tpu.ops.resample import StreamingResampler

        # 30 kHz tone at 96k must not alias into the 48k output
        t = np.arange(96000) / 96000.0
        x = np.sin(2 * np.pi * 30000 * t).astype(np.float32)
        sr = StreamingResampler(96000, 48000)
        y = sr.process(x)[500:-500]
        assert np.sqrt(np.mean(y ** 2)) < 1e-3

    def test_invalid_rates(self):
        from audioforge_tpu.ops.resample import StreamingResampler

        with pytest.raises(ValueError):
            StreamingResampler(0, 48000)
