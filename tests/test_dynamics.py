"""Limiter, true-peak, and loudness contracts.

Mirrors the behavioural tests of `rust-core/src/dsp/limiter.rs`,
`true_peak.rs:406-568` (incl. the 511-tap reference-accuracy contract) and
the BS.1770 K-weighting standard coefficients.
"""

import numpy as np
import jax.numpy as jnp
import pytest

from audioforge_tpu.ops import limiter, true_peak, loudness, scan

FS = 48000.0


# --------------------------- scan primitives ---------------------------


def test_sliding_window_max_matches_naive(rng):
    x = rng.standard_normal(1000).astype(np.float32)
    for w in (1, 2, 7, 96, 97):
        got = np.asarray(scan.sliding_window_max(jnp.asarray(x), w))
        want = np.array([x[max(0, i - w + 1) : i + 1].max() for i in range(len(x))])
        np.testing.assert_allclose(got, want)


def test_sliding_window_max_with_history(rng):
    x = rng.standard_normal(200).astype(np.float32)
    w = 17
    full = np.asarray(scan.sliding_window_max(jnp.asarray(x), w))
    h = 100
    part = np.asarray(
        scan.sliding_window_max(jnp.asarray(x[h:]), w, init=jnp.asarray(x[h - w + 1 : h]))
    )
    np.testing.assert_allclose(part, full[h:])


def test_max_affine_scan_matches_sequential(rng):
    v = np.abs(rng.standard_normal(500)).astype(np.float32)
    rho = 0.97
    c = ((1 - rho) * v).astype(np.float32)
    got = np.asarray(scan.max_affine_scan(jnp.asarray(v), rho, jnp.asarray(c), 0.3))
    u = 0.3
    want = []
    for i in range(len(v)):
        u = max(v[i], rho * u + c[i])
        want.append(u)
    np.testing.assert_allclose(got, np.array(want), rtol=1e-5, atol=1e-6)


# --------------------------- limiter ---------------------------


class SeqLimiter:
    """Sequential reference port of `limiter.rs:239-330` semantics."""

    def __init__(self, cfg: limiter.LimiterConfig):
        self.ceiling = cfg.ceiling_linear
        self.rc = cfg.release_coeff
        self.W = cfg.lookahead_samples
        self.delay = np.zeros(self.W)
        self.widx = 0
        self.gain = 1.0
        self.window = []

    def process(self, x):
        out = np.empty_like(x)
        for n, xn in enumerate(x):
            delayed = self.delay[self.widx]
            peak = max([abs(v) for v in self.window[-self.W:]] + [abs(xn)])
            self.delay[self.widx] = xn
            self.window.append(xn)
            self.widx = (self.widx + 1) % self.W
            target = self.ceiling / peak if peak > self.ceiling else 1.0
            if target < self.gain:
                self.gain = target
            else:
                self.gain = self.rc * self.gain + (1 - self.rc) * target
            out[n] = np.clip(delayed * self.gain, -self.ceiling, self.ceiling)
        return out


def test_limiter_matches_sequential(rng):
    cfg = limiter.LimiterConfig(ceiling_db=-6.0, release_ms=50.0, lookahead_ms=2.0)
    x = (rng.standard_normal(2000) * 0.8).astype(np.float32)
    x[500:520] = 1.5  # drive over the ceiling
    ref = SeqLimiter(cfg).process(x.astype(np.float64))
    state = limiter.limiter_init(cfg)
    state, y, m = limiter.limiter_process(cfg, state, jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(y), ref, rtol=1e-4, atol=2e-5)
    assert float(m["peak_gr_db"]) > 0.0


def test_limiter_never_exceeds_ceiling(rng):
    cfg = limiter.LimiterConfig(ceiling_db=-1.0)
    x = (rng.standard_normal(48000) * 2.0).astype(np.float32)
    state = limiter.limiter_init(cfg)
    outs = []
    for i in range(0, 48000, 480):
        state, y, _ = limiter.limiter_process(cfg, state, jnp.asarray(x[i : i + 480]))
        outs.append(np.asarray(y))
    y = np.concatenate(outs)
    assert np.max(np.abs(y)) <= cfg.ceiling_linear + 1e-6


def test_limiter_block_size_invariance(rng):
    cfg = limiter.LimiterConfig(ceiling_db=-3.0)
    x = (rng.standard_normal(1920) * 1.2).astype(np.float32)
    s1 = limiter.limiter_init(cfg)
    _, y_full, _ = limiter.limiter_process(cfg, s1, jnp.asarray(x))
    s2 = limiter.limiter_init(cfg)
    parts = []
    for i in range(0, 1920, 160):
        s2, y, _ = limiter.limiter_process(cfg, s2, jnp.asarray(x[i : i + 160]))
        parts.append(np.asarray(y))
    # block size changes the scan chunking, so tiny f32 reassociation
    # differences are expected; the behaviour must still match closely
    np.testing.assert_allclose(
        np.asarray(y_full), np.concatenate(parts), rtol=1e-4, atol=1e-5
    )


def test_limiter_transparent_below_ceiling(rng):
    cfg = limiter.LimiterConfig(ceiling_db=-1.0)
    x = (rng.standard_normal(4800) * 0.05).astype(np.float32)
    state = limiter.limiter_init(cfg)
    state, y, m = limiter.limiter_process(cfg, state, jnp.asarray(x))
    W = cfg.lookahead_samples
    np.testing.assert_allclose(np.asarray(y)[W:], x[:-W], atol=1e-7)
    assert float(m["peak_gr_db"]) == 0.0


# --------------------------- true peak ---------------------------


def test_true_peak_constant_signal_matches_sample_peak():
    """`true_peak.rs:406-413` — steady state after the band-limited
    ramp-in transient."""
    x = jnp.full((960,), 0.5, jnp.float32)
    state = true_peak.detector_init()
    state, _ = true_peak.detector_process(state, x)  # warm-up
    state, peak = true_peak.detector_process(state, x)
    assert abs(float(peak) - 0.5) < 0.01


def test_true_peak_detects_intersample_overshoot():
    """`true_peak.rs:415-424`: a sine near Nyquist/2 has inter-sample peaks
    above the sampled peak."""
    t = np.arange(4800)
    f = 11025.0 / 48000.0
    # phase offset so samples straddle the actual crest
    x = np.sin(2 * np.pi * f * t + 0.3).astype(np.float32) * 0.98
    sampled_peak = np.abs(x).max()
    state = true_peak.detector_init()
    state, peak = true_peak.detector_process(state, jnp.asarray(x))
    assert float(peak) > sampled_peak


@pytest.mark.parametrize("freq", [6000.0, 8000.0, 12000.0, 16000.0, 18000.0, 20000.0, 22000.0])
def test_true_peak_matches_511tap_reference(freq):
    """Accuracy contract vs a 511-tap Blackman reference within 0.08 dB
    (`true_peak.rs:484-568`)."""
    taps = 511
    center = (taps - 1) / 2
    cutoff = 1.0 / 8.0
    n = np.arange(taps)
    off = n - center
    sinc = np.where(
        np.abs(off) < 1e-12, 2 * cutoff, np.sin(2 * np.pi * cutoff * off) / (np.pi * np.where(off == 0, 1, off))
    )
    ph = 2 * np.pi * n / (taps - 1)
    blackman = 0.42 - 0.5 * np.cos(ph) + 0.08 * np.cos(2 * ph)
    imp = sinc * blackman
    imp *= 4.0 / imp.sum()
    ref_phases = [imp[p::4] for p in range(4)]

    t = np.arange(1024)
    x = (0.9 * np.sin(2 * np.pi * freq / 48000.0 * t + 0.13)).astype(np.float32)

    # reference: newest-first conv over 128-history, skipping the 192-sample
    # startup transient exactly like `true_peak.rs:554-559`
    hist = np.zeros(128)
    ref_peak = 0.0
    for i, s in enumerate(x):
        hist[1:] = hist[:-1]
        hist[0] = s
        p = max(abs(np.dot(ph_, hist[: len(ph_)])) for ph_ in ref_phases)
        if i >= 192:
            ref_peak = max(ref_peak, p, abs(s))

    state = true_peak.detector_init()
    state, _ = true_peak.detector_process(state, jnp.asarray(x[:192]))
    state, peak = true_peak.detector_process(state, jnp.asarray(x[192:]))
    diff_db = abs(20 * np.log10(float(peak)) - 20 * np.log10(ref_peak))
    assert diff_db < 0.08, f"{freq} Hz: {diff_db} dB"


def test_tp_limiter_attenuates_and_stays_finite(rng):
    cfg = true_peak.TruePeakLimiterConfig(ceiling_db=-1.0)
    t = np.arange(4800)
    x = (1.4 * np.sin(2 * np.pi * 12000 / 48000 * t)).astype(np.float32)
    x[1000] = np.inf
    x[1001] = np.nan
    state = true_peak.tp_limiter_init()
    state, y, stats = true_peak.tp_limiter_process(cfg, state, jnp.asarray(x))
    y = np.asarray(y)
    assert np.all(np.isfinite(y))
    assert np.max(np.abs(y)) <= cfg.ceiling_linear + 1e-6
    assert int(stats["limited_events"]) == 1
    assert float(stats["max_gain_reduction_db"]) > 0.0


def test_tp_limiter_transparent_below_ceiling(rng):
    cfg = true_peak.TruePeakLimiterConfig(ceiling_db=-1.0)
    x = (rng.standard_normal(4800) * 0.02).astype(np.float32)
    state = true_peak.tp_limiter_init()
    state, y, stats = true_peak.tp_limiter_process(cfg, state, jnp.asarray(x))
    W = true_peak.LIMITER_LOOKAHEAD_SAMPLES
    np.testing.assert_allclose(np.asarray(y)[W:], x[:-W], atol=1e-6)
    assert int(stats["limited_events"]) == 0


# --------------------------- loudness ---------------------------


def test_k_weighting_matches_standard_48k():
    """BS.1770-4 tabulated 48 kHz coefficients."""
    c = loudness.k_weighting_coefficients(48000.0)
    np.testing.assert_allclose(
        c[0],
        [1.53512485958697, -2.69169618940638, 1.19839281085285,
         -1.69065929318241, 0.73248077421585],
        atol=2e-6,
    )
    np.testing.assert_allclose(
        c[1], [1.0, -2.0, 1.0, -1.99004745483398, 0.99007225036621], atol=2e-6
    )


def test_integrated_loudness_sine_standard():
    """BS.1770-4: a 997 Hz sine at 0 dBFS reads -3.01 LKFS (the -0.691
    offset compensates the K-weighting gain at ~1 kHz); at -20 dBFS it
    therefore reads -23.01 LUFS."""
    t = np.arange(10 * 48000) / 48000
    x = 0.1 * np.sin(2 * np.pi * 997 * t)
    lufs = loudness.integrated_loudness_lufs(x, 48000)
    assert abs(lufs - (-23.01)) < 0.1, lufs


def test_integrated_loudness_gating_ignores_silence():
    t = np.arange(5 * 48000) / 48000
    tone = 0.1 * np.sin(2 * np.pi * 997 * t)
    padded = np.concatenate([tone, np.zeros(10 * 48000)])
    lufs_tone = loudness.integrated_loudness_lufs(tone, 48000)
    lufs_padded = loudness.integrated_loudness_lufs(padded, 48000)
    assert abs(lufs_tone - lufs_padded) < 0.6


def test_loudness_validation():
    with pytest.raises(ValueError):
        loudness.integrated_loudness_lufs(np.zeros(100), 12345)
    with pytest.raises(ValueError):
        loudness.integrated_loudness_lufs(np.array([]), 48000)
    with pytest.raises(ValueError):
        loudness.integrated_loudness_lufs(np.array([np.nan] * 48000), 48000)
    with pytest.raises(ValueError):
        loudness.integrated_loudness_lufs(np.zeros(48000), 48000)  # all gated


def test_streaming_meter_matches_offline():
    t = np.arange(2 * 48000) / 48000
    x = (0.1 * np.sin(2 * np.pi * 997 * t)).astype(np.float32)
    state = loudness.meter_init(48000.0, 480)
    lufs = -100.0
    for i in range(0, len(x), 480):
        state, lufs = loudness.meter_process(state, jnp.asarray(x[i : i + 480]))
    assert abs(float(lufs) - (-23.01)) < 0.1


# ------------------- compressor auto-makeup invariance -------------------


def test_auto_makeup_activity_smoothing_is_block_size_invariant():
    """`compressor.rs:1084-1105` — one second of constant full activity
    must land the smoothed activity score at the same value regardless of
    how the second is partitioned into blocks."""
    from audioforge_tpu.ops import compressor as comp

    import jax

    def activity_after_one_second(block_size):
        cfg = comp.CompressorConfig(sample_rate=FS, enabled=True,
                                    auto_makeup_enabled=True,
                                    block_samples=block_size)
        params = comp.compressor_params(cfg)
        state = comp.compressor_init(cfg, params)
        y = jnp.zeros(block_size, jnp.float32)
        one = jnp.float32(1.0)
        n_blocks, rem = divmod(48_000, block_size)

        @jax.jit
        def run(state):
            def body(st, _):
                st, _m = comp.finalize_block(cfg, params, st, st, y,
                                             block_size, one, one,
                                             jnp.float32(0.0))
                return st, None
            st, _ = jax.lax.scan(body, state, None, length=n_blocks)
            return st

        state = run(state)
        if rem:
            state, _ = comp.finalize_block(cfg, params, state, state,
                                           y[:rem], rem, one, one,
                                           jnp.float32(0.0))
        return float(state["speech_activity_score"])

    reference = activity_after_one_second(480)
    for block_size in [1, 48, 240, 960, 4096, 48000]:
        candidate = activity_after_one_second(block_size)
        assert abs(candidate - reference) < 1e-5, (
            f"block size {block_size} changed activity from "
            f"{reference} to {candidate}")
