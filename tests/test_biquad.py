"""Biquad contracts: coefficient math, scan-vs-sequential parity, crossfade.

Mirrors the behavioural tests of `rust-core/src/dsp/biquad.rs:603-657` and
`eq.rs:713-826` (cutoff accuracy, slope asymptotes, click-bounded edits,
block-size invariance) against this framework's parallel-scan implementation.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from audioforge_tpu.ops import biquad, eq


def seq_biquad(coeffs, x, z=(0.0, 0.0)):
    """Reference sequential DF2T in float64 (`biquad.rs:262-274`)."""
    b0, b1, b2, a1, a2 = [float(v) for v in coeffs]
    z1, z2 = float(z[0]), float(z[1])
    y = np.empty_like(x, dtype=np.float64)
    for n, xn in enumerate(x):
        out = b0 * xn + z1
        z1 = b1 * xn - a1 * out + z2
        z2 = b2 * xn - a2 * out
        y[n] = out
    return y, (z1, z2)


class SeqCrossfadeBiquad:
    """Sequential dual-lane crossfade reference (`biquad.rs:288-327`)."""

    def __init__(self, coeffs):
        self.active = list(map(float, coeffs))
        self.pending = list(self.active)
        self.z = [0.0, 0.0]
        self.pz = [0.0, 0.0]
        self.total = 0
        self.remaining = 0

    def schedule(self, coeffs, fade):
        self.pending = list(map(float, coeffs))
        self.pz = list(self.z)
        self.total = fade
        self.remaining = fade

    @staticmethod
    def _step(c, z, x):
        b0, b1, b2, a1, a2 = c
        y = b0 * x + z[0]
        z[0] = b1 * x - a1 * y + z[1]
        z[1] = b2 * x - a2 * y
        return y

    def process(self, x):
        out = np.empty_like(x, dtype=np.float64)
        for n, xn in enumerate(x):
            ya = self._step(self.active, self.z, xn)
            if self.remaining == 0:
                out[n] = ya
                continue
            yp = self._step(self.pending, self.pz, xn)
            fade = (self.total - self.remaining + 1) / self.total
            out[n] = ya * (1.0 - fade) + yp * fade
            self.remaining -= 1
            if self.remaining == 0:
                self.active = list(self.pending)
                self.z = list(self.pz)
                self.total = 0
        return out


FS = 48000.0


def test_design_matches_expected_peaking_unity():
    c = biquad.design(biquad.PEAKING, 1000.0, 0.0, 1.41, FS)
    # 0 dB peaking must be exact identity
    x = np.random.default_rng(0).standard_normal(256)
    y, _ = seq_biquad(c, x)
    np.testing.assert_allclose(y, x, atol=1e-12)


@pytest.mark.parametrize(
    "ftype,freq,gain,q",
    [
        (biquad.PEAKING, 1000.0, 6.0, 1.41),
        (biquad.PEAKING, 250.0, -9.0, 4.33),
        (biquad.LOW_SHELF, 80.0, 5.0, 0.707),
        (biquad.HIGH_SHELF, 16000.0, -6.0, 0.707),
        (biquad.NOTCH, 50.0, 0.0, 36.0),
        (biquad.HIGH_PASS, 80.0, 0.0, 0.707),
        (biquad.LOW_PASS, 12000.0, 0.0, 0.707),
    ],
)
def test_magnitude_response_properties(ftype, freq, gain, q):
    c = biquad.design(ftype, freq, gain, q, FS)
    resp_at = biquad.magnitude_response_db(c, np.array([freq]), FS)[0]
    if ftype == biquad.PEAKING:
        assert abs(resp_at - gain) < 1e-6
    elif ftype == biquad.NOTCH:
        assert resp_at < -60.0
    elif ftype in (biquad.HIGH_PASS, biquad.LOW_PASS):
        assert abs(resp_at - (-3.0103)) < 0.02  # -3 dB at cutoff, Q=0.707
    elif ftype in (biquad.LOW_SHELF, biquad.HIGH_SHELF):
        # shelf midpoint: half the shelf gain at the corner frequency
        assert abs(resp_at - gain / 2.0) < 0.2


def test_scipy_parity_peaking():
    scipy_signal = pytest.importorskip("scipy.signal")
    c = biquad.design(biquad.PEAKING, 1000.0, 6.0, 1.41, FS)
    b = c[:3]
    a = np.concatenate([[1.0], c[3:]])
    w, h = scipy_signal.freqz(b, a, worN=512, fs=FS)
    ours = biquad.magnitude_response_db(c, w[1:], FS)
    np.testing.assert_allclose(ours, 20 * np.log10(np.abs(h[1:])), atol=1e-8)


@pytest.mark.parametrize("ftype,freq,gain,q,compensated", [
    (biquad.PEAKING, 1000.0, 6.0, 1.41, False),
    # Low-frequency sections (pole radius ~1) need the double-word-f32 scan
    # to stay inside the <1e-4 parity budget — plain f32 sits at ~1e-4-7e-3.
    # Production routes all <=320 Hz EQ slots, the hum notches, and the
    # owned high-pass through the compensated path.
    (biquad.NOTCH, 50.0, 0.0, 36.0, True),
    (biquad.HIGH_PASS, 80.0, 0.0, 0.707, True),
])
def test_apply_matches_sequential(ftype, freq, gain, q, compensated, rng):
    c = biquad.design(ftype, freq, gain, q, FS)
    x = rng.standard_normal(4096).astype(np.float32) * 0.5
    y_ref, z_ref = seq_biquad(c, x.astype(np.float64))
    y, z_out = biquad.apply(
        jnp.asarray(c, jnp.float32), jnp.zeros(2), jnp.asarray(x),
        compensated=compensated,
    )
    rms = float(np.sqrt(np.mean((np.asarray(y, np.float64) - y_ref) ** 2)))
    ref_rms = float(np.sqrt(np.mean(y_ref**2)))
    assert rms < 1e-4 * max(ref_rms, 1.0), f"RMS dev {rms} vs signal {ref_rms}"
    np.testing.assert_allclose(np.asarray(z_out), np.asarray(z_ref), rtol=2e-3, atol=1e-4)


def test_apply_state_continuity(rng):
    """Chunked processing must equal one-shot processing exactly."""
    c = jnp.asarray(biquad.design(biquad.PEAKING, 500.0, -6.0, 2.0, FS), jnp.float32)
    x = jnp.asarray(rng.standard_normal(1920).astype(np.float32))
    y_full, _ = biquad.apply(c, jnp.zeros(2), x)
    z = jnp.zeros(2)
    parts = []
    for i in range(0, 1920, 480):
        y, z = biquad.apply(c, z, x[i : i + 480])
        parts.append(y)
    y_chunked = jnp.concatenate(parts)
    np.testing.assert_allclose(
        np.asarray(y_full), np.asarray(y_chunked), rtol=1e-5, atol=1e-6
    )


def test_unit_crossfade_matches_sequential(rng):
    c0 = biquad.design(biquad.PEAKING, 1000.0, 0.0, 1.41, FS)
    c1 = biquad.design(biquad.PEAKING, 1000.0, 9.0, 1.41, FS)
    fade = biquad.crossfade_samples(FS)
    assert fade == 72

    x = rng.standard_normal(480).astype(np.float32) * 0.25

    ref = SeqCrossfadeBiquad(c0)
    warm = rng.standard_normal(480).astype(np.float32) * 0.25
    ref.process(warm.astype(np.float64))
    ref.schedule(c1, fade)
    y_ref = ref.process(x.astype(np.float64))

    state = biquad.unit_init(c0)
    state, _ = biquad.unit_process(state, jnp.asarray(warm))
    state = biquad.unit_schedule(state, jnp.asarray(c1, jnp.float32), fade)
    state, y = biquad.unit_process(state, jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(y), y_ref, rtol=1e-4, atol=1e-5)
    # crossfade completed mid-block -> lanes identical afterwards
    np.testing.assert_array_equal(
        np.asarray(state["coeffs"][0]), np.asarray(state["coeffs"][1])
    )
    assert int(state["fade_remaining"]) == 0


def test_unit_crossfade_spans_blocks(rng):
    """Crossfade continuing across block boundaries stays sample-accurate."""
    c0 = biquad.design(biquad.HIGH_PASS, 80.0, 0.0, 0.707, FS)
    c1 = biquad.design(biquad.HIGH_PASS, 120.0, 0.0, 0.707, FS)
    fade = 72
    x = rng.standard_normal(160).astype(np.float32)

    ref = SeqCrossfadeBiquad(c0)
    ref.schedule(c1, fade)
    y_ref = ref.process(x.astype(np.float64))

    state = biquad.unit_init(c0)
    state = biquad.unit_schedule(state, jnp.asarray(c1, jnp.float32), fade)
    outs = []
    for i in range(0, 160, 32):
        state, y = biquad.unit_process(state, jnp.asarray(x[i : i + 32]))
        outs.append(np.asarray(y))
    np.testing.assert_allclose(np.concatenate(outs), y_ref, rtol=1e-4, atol=1e-5)


def test_unit_edit_click_bounded(rng):
    """Live gain edits must not click (`biquad.rs:603-625`)."""
    t = np.arange(4800) / FS
    x = (0.5 * np.sin(2 * np.pi * 440 * t)).astype(np.float32)
    state = biquad.unit_init(biquad.design(biquad.PEAKING, 440.0, 0.0, 1.41, FS))
    out = []
    for i in range(0, 4800, 480):
        if i == 2400:
            state = biquad.unit_schedule(
                state,
                jnp.asarray(biquad.design(biquad.PEAKING, 440.0, 12.0, 1.41, FS), jnp.float32),
                72,
            )
        state, y = biquad.unit_process(state, jnp.asarray(x[i : i + 480]))
        out.append(np.asarray(y))
    y = np.concatenate(out)
    dy = np.abs(np.diff(y.astype(np.float64)))
    # 440 Hz sine at 2.0 peak: max slope ≈ 2*2π*440/48000 ≈ 0.115; allow margin
    assert dy.max() < 0.2, f"click detected: max |dy| = {dy.max()}"


def test_batch_vmap(rng):
    c = jnp.asarray(
        np.stack(
            [
                biquad.design(biquad.PEAKING, 1000.0, 6.0, 1.41, FS),
                biquad.design(biquad.LOW_PASS, 4000.0, 0.0, 0.707, FS),
            ]
        ),
        jnp.float32,
    )
    x = jnp.asarray(rng.standard_normal((2, 1024)).astype(np.float32))
    y, z = biquad.apply(c, jnp.zeros((2, 2)), x)
    for i in range(2):
        yi, _ = biquad.apply(c[i], jnp.zeros(2), x[i])
        np.testing.assert_allclose(np.asarray(y[i]), np.asarray(yi), atol=1e-6)


# ------------------------------ EQ ------------------------------


def test_eq_default_is_identity(rng):
    state = eq.eq_init()
    x = jnp.asarray(rng.standard_normal(960).astype(np.float32))
    _, y = eq.eq_process(state, x)
    np.testing.assert_allclose(np.asarray(y), np.asarray(x), atol=1e-5)


def test_eq_butterworth_cutoff_and_slope():
    """-3.01 dB at cutoff; asymptotic slope per selected order (`eq.rs:713-762`)."""
    for slope in (12, 24, 36, 48):
        bands = eq.default_bands()
        bands[0] = eq.EqBandConfig(4, 100.0, 0.0, eq.DEFAULT_Q, slope, True)
        resp = eq.magnitude_response_db(bands, np.array([100.0, 50.0, 25.0]), FS)
        assert abs(resp[0] + 3.0103) < 0.05, f"slope {slope}: cutoff {resp[0]}"
        measured = resp[1] - resp[2]  # dB per octave well below cutoff
        assert abs(measured - slope) < 0.6, f"slope {slope}: {measured}"


def test_eq_magnitude_matches_filtering(rng):
    """Filtered sine amplitude must match the predicted response (parity with
    the shared UI renderer, `eq.rs:528-541`)."""
    bands = eq.default_bands()
    bands[4] = eq.EqBandConfig(1, 1280.0, 7.5, 2.0, 12, True)
    state = eq.eq_init(bands)
    freq = 1280.0
    t = np.arange(24000) / FS
    x = np.sin(2 * np.pi * freq * t).astype(np.float32) * 0.1
    _, y = eq.eq_process(state, jnp.asarray(x))
    y = np.asarray(y, np.float64)
    # steady-state amplitude over the last half
    amp = np.sqrt(2 * np.mean(y[12000:] ** 2))
    gain_db = 20 * np.log10(amp / 0.1 / np.sqrt(2) * np.sqrt(2))
    pred = eq.magnitude_response_db(bands, np.array([freq]), FS)[0]
    assert abs(gain_db - pred) < 0.05


def test_eq_band_edit_crossfades(rng):
    state = eq.eq_init()
    x = jnp.asarray(rng.standard_normal(480).astype(np.float32) * 0.3)
    state, _ = eq.eq_process(state, x)
    cfg = eq.EqBandConfig(1, 160.0, 8.0, 1.41, 12, True)
    state = eq.eq_set_band(state, 1, cfg, FS)
    # band 1 occupies compact slot 1 of the compensated ('lo') group
    assert int(state["lo"]["fade_remaining"][1]) == 72
    state, y = eq.eq_process(state, x)
    assert int(state["lo"]["fade_remaining"][1]) == 0
    assert np.all(np.isfinite(np.asarray(y)))


def test_eq_validation_errors():
    with pytest.raises(ValueError):
        eq.validate_band(eq.EqBandConfig(1, 1000.0, 13.0, 1.0, 12, True), FS)
    with pytest.raises(ValueError):
        eq.validate_band(eq.EqBandConfig(1, 5.0, 0.0, 1.0, 12, True), FS)
    with pytest.raises(ValueError):
        eq.validate_band(eq.EqBandConfig(1, 1000.0, 0.0, 99.0, 12, True), FS)
    with pytest.raises(ValueError):
        eq.validate_band(eq.EqBandConfig(4, 100.0, 0.0, 1.0, 13, True), FS)
    # valid
    eq.validate_band(eq.EqBandConfig(4, 100.0, 0.0, 1.0, 48, True), FS)


def test_eq_disabled_band_bypasses(rng):
    bands = eq.default_bands()
    bands[3] = eq.EqBandConfig(1, 640.0, 12.0, 1.0, 12, False)
    state = eq.eq_init(bands)
    x = jnp.asarray(rng.standard_normal(960).astype(np.float32))
    _, y = eq.eq_process(state, x)
    np.testing.assert_allclose(np.asarray(y), np.asarray(x), atol=1e-5)
