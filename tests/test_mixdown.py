"""Phase-safe mono mixdown + output-writer drift retiming."""

import numpy as np
import pytest

from audioforge_tpu.ops import mixdown as mx
from audioforge_tpu.runtime.output_writer import (
    OutputWriteController,
    retime_audio_block,
)


def _speechish(rng, n):
    t = np.arange(n) / 48000.0
    return (0.3 * np.sin(2 * np.pi * 220 * t)
            + 0.1 * np.sin(2 * np.pi * 680 * t)
            + 0.02 * rng.standard_normal(n)).astype(np.float32)


class TestPhaseSafeMono:
    def test_correlated_input_plain_average(self, rng):
        x = _speechish(rng, 4800)
        mono, corr, diag = mx.mix_to_mono(x, x, "phase_safe_mono")
        assert corr == pytest.approx(1.0, abs=1e-5)
        assert diag["strategy"] == "none"
        np.testing.assert_allclose(mono, x, rtol=1e-5)

    def test_polarity_flip_rescue(self, rng):
        x = _speechish(rng, 4800)
        mono, corr, diag = mx.mix_to_mono(x, -x, "phase_safe_mono")
        assert corr == pytest.approx(-1.0, abs=1e-5)
        assert diag["strategy"] == "polarity_flip"
        assert diag["polarity_flipped"]
        # rescued mono keeps the signal instead of cancelling
        assert np.sqrt(np.mean(mono**2)) > 0.5 * np.sqrt(np.mean(x**2))

    def test_integer_delay_detected(self, rng):
        x = _speechish(rng, 4800)
        delay = 5
        # right leads left by `delay` -> left[i] matches right[i - delay],
        # so the scan peaks at -delay (right_idx = left_idx + d convention)
        right = np.roll(x, -delay)
        cand = mx.best_phase_alignment(x, right, 0.0)
        assert cand is not None
        assert cand.strategy == "fractional_delay"
        assert abs(cand.delay_samples + delay) < 0.5

    def test_fractional_alignment_restores_level(self, rng):
        # wideband content so a 4-sample skew genuinely decorrelates —
        # low-passed signals stay >0.96 correlated and the rescue
        # correctly declines (improvement gate, `input.rs:26`)
        x = (0.3 * rng.standard_normal(9600)).astype(np.float32)
        delay = 4
        right = np.concatenate([np.zeros(delay, np.float32), x[:-delay]])
        state = mx.PhaseSafeMonoState()
        # two blocks so the history warms up
        m1, _ = mx.mix_phase_safe(x[:4800], right[:4800], state)
        m2, diag = mx.mix_phase_safe(x[4800:], right[4800:], state)
        assert diag["strategy"] == "fractional_delay"
        naive = 0.5 * (x[4800:] + right[4800:])
        assert np.sqrt(np.mean(m2**2)) > np.sqrt(np.mean(naive**2))

    def test_max_rms_fallback_on_hostile_phase(self, rng):
        # decorrelated anti-phase-ish content with no single alignment
        x = _speechish(rng, 4800)
        hostile = -x + 0.8 * rng.standard_normal(4800).astype(np.float32)
        corr = mx.stereo_correlation(x, hostile)
        if corr is not None and corr < mx.INPUT_PHASE_WARNING_CORRELATION:
            mono, _, diag = mx.mix_to_mono(x, hostile, "phase_safe_mono")
            assert diag["strategy"] in ("max_rms_fallback", "polarity_flip",
                                        "fractional_delay")

    def test_simple_modes(self, rng):
        left = _speechish(rng, 1000)
        right = 0.5 * left
        m, _, _ = mx.mix_to_mono(left, right, "left")
        np.testing.assert_array_equal(m, left)
        m, _, _ = mx.mix_to_mono(left, right, "right")
        np.testing.assert_array_equal(m, right)
        m, _, _ = mx.mix_to_mono(left, right, "max_rms")
        np.testing.assert_array_equal(m, left)
        m, _, _ = mx.mix_to_mono(left, right, "average")
        np.testing.assert_allclose(m, 0.5 * (left + right), rtol=1e-6)

    def test_silent_block(self):
        z = np.zeros(480, np.float32)
        mono, corr, diag = mx.mix_to_mono(z, z, "phase_safe_mono")
        assert corr is None
        assert np.all(mono == 0)


class TestOutputWriter:
    def test_retime_identity(self):
        x = np.sin(np.arange(480) * 0.1).astype(np.float32)
        np.testing.assert_array_equal(retime_audio_block(x, 1.0), x)

    def test_retime_speedup_shrinks(self):
        x = np.linspace(0.0, 1.0, 480).astype(np.float32)
        y = retime_audio_block(x, 1.06)
        assert y.size == round(480 / 1.06)
        # a linear ramp stays linear under linear-interp retime (the final
        # sample clamps to the source end, so skip the last diff)
        d = np.diff(y)[:-1]
        np.testing.assert_allclose(d, d[0], atol=1e-5)

    def test_retime_slowdown_grows(self):
        x = np.ones(480, np.float32)
        y = retime_audio_block(x, 0.96)
        assert y.size == round(480 / 0.96)
        np.testing.assert_allclose(y, 1.0, atol=1e-6)

    def test_controller_converges_toward_center(self):
        c = OutputWriteController(48000.0)
        # overfull queue -> catch-up ratio > 1 (shrinks blocks)
        for _ in range(50):
            r_high = c.speed_ratio(c.hard_backlog_samples - 100)
        assert 1.0 < r_high <= 1.03
        c2 = OutputWriteController(48000.0)
        for _ in range(50):
            r_low = c2.speed_ratio(0)
        assert 0.96 <= r_low < 1.0

    def test_emergency_ratio_at_hard_backlog(self):
        c = OutputWriteController(48000.0)
        assert c.speed_ratio(c.hard_backlog_samples) == 1.06

    def test_discontinuity_fade(self):
        c = OutputWriteController(48000.0)
        c.mark_discontinuity()
        block = np.ones(480, np.float32)
        out = c.condition(block, c.target_center_samples)
        fade_n = c.fade_samples
        assert out[0] < 0.02  # ramp starts near zero
        assert out[fade_n - 1] <= 1.0
        assert np.all(np.diff(out[:fade_n]) >= -1e-6)
        # second block continues/finishes the fade (288 samples > 480? no)
        assert c._fade_remaining == max(0, fade_n - 480)
