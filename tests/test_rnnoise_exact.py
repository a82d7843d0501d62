"""RNNoise exact-graph contracts: the binding spec for weight conversion.

Every test here pins part of the published RNNoise processing graph
(`rust-core/src/dsp/rnnoise.rs:122-164` consumes it via `nnnoiseless`,
`Cargo.toml:17`) against independently hand-computed values: the eband5ms
band layout, the DCT normalisation, the BFCC pipeline recomputed in plain
NumPy, the input high-pass response vs scipy, the Opus pitch tracker on
known-period signals, the GRU update form, and the silence bypass. A
converted weight archive is only meaningful if ALL of these hold — they
define the feature/graph contract the weights were trained against.
"""

import numpy as np
import jax.numpy as jnp
import pytest
from scipy import signal as sp_signal

from audioforge_tpu.models import rnnoise as rn


EBAND5MS = [0, 1, 2, 3, 4, 5, 6, 7, 8, 10, 12, 14, 16, 20, 24, 28, 34, 40,
            48, 60, 78, 100]


class TestBandLayout:
    def test_band_matrix_matches_eband5ms_hand_values(self):
        """compute_band_energy semantics: fractional split inside each band
        pair, edge bands doubled, bins >= 400 excluded."""
        m = np.asarray(rn._BANDS)
        assert m.shape == (22, 481)
        # band pair (8, 9): edges 8*4=32 .. 10*4=40, size 8
        for j in range(8):
            frac = j / 8
            assert m[8, 32 + j] == pytest.approx(1.0 - frac)
            assert m[9, 32 + j] == pytest.approx(frac)
        # first band doubled: pair (0,1) covers bins 0..3, band 0 gets
        # 2*(1-j/4)
        for j in range(4):
            assert m[0, j] == pytest.approx(2.0 * (1.0 - j / 4))
        # last band doubled: pair (20,21) covers bins 312..399 (size 88)
        assert m[21, 399] == pytest.approx(2.0 * 87 / 88)
        # 20 kHz cutoff: bins >= 400 contribute to NO band
        assert np.all(m[:, 400:] == 0.0)

    def test_interp_matrix_zeroes_above_20k(self):
        g = np.asarray(rn._INTERP)
        assert g.shape == (481, 22)
        assert np.all(g[400:, :] == 0.0)
        # linear blend inside pair (8,9)
        for j in range(8):
            frac = j / 8
            assert g[32 + j, 8] == pytest.approx(1.0 - frac)
            assert g[32 + j, 9] == pytest.approx(frac)
        # no doubling on the interpolation side
        assert g[0, 0] == pytest.approx(1.0)

    def test_dct_is_rnnoise_table(self):
        """out[k] = sum_j in[j] cos((j+.5)k pi/22) sqrt(2/22), first row
        scaled sqrt(.5) — i.e. the orthonormal DCT-II."""
        d = np.asarray(rn._DCT)
        j, k = 3, 5
        want = np.cos(np.pi / 22 * (j + 0.5) * k) * np.sqrt(2.0 / 22)
        assert d[k, j] == pytest.approx(want, abs=1e-6)
        assert d[0, j] == pytest.approx(np.sqrt(2.0 / 22) * np.sqrt(0.5),
                                        abs=1e-6)
        np.testing.assert_allclose(d @ d.T, np.eye(22), atol=1e-5)


class TestInputHighpass:
    def test_matches_scipy_lfilter(self):
        rng = np.random.default_rng(3)
        x = rng.standard_normal(960).astype(np.float32) * 1000.0
        mem = jnp.zeros(2, jnp.float32)
        _, y = rn._hp_biquad(mem, jnp.asarray(x))
        want = sp_signal.lfilter([1.0, -2.0, 1.0], [1.0, -1.99599, 0.99600], x)
        # Compensated double-word-f32 scan vs the f64 oracle: bound the
        # error relative to the signal scale (~-90 dB; the published
        # extractor's own plain-f32 recurrence sits near -45 dB).
        err = np.abs(np.asarray(y) - want)
        scale = np.abs(want).max()
        assert err.max() < 2e-4 * scale, (err.max(), scale)
        assert np.sqrt((err**2).mean()) < 5e-5 * scale

    def test_state_carries_across_frames(self):
        rng = np.random.default_rng(4)
        x = rng.standard_normal(960).astype(np.float32) * 1000.0
        mem = jnp.zeros(2, jnp.float32)
        m1, y1 = rn._hp_biquad(mem, jnp.asarray(x[:480]))
        _, y2 = rn._hp_biquad(m1, jnp.asarray(x[480:]))
        _, y_all = rn._hp_biquad(mem, jnp.asarray(x))
        # The inter-frame state hands over only the high word of the
        # compensated pair, so continuation is seamless to ~1e-4 of the
        # signal scale (no click), not bit-exact.
        y_split = np.concatenate([np.asarray(y1), np.asarray(y2)])
        d = np.abs(y_split - np.asarray(y_all))
        scale = np.abs(np.asarray(y_all)).max()
        assert d.max() < 1e-4 * scale, (d.max(), scale)


def _numpy_bfcc(prev_frame, cur_frame):
    """Independent NumPy replica of the BFCC path: Vorbis window ->
    FFT/960 -> eband5ms energies (edges doubled) -> spectral floor ->
    log10 -> DCT -> -12/-4 offsets."""
    n = np.arange(960)
    s = np.sin(np.pi * (n + 0.5) / 960)
    win = np.sin(0.5 * np.pi * s * s)
    x = np.concatenate([prev_frame, cur_frame]) * win
    X = np.fft.rfft(x) / 960.0
    mag2 = np.abs(X) ** 2
    bands = np.zeros(22)
    for b in range(21):
        lo, hi = EBAND5MS[b] * 4, EBAND5MS[b + 1] * 4
        size = hi - lo
        for j in range(size):
            frac = j / size
            bands[b] += (1 - frac) * mag2[lo + j]
            bands[b + 1] += frac * mag2[lo + j]
    bands[0] *= 2
    bands[21] *= 2
    log_e = np.log10(1e-2 + bands)
    log_max, follow = -2.0, -2.0
    ly = np.zeros(22)
    for i in range(22):
        ly[i] = max(log_max - 7, max(follow - 1.5, log_e[i]))
        log_max = max(log_max, ly[i])
        follow = max(follow - 1.5, ly[i])
    dct = np.array(
        [[np.cos(np.pi / 22 * (j + 0.5) * k) for j in range(22)]
         for k in range(22)]
    ) * np.sqrt(2.0 / 22)
    dct[0] *= np.sqrt(0.5)
    ceps = dct @ ly
    ceps[0] -= 12.0
    ceps[1] -= 4.0
    return bands, ceps


class TestFeatureVector:
    def test_bfcc_against_numpy_reference(self):
        """features[6:22] must equal the hand-computed adjusted cepstrum of
        the current frame (first 6 slots are the 3-frame smoothed sums)."""
        rng = np.random.default_rng(7)
        prev = (rng.standard_normal(480) * 3000).astype(np.float32)
        cur = (rng.standard_normal(480) * 3000).astype(np.float32)
        state = rn.rnnoise_state_init()
        state = dict(state, analysis_mem=jnp.asarray(prev))
        feats, X, P, Ex, Ep, Exp, silence, upd = rn.frame_features(
            state, jnp.asarray(cur)
        )
        bands_np, ceps_np = _numpy_bfcc(prev, cur)
        np.testing.assert_allclose(np.asarray(Ex), bands_np, rtol=2e-3)
        np.testing.assert_allclose(
            np.asarray(feats)[6:22], ceps_np[6:], rtol=2e-3, atol=2e-3
        )
        # fresh cepstral memory is zero, so the smoothed slots reduce to
        # c0 and the deltas to +/- c0
        np.testing.assert_allclose(
            np.asarray(feats)[:6], ceps_np[:6], rtol=2e-3, atol=2e-3
        )
        np.testing.assert_allclose(
            np.asarray(feats)[22:28], ceps_np[:6], rtol=2e-3, atol=2e-3
        )
        assert not bool(silence)

    def test_feature_vector_is_42_dim_with_layout(self):
        state = rn.rnnoise_state_init()
        x = jnp.asarray(
            (np.random.default_rng(8).standard_normal(480) * 2000)
            .astype(np.float32)
        )
        feats, *_ , upd = rn.frame_features(state, x)
        assert feats.shape == (42,)
        # slot 40 is the normalised pitch period 0.01*(T-300)
        T = int(upd["last_period"])
        assert float(feats[40]) == pytest.approx(0.01 * (T - 300), abs=1e-5)

    def test_delta_cepstra_recurrence(self):
        """features[22:28] = c0 - c2 and [28:34] = c0 - 2c1 + c2 over the
        rolled cepstral memory."""
        rng = np.random.default_rng(9)
        state = rn.rnnoise_state_init()
        ceps_hist = []
        x0 = None
        for i in range(3):
            cur = (rng.standard_normal(480) * 2500).astype(np.float32)
            prev = np.asarray(state["analysis_mem"])
            feats, *_rest, upd = rn.frame_features(state, jnp.asarray(cur))
            state = dict(state, **upd, analysis_mem=jnp.asarray(cur))
            _, ceps = _numpy_bfcc(prev, cur)
            ceps_hist.append(ceps)
            x0 = feats
        c0, c1, c2 = ceps_hist[2], ceps_hist[1], ceps_hist[0]
        np.testing.assert_allclose(
            np.asarray(x0)[:6], (c0 + c1 + c2)[:6], rtol=5e-3, atol=5e-3
        )
        np.testing.assert_allclose(
            np.asarray(x0)[22:28], (c0 - c2)[:6], rtol=5e-3, atol=5e-3
        )
        np.testing.assert_allclose(
            np.asarray(x0)[28:34], (c0 - 2 * c1 + c2)[:6], rtol=5e-3,
            atol=5e-3,
        )


class TestPitchTracker:
    @pytest.mark.parametrize("period", [120, 240, 400])
    def test_recovers_known_period(self, period):
        """A harmonic-rich periodic source must yield last_period within
        +/-2 samples of the true period and near-unity pitch correlation."""
        fs = 48000.0
        n = np.arange(480 * 6)
        f0 = fs / period
        x = np.zeros(len(n))
        for h in range(1, 6):
            x += (0.5 / h) * np.sin(2 * np.pi * f0 * h * n / fs)
        x = (x * 8000).astype(np.float32)
        state = rn.rnnoise_state_init()
        T = None
        gain = None
        for i in range(6):
            frame = jnp.asarray(x[i * 480 : (i + 1) * 480])
            feats, *_rest, upd = rn.frame_features(state, frame)
            state = dict(state, **upd,
                         analysis_mem=frame)
            T = int(upd["last_period"])
            gain = float(upd["last_gain"])
        assert abs(T - period) <= 2, (T, period)
        assert gain > 0.4

    def test_pitch_correlation_near_one_for_periodic(self):
        """Exp (normalised per-band correlation with the pitch-delayed
        window) must approach 1 in the fundamental's band for a steady
        periodic signal."""
        fs = 48000.0
        period = 240  # 200 Hz -> FFT bin 4 (50 Hz/bin) -> band 1
        n = np.arange(480 * 6)
        x = (6000 * np.sin(2 * np.pi * (fs / period) * n / fs)).astype(
            np.float32
        )
        state = rn.rnnoise_state_init()
        Exp = None
        T = None
        gain = None
        for i in range(6):
            frame = jnp.asarray(x[i * 480 : (i + 1) * 480])
            feats, X, P, Ex, Ep, Exp, sil, upd = rn.frame_features(
                state, frame
            )
            state = dict(state, **upd, analysis_mem=frame)
            T = int(upd["last_period"])
            gain = float(upd["last_gain"])
        assert T == period
        assert gain > 0.95
        assert float(np.asarray(Exp)[1]) > 0.99


class TestGruForm:
    def test_reset_applied_to_state_before_recurrent_matmul(self):
        """RNNoise GRU: h~ = act(Wx + U(r*h) + b), NOT r*(Uh). With a
        crafted weight set the two forms differ; pin the reference form."""
        p = {
            "vad_gru_wi": jnp.zeros((24, 72), jnp.float32),
            "vad_gru_wh": jnp.zeros((24, 72), jnp.float32),
            "vad_gru_b": jnp.zeros((72,), jnp.float32),
        }
        # reset gate bias -> r = sigmoid(-2); h-gate recurrent weight = I
        p["vad_gru_b"] = p["vad_gru_b"].at[24:48].set(-2.0)
        p["vad_gru_wh"] = p["vad_gru_wh"].at[:, 48:].set(jnp.eye(24))
        h = jnp.ones((24,), jnp.float32) * 0.5
        x = jnp.zeros((24,), jnp.float32)
        out = rn._gru(p, "vad_gru", h, x)
        r = 1.0 / (1.0 + np.exp(2.0))
        z = 0.5  # sigmoid(0)
        h_tilde = np.tanh(r * 0.5)  # U(r*h) with U=I
        want = z * 0.5 + (1 - z) * h_tilde
        np.testing.assert_allclose(np.asarray(out), want, rtol=1e-5)

    def test_gru_activations(self):
        assert rn._GRU_ACT["vad_gru"] is jnp.tanh
        import jax
        assert rn._GRU_ACT["noise_gru"] is jax.nn.relu
        assert rn._GRU_ACT["denoise_gru"] is jax.nn.relu


class TestFrameSemantics:
    def test_silence_bypass_freezes_rnn_state(self):
        """E < 0.04 frames must skip the RNN (state frozen), apply no
        gains, and report vad = 0. E covers the full 960 window and the
        input high-pass rings after loud audio, so true silence is reached
        only once analysis/HP state has decayed — prime the RNN states
        directly on an otherwise-fresh (all-zero-signal) state to isolate
        the bypass semantics."""
        params = rn.init_params()
        state = rn.rnnoise_state_init()
        rng = np.random.default_rng(5)
        primed = dict(
            state,
            vad_gru=jnp.asarray(rng.standard_normal(24), jnp.float32) * 0.3,
            noise_gru=jnp.asarray(rng.standard_normal(48), jnp.float32) * 0.3,
            denoise_gru=jnp.asarray(rng.standard_normal(96), jnp.float32) * 0.3,
            lastg=jnp.asarray(rng.uniform(0.2, 1.0, 22), jnp.float32),
        )
        quiet = jnp.zeros(480, jnp.float32)
        state2, y, aux = rn.rnnoise_frame(params, primed, quiet)
        np.testing.assert_array_equal(
            np.asarray(state2["vad_gru"]), np.asarray(primed["vad_gru"])
        )
        np.testing.assert_array_equal(
            np.asarray(state2["lastg"]), np.asarray(primed["lastg"])
        )
        assert float(aux["vad"]) == 0.0

    def test_silence_reached_after_loud_audio_decays(self):
        """Driving loud audio then zeros: the bypass engages once the
        window/HP ring decays below E = 0.04, and the RNN state freezes
        from that frame on."""
        params = rn.init_params()
        state = rn.rnnoise_state_init()
        loud = jnp.asarray(
            (np.random.default_rng(5).standard_normal(480) * 5000)
            .astype(np.float32)
        )
        state, _, _ = rn.rnnoise_frame(params, state, loud)
        quiet = jnp.zeros(480, jnp.float32)
        froze = False
        for _ in range(30):
            before = np.asarray(state["vad_gru"]).copy()
            state, _, aux = rn.rnnoise_frame(params, state, quiet)
            if np.array_equal(np.asarray(state["vad_gru"]), before):
                froze = True
                assert float(aux["vad"]) == 0.0
                break
        assert froze, "silence bypass never engaged after 30 quiet frames"

    def test_gain_hangover(self):
        """g = max(g, 0.6 * lastg): gains cannot fall faster than the
        hangover between consecutive voiced frames."""
        params = rn.init_params()
        state = rn.rnnoise_state_init()
        state = dict(state, lastg=jnp.ones(22, jnp.float32))
        x = jnp.asarray(
            (np.random.default_rng(6).standard_normal(480) * 5000)
            .astype(np.float32)
        )
        _, _, aux = rn.rnnoise_frame(params, state, x)
        assert np.all(np.asarray(aux["gains"]) >= 0.6 - 1e-6)

    def test_batched_equals_single(self):
        """Batch axis must not change numerics (serving runs [N] streams)."""
        params = rn.init_params()
        rng = np.random.default_rng(11)
        x = (rng.standard_normal((3, 480)) * 4000).astype(np.float32)
        sb = rn.rnnoise_state_init((3,))
        sb2, yb, auxb = rn.rnnoise_frame(params, sb, jnp.asarray(x))
        for i in range(3):
            s1 = rn.rnnoise_state_init()
            _, y1, aux1 = rn.rnnoise_frame(params, s1, jnp.asarray(x[i]))
            np.testing.assert_allclose(
                np.asarray(yb)[i], np.asarray(y1), rtol=1e-4, atol=1e-2
            )

    def test_20k_cutoff_zeroed_on_active_frames(self):
        """interp_band_gain leaves bins >= 400 at gain 0: a 21 kHz tone is
        removed on non-silent frames."""
        params = rn.init_params()
        state = rn.rnnoise_state_init()
        fs = 48000.0
        n = np.arange(480 * 4)
        x = (
            3000 * np.sin(2 * np.pi * 1000 * n / fs)
            + 3000 * np.sin(2 * np.pi * 21000 * n / fs)
        ).astype(np.float32)
        outs = []
        for i in range(4):
            state, y, _ = rn.rnnoise_frame(
                params, state, jnp.asarray(x[i * 480 : (i + 1) * 480])
            )
            outs.append(np.asarray(y))
        tail = np.concatenate(outs[2:])
        spec = np.abs(np.fft.rfft(tail * np.hanning(len(tail))))
        freqs = np.fft.rfftfreq(len(tail), 1 / fs)
        hi = spec[(freqs > 20500) & (freqs < 21500)].max()
        lo = spec[(freqs > 900) & (freqs < 1100)].max()
        assert hi < lo * 1e-2
