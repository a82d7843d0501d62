"""Model-layer contracts: Silero VAD wrapper, RNNoise/DFN3 processors,
suppressor engine, VAD auto-gate.

Weight-independent behaviours mirrored from the reference: frame staging and
latency accounting, state round-trips, calibration math, wet/dry alignment,
failure semantics, noise-floor tracking.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from audioforge_tpu.models import dfn3, rnnoise, silero, suppressor, vad_gate


# --------------------------- Silero VAD ---------------------------


def test_calibration_exact():
    """Platt constants from the v6.2.1 report (`vad.rs:53-55,468-477`)."""
    p = 0.7
    logit = np.log(p / (1 - p))
    want = 1 / (1 + np.exp(-(0.6922877 * logit + 0.08612386)))
    got = float(silero.calibrate_probability(0.7))
    assert abs(got - want) < 1e-6
    assert float(silero.calibrate_probability(np.nan)) == 0.0
    assert 0.0 <= float(silero.calibrate_probability(0.0)) <= 1.0
    assert 0.0 <= float(silero.calibrate_probability(1.0)) <= 1.0


def test_silero_infer_state_roundtrip():
    params = silero.init_params()
    x = jnp.asarray(np.random.default_rng(0).standard_normal((3, 576)), jnp.float32)
    state = jnp.zeros((2, 3, 128), jnp.float32)
    p1, s1 = silero.silero_infer(params, x, state)
    assert p1.shape == (3,)
    assert s1.shape == (2, 3, 128)
    assert np.all(np.isfinite(np.asarray(p1)))
    assert np.all((np.asarray(p1) >= 0) & (np.asarray(p1) <= 1))
    # state must influence the next step (recurrent, not stateless)
    p2a, _ = silero.silero_infer(params, x, s1)
    p2b, _ = silero.silero_infer(params, x, state)
    assert not np.allclose(np.asarray(p2a), np.asarray(p2b))


def test_silero_stream_window_cadence():
    """One inference per 1536-sample (48 kHz) window (`vad.rs:251-296`)."""
    st = silero.vad_stream_init(48000)
    rng = np.random.default_rng(1)
    st, p0 = silero.vad_stream_process(st, rng.standard_normal(480).astype(np.float32))
    assert not st["has_inference"]  # not enough samples yet
    st, _ = silero.vad_stream_process(st, rng.standard_normal(480).astype(np.float32))
    st, p = silero.vad_stream_process(st, rng.standard_normal(600).astype(np.float32))
    assert st["has_inference"]
    assert 0.0 <= p <= 1.0


def test_silero_stft_graph_structure():
    """The committed graph facts of `docs/silero_graph.md`: exact key set
    with the official checkpoint shapes, analytic STFT basis, 4 frames,
    time reduced to one LSTM step."""
    params = silero.init_params()
    assert set(params) == set(silero.ONNX_NAME_MAP)
    assert params["stft_basis"].shape == (258, 1, 256)
    assert params["lstm_wi"].shape == (512, 128)
    assert params["head_w"].shape == (1, 128, 1)
    # the basis is the hann-windowed Fourier matrix: a pure 16 kHz bin-8
    # tone (8 cycles per 256 samples) projects onto bin 8 dominantly
    x = jnp.asarray(
        np.sin(2 * np.pi * 8 * np.arange(576) / 256), jnp.float32
    )[None, :]
    mags = silero._stft_mag(params, x)  # [1, 4, 129]
    assert mags.shape == (1, silero._N_FRAMES, silero._N_BINS)
    assert int(np.argmax(np.asarray(mags)[0, 1])) == 8


def test_silero_convert_roundtrip(tmp_path):
    """A synthetic archive carrying the OFFICIAL tensor names converts
    through tools/convert_model_weights.py, loads via load_weights, and
    reproduces bit-identical posteriors (VERDICT r1 item 4)."""
    import subprocess
    import sys
    from pathlib import Path

    repo = Path(__file__).resolve().parents[1]
    params = silero.init_params(seed=0xBEEF)
    # dump under the official names, as an offline exporter would
    src = {
        silero.ONNX_NAME_MAP[k]: np.asarray(v) for k, v in params.items()
    }
    src_path = tmp_path / "silero_state_dict.npz"
    out_path = tmp_path / "silero_vad.npz"
    np.savez(src_path, **src)
    res = subprocess.run(
        [sys.executable, str(repo / "tools" / "convert_model_weights.py"),
         "--model", "silero", "--source", str(src_path),
         "--output", str(out_path)],
        capture_output=True, text=True, timeout=300,
    )
    assert res.returncode == 0, res.stdout + res.stderr
    loaded = silero.load_weights(out_path)
    x = jnp.asarray(
        np.random.default_rng(3).standard_normal((2, 576)), jnp.float32
    )
    state = jnp.zeros((2, 2, 128), jnp.float32)
    p_ref, s_ref = silero.silero_infer(params, x, state)
    p_new, s_new = silero.silero_infer(loaded, x, state)
    np.testing.assert_array_equal(np.asarray(p_ref), np.asarray(p_new))
    np.testing.assert_array_equal(np.asarray(s_ref), np.asarray(s_new))


def test_analyze_vad_probabilities_window_count():
    x = np.random.default_rng(2).standard_normal(48000).astype(np.float32) * 0.1
    probs = silero.analyze_vad_probabilities(x, 48000)
    # one posterior per 1536-sample window, final partial zero-padded
    assert len(probs) == -(-48000 // 1536)
    assert all(0.0 <= p <= 1.0 for p in probs)
    assert silero.analyze_vad_probabilities(np.zeros(0), 48000) == []
    with pytest.raises(ValueError):
        silero.analyze_vad_probabilities(x, 44100)


# --------------------------- RNNoise ---------------------------


def test_rnnoise_frame_shapes_and_state():
    params = rnnoise.init_params()
    state = rnnoise.rnnoise_state_init((2,))
    x = jnp.asarray(
        np.random.default_rng(0).standard_normal((2, 480)) * 1000.0, jnp.float32
    )
    s1, y, aux = rnnoise.rnnoise_frame(params, state, x)
    assert y.shape == (2, 480)
    assert aux["gains"].shape == (2, 22)
    assert aux["vad"].shape == (2,)
    assert np.all(np.isfinite(np.asarray(y)))


def test_rnnoise_overlap_add_latency():
    """The first output frame is the previous (zero) frame's tail: one frame
    latency (`rnnoise.rs:313-315`). A unity-gain model reconstructs the
    input delayed by 480 samples — here gains vary, so check energy flows
    and staging length accounting instead."""
    proc = rnnoise.processor_init(strength=1.0)
    rng = np.random.default_rng(3)
    x = (rng.standard_normal(2400) * 0.1).astype(np.float32)
    proc, _ = rnnoise.processor_push(proc, x)
    proc, n = rnnoise.processor_process(proc)
    assert n == 5
    proc, out = rnnoise.processor_pop(proc, 2400)
    assert len(out) == 2400
    assert np.all(np.isfinite(out))


def test_rnnoise_strength_zero_is_delayed_dry():
    proc = rnnoise.processor_init(strength=0.0)
    proc["smoothed_strength"] = 0.0  # settle the EMA
    rng = np.random.default_rng(4)
    x = (rng.standard_normal(1440) * 0.1).astype(np.float32)
    proc, _ = rnnoise.processor_push(proc, x)
    proc, _ = rnnoise.processor_process(proc)
    proc, out = rnnoise.processor_pop(proc, 1440)
    # dry path is delayed one frame
    np.testing.assert_allclose(out[480:], x[:960], atol=1e-6)
    np.testing.assert_allclose(out[:480], 0.0, atol=1e-6)


def test_rnnoise_soft_reset_preserves_model_state():
    proc = rnnoise.processor_init()
    rng = np.random.default_rng(5)
    proc, _ = rnnoise.processor_push(proc, rng.standard_normal(960).astype(np.float32))
    proc, _ = rnnoise.processor_process(proc)
    gru_before = np.asarray(proc["model"]["vad_gru"])
    proc = rnnoise.processor_soft_reset(proc)
    assert len(proc["in_buf"]) == 0 and len(proc["out_buf"]) == 0
    np.testing.assert_array_equal(np.asarray(proc["model"]["vad_gru"]), gru_before)


def test_rnnoise_soft_clip():
    x = jnp.asarray([0.5, 0.99, 2.0, -3.0, np.nan, np.inf], jnp.float32)
    y = np.asarray(rnnoise._soft_clip(x))
    assert y[0] == pytest.approx(0.5)
    assert 0.98 < y[1] <= 32760 / 32768
    assert y[2] <= 32760 / 32768
    assert y[3] >= -32760 / 32768
    assert y[4] == 0.0 and y[5] == 0.0


# --------------------------- DFN3 ---------------------------


def test_dfn_runtime_config_validation():
    dfn3.validate_runtime_config(30.0, 0.0)
    dfn3.validate_runtime_config(0.01, 0.05)
    with pytest.raises(ValueError):
        dfn3.validate_runtime_config(0.0, 0.0)
    with pytest.raises(ValueError):
        dfn3.validate_runtime_config(101.0, 0.0)
    with pytest.raises(ValueError):
        dfn3.validate_runtime_config(30.0, 0.06)
    with pytest.raises(ValueError):
        dfn3.validate_runtime_config(np.nan, 0.0)


def test_dfn_convert_roundtrip(tmp_path):
    """A synthetic archive carrying the OFFICIAL DFN3 torch state-dict
    tensor names converts through tools/convert_model_weights.py
    (dfn3.TORCH_NAME_MAP + the transposed-conv re-layout), loads via
    load_weights, and reproduces bit-identical frames (VERDICT r2 item 1:
    the Silero conversion discipline applied to DeepFilterNet3)."""
    import subprocess
    import sys
    from pathlib import Path

    repo = Path(__file__).resolve().parents[1]
    params = dfn3.init_params(seed=0xD0F3)
    inv_map = {v: k for k, v in dfn3.TORCH_NAME_MAP.items()}
    src = {}
    for key, value in params.items():
        arr = np.asarray(value, np.float32)
        if key in dfn3._TRANSPOSED_KEYS:
            # back to torch ConvTranspose2d layout (both units are
            # depthwise, so the within-group transpose is identity and the
            # inverse is the freq flip)
            arr = arr[..., ::-1].copy()
        src[inv_map[key]] = arr
    # exporters also dump these; conversion must ignore them
    src["enc.erb_conv0.3.num_batches_tracked"] = np.asarray(7)
    src_path = tmp_path / "dfn3_state_dict.npz"
    out_path = tmp_path / "dfn3.npz"
    np.savez(src_path, **src)
    res = subprocess.run(
        [sys.executable, str(repo / "tools" / "convert_model_weights.py"),
         "--model", "dfn3", "--source", str(src_path),
         "--output", str(out_path), "--variant", "standard"],
        capture_output=True, text=True, timeout=600,
    )
    assert res.returncode == 0, res.stdout + res.stderr
    loaded = dfn3.load_weights(out_path)
    x = jnp.asarray(
        np.random.default_rng(9).standard_normal((2, 6, 480)) * 0.1,
        jnp.float32,
    )
    st = dfn3.dfn_state_init((2,), lookahead=True)
    _, y_ref = dfn3.dfn_frames(params, st, x)
    _, y_new = dfn3.dfn_frames(loaded, st, x)
    np.testing.assert_array_equal(np.asarray(y_ref), np.asarray(y_new))
    # the archive carries the variant tag
    data = np.load(out_path)
    assert str(np.asarray(data["__variant__"]).item()) == "standard"


def test_dfn_layers_match_torch():
    """Pins the layer semantics of the re-expressed DFN3 graph against
    torch itself: causal separable Conv2d+BN+ReLU, depthwise
    ConvTranspose2d (freq stride 2) through the conversion re-layout, and
    the torch nn.GRU cell — the three places where a silent convention
    mismatch would let official weights bind but compute garbage."""
    torch = pytest.importorskip("torch")
    nn = torch.nn
    rng = np.random.default_rng(0)
    B, C, F = 2, 8, 16

    # causal grouped conv (time kernel 3) + pointwise + BN + ReLU
    conv = nn.Conv2d(C, C, (3, 3), padding=(0, 1), groups=2, bias=False)
    pw = nn.Conv2d(C, C, 1, bias=False)
    bn = nn.BatchNorm2d(C).eval()
    with torch.no_grad():
        bn.weight.copy_(torch.tensor(rng.normal(1, .2, C)).float())
        bn.bias.copy_(torch.tensor(rng.normal(0, .2, C)).float())
        bn.running_mean.copy_(torch.tensor(rng.normal(0, .2, C)).float())
        bn.running_var.copy_(torch.tensor(rng.uniform(.5, 2, C)).float())
    T = 5
    x = torch.tensor(rng.normal(0, 1, (B, C, T, F))).float()
    ref = torch.relu(bn(pw(conv(
        torch.nn.functional.pad(x, (0, 0, 2, 0)))))).detach().numpy()
    p = {
        "u.w": jnp.asarray(conv.weight.detach().numpy()),
        "u.pw": jnp.asarray(pw.weight.detach().numpy()),
        "u.bn.g": jnp.asarray(bn.weight.detach().numpy()),
        "u.bn.b": jnp.asarray(bn.bias.detach().numpy()),
        "u.bn.m": jnp.asarray(bn.running_mean.detach().numpy()),
        "u.bn.v": jnp.asarray(bn.running_var.detach().numpy()),
    }
    xn = x.numpy()
    hist = np.zeros((2, B, C, F), np.float32)
    for t in range(T):
        win = jnp.asarray(np.concatenate([hist, xn[:, :, t, :][None]]))
        got = np.asarray(dfn3._conv_step(p, "u", win, 1, 2))
        np.testing.assert_allclose(got, ref[:, :, t, :], atol=1e-5)
        hist = np.concatenate([hist[1:], xn[:, :, t, :][None]])

    # depthwise ConvTranspose2d, stride (1,2), pad (0,1), output_pad (0,1)
    convt = nn.ConvTranspose2d(C, C, (1, 3), stride=(1, 2), padding=(0, 1),
                               output_padding=(0, 1), groups=C, bias=False)
    x1 = torch.tensor(rng.normal(0, 1, (B, C, 1, F))).float()
    ref_t = convt(x1).detach().numpy()[:, :, 0, :]
    w_fw = dfn3._convert_transposed(convt.weight.detach().numpy(), C)
    ident = {
        "t.w": jnp.asarray(w_fw),
        "t.bn.g": jnp.ones(C, jnp.float32),
        "t.bn.b": jnp.zeros(C, jnp.float32),
        "t.bn.m": jnp.zeros(C, jnp.float32),
        "t.bn.v": jnp.full((C,), 1.0 - dfn3._BN_EPS, jnp.float32),
    }
    got_t = np.asarray(
        dfn3._convt_step(ident, "t", jnp.asarray(x1.numpy()[:, :, 0, :])))
    np.testing.assert_allclose(got_t, np.maximum(ref_t, 0.0), atol=1e-5)

    # torch GRU (2 layers)
    gru = nn.GRU(12, 12, num_layers=2, batch_first=True)
    xs = torch.tensor(rng.normal(0, 1, (B, 5, 12))).float()
    ref_out, _ = gru(xs)
    pg = {}
    for layer in range(2):
        for ours, theirs in (("wi", "weight_ih"), ("wh", "weight_hh"),
                             ("bi", "bias_ih"), ("bh", "bias_hh")):
            pg[f"g.gru_l{layer}.{ours}"] = jnp.asarray(
                getattr(gru, f"{theirs}_l{layer}").detach().numpy())
    h = [jnp.zeros((B, 12)), jnp.zeros((B, 12))]
    for t in range(5):
        inp = jnp.asarray(xs.numpy()[:, t])
        h[0] = dfn3._gru_step(pg, "g.gru_l0", inp, h[0])
        h[1] = dfn3._gru_step(pg, "g.gru_l1", h[0], h[1])
        np.testing.assert_allclose(
            np.asarray(h[1]), ref_out[:, t].detach().numpy(), atol=1e-5)


def test_dfn_erb_widths_contract():
    """libDF's rectangular band layout: monotone non-decreasing widths, a
    minimum width of 2, covering all 481 bins with the Nyquist bin folded
    into the last band."""
    widths = dfn3.erb_widths()
    assert len(widths) == dfn3.NB_ERB
    assert int(widths.sum()) == dfn3.FREQ_SIZE
    assert int(widths.min()) >= 2
    assert all(int(b) >= int(a)
               for a, b in zip(widths[:-1], widths[1:]))


def test_dfn_latency_labels():
    assert dfn3.latency_samples(True) == 480
    assert dfn3.latency_samples(False) == 1440


def _structured_params(erb_bias: float, df_tap: int | None):
    """Force the official-topology heads to analytic outputs: the ERB mask
    head becomes ``sigmoid(erb_bias)`` everywhere (conv weights zeroed, the
    constant injected through the head's BatchNorm shift), and the deep
    filter becomes a one-hot real coefficient on history frame ``df_tap``
    via the df conv-pathway BatchNorm shift (the tanh branch is zeroed —
    GroupedLinearEinsum has no bias, so tanh(0)=0). ``df_tap=None`` zeroes
    the deep filter entirely."""
    params = dict(dfn3.init_params())

    def zero(key):
        params[key] = jnp.zeros_like(params[key])

    zero("erb_dec.conv0_out.w")
    zero("erb_dec.conv0_out.bn.g")
    params["erb_dec.conv0_out.bn.b"] = jnp.full_like(
        params["erb_dec.conv0_out.bn.b"], erb_bias)
    zero("df_dec.df_out.w")
    zero("df_dec.df_convp.w")
    zero("df_dec.df_convp.pw")
    zero("df_dec.df_convp.bn.g")
    bias = np.zeros(dfn3.DF_ORDER * 2, np.float32)
    if df_tap is not None:
        bias[2 * df_tap] = 1.0  # (order df_tap, real part)
    params["df_dec.df_convp.bn.b"] = jnp.asarray(bias)
    return params


def _identity_tap_params(tap: int):
    """Weights that make the model an exact delay: unity ERB gains
    (sigmoid(+30) ~= 1) and a one-hot real deep-filter coefficient on
    history ``tap``, so the low bins are copied verbatim from that frame."""
    return _structured_params(30.0, tap)


def test_dfn_lookahead_centering():
    """Pins the latency-variant semantics (`deepfilter_ffi.rs:40-43`):
    coefficients predicted at frame t apply to frame t for the LL variant
    (identity tap = history index 4, the current frame) and to frame t-2
    for the standard 2-frame-lookahead variant (identity tap = history
    index 2). With unity gains and the one-hot tap, each variant must be an
    EXACT delay of its declared latency."""
    fs = 48000.0
    n = np.arange(24 * dfn3.FRAME_SIZE)
    x = (0.25 * np.sin(2 * np.pi * 331.0 * n / fs)
         + 0.05 * np.sin(2 * np.pi * 47.0 * n / fs)).astype(np.float32)
    frames = jnp.asarray(x.reshape(24, dfn3.FRAME_SIZE))

    # LL: identity tap on the current frame -> exact 1-frame (480) delay
    _, y = dfn3.dfn_frames(_identity_tap_params(4), dfn3.dfn_state_init(),
                           frames, 100.0, 0.0)
    y = np.asarray(y).reshape(-1)
    np.testing.assert_allclose(y[480:], x[:-480], atol=2e-4)

    # standard: identity tap on frame t-2 -> exact 3-frame (1440) delay
    _, y = dfn3.dfn_frames(_identity_tap_params(2),
                           dfn3.dfn_state_init(lookahead=True),
                           frames, 100.0, 0.0)
    y = np.asarray(y).reshape(-1)
    np.testing.assert_allclose(y[1440:], x[:-1440], atol=2e-4)


def test_dfn_variant_archive_mismatch_rejected(tmp_path, monkeypatch):
    """The two latency variants are different models; loading an archive
    tagged for one into the other must fail loudly, not silently degrade."""
    params = dfn3.init_params()
    path = tmp_path / "dfn3_ll_tagged.npz"
    np.savez(path, **{k: np.asarray(v, np.float32) for k, v in params.items()},
             __provenance__=np.asarray("trained"),
             __variant__=np.asarray("ll"))
    monkeypatch.setattr(dfn3, "_APP_OWNED_PATHS",
                        {"model": path, "library": None})
    monkeypatch.setattr(dfn3, "_DEFAULT_PARAMS_CACHE", {})
    with pytest.raises(ValueError, match="variant"):
        dfn3.default_params(low_latency=False)
    assert dfn3.default_params(low_latency=True)


def test_dfn_processor_failure_passthrough():
    """Non-finite model output => permanent latency-preserving passthrough
    (`deepfilter_ffi.rs:841-864`)."""
    proc = dfn3.processor_init(low_latency=True)
    # poison the weights to force a non-finite output
    proc["params"] = {k: v * np.nan for k, v in proc["params"].items()}
    x = np.random.default_rng(6).standard_normal(960).astype(np.float32) * 0.1
    proc, _ = dfn3.processor_push(proc, x)
    proc, _ = dfn3.processor_process(proc)
    assert proc["backend_failed"]
    proc, out = dfn3.processor_pop(proc, 960)
    # passthrough preserves the 480-sample latency alignment
    np.testing.assert_allclose(out[480:], x[:480], atol=1e-6)
    # and stays failed for subsequent blocks
    proc, _ = dfn3.processor_push(proc, x)
    proc, _ = dfn3.processor_process(proc)
    assert proc["backend_failed"]


def test_dfn_atten_lim_applied_exactly_once():
    """Max suppression must equal the configured attenuation limit — not
    double it (the reference applies df_set_atten_lim once, as a
    noisy-spectrum mix; `deepfilter_ffi.rs:44-63`). Weights are forced to
    full suppression (sigmoid -> ~0 gains, zero deep-filter taps), so the
    wet output is exactly the gain-floor mix of the input."""
    params = _structured_params(-30.0, None)  # gains ~ 0, zero deep filter
    fs = 48000.0
    n = np.arange(20 * dfn3.FRAME_SIZE)
    x = (0.3 * np.sin(2 * np.pi * 1000.0 * n / fs)).astype(np.float32)
    frames = jnp.asarray(x.reshape(20, dfn3.FRAME_SIZE))
    for atten_db in (30.0, 12.0):
        state = dfn3.dfn_state_init()
        _, ys = dfn3.dfn_frames(params, state, frames, atten_db, 0.0)
        y = np.asarray(ys).reshape(-1)
        # skip warmup (overlap-add + 1-frame latency), measure steady state
        steady_in = x[4 * 480 : 16 * 480]
        steady_out = y[4 * 480 + 480 : 16 * 480 + 480]
        rms_in = np.sqrt(np.mean(steady_in**2))
        rms_out = np.sqrt(np.mean(steady_out**2))
        got_db = -20.0 * np.log10(rms_out / rms_in)
        assert abs(got_db - atten_db) < 1.0, (atten_db, got_db)


def test_dfn_frames_batched():
    params = dfn3.init_params()
    state = dfn3.dfn_state_init((4,))
    frames = jnp.asarray(
        np.random.default_rng(7).standard_normal((4, 6, 480)) * 0.1, jnp.float32
    )
    s1, ys = dfn3.dfn_frames(params, state, frames)
    assert ys.shape == (4, 6, 480)
    assert np.all(np.isfinite(np.asarray(ys)))


# --------------------------- suppressor engine ---------------------------


def test_engine_model_registry():
    assert suppressor.model_latency_ms("rnnoise") == 10.0
    assert suppressor.model_latency_ms("deepfilter-ll") == 10.0
    assert suppressor.model_latency_ms("deepfilter") == 30.0
    with pytest.raises(ValueError):
        suppressor.model_latency_ms("spectral-gate")


def test_engine_deepfilter_env_gate(monkeypatch):
    monkeypatch.delenv("AUDIOFORGE_ENABLE_DEEPFILTER", raising=False)
    eng = suppressor.engine_init("deepfilter-ll")
    d = suppressor.engine_diagnostics(eng)
    assert not d["backend_available"]
    # passthrough at the model latency
    x = np.arange(960, dtype=np.float32)
    eng, _ = suppressor.engine_push(eng, x)
    eng, out = suppressor.engine_pop(eng, 960)
    np.testing.assert_allclose(out[480:], x[:480 if len(out) == 960 else 0], atol=1e-6)

    monkeypatch.setenv("AUDIOFORGE_ENABLE_DEEPFILTER", "1")
    # the standard variant ships a trained archive -> available once the
    # env gate opens
    eng2 = suppressor.engine_init("deepfilter")
    assert suppressor.engine_diagnostics(eng2)["backend_available"]
    # the LL variant has no trained archive committed yet: the env gate
    # alone must NOT run it on seeded structural weights (it refuses and
    # stays passthrough rather than emitting garbage gains)
    if dfn3.weights_source(True) == "seeded":
        eng3 = suppressor.engine_init("deepfilter-ll")
        assert not suppressor.engine_diagnostics(eng3)["backend_available"]


def test_engine_rnnoise_roundtrip():
    eng = suppressor.engine_init("rnnoise", strength=1.0)
    x = np.random.default_rng(8).standard_normal(1440).astype(np.float32) * 0.1
    eng, n = suppressor.engine_push(eng, x)
    assert n == 1440
    eng, nf = suppressor.engine_process(eng)
    assert nf == 3
    eng, out = suppressor.engine_pop(eng, 1440)
    assert len(out) == 1440
    d = suppressor.engine_diagnostics(eng)
    assert d["model"] == "rnnoise" and not d["backend_failed"]


# --------------------------- VAD auto-gate ---------------------------


def _run_gate_blocks(cfg, st, rms_db_seq, prob_seq):
    outs = []
    for rms, p in zip(rms_db_seq, prob_seq):
        st, out = vad_gate.vad_gate_process(
            cfg, st, jnp.float32(rms), jnp.float32(p), True, 480
        )
        outs.append({k: np.asarray(v) for k, v in out.items()})
    return st, outs


def test_vad_gate_noise_floor_tracking():
    cfg = vad_gate.VadGateConfig(gate_mode=vad_gate.VAD_ASSISTED)
    st = vad_gate.vad_gate_init(cfg)
    # feed 300 low-posterior blocks at -55 dB: floor should approach -55
    st, outs = _run_gate_blocks(cfg, st, [-55.0] * 300, [0.05] * 300)
    floor = float(outs[-1]["noise_floor_db"])
    assert -58.0 < floor < -52.0, floor
    assert float(outs[-1]["reliability"]) > 0.5
    # threshold = floor + margin (10)
    assert abs(float(outs[-1]["threshold_db"]) - (floor + 10.0)) < 1e-4


def test_vad_gate_hold_and_debounce():
    cfg = vad_gate.VadGateConfig(gate_mode=vad_gate.VAD_ONLY, hold_time_ms=200.0)
    st = vad_gate.vad_gate_init(cfg)
    # speech opens the gate
    st, outs = _run_gate_blocks(cfg, st, [-30.0] * 5, [0.9] * 5)
    assert bool(outs[-1]["gate_open"])
    # drop the posterior: hold keeps it open for ~200ms (20 blocks of 10ms)
    st, outs = _run_gate_blocks(cfg, st, [-30.0] * 19, [0.1] * 19)
    assert bool(outs[0]["gate_open"])
    assert bool(outs[17]["gate_open"])
    st, outs = _run_gate_blocks(cfg, st, [-30.0] * 3, [0.1] * 3)
    assert not bool(outs[-1]["gate_open"])


def test_vad_gate_speech_not_in_floor():
    """High-posterior blocks must not pull the floor up
    (`vad.rs:734-760` eligibility gate)."""
    cfg = vad_gate.VadGateConfig()
    st = vad_gate.vad_gate_init(cfg)
    st, outs = _run_gate_blocks(cfg, st, [-60.0] * 260, [0.05] * 260)
    floor_before = float(outs[-1]["noise_floor_db"])
    st, outs = _run_gate_blocks(cfg, st, [-20.0] * 100, [0.95] * 100)
    floor_after = float(outs[-1]["noise_floor_db"])
    assert abs(floor_after - floor_before) < 0.5


class TestDeepFilterOptIn:
    def test_engine_env_gated(self, monkeypatch):
        from audioforge_tpu.models import suppressor as supp

        monkeypatch.delenv("AUDIOFORGE_ENABLE_DEEPFILTER", raising=False)
        eng = supp.engine_init("deepfilter-ll")
        assert eng["backend_available"] is False
        # passthrough preserves the model's latency
        x = np.full(960, 0.25, np.float32)
        eng, _ = supp.engine_push(eng, x)
        eng, _ = supp.engine_process(eng)
        eng, out = supp.engine_pop(eng, 960)
        assert out.size == 960
        assert np.all(out[: eng["latency_samples"]] == 0.0)

    def test_engine_refuses_seeded_weights(self, monkeypatch):
        """A DeepFilter variant whose archive is missing must NOT silently
        run seeded structural weights: it reports backend unavailable and
        passes audio through at the model latency, mirroring the
        reference's backend-failed semantics
        (`noise_suppressor.rs:216-261`)."""
        from audioforge_tpu.models import dfn3
        from audioforge_tpu.models import suppressor as supp

        monkeypatch.setenv("AUDIOFORGE_ENABLE_DEEPFILTER", "1")
        monkeypatch.setattr(dfn3, "weights_source", lambda ll=True: "seeded")
        eng = supp.engine_init("deepfilter-ll")
        assert eng["backend_available"] is False
        assert "seeded" in (eng["error"] or "")
        x = np.full(960, 0.25, np.float32)
        eng, _ = supp.engine_push(eng, x)
        eng, _ = supp.engine_process(eng)
        eng, out = supp.engine_pop(eng, 960)
        lat = eng["latency_samples"]
        assert np.all(out[:lat] == 0.0)
        np.testing.assert_allclose(out[lat:], x[: out.size - lat], atol=1e-6)
        # explicit params opt back in to the structural graph (training path)
        eng2 = supp.engine_init("deepfilter-ll", dfn_params=dfn3.init_params())
        assert eng2["backend_available"] is True

    def test_engine_processes_when_enabled(self, monkeypatch, rng):
        from audioforge_tpu.models import suppressor as supp

        monkeypatch.setenv("AUDIOFORGE_ENABLE_DEEPFILTER", "1")
        # standard variant: trained archive committed, so the env gate is
        # the only thing between the engine and a running backend
        eng = supp.engine_init("deepfilter")
        assert eng["backend_available"] is True
        x = (0.1 * rng.standard_normal(1920)).astype(np.float32)
        eng, _ = supp.engine_push(eng, x)
        eng, n = supp.engine_process(eng)
        assert n > 0
        eng, out = supp.engine_pop(eng, 1920)
        assert np.all(np.isfinite(out))
        d = supp.engine_diagnostics(eng)
        assert d["model"] == "deepfilter"
        assert not d["backend_failed"]

    def test_processor_model_switch_gated(self, monkeypatch):
        from audioforge_tpu.runtime.processor import AudioProcessor

        p = AudioProcessor()
        monkeypatch.delenv("AUDIOFORGE_ENABLE_DEEPFILTER", raising=False)
        assert p.set_noise_model("deepfilter") is False
        monkeypatch.setenv("AUDIOFORGE_ENABLE_DEEPFILTER", "1")
        assert p.set_noise_model("deepfilter") is True
        assert p.get_noise_model() == "deepfilter"
        assert ("deepfilter", "DeepFilterNet3") in p.list_noise_models()


class TestMxuDft:
    """ops/dft.py — fixed-size real DFT as MXU matmuls (the suppressors'
    960-pt transforms; XLA's FFT custom call cannot fuse inside the
    serving engine's large scans, measured +13 ms/block at fleet 256)."""

    def test_forward_matches_rfft(self, rng):
        import jax.numpy as jnp

        from audioforge_tpu.ops.dft import rdft

        x = jnp.asarray(rng.standard_normal((4, 960)).astype(np.float32))
        ref = jnp.fft.rfft(x, axis=-1)
        got = rdft(x, 960)
        rel = float(jnp.max(jnp.abs(got - ref)) / jnp.max(jnp.abs(ref)))
        assert rel < 1e-5

    def test_inverse_matches_irfft(self, rng):
        import jax.numpy as jnp

        from audioforge_tpu.ops.dft import irdft

        x = jnp.asarray(rng.standard_normal((4, 960)).astype(np.float32))
        X = jnp.fft.rfft(x, axis=-1)
        ref = jnp.fft.irfft(X, n=960, axis=-1)
        got = irdft(X, 960)
        assert float(jnp.max(jnp.abs(got - ref))) < 1e-5

    def test_roundtrip_within_parity_budget(self, rng):
        import jax.numpy as jnp

        from audioforge_tpu.ops.dft import irdft, rdft

        x = jnp.asarray(rng.standard_normal((2, 960)).astype(np.float32))
        rt = irdft(rdft(x, 960), 960)
        rms = float(jnp.sqrt(jnp.mean((rt - x) ** 2)))
        assert rms < 1e-5  # well inside the 1e-4 chain parity budget

    def test_odd_length_inverse_weighting(self, rng):
        import jax.numpy as jnp

        from audioforge_tpu.ops.dft import irdft, rdft

        x = jnp.asarray(rng.standard_normal((3, 15)).astype(np.float32))
        rt = irdft(rdft(x, 15), 15)
        assert float(jnp.max(jnp.abs(rt - x))) < 1e-5

    def test_auto_variants_dispatch_on_backend(self, rng):
        import jax
        import jax.numpy as jnp

        from audioforge_tpu.ops.dft import irdft_auto, rdft_auto

        x = jnp.asarray(rng.standard_normal((2, 960)).astype(np.float32))
        X = rdft_auto(x, 960)
        y = irdft_auto(X, 960)
        # on the CPU test backend these are pocketfft; either way the
        # round trip must hold
        assert jax.default_backend() == "cpu"
        assert float(jnp.max(jnp.abs(y - x))) < 1e-4

    def test_constants_survive_cross_trace_reuse(self, rng):
        """The DFT matrices are cached as numpy: a jnp constant first
        materialized inside one jit trace would leak its tracer into
        later traces (regression: serving evaluator fleet sweep)."""
        import jax
        import jax.numpy as jnp

        from audioforge_tpu.ops.dft import rdft

        x = jnp.asarray(rng.standard_normal((2, 960)).astype(np.float32))

        @jax.jit
        def first(x):
            return jnp.sum(jnp.abs(rdft(x, 960)))

        @jax.jit
        def second(x):
            return jnp.sum(jnp.real(rdft(x, 960)))

        assert np.isfinite(float(first(x)))
        assert np.isfinite(float(second(x)))  # raised UnexpectedTracerError
