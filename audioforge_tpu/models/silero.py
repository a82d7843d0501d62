"""Silero-style voice activity detection as batched XLA inference.

Contract mirrors the reference's Silero v6.2.1 integration
(`rust-core/src/dsp/vad.rs`):

- Model input: ``[batch, 576]`` at 16 kHz — 64 samples of rolling raw-audio
  context followed by the current 512-sample (32 ms) window
  (`vad.rs:44-51,372-391`); ``sr`` is fixed at 16000; recurrent state is a
  ``[2, batch, 128]`` tensor round-tripped every call (`vad.rs:430-460`).
- 48 kHz feeds are anti-alias resampled 3:1 with a 31-tap windowed sinc
  (`vad.rs:64,530-578`); optional pre-gain (min 0.1) boosts weak signals
  (`vad.rs:322-328`).
- One inference consumes exactly one window; the raw posterior is EMA
  smoothed (factor 0.5 toward the new value) and then Platt-calibrated with
  ``sigmoid(0.6923 * logit(p) + 0.0861)`` (`vad.rs:53-55,287-296,468-477`).

The network is the published Silero architecture (v5/v6 16 kHz branch)
re-expressed op-for-op as native XLA (the reference treats it as an ONNX
black box; the graph here matches the official release's own tensors so
converted weights bind 1:1):

- **STFT block**: the exported graph owns one tensor,
  ``stft.forward_basis_buffer [258, 1, 256]`` — a hann-windowed 256-point
  Fourier basis (129 real rows + 129 imaginary rows) applied as a stride-128
  conv after right reflect-padding the 576-sample input by 64 → 4 frames;
  magnitude = sqrt(re² + im²) → ``[B, 129, 4]``.
- **Encoder**: four ``reparam_conv`` Conv1d+ReLU blocks (kernel 3, pad 1),
  129→128 (stride 1), 128→64 (stride 2), 64→64 (stride 2), 64→128
  (stride 1): time 4 → 4 → 2 → 1.
- **Decoder**: one ``LSTMCell(128, 128)`` whose (h, c) pair IS the
  ``[2, batch, 128]`` recurrent tensor the reference round-trips
  (`vad.rs:430-460`), then ReLU → Conv1d(128→1, k=1) → sigmoid.

``ONNX_NAME_MAP`` pins each framework key to the official checkpoint tensor
name — the committed conversion contract for
``tools/convert_model_weights.py``. Structural facts above are pinned by
the key/shape contract; two graph details (the reflect-pad side and which
two encoder convs carry stride 2) cannot change any tensor shape and are
flagged in ``docs/silero_graph.md`` for numeric confirmation against the
official runtime once archives can be produced. ``load_weights`` accepts a
numpy archive converted offline from the official release; without one,
deterministic seeded weights (with the EXACT analytic STFT basis) keep the
full pipeline exercisable end-to-end.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from ..ops.resample import decimate3, decimate3_init

__all__ = [
    "SAMPLE_RATE",
    "WINDOW_SIZE",
    "CONTEXT_SIZE",
    "MODEL_INPUT_SIZE",
    "CALIBRATION_A",
    "CALIBRATION_B",
    "calibrate_probability",
    "init_params",
    "load_weights",
    "default_params",
    "weights_source",
    "discover_model_path",
    "silero_infer",
    "vad_stream_init",
    "vad_stream_process",
    "analyze_vad_probabilities",
]

SAMPLE_RATE = 16000
WINDOW_SIZE = 512
CONTEXT_SIZE = 64
MODEL_INPUT_SIZE = CONTEXT_SIZE + WINDOW_SIZE  # 576
CALIBRATION_A = 0.6922877
CALIBRATION_B = 0.08612386

_STFT_N = 256
_STFT_HOP = 128
_STFT_PAD = 64  # right reflect pad: (576 + 64 - 256) // 128 + 1 = 4 frames
_N_BINS = _STFT_N // 2 + 1  # 129
_N_FRAMES = (MODEL_INPUT_SIZE + _STFT_PAD - _STFT_N) // _STFT_HOP + 1  # 4
_LSTM_HIDDEN = 128
# encoder blocks: (in_ch, out_ch, stride); kernel 3, symmetric zero pad 1
_ENC_SPEC = ((_N_BINS, 128, 1), (128, 64, 2), (64, 64, 2), (64, 128, 1))
_N_LAYERS = 2  # state planes: h and c of the single LSTMCell (NOT layers)
_STATE_DIM = _LSTM_HIDDEN

# committed conversion contract: framework key -> tensor name in the
# official Silero checkpoint (the jit/ONNX export's state dict). Feed to
# tools/convert_model_weights.py as the default --name-map for silero.
ONNX_NAME_MAP = {
    "stft_basis": "_model.stft.forward_basis_buffer",
    "enc0_w": "_model.encoder.0.reparam_conv.weight",
    "enc0_b": "_model.encoder.0.reparam_conv.bias",
    "enc1_w": "_model.encoder.1.reparam_conv.weight",
    "enc1_b": "_model.encoder.1.reparam_conv.bias",
    "enc2_w": "_model.encoder.2.reparam_conv.weight",
    "enc2_b": "_model.encoder.2.reparam_conv.bias",
    "enc3_w": "_model.encoder.3.reparam_conv.weight",
    "enc3_b": "_model.encoder.3.reparam_conv.bias",
    "lstm_wi": "_model.decoder.rnn.weight_ih",
    "lstm_wh": "_model.decoder.rnn.weight_hh",
    "lstm_bi": "_model.decoder.rnn.bias_ih",
    "lstm_bh": "_model.decoder.rnn.bias_hh",
    "head_w": "_model.decoder.decoder.2.weight",
    "head_b": "_model.decoder.decoder.2.bias",
}


def stft_basis_analytic():
    """The analytic value of ``stft.forward_basis_buffer``: hann-windowed
    256-point Fourier basis, 129 real rows then 129 imaginary rows,
    ``[258, 1, 256]`` (torch-stft layout). The official buffer IS this
    matrix, so seeded mode computes the exact production STFT."""
    n = _STFT_N
    basis = np.fft.fft(np.eye(n))[: _N_BINS]
    window = np.hanning(n + 1)[:n]  # periodic hann, torch.hann_window
    full = np.concatenate([basis.real, basis.imag], axis=0) * window
    return jnp.asarray(full[:, None, :], jnp.float32)


def calibrate_probability(probability):
    """Platt calibration (`vad.rs:468-477`); exact constants from the
    v6.2.1 evaluation (`evaluation/vad-v6.2.1-report.json`)."""
    p = jnp.asarray(probability, jnp.float32)
    eps = 1e-6
    bounded = jnp.clip(p, eps, 1.0 - eps)
    logit = jnp.log(bounded / (1.0 - bounded))
    transformed = jnp.clip(CALIBRATION_A * logit + CALIBRATION_B, -30.0, 30.0)
    out = jnp.clip(1.0 / (1.0 + jnp.exp(-transformed)), 0.0, 1.0)
    return jnp.where(jnp.isfinite(p), out, 0.0)


def init_params(seed: int = 0x51E0):
    """Deterministic parameters with the official checkpoint's exact
    key/shape contract (see ``ONNX_NAME_MAP``). The STFT basis is the true
    analytic buffer; learned tensors are seeded (replace via
    :func:`load_weights` when converted official weights are available)."""
    rng = np.random.default_rng(seed)

    def w(*shape):
        scale = 1.0 / np.sqrt(np.prod(shape[1:]))
        return jnp.asarray(rng.normal(0.0, scale, shape), jnp.float32)

    params = {"stft_basis": stft_basis_analytic()}
    for i, (cin, cout, _stride) in enumerate(_ENC_SPEC):
        params[f"enc{i}_w"] = w(cout, cin, 3)  # torch Conv1d layout
        params[f"enc{i}_b"] = jnp.zeros((cout,), jnp.float32)
    # torch LSTMCell tensors: weight_ih/hh [4*hidden, in], gate order ifgo
    params["lstm_wi"] = w(4 * _LSTM_HIDDEN, _LSTM_HIDDEN)
    params["lstm_wh"] = w(4 * _LSTM_HIDDEN, _LSTM_HIDDEN)
    params["lstm_bi"] = jnp.zeros((4 * _LSTM_HIDDEN,), jnp.float32)
    params["lstm_bh"] = jnp.zeros((4 * _LSTM_HIDDEN,), jnp.float32)
    params["head_w"] = w(1, _LSTM_HIDDEN, 1)  # Conv1d(128 -> 1, k=1)
    params["head_b"] = jnp.zeros((1,), jnp.float32)
    return params


def _validate_loaded(params, reference):
    """Converted archives must structurally match the framework graph."""
    missing = set(reference) - set(params)
    extra = set(params) - set(reference)
    if missing or extra:
        raise ValueError(
            f"weight archive key mismatch: missing={sorted(missing)} "
            f"extra={sorted(extra)}"
        )
    for key, ref in reference.items():
        if params[key].shape != ref.shape:
            raise ValueError(
                f"weight {key!r} shape {params[key].shape} != expected "
                f"{ref.shape}"
            )
    return params


def load_weights(path):
    """Load converted weights from a ``.npz`` archive (produced offline from
    the official ONNX release by ``tools/convert_model_weights.py``),
    validated against the framework graph's key/shape contract."""
    data = np.load(path)
    params = {k: jnp.asarray(data[k], jnp.float32) for k in data.files
              if not k.startswith("__")}
    return _validate_loaded(params, init_params())


def discover_model_path():
    """Weight-archive discovery mirroring the reference's model lookup
    (`vad.rs:133-184`): ``VAD_MODEL_PATH`` env first, then ``models/`` next
    to the package root. Returns None when nothing is found."""
    import os
    from pathlib import Path

    env = os.environ.get("VAD_MODEL_PATH")
    if env and Path(env).is_file():
        return Path(env)
    candidate = (
        Path(__file__).resolve().parents[2] / "models" / "silero_vad.npz"
    )
    return candidate if candidate.is_file() else None


_DEFAULT_PARAMS_CACHE: dict = {}


def default_params():
    """Resolve the default weight set once per process: a discovered
    converted archive (:func:`discover_model_path`) wins; otherwise the
    seeded structural weights. :func:`weights_source` reports which —
    callers that gate on posterior quality (e.g. the microphone-noise
    capture contract) must check it."""
    if "params" not in _DEFAULT_PARAMS_CACHE:
        path = discover_model_path()
        if path is not None:
            _DEFAULT_PARAMS_CACHE["params"] = load_weights(path)
            data = np.load(path)
            _DEFAULT_PARAMS_CACHE["source"] = (
                str(np.asarray(data["__provenance__"]).item())
                if "__provenance__" in data.files else "converted")
        else:
            _DEFAULT_PARAMS_CACHE["params"] = init_params()
            _DEFAULT_PARAMS_CACHE["source"] = "seeded"
    return _DEFAULT_PARAMS_CACHE["params"]


def weights_source() -> str:
    """``"converted"`` when a real weight archive is loaded, else
    ``"seeded"`` (structural weights — posteriors are shape-correct but
    not discriminative on real speech)."""
    default_params()
    return _DEFAULT_PARAMS_CACHE["source"]


def _stft_mag(params, x):
    """The exported STFT block: right reflect pad 64 then the
    ``forward_basis_buffer`` as a stride-128 conv; magnitude over the
    129-bin real/imag split -> ``[B, 4, 129]`` (frame-major here; the
    channel-major torch layout is restored by the caller's einsums)."""
    xp = jnp.concatenate([x, x[:, -2 : -2 - _STFT_PAD : -1]], axis=-1)
    idx = (jnp.arange(_N_FRAMES)[:, None] * _STFT_HOP
           + jnp.arange(_STFT_N)[None, :])
    frames = xp[:, idx]  # [B, 4, 256]
    basis = params["stft_basis"][:, 0, :]  # [258, 256]
    proj = jnp.einsum("bfn,cn->bfc", frames, basis)  # [B, 4, 258]
    re, im = proj[..., :_N_BINS], proj[..., _N_BINS:]
    return jnp.sqrt(re * re + im * im + 1e-12)


def _conv1d_k3(h, w, b, stride):
    """torch ``Conv1d(k=3, padding=1)`` on ``[B, T, Cin]`` with weight in
    the checkpoint's ``[Cout, Cin, 3]`` layout -> ``[B, T', Cout]``."""
    hp = jnp.pad(h, ((0, 0), (1, 1), (0, 0)))
    t_out = (h.shape[1] + 2 - 3) // stride + 1
    taps = jnp.arange(t_out) * stride
    stacked = jnp.stack(
        [hp[:, taps], hp[:, taps + 1], hp[:, taps + 2]], axis=2
    )  # [B, T', 3, Cin]
    return jnp.einsum("btki,oik->bto", stacked, w) + b


@jax.jit
def silero_infer(params, audio_576, state):
    """One batched inference step of the production graph.

    ``audio_576``: ``[B, 576]`` (64 context + 512 window, pre-gain already
    applied); ``state``: ``[2, B, 128]`` — plane 0 is the LSTMCell ``h``,
    plane 1 its ``c``, exactly the tensor the reference round-trips through
    ONNX Runtime (`vad.rs:430-460`). Returns ``(prob [B], new_state)`` with
    the raw (uncalibrated) posterior."""
    h = _stft_mag(params, audio_576)  # [B, 4, 129]
    for i, (_cin, _cout, stride) in enumerate(_ENC_SPEC):
        h = jax.nn.relu(
            _conv1d_k3(h, params[f"enc{i}_w"], params[f"enc{i}_b"], stride)
        )
    x_t = h[:, 0, :]  # encoder reduces time 4 -> 1

    h0, c0 = state[0], state[1]
    gates = (x_t @ params["lstm_wi"].T + h0 @ params["lstm_wh"].T
             + params["lstm_bi"] + params["lstm_bh"])
    i_g, f_g, g_g, o_g = jnp.split(gates, 4, axis=-1)  # torch ifgo order
    c1 = jax.nn.sigmoid(f_g) * c0 + jax.nn.sigmoid(i_g) * jnp.tanh(g_g)
    h1 = jax.nn.sigmoid(o_g) * jnp.tanh(c1)

    # decoder: ReLU -> Conv1d(128 -> 1, k=1) -> sigmoid
    logits = jax.nn.relu(h1) @ params["head_w"][0, :, 0] + params["head_b"][0]
    prob = jax.nn.sigmoid(logits)
    return prob, jnp.stack([h1, c1], axis=0)


# ---------------------------------------------------------------------------
# Streaming wrapper (the realtime worker path)
# ---------------------------------------------------------------------------


def vad_stream_init(sample_rate: int = 48000, threshold: float = 0.5,
                    smoothing: float = 0.5, pre_gain: float = 1.0,
                    params=None):
    """Streaming single-stream state mirroring ``SileroVAD``
    (`vad.rs:198-249`); batched inference goes through
    :func:`silero_infer` directly."""
    if sample_rate not in (16000, 48000):
        raise ValueError("sample_rate must be 16000 or 48000")
    if params is None:
        params = default_params()
    window_in = WINDOW_SIZE * (sample_rate // SAMPLE_RATE)
    return {
        "params": params,
        "config": {
            "sample_rate": sample_rate,
            "threshold": float(threshold),
            "smoothing": float(smoothing),
            "pre_gain": float(max(pre_gain, 0.1)),
            "window_in": window_in,
        },
        "buffer": np.zeros(0, np.float32),
        "context": jnp.zeros(CONTEXT_SIZE, jnp.float32),
        "lstm_state": jnp.zeros((_N_LAYERS, 1, _STATE_DIM), jnp.float32),
        "dec3": decimate3_init(),
        "smoothed_prob": float(0.0),
        "has_inference": False,
    }


def vad_stream_process(state, samples):
    """Feed samples (1-D numpy/array at the configured rate); consumes at
    most ONE inference window per call like the reference (`vad.rs:251-296`).
    Returns ``(state, calibrated_probability)``."""
    cfg = state["config"]
    buf = np.concatenate([state["buffer"], np.asarray(samples, np.float32)])
    win = cfg["window_in"]
    if len(buf) < win:
        state = dict(state, buffer=buf)
        return state, float(
            calibrate_probability(jnp.float32(state["smoothed_prob"]))
        )

    window, buf = buf[:win], buf[win:]
    if cfg["sample_rate"] == 48000:
        d3, w16 = decimate3(state["dec3"], jnp.asarray(window))
        w16 = np.asarray(w16)[:WINDOW_SIZE]
    else:
        d3 = state["dec3"]
        w16 = window[:WINDOW_SIZE]
    if len(w16) < WINDOW_SIZE:
        w16 = np.pad(w16, (0, WINDOW_SIZE - len(w16)))

    model_in = (
        jnp.concatenate([state["context"], jnp.asarray(w16)])[None, :]
        * cfg["pre_gain"]
    )
    prob, new_lstm = silero_infer(state["params"], model_in, state["lstm_state"])
    prob = float(jnp.clip(prob[0], 0.0, 1.0))
    if state["has_inference"]:
        smoothed = cfg["smoothing"] * prob + (1.0 - cfg["smoothing"]) * state["smoothed_prob"]
    else:
        smoothed = prob
    new_state = dict(
        state,
        buffer=buf,
        context=jnp.asarray(w16[WINDOW_SIZE - CONTEXT_SIZE:]),
        lstm_state=new_lstm,
        dec3=d3,
        smoothed_prob=smoothed,
        has_inference=True,
    )
    return new_state, float(calibrate_probability(jnp.float32(smoothed)))


def analyze_vad_probabilities(audio, sample_rate, threshold=0.48, params=None):
    """Offline batched posteriors, one per model window; the final partial
    window is zero-padded (`python_api.rs:749-790`). Returns a list of
    calibrated probabilities at the window cadence."""
    if sample_rate not in (16000, 48000):
        raise ValueError("sample_rate must be 16000 or 48000")
    x = np.asarray(audio, np.float32)
    if params is None:
        params = default_params()
    win_in = WINDOW_SIZE * (sample_rate // SAMPLE_RATE)
    n_windows = -(-len(x) // win_in) if len(x) else 0
    if n_windows == 0:
        return []
    padded = np.zeros(n_windows * win_in, np.float32)
    padded[: len(x)] = x
    if sample_rate == 48000:
        d3 = decimate3_init()
        _, x16 = decimate3(d3, jnp.asarray(padded))
        x16 = np.asarray(x16)
    else:
        x16 = padded
    windows = x16.reshape(n_windows, WINDOW_SIZE)

    # context is the previous window's tail, known up front — only the
    # LSTM state chains, so the whole take runs as ONE lax.scan device call
    # (the reference loops windows through ONNX Runtime serially,
    # `python_api.rs:749-790`)
    ctx0 = np.zeros((1, CONTEXT_SIZE), np.float32)
    contexts = np.concatenate(
        [ctx0, windows[:-1, WINDOW_SIZE - CONTEXT_SIZE:]], axis=0
    )
    model_ins = jnp.asarray(
        np.concatenate([contexts, windows], axis=1)[:, None, :], jnp.float32
    )  # (n_windows, 1, 576)
    probs = np.asarray(_offline_windows(params, model_ins))
    return [float(v) for v in probs]


@jax.jit
def _offline_windows(params, model_ins):
    """Scan the stateful model over pre-built windows; applies the 0.5
    smoothing EMA and Platt calibration per window."""
    lstm0 = jnp.zeros((_N_LAYERS, 1, _STATE_DIM), jnp.float32)

    def body(carry, model_in):
        lstm, smoothed, has = carry
        p, lstm = silero_infer(params, model_in, lstm)
        p = jnp.clip(p[0], 0.0, 1.0)
        smoothed = jnp.where(has, 0.5 * p + 0.5 * smoothed, p)
        return (lstm, smoothed, jnp.bool_(True)), calibrate_probability(smoothed)

    _, out = jax.lax.scan(
        body, (lstm0, jnp.float32(0.0), jnp.bool_(False)), model_ins
    )
    return out
