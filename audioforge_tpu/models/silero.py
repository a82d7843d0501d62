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

The network itself is re-implemented natively (the reference treats it as an
ONNX black box): magnitude-STFT features, a small conv encoder, a 2-layer
LSTM whose per-layer (h, c) pair packs into the ``[2, batch, 128]`` state
exactly like the ONNX wrapper, and a sigmoid head. ``load_weights`` accepts
a numpy archive converted offline from the official ONNX release; without
one, deterministic seeded weights keep the full pipeline exercisable
end-to-end (shape/state/latency/control behaviour are bit-compatible with
the real weights path).
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
_N_BINS = _STFT_N // 2 + 1  # 129
_ENC_DIM = 128
_LSTM_HIDDEN = 64
_N_LAYERS = 2
_STATE_DIM = 2 * _LSTM_HIDDEN  # h||c per layer -> 128


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
    """Deterministic random-initialised parameters with the production
    architecture shapes. Replace via :func:`load_weights` when converted
    official weights are available."""
    rng = np.random.default_rng(seed)

    def w(*shape, scale=None):
        scale = scale or (1.0 / np.sqrt(shape[-1]))
        return jnp.asarray(rng.normal(0.0, scale, shape), jnp.float32)

    params = {
        # conv encoder over STFT magnitudes: (bins -> 128) pointwise + two
        # depth-3 temporal convs
        "enc_w0": w(_N_BINS, _ENC_DIM),
        "enc_b0": jnp.zeros((_ENC_DIM,), jnp.float32),
        "enc_w1": w(3, _ENC_DIM, _ENC_DIM, scale=1.0 / np.sqrt(3 * _ENC_DIM)),
        "enc_b1": jnp.zeros((_ENC_DIM,), jnp.float32),
        "head_w": w(_LSTM_HIDDEN, 1),
        "head_b": jnp.zeros((1,), jnp.float32),
    }
    for layer in range(_N_LAYERS):
        in_dim = _ENC_DIM if layer == 0 else _LSTM_HIDDEN
        params[f"lstm{layer}_wi"] = w(in_dim, 4 * _LSTM_HIDDEN)
        params[f"lstm{layer}_wh"] = w(_LSTM_HIDDEN, 4 * _LSTM_HIDDEN)
        params[f"lstm{layer}_b"] = jnp.zeros((4 * _LSTM_HIDDEN,), jnp.float32)
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
    params = {k: jnp.asarray(data[k], jnp.float32) for k in data.files}
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
            _DEFAULT_PARAMS_CACHE["source"] = "converted"
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


def _stft_mag(x):
    """Magnitude STFT features of a [B, 576] model input: 256-window /
    128-hop frames -> [B, frames, 129]."""
    B = x.shape[0]
    n_frames = (MODEL_INPUT_SIZE - _STFT_N) // _STFT_HOP + 1  # 3
    idx = jnp.arange(n_frames)[:, None] * _STFT_HOP + jnp.arange(_STFT_N)[None, :]
    frames = x[:, idx]  # [B, frames, 256]
    win = jnp.asarray(np.hanning(_STFT_N), jnp.float32)
    spec = jnp.fft.rfft(frames * win, axis=-1)
    return jnp.abs(spec).astype(jnp.float32)


@jax.jit
def silero_infer(params, audio_576, state):
    """One batched inference step.

    ``audio_576``: ``[B, 576]`` (context + window, pre-gain already
    applied); ``state``: ``[2, B, 128]`` (per layer ``h || c``). Returns
    ``(prob [B], new_state)`` with the raw (uncalibrated) posterior.
    """
    B = audio_576.shape[0]
    feats = _stft_mag(audio_576)  # [B, F, 129]
    h = jnp.log1p(feats)
    h = jax.nn.relu(h @ params["enc_w0"] + params["enc_b0"])  # [B, F, 128]
    # temporal conv (causal, width 3)
    hp = jnp.pad(h, ((0, 0), (2, 0), (0, 0)))
    stacked = jnp.stack([hp[:, 0:-2], hp[:, 1:-1], hp[:, 2:]], axis=2)  # [B,F,3,D]
    h = jax.nn.relu(
        jnp.einsum("bfki,kio->bfo", stacked, params["enc_w1"]) + params["enc_b1"]
    )  # [B, F, 128]

    new_states = []
    x_seq = h  # [B, F, D]
    for layer in range(_N_LAYERS):
        hc = state[layer]  # [B, 128]
        h0, c0 = hc[:, :_LSTM_HIDDEN], hc[:, _LSTM_HIDDEN:]
        wi = params[f"lstm{layer}_wi"]
        wh = params[f"lstm{layer}_wh"]
        b = params[f"lstm{layer}_b"]

        def cell(carry, x_t):
            hprev, cprev = carry
            gates = x_t @ wi + hprev @ wh + b
            i, f, g, o = jnp.split(gates, 4, axis=-1)
            c = jax.nn.sigmoid(f) * cprev + jax.nn.sigmoid(i) * jnp.tanh(g)
            hnew = jax.nn.sigmoid(o) * jnp.tanh(c)
            return (hnew, c), hnew

        (hN, cN), out_seq = jax.lax.scan(
            cell, (h0, c0), jnp.swapaxes(x_seq, 0, 1)
        )
        x_seq = jnp.swapaxes(out_seq, 0, 1)
        new_states.append(jnp.concatenate([hN, cN], axis=-1))

    logits = x_seq[:, -1, :] @ params["head_w"] + params["head_b"]
    prob = jax.nn.sigmoid(logits)[:, 0]
    return prob, jnp.stack(new_states, axis=0)


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
