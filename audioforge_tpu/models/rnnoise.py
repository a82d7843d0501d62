"""RNNoise-style noise suppression as batched XLA inference.

The reference ships RNNoise via the pure-Rust ``nnnoiseless`` crate wrapped
in a frame-staging processor (`rust-core/src/dsp/rnnoise.rs`):

- 480-sample (10 ms) frames buffered through fixed rings
  (`rnnoise.rs:9-11,122-164`); model I/O scaled ±1.0 -> PCM ±32768 with a
  soft-clip knee at 0.98 (`rnnoise.rs:13-19,88-111`).
- Wet/dry strength smoothed with a 15 ms per-frame EMA
  (`rnnoise.rs:33-41,79-86`); ``soft_reset`` clears staging but preserves
  the learned recurrent state (`rnnoise.rs:224-231`); latency is one frame
  = 480 samples (`rnnoise.rs:313-315`).

The network here is the RNNoise architecture re-implemented natively:
Vorbis-windowed 960-point STFT at 480 hop, 22 triangular Bark-scale band
energies (the Opus ``eband5ms`` layout), cepstral features with first/second
deltas plus pitch-correlation features, the dense->GRU(24)->GRU(48)->
GRU(96)->dense stack producing 22 band gains and a VAD output, per-bin gain
interpolation, and overlap-add synthesis. ``load_weights`` accepts a
converted numpy archive of the published RNNoise weights; otherwise seeded
deterministic weights keep the pipeline exercisable (staging, latency,
wet/dry and reset semantics are weight-independent).

Everything is expressed over a leading batch axis: a fleet of streams (or
evaluation corpus clips) denoises in ONE device call per frame step.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from ..ops.dft import irdft_auto, rdft_auto

__all__ = [
    "FRAME_SIZE",
    "WINDOW_SIZE",
    "FREQ_SIZE",
    "NB_BANDS",
    "init_params",
    "load_weights",
    "rnnoise_state_init",
    "rnnoise_frame",
    "rnnoise_frames",
    "processor_init",
    "processor_push",
    "processor_process",
    "processor_pop",
    "processor_soft_reset",
    "LATENCY_SAMPLES",
]

FRAME_SIZE = 480
WINDOW_SIZE = 960
FREQ_SIZE = WINDOW_SIZE // 2 + 1  # 481
NB_BANDS = 22
NB_FEATURES = 42
LATENCY_SAMPLES = FRAME_SIZE

PCM_SCALE = 32768.0
PCM_MODEL_LIMIT = 32760.0
SOFT_CLIP_THRESHOLD = 0.98

# Opus 5 ms band edges scaled x4 for the 960-point DFT (bin units; top bin
# 400 = 20 kHz at 48 kHz) — the standard RNNoise band layout.
_EBAND5MS = np.array(
    [0, 1, 2, 3, 4, 5, 6, 7, 8, 10, 12, 14, 16, 20, 24, 28, 34, 40, 48, 60, 78, 100]
)
_BAND_EDGES = _EBAND5MS * 4


def _vorbis_window() -> np.ndarray:
    n = np.arange(WINDOW_SIZE)
    s = np.sin(np.pi * (n + 0.5) / WINDOW_SIZE)
    return np.sin(0.5 * np.pi * s * s).astype(np.float32)


_WINDOW = _vorbis_window()


def _band_matrix() -> np.ndarray:
    """``(NB_BANDS, FREQ_SIZE)`` triangular analysis weights (energy) and the
    matching interpolation matrix for per-bin gains."""
    m = np.zeros((NB_BANDS, FREQ_SIZE), np.float64)
    for b in range(NB_BANDS - 1):
        lo, hi = _BAND_EDGES[b], _BAND_EDGES[b + 1]
        size = hi - lo
        for j in range(size):
            frac = j / size
            m[b, lo + j] += 1.0 - frac
            m[b + 1, lo + j] += frac
    m[NB_BANDS - 1, _BAND_EDGES[-1]:] = 1.0
    return m


_BANDS = jnp.asarray(_band_matrix(), jnp.float32)  # (22, 481)
# per-bin gain interpolation = transpose with rows normalised
_INTERP = jnp.asarray(
    _band_matrix().T / np.maximum(_band_matrix().sum(axis=0)[:, None], 1e-9),
    jnp.float32,
)  # (481, 22)

_DCT = jnp.asarray(
    np.array(
        [
            [np.cos(np.pi / NB_BANDS * (j + 0.5) * k) for j in range(NB_BANDS)]
            for k in range(NB_BANDS)
        ]
    )
    * np.sqrt(2.0 / NB_BANDS),
    jnp.float32,
)  # (22, 22) DCT-II basis


def init_params(seed: int = 0x4242):
    """RNNoise topology: dense(42->24, tanh) -> GRU(24) -> GRU(48) ->
    GRU(96) -> dense(22, sigmoid) band gains + dense(1, sigmoid) VAD."""
    rng = np.random.default_rng(seed)

    def w(*shape):
        return jnp.asarray(
            rng.normal(0.0, 1.0 / np.sqrt(shape[0]), shape), jnp.float32
        )

    p = {
        "input_w": w(NB_FEATURES, 24),
        "input_b": jnp.zeros((24,), jnp.float32),
        "vad_out_w": w(24 + 24, 1),
        "vad_out_b": jnp.zeros((1,), jnp.float32),
        "denoise_out_w": w(96, NB_BANDS),
        "denoise_out_b": jnp.zeros((NB_BANDS,), jnp.float32),
    }
    gru_dims = {"vad_gru": (24, 24), "noise_gru": (24 + 24 + NB_FEATURES, 48),
                "denoise_gru": (24 + 48 + NB_FEATURES, 96)}
    for name, (din, dh) in gru_dims.items():
        p[f"{name}_wi"] = w(din, 3 * dh)
        p[f"{name}_wh"] = w(dh, 3 * dh)
        p[f"{name}_b"] = jnp.zeros((3 * dh,), jnp.float32)
    return p


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
    """Load a converted numpy archive of the published RNNoise weights,
    validated against the framework graph's key/shape contract."""
    data = np.load(path)
    params = {k: jnp.asarray(data[k], jnp.float32) for k in data.files}
    return _validate_loaded(params, init_params())


def rnnoise_state_init(batch_shape=()):
    return {
        # analysis/synthesis memories
        "analysis_mem": jnp.zeros(batch_shape + (FRAME_SIZE,), jnp.float32),
        "synthesis_mem": jnp.zeros(batch_shape + (FRAME_SIZE,), jnp.float32),
        # cepstral history for delta features
        "cepstral_mem": jnp.zeros(batch_shape + (2, NB_BANDS), jnp.float32),
        # recurrent states
        "vad_gru": jnp.zeros(batch_shape + (24,), jnp.float32),
        "noise_gru": jnp.zeros(batch_shape + (48,), jnp.float32),
        "denoise_gru": jnp.zeros(batch_shape + (96,), jnp.float32),
        # previous-frame signal for pitch correlation features
        "pitch_mem": jnp.zeros(batch_shape + (FRAME_SIZE,), jnp.float32),
    }


def _gru(p, name, h, x):
    gates = x @ p[f"{name}_wi"] + h @ p[f"{name}_wh"] + p[f"{name}_b"]
    dh = h.shape[-1]
    z = jax.nn.sigmoid(gates[..., :dh])
    r = jax.nn.sigmoid(gates[..., dh : 2 * dh])
    n = jnp.tanh(
        gates[..., 2 * dh :]
        - (1 - r) * (h @ p[f"{name}_wh"][:, 2 * dh :])
    )
    return (1 - z) * n + z * h


def _features(state, x_frame):
    """42-dim feature vector per frame (`nnnoiseless` feature layout:
    22 BFCC, 2x6 deltas, 6 pitch-corr cepstra, pitch gain + variability)."""
    windowed_in = jnp.concatenate([state["analysis_mem"], x_frame], axis=-1) * _WINDOW
    X = rdft_auto(windowed_in, WINDOW_SIZE)
    mag2 = (X.real**2 + X.imag**2).astype(jnp.float32)
    bandE = mag2 @ _BANDS.T  # [..., 22]
    logE = jnp.log10(jnp.maximum(bandE, 1e-2))
    ceps = logE @ _DCT.T

    c1 = state["cepstral_mem"][..., 0, :]
    c2 = state["cepstral_mem"][..., 1, :]
    d = ceps - c1
    dd = ceps - 2 * c1 + c2

    # pitch-correlation cepstra: correlation of the current frame with the
    # previous one, banded (proxy for the comb-correlation features)
    prev = state["pitch_mem"]
    Xp = rdft_auto(
        jnp.concatenate([prev, x_frame], axis=-1)[..., :WINDOW_SIZE] * _WINDOW,
        WINDOW_SIZE,
    )
    cross = (X.real * Xp.real + X.imag * Xp.imag).astype(jnp.float32)
    bandC = cross @ _BANDS.T
    corr = bandC / jnp.sqrt(
        jnp.maximum(bandE * (jnp.abs(Xp) ** 2 @ _BANDS.T), 1e-6)
    )
    pitch_ceps = (corr @ _DCT.T)[..., :6]

    pitch_gain = jnp.clip(jnp.mean(corr, axis=-1, keepdims=True), -1.0, 1.0)
    variability = jnp.mean(d * d, axis=-1, keepdims=True)

    feats = jnp.concatenate(
        [ceps, d[..., :6], dd[..., :6], pitch_ceps, pitch_gain, variability],
        axis=-1,
    )
    new_cepstral = jnp.stack([ceps, c1], axis=-2)
    return feats, X, bandE, new_cepstral


@jax.jit
def rnnoise_frame(params, state, x_frame):
    """Denoise one 480-sample frame (already model-scaled); batch leading.

    Returns ``(new_state, y_frame, {"gains", "vad"})``.
    """
    feats, X, bandE, new_cepstral = _features(state, x_frame)

    dense = jnp.tanh(feats @ params["input_w"] + params["input_b"])
    vad_h = _gru(params, "vad_gru", state["vad_gru"], dense)
    vad = jax.nn.sigmoid(
        jnp.concatenate([dense, vad_h], axis=-1) @ params["vad_out_w"]
        + params["vad_out_b"]
    )[..., 0]
    noise_in = jnp.concatenate([dense, vad_h, feats], axis=-1)
    noise_h = _gru(params, "noise_gru", state["noise_gru"], noise_in)
    den_in = jnp.concatenate([vad_h, noise_h, feats], axis=-1)
    den_h = _gru(params, "denoise_gru", state["denoise_gru"], den_in)
    gains = jax.nn.sigmoid(
        den_h @ params["denoise_out_w"] + params["denoise_out_b"]
    )  # [..., 22]

    bin_gains = gains @ _INTERP.T  # [..., 481]
    Y = X * bin_gains
    y = irdft_auto(Y, WINDOW_SIZE).astype(jnp.float32) * _WINDOW
    out = state["synthesis_mem"] + y[..., :FRAME_SIZE]
    new_state = {
        "analysis_mem": x_frame,
        "synthesis_mem": y[..., FRAME_SIZE:],
        "cepstral_mem": new_cepstral,
        "vad_gru": vad_h,
        "noise_gru": noise_h,
        "denoise_gru": den_h,
        "pitch_mem": x_frame,
    }
    return new_state, out, {"gains": gains, "vad": vad}


@jax.jit
def rnnoise_frames(params, state, frames):
    """Denoise ``frames: [..., n_frames, 480]`` in one compiled scan."""
    ft = jnp.moveaxis(frames, -2, 0)

    def body(st, xf):
        st, y, aux = rnnoise_frame(params, st, xf)
        return st, (y, aux["vad"])

    state, (ys, vads) = jax.lax.scan(body, state, ft)
    return state, jnp.moveaxis(ys, 0, -2), jnp.moveaxis(vads, 0, -1)


# ---------------------------------------------------------------------------
# Frame-staging processor (`rnnoise.rs` semantics)
# ---------------------------------------------------------------------------


def _soft_clip(x):
    """`rnnoise.rs:88-111`: finite-scrub + soft knee above 0.98."""
    x = jnp.where(jnp.isfinite(x), x, 0.0)
    limit_unit = PCM_MODEL_LIMIT / PCM_SCALE
    sign = jnp.sign(x)
    mag = jnp.abs(x)
    over = mag - SOFT_CLIP_THRESHOLD
    compressed = over / (over + (1.0 - SOFT_CLIP_THRESHOLD))
    softened = SOFT_CLIP_THRESHOLD + (limit_unit - SOFT_CLIP_THRESHOLD) * compressed
    return jnp.where(mag <= SOFT_CLIP_THRESHOLD, x, sign * jnp.minimum(softened, limit_unit))


def processor_init(params=None, strength: float = 1.0, sample_rate: float = 48000.0):
    if params is None:
        params = init_params()
    frame_dt = FRAME_SIZE / sample_rate
    smoothing_coeff = 1.0 - np.exp(-(frame_dt / 0.015))  # 15 ms EMA
    return {
        "params": params,
        "model": rnnoise_state_init(),
        "in_buf": np.zeros(0, np.float32),
        "out_buf": np.zeros(0, np.float32),
        "strength": float(np.clip(strength, 0.0, 1.0)),
        "smoothed_strength": 1.0,
        "smoothing_coeff": float(smoothing_coeff),
        "enabled": True,
    }


def processor_push(state, samples):
    """`rnnoise.rs:113-118`."""
    state = dict(state)
    state["in_buf"] = np.concatenate([state["in_buf"], np.asarray(samples, np.float32)])
    return state, len(np.asarray(samples))


def processor_process(state):
    """Process all complete staged frames (`rnnoise.rs:122-164`): scale to
    PCM with soft-clip, run the model, mix wet/dry with the 15 ms-smoothed
    strength, and stage the output."""
    state = dict(state)
    n_frames = len(state["in_buf"]) // FRAME_SIZE
    if n_frames == 0:
        return state, 0
    take = state["in_buf"][: n_frames * FRAME_SIZE]
    state["in_buf"] = state["in_buf"][n_frames * FRAME_SIZE :]
    frames = jnp.asarray(take.reshape(n_frames, FRAME_SIZE))

    if not state["enabled"]:
        state["out_buf"] = np.concatenate([state["out_buf"], take])
        return state, n_frames

    scaled = jnp.clip(_soft_clip(frames) * PCM_SCALE, -PCM_MODEL_LIMIT, PCM_MODEL_LIMIT)
    model, wet, _ = rnnoise_frames(state["params"], state["model"], scaled)
    wet = np.asarray(wet) / PCM_SCALE
    state["model"] = model

    # The dry path is delayed by one frame so wet/dry stay time-aligned at
    # the model's 480-sample latency; strength smoothing advances per frame
    # (`rnnoise.rs:79-86,122-164`).
    dry_delay = state.get("dry_delay", np.zeros(FRAME_SIZE, np.float32))
    dry_frames = np.concatenate(
        [dry_delay[None, :], take.reshape(n_frames, FRAME_SIZE)]
    )
    sm = state["smoothed_strength"]
    target = state["strength"]
    mixed = []
    for i in range(n_frames):
        sm = target * state["smoothing_coeff"] + sm * (1.0 - state["smoothing_coeff"])
        mixed.append(wet[i] * sm + dry_frames[i] * (1.0 - sm))
    state["smoothed_strength"] = sm
    state["dry_delay"] = dry_frames[-1]
    state["out_buf"] = np.concatenate([state["out_buf"]] + mixed)
    return state, n_frames


def processor_pop(state, count):
    """`rnnoise.rs:166-186`."""
    state = dict(state)
    n = min(count, len(state["out_buf"]))
    out = state["out_buf"][:n]
    state["out_buf"] = state["out_buf"][n:]
    return state, out


def processor_soft_reset(state):
    """Clear staging but preserve learned model state
    (`rnnoise.rs:224-231`)."""
    state = dict(state)
    state["in_buf"] = np.zeros(0, np.float32)
    state["out_buf"] = np.zeros(0, np.float32)
    state["dry_delay"] = np.zeros(FRAME_SIZE, np.float32)
    return state
