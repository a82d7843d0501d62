"""DeepFilterNet3-style full-band noise suppression as batched XLA inference.

The reference loads DeepFilterNet3 through a C dynamic library at runtime
(`rust-core/src/dsp/deepfilter_ffi.rs`); here the model family is
re-implemented natively with the DFN3 processing structure:

- 960-point STFT at 480-sample hop (10 ms frames at 48 kHz); the
  low-latency (LL) variant has 1 frame latency, the standard variant adds a
  2-frame lookahead for 3 frames total (`deepfilter_ffi.rs:40-43,226-243`).
- ERB-scale magnitude features (32 bands) drive a conv+GRU encoder; one
  decoder emits per-ERB-band gains for the full spectrum, a second emits
  order-5 complex deep-filtering coefficients applied to the low bins
  (<= ~4.8 kHz), the DFN "deep filtering" operation.
- Runtime config validation: attenuation limit 0.01-100 dB (default 30),
  post-filter beta 0-0.05 (default 0) (`deepfilter_ffi.rs:44-79`).
- Failure semantics: a non-finite output marks the backend permanently
  failed and the processor becomes a latency-preserving passthrough
  (`deepfilter_ffi.rs:187-204,841-864`).
- A dry-path delay line keeps wet/dry aligned for strength mixing
  (`deepfilter_ffi.rs:786-806,838-846`).

``load_weights`` accepts a converted numpy archive of published DFN3
weights; seeded deterministic weights otherwise keep the full pipeline
exercisable.
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
    "NB_ERB",
    "DF_ORDER",
    "DF_BINS",
    "DEFAULT_ATTEN_LIM_DB",
    "DEFAULT_POST_FILTER_BETA",
    "validate_runtime_config",
    "configure_deepfilter_runtime_paths",
    "configured_deepfilter_runtime_paths",
    "external_paths_allowed",
    "resolve_weight_path",
    "init_params",
    "load_weights",
    "dfn_state_init",
    "dfn_frame",
    "dfn_frames",
    "processor_init",
    "processor_push",
    "processor_process",
    "processor_pop",
    "processor_soft_reset",
    "latency_samples",
]

FRAME_SIZE = 480
WINDOW_SIZE = 960
FREQ_SIZE = WINDOW_SIZE // 2 + 1  # 481
NB_ERB = 32
DF_ORDER = 5
DF_BINS = 96  # deep filtering below ~4.8 kHz
_HIDDEN = 128

DEFAULT_ATTEN_LIM_DB = 30.0
DEFAULT_POST_FILTER_BETA = 0.0


def validate_runtime_config(atten_lim_db=DEFAULT_ATTEN_LIM_DB,
                            post_filter_beta=DEFAULT_POST_FILTER_BETA):
    """`deepfilter_ffi.rs:44-79`."""
    if not np.isfinite(atten_lim_db) or not (0.01 <= atten_lim_db <= 100.0):
        raise ValueError("attenuation limit must be between 0.01 and 100 dB")
    if not np.isfinite(post_filter_beta) or not (0.0 <= post_filter_beta <= 0.05):
        raise ValueError("post-filter beta must be between 0 and 0.05")
    return float(atten_lim_db), float(post_filter_beta)


def _vorbis_window():
    n = np.arange(WINDOW_SIZE)
    s = np.sin(np.pi * (n + 0.5) / WINDOW_SIZE)
    return np.sin(0.5 * np.pi * s * s).astype(np.float32)


_WINDOW = _vorbis_window()


def _erb_matrix():
    """``(NB_ERB, FREQ_SIZE)`` triangular ERB-scale filterbank."""
    fs = 48000.0
    freqs = np.fft.rfftfreq(WINDOW_SIZE, 1.0 / fs)

    def hz_to_erb(f):
        return 21.4 * np.log10(1.0 + 0.00437 * f)

    def erb_to_hz(e):
        return (10 ** (e / 21.4) - 1.0) / 0.00437

    edges_erb = np.linspace(0.0, hz_to_erb(fs / 2), NB_ERB + 2)
    edges_hz = erb_to_hz(edges_erb)
    m = np.zeros((NB_ERB, FREQ_SIZE))
    for b in range(NB_ERB):
        lo, mid, hi = edges_hz[b], edges_hz[b + 1], edges_hz[b + 2]
        up = (freqs - lo) / max(mid - lo, 1e-9)
        down = (hi - freqs) / max(hi - mid, 1e-9)
        m[b] = np.clip(np.minimum(up, down), 0.0, 1.0)
    m /= np.maximum(m.sum(axis=1, keepdims=True), 1e-9)
    return m


_ERB = jnp.asarray(_erb_matrix(), jnp.float32)


def _erb_spread_matrix():
    """``(481, 32)`` band gain -> bin gain, a true partition of unity.

    The triangular analysis bank gives the DC and Nyquist bins zero weight
    in every band; without a fix those bins would be structurally zeroed
    for ANY gain vector (unity gains would not be identity). libDF's
    rectangular bands partition all 481 bins (`DeepFilterNet erb widths`),
    so orphan bins are assigned wholly to their nearest band."""
    m = _erb_matrix()
    col = m.sum(axis=0)
    spread = m.T / np.maximum(col[:, None], 1e-9)
    orphan = np.flatnonzero(col < 1e-9)
    covered = np.flatnonzero(col >= 1e-9)
    for b in orphan:
        nearest = covered[np.argmin(np.abs(covered - b))]
        spread[b] = spread[nearest]
    return spread


_ERB_SPREAD = jnp.asarray(_erb_spread_matrix(), jnp.float32)


def init_params(seed: int = 0xDF3):
    rng = np.random.default_rng(seed)

    def w(*shape):
        return jnp.asarray(rng.normal(0, 1.0 / np.sqrt(shape[0]), shape), jnp.float32)

    return {
        "enc_w": w(NB_ERB + 2 * DF_BINS, _HIDDEN),
        "enc_b": jnp.zeros((_HIDDEN,), jnp.float32),
        "gru_wi": w(_HIDDEN, 3 * _HIDDEN),
        "gru_wh": w(_HIDDEN, 3 * _HIDDEN),
        "gru_b": jnp.zeros((3 * _HIDDEN,), jnp.float32),
        "erb_dec_w": w(_HIDDEN, NB_ERB),
        "erb_dec_b": jnp.zeros((NB_ERB,), jnp.float32),
        "df_dec_w": w(_HIDDEN, DF_BINS * DF_ORDER * 2),
        "df_dec_b": jnp.zeros((DF_BINS * DF_ORDER * 2,), jnp.float32),
    }


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
    """Load converted DeepFilterNet3 weights, validated against the
    framework graph's key/shape contract. Keys starting with ``__`` are
    provenance metadata, not weights."""
    data = np.load(path)
    params = {k: jnp.asarray(data[k], jnp.float32) for k in data.files
              if not k.startswith("__")}
    return _validate_loaded(params, init_params())


def dfn_state_init(batch_shape=(), lookahead: bool = False):
    state = {
        "analysis_mem": jnp.zeros(batch_shape + (FRAME_SIZE,), jnp.float32),
        "synthesis_mem": jnp.zeros(batch_shape + (FRAME_SIZE,), jnp.float32),
        "gru": jnp.zeros(batch_shape + (_HIDDEN,), jnp.float32),
        # spectral history for order-5 deep filtering on the low bins
        "spec_hist": jnp.zeros(
            batch_shape + (DF_ORDER, DF_BINS, 2), jnp.float32
        ),
    }
    if lookahead:
        # standard (non-LL) variant: full spectra of the two pending frames
        # (t-2, t-1) awaiting their lookahead-informed gains
        state["spec_queue"] = jnp.zeros(
            batch_shape + (2, FREQ_SIZE, 2), jnp.float32
        )
    return state


def _dfn_analyze(params, state, x_frame):
    """Shared per-frame analysis: window/DFT the incoming frame, run the
    encoder + GRU, and emit the ERB-band gains, deep-filter output over the
    5-frame low-bin history, and the updated recurrent state. Both latency
    variants share this exactly; they differ only in WHICH spectrum the
    gains are applied to (current frame for LL, frame t-2 for the standard
    2-frame-lookahead variant, `deepfilter_ffi.rs:40-43,226-243`)."""
    windowed = jnp.concatenate([state["analysis_mem"], x_frame], axis=-1) * _WINDOW
    X = rdft_auto(windowed, WINDOW_SIZE)
    mag = jnp.abs(X).astype(jnp.float32)
    erb_feat = jnp.log1p(mag**2 @ _ERB.T)
    low = X[..., :DF_BINS]
    low_ri = jnp.stack([low.real, low.imag], axis=-1).astype(jnp.float32)
    df_feat = jnp.sign(low_ri.reshape(*low_ri.shape[:-2], -1)) * jnp.log1p(
        jnp.abs(low_ri.reshape(*low_ri.shape[:-2], -1))
    )

    h_in = jax.nn.relu(
        jnp.concatenate([erb_feat, df_feat], axis=-1) @ params["enc_w"]
        + params["enc_b"]
    )
    h = state["gru"]
    gates = h_in @ params["gru_wi"] + h @ params["gru_wh"] + params["gru_b"]
    z = jax.nn.sigmoid(gates[..., :_HIDDEN])
    r = jax.nn.sigmoid(gates[..., _HIDDEN : 2 * _HIDDEN])
    n = jnp.tanh(gates[..., 2 * _HIDDEN :] - (1 - r) * (h @ params["gru_wh"][:, 2 * _HIDDEN :]))
    h_new = (1 - z) * n + z * h

    # ERB gain decoder: raw sigmoid gains. The attenuation limit is applied
    # exactly once, as the noisy-spectrum mix below (DeepFilterNet's
    # df_set_atten_lim semantics) — flooring the gains here too would halve
    # the configured maximum suppression in dB.
    erb_gains = jax.nn.sigmoid(
        h_new @ params["erb_dec_w"] + params["erb_dec_b"]
    )
    bin_gains = erb_gains @ _ERB_SPREAD.T  # [..., 481]

    # deep filtering on the low bins: order-5 complex FIR over frame history.
    # Coefficients are applied linearly (libDF semantics) — an activation
    # clamp like tanh/order would cap the current-frame tap below 1.0,
    # making identity unreachable and guaranteeing distortion on clean
    # high-SNR audio. The FIR has no feedback, so unbounded taps are stable;
    # the attenuation-limit mix below still bounds total deviation.
    df_c = (
        h_new @ params["df_dec_w"] + params["df_dec_b"]
    ).reshape(*h_new.shape[:-1], DF_ORDER, DF_BINS, 2)
    hist = jnp.concatenate(
        [state["spec_hist"][..., 1:, :, :], low_ri[..., None, :, :]], axis=-3
    )
    hr, hi_ = hist[..., 0], hist[..., 1]
    cr, ci = df_c[..., 0], df_c[..., 1]
    df_re = jnp.sum(cr * hr - ci * hi_, axis=-2)
    df_im = jnp.sum(cr * hi_ + ci * hr, axis=-2)
    low_enh = df_re + 1j * df_im
    return X, h_new, hist, erb_gains, bin_gains, low_enh


def _dfn_synthesize(state, x_frame, h_new, hist, X_tgt, erb_gains, bin_gains,
                    low_enh, atten_lim_db, post_filter_beta):
    """Apply the gains/deep-filter output to the target spectrum, mix the
    attenuation limit, and overlap-add one output frame."""
    Y = X_tgt * bin_gains
    Y = Y.at[..., :DF_BINS].set(low_enh * bin_gains[..., :DF_BINS])
    # optional post filter: sharpen gains (beta-weighted sine shaping)
    beta = jnp.asarray(post_filter_beta, jnp.float32)
    pf = bin_gains * (1.0 + beta) / (1.0 + beta * jnp.square(bin_gains / jnp.maximum(bin_gains.max(axis=-1, keepdims=True), 1e-6)))
    Y = jnp.where(beta > 0, X_tgt * pf, Y)
    # attenuation limit, applied once: mix the noisy spectrum back in so no
    # bin is attenuated by more than the configured limit — this bounds the
    # ERB gains AND the deep-filtering stage together
    # (DeepFilterNet's df_set_atten_lim semantics, `deepfilter_ffi.rs:44-63`)
    gain_floor = jnp.power(10.0, -jnp.asarray(atten_lim_db, jnp.float32) / 20.0)
    Y = gain_floor * X_tgt + (1.0 - gain_floor) * Y

    y = irdft_auto(Y, WINDOW_SIZE).astype(jnp.float32) * _WINDOW
    out = state["synthesis_mem"] + y[..., :FRAME_SIZE]
    new_state = {
        "analysis_mem": x_frame,
        "synthesis_mem": y[..., FRAME_SIZE:],
        "gru": h_new,
        "spec_hist": hist,
    }
    return new_state, out, {"erb_gains": erb_gains}


@jax.jit
def dfn_frame(params, state, x_frame, atten_lim_db=DEFAULT_ATTEN_LIM_DB,
              post_filter_beta=DEFAULT_POST_FILTER_BETA):
    """Enhance one 480-sample frame. Returns ``(new_state, y, aux)``.

    The latency variant is chosen by the STATE's pytree structure (static
    under jit): a state from ``dfn_state_init()`` runs the low-latency path
    (gains apply to the current frame, 1-frame total latency); a state from
    ``dfn_state_init(lookahead=True)`` runs the standard 2-frame-lookahead
    path, where the gains and order-5 deep filter predicted at frame ``t``
    apply to the queued spectrum of frame ``t-2`` — the FIR history
    ``t-4..t`` is then centred on the output frame, matching libDF's
    ``df_lookahead=2`` semantics (`deepfilter_ffi.rs:40-43,226-243`)."""
    X, h_new, hist, erb_gains, bin_gains, low_enh = _dfn_analyze(
        params, state, x_frame
    )
    if "spec_queue" not in state:
        return _dfn_synthesize(
            state, x_frame, h_new, hist, X, erb_gains, bin_gains, low_enh,
            atten_lim_db, post_filter_beta,
        )
    queue = state["spec_queue"]
    X_tgt = (queue[..., 0, :, 0] + 1j * queue[..., 0, :, 1])
    X_ri = jnp.stack([X.real, X.imag], axis=-1).astype(jnp.float32)
    new_queue = jnp.concatenate(
        [queue[..., 1:, :, :], X_ri[..., None, :, :]], axis=-3
    )
    new_state, out, aux = _dfn_synthesize(
        state, x_frame, h_new, hist, X_tgt, erb_gains, bin_gains, low_enh,
        atten_lim_db, post_filter_beta,
    )
    new_state["spec_queue"] = new_queue
    return new_state, out, aux


@jax.jit
def dfn_frames(params, state, frames, atten_lim_db=DEFAULT_ATTEN_LIM_DB,
               post_filter_beta=DEFAULT_POST_FILTER_BETA):
    """Enhance ``frames: [..., n, 480]`` in one compiled scan. The latency
    variant follows the state's structure, as in :func:`dfn_frame`."""
    ft = jnp.moveaxis(frames, -2, 0)

    def body(st, xf):
        st, y, _ = dfn_frame(params, st, xf, atten_lim_db, post_filter_beta)
        return st, y

    state, ys = jax.lax.scan(body, state, ft)
    return state, jnp.moveaxis(ys, 0, -2)


# ---------------------------------------------------------------------------
# Frame-staging processor with failure semantics
# ---------------------------------------------------------------------------


def latency_samples(low_latency: bool) -> int:
    """LL: 1 frame; standard: 3 frames (2-frame lookahead)
    (`deepfilter_ffi.rs:40-43,226-243`)."""
    return FRAME_SIZE if low_latency else 3 * FRAME_SIZE


def processor_init(params=None, strength: float = 1.0, low_latency: bool = True,
                   atten_lim_db: float = DEFAULT_ATTEN_LIM_DB,
                   post_filter_beta: float = DEFAULT_POST_FILTER_BETA):
    atten, beta = validate_runtime_config(atten_lim_db, post_filter_beta)
    if params is None:
        params = default_params(low_latency)
    return {
        "params": params,
        "model": dfn_state_init(lookahead=not low_latency),
        "in_buf": np.zeros(0, np.float32),
        "out_buf": np.zeros(0, np.float32),
        # dry delay aligns the unprocessed path with model latency
        "dry_delay": np.zeros(latency_samples(low_latency), np.float32),
        "strength": float(np.clip(strength, 0.0, 1.0)),
        "smoothed_strength": 1.0,
        "smoothing_coeff": float(1.0 - np.exp(-(FRAME_SIZE / 48000.0) / 0.015)),
        "low_latency": bool(low_latency),
        "atten_lim_db": atten,
        "post_filter_beta": beta,
        "backend_failed": False,
        "enabled": True,
    }


def processor_push(state, samples):
    state = dict(state)
    state["in_buf"] = np.concatenate(
        [state["in_buf"], np.asarray(samples, np.float32)]
    )
    return state, len(np.asarray(samples))


def processor_process(state):
    """Process staged frames. On a non-finite model output the backend is
    marked permanently failed and the processor becomes a latency-preserving
    passthrough (`deepfilter_ffi.rs:841-864`)."""
    state = dict(state)
    n_frames = len(state["in_buf"]) // FRAME_SIZE
    if n_frames == 0:
        return state, 0
    take = state["in_buf"][: n_frames * FRAME_SIZE]
    state["in_buf"] = state["in_buf"][n_frames * FRAME_SIZE :]

    # dry path through the alignment delay
    dry_stream = np.concatenate([state["dry_delay"], take])
    dry_aligned = dry_stream[: n_frames * FRAME_SIZE]
    state["dry_delay"] = dry_stream[n_frames * FRAME_SIZE :]

    if state["backend_failed"] or not state["enabled"]:
        state["out_buf"] = np.concatenate([state["out_buf"], dry_aligned])
        return state, n_frames

    frames = jnp.asarray(take.reshape(n_frames, FRAME_SIZE))
    model, wet = dfn_frames(
        state["params"], state["model"], frames,
        state["atten_lim_db"], state["post_filter_beta"],
    )
    wet = np.asarray(wet).reshape(-1)
    if not np.all(np.isfinite(wet)):
        state["backend_failed"] = True
        state["out_buf"] = np.concatenate([state["out_buf"], dry_aligned])
        return state, n_frames
    state["model"] = model

    sm = state["smoothed_strength"]
    target = state["strength"]
    mixed = []
    for i in range(n_frames):
        sm = target * state["smoothing_coeff"] + sm * (1.0 - state["smoothing_coeff"])
        lo, hi = i * FRAME_SIZE, (i + 1) * FRAME_SIZE
        mixed.append(wet[lo:hi] * sm + dry_aligned[lo:hi] * (1.0 - sm))
    state["smoothed_strength"] = sm
    state["out_buf"] = np.concatenate([state["out_buf"]] + mixed)
    return state, n_frames


def processor_pop(state, count):
    state = dict(state)
    n = min(count, len(state["out_buf"]))
    out = state["out_buf"][:n]
    state["out_buf"] = state["out_buf"][n:]
    return state, out


def processor_soft_reset(state):
    """Clear staging, preserve model weights/recurrent state and the failed
    flag (`deepfilter_ffi.rs` soft reset semantics)."""
    state = dict(state)
    state["in_buf"] = np.zeros(0, np.float32)
    state["out_buf"] = np.zeros(0, np.float32)
    state["dry_delay"] = np.zeros(
        latency_samples(state["low_latency"]), np.float32
    )
    return state


# App-owned asset paths (`dsp/deepfilter_ffi.rs:119-160`): intentionally
# separate from ambient DEEPFILTER_* env overrides, which stay ignored unless
# AUDIOFORGE_ALLOW_EXTERNAL_DF=1.
_APP_OWNED_PATHS: dict[str, "Path | None"] = {"library": None, "model": None}


def _canonical_app_owned_path(path, kind: str):
    from pathlib import Path

    if path is None:
        return None
    try:
        canonical = Path(path).resolve(strict=True)
    except OSError as exc:
        raise ValueError(
            f"Invalid app-owned DeepFilter {kind} path: {exc}"
        ) from exc
    return canonical


def configure_deepfilter_runtime_paths(library_path=None, model_path=None):
    """Register bundled DeepFilter assets (`lib.rs:352-361`,
    `deepfilter_ffi.rs:135-153`). Both paths must exist; either may be None
    to clear it."""
    configured = {
        "library": _canonical_app_owned_path(library_path, "library"),
        "model": _canonical_app_owned_path(model_path, "model"),
    }
    _APP_OWNED_PATHS.update(configured)


def configured_deepfilter_runtime_paths() -> dict:
    return dict(_APP_OWNED_PATHS)


def external_paths_allowed() -> bool:
    """Ambient ``DEEPFILTER_*`` env paths are honoured only with the
    explicit ``AUDIOFORGE_ALLOW_EXTERNAL_DF=1`` opt-in
    (`deepfilter_ffi.rs:90-160`, `README.md:195-209`)."""
    import os

    return os.environ.get("AUDIOFORGE_ALLOW_EXTERNAL_DF", "").strip() == "1"


def resolve_weight_path(low_latency: bool = True):
    """Weight-archive resolution honouring the trust model: app-owned
    (bootstrap-registered) paths first; the ambient ``DEEPFILTER_MODEL_PATH``
    env override only with the external opt-in. Returns None when nothing
    trusted is configured (the processor then runs seeded structural
    weights).

    The two latency variants are DIFFERENT models, not one model at two
    delays — the standard variant's gains/deep-filter are trained to apply
    to frame ``t-2``, the LL variant's to frame ``t`` — so each resolves
    its own bundled archive (``dfn3.npz`` standard / ``dfn3_ll.npz`` LL),
    mirroring the reference's separate DeepFilterNet3 and
    DeepFilterNet3-LL assets (`deepfilter_ffi.rs:40-43`)."""
    import os
    from pathlib import Path

    owned = _APP_OWNED_PATHS.get("model")
    if owned is not None:
        return owned
    env = os.environ.get("DEEPFILTER_MODEL_PATH")
    if env and external_paths_allowed():
        candidate = Path(env)
        if candidate.is_file():
            return candidate.resolve()
    # the repo/bundle's own models dir is app-owned (the analogue of the
    # bootstrap-registered bundled assets, `app_bootstrap.py`)
    name = "dfn3_ll.npz" if low_latency else "dfn3.npz"
    bundled = Path(__file__).resolve().parents[2] / "models" / name
    if bundled.is_file():
        return bundled
    return None


_DEFAULT_PARAMS_CACHE: dict = {}


def default_params(low_latency: bool = True):
    """Resolve the default weight set once per process and per latency
    variant: a trusted archive (:func:`resolve_weight_path`) wins;
    otherwise the seeded structural weights. :func:`weights_source`
    reports which."""
    key = "ll" if low_latency else "std"
    if key not in _DEFAULT_PARAMS_CACHE:
        path = resolve_weight_path(low_latency)
        if path is not None:
            params = load_weights(path)
            data = np.load(path)
            source = (str(np.asarray(data["__provenance__"]).item())
                      if "__provenance__" in data.files else "converted")
            variant = (str(np.asarray(data["__variant__"]).item())
                       if "__variant__" in data.files else None)
            expected = "ll" if low_latency else "standard"
            if variant is not None and variant != expected:
                raise ValueError(
                    f"DeepFilter archive {path} is the {variant!r} variant "
                    f"but the {expected!r} variant was requested — the two "
                    "latency variants use different weights"
                )
            _DEFAULT_PARAMS_CACHE[key] = (params, source)
        else:
            _DEFAULT_PARAMS_CACHE[key] = (init_params(), "seeded")
    return _DEFAULT_PARAMS_CACHE[key][0]


def weights_source(low_latency: bool = True) -> str:
    """``"converted"``, ``"trained"``, or ``"seeded"`` (structural)."""
    default_params(low_latency)
    return _DEFAULT_PARAMS_CACHE["ll" if low_latency else "std"][1]
