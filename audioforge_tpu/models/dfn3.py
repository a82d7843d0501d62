"""DeepFilterNet3 full-band noise suppression as batched XLA inference.

The reference loads DeepFilterNet3 through a C dynamic library at runtime
(`rust-core/src/dsp/deepfilter_ffi.rs`); here the OFFICIAL published DFN3
network topology (arXiv:2305.08227; the `deepfilternet3` model family of
the public DeepFilterNet repository) is re-expressed natively in JAX so
that converted official checkpoints bind 1:1 — the same conversion
discipline as `models/silero.py` / `docs/silero_graph.md`. The committed
graph map lives in ``docs/dfn3_graph.md`` and in code as
:data:`TORCH_NAME_MAP`.

Processing frame structure (matching the reference runtime contract):

- 960-point STFT at 480-sample hop (10 ms frames at 48 kHz), vorbis
  window; the low-latency (LL) variant has 1 frame latency, the standard
  variant adds a 2-frame lookahead for 3 frames total
  (`deepfilter_ffi.rs:40-43,226-243`).
- Features: 32 rectangular ERB bands of log power with exponential
  mean-norm (tau 1 s, /40), and the unit-normed complex spectrum of the
  first 96 bins.
- Network: separable-conv ERB encoder with skips, a grouped-linear
  squeezed GRU bottleneck, an ERB-gain decoder (transposed-conv mirror,
  sigmoid mask) and a deep-filtering decoder (2-layer GRU + grouped
  linear, tanh, plus a conv pathway from the spec encoder) emitting
  order-5 complex FIR taps for the low 96 bins.
- Runtime config validation: attenuation limit 0.01-100 dB (default 30),
  post-filter beta 0-0.05 (default 0) (`deepfilter_ffi.rs:44-79`).
- Failure semantics: a non-finite output marks the backend permanently
  failed and the processor becomes a latency-preserving passthrough
  (`deepfilter_ffi.rs:187-204,841-864`).
- A dry-path delay line keeps wet/dry aligned for strength mixing
  (`deepfilter_ffi.rs:786-806,838-846`).

``load_weights`` accepts a converted numpy archive of published DFN3
weights (``tools/convert_model_weights.py --model dfn3``); the in-repo
trained archives (``tools/train_dfn3_weights.py``) use this exact
topology, and seeded deterministic weights otherwise keep the full
pipeline exercisable.
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
    "NB_DF",
    "DF_ORDER",
    "DF_BINS",
    "CONV_CH",
    "EMB_HIDDEN",
    "DF_HIDDEN",
    "LIN_GROUPS",
    "ENC_LIN_GROUPS",
    "DF_PATHWAY_KT",
    "DEFAULT_ATTEN_LIM_DB",
    "DEFAULT_POST_FILTER_BETA",
    "TORCH_NAME_MAP",
    "erb_widths",
    "validate_runtime_config",
    "configure_deepfilter_runtime_paths",
    "configured_deepfilter_runtime_paths",
    "external_paths_allowed",
    "resolve_weight_path",
    "init_params",
    "load_weights",
    "convert_torch_state_dict",
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

# ---------------------------------------------------------------------------
# Static model hyperparameters — the published DeepFilterNet3 configuration
# (df/config defaults of the `deepfilternet3` model; arXiv:2305.08227 §2).
# See docs/dfn3_graph.md for the full derivation and residual uncertainty.
# ---------------------------------------------------------------------------

SAMPLE_RATE = 48000
FRAME_SIZE = 480            # hop_size
WINDOW_SIZE = 960           # fft_size
FREQ_SIZE = WINDOW_SIZE // 2 + 1  # 481
NB_ERB = 32
NB_DF = 96                  # deep-filtering bins (<= 4.8 kHz)
DF_BINS = NB_DF             # kept for API compatibility
DF_ORDER = 5
DF_LOOKAHEAD = 2            # standard variant; LL variant uses 0
CONV_CH = 64
CONV_KERNEL_INP = (3, 3)    # (time, freq) of the two input convs
CONV_KERNEL = (1, 3)
EMB_HIDDEN = 256
DF_HIDDEN = 256
EMB_GRU_LAYERS = 1          # encoder bottleneck GRU
ERB_DEC_GRU_LAYERS = 1      # = emb_num_layers - 1
DF_GRU_LAYERS = 2
LIN_GROUPS = 8
ENC_LIN_GROUPS = 16
DF_PATHWAY_KT = 5           # df_convp time kernel
LSNR_MIN = -15.0
LSNR_MAX = 35.0
NORM_TAU_S = 1.0
_BN_EPS = 1e-5

EMB_DIM = CONV_CH * NB_ERB // 4          # 512 — flattened e3 / decoder emb
_DF_CEMB_DIM = CONV_CH * NB_DF // 2      # 3072 — flattened c1
_DF_OUT_DIM = NB_DF * DF_ORDER * 2       # 960

DEFAULT_ATTEN_LIM_DB = 30.0
DEFAULT_POST_FILTER_BETA = 0.0

# exponential norm smoothing for the input features (norm_tau = 1 s at the
# 10 ms hop)
_NORM_ALPHA = float(np.exp(-(FRAME_SIZE / SAMPLE_RATE) / NORM_TAU_S))


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


def erb_widths(sr: int = SAMPLE_RATE, fft_size: int = WINDOW_SIZE,
               nb_bands: int = NB_ERB, min_nb_freqs: int = 2) -> np.ndarray:
    """Rectangular ERB band widths in FFT bins — libDF's band layout:
    uniform steps on the ERB scale, each band rounded to FFT bins with a
    minimum width, carrying the rounding overshoot forward; the last band
    absorbs the Nyquist bin. Widths sum to ``fft_size//2 + 1``."""
    erb_l, erb_q = 24.7, 9.265

    def freq2erb(f):
        return erb_q * np.log(1.0 + f / (erb_l * erb_q))

    def erb2freq(e):
        return (np.exp(e / erb_q) - 1.0) * erb_l * erb_q

    nyq = sr / 2
    freq_width = sr / fft_size
    step = freq2erb(nyq) / nb_bands
    widths = np.zeros(nb_bands, np.int64)
    prev_freq = 0   # IDEAL band boundary in bins (not the cumulative width)
    over = 0
    for i in range(1, nb_bands + 1):
        f = erb2freq(step * i)
        fb = int(round(f / freq_width))
        nb_freqs = fb - prev_freq - over
        if nb_freqs < min_nb_freqs:
            over = min_nb_freqs - nb_freqs
            nb_freqs = min_nb_freqs
        else:
            over = 0
        widths[i - 1] = nb_freqs
        prev_freq = fb
    widths[-1] += 1  # include the Nyquist bin
    assert int(widths.sum()) == fft_size // 2 + 1
    return widths


def _erb_matrices():
    """(analysis [NB_ERB, 481] width-normalized sums,
    synthesis [481, NB_ERB] rectangular gain spread)."""
    widths = erb_widths()
    fb = np.zeros((NB_ERB, FREQ_SIZE), np.float32)
    spread = np.zeros((FREQ_SIZE, NB_ERB), np.float32)
    start = 0
    for b, w in enumerate(widths):
        fb[b, start:start + w] = 1.0 / float(w)
        spread[start:start + w, b] = 1.0
        start += w
    return fb, spread


_ERB_FB_NP, _ERB_SPREAD_NP = _erb_matrices()
_ERB_FB = jnp.asarray(_ERB_FB_NP)
_ERB_SPREAD = jnp.asarray(_ERB_SPREAD_NP)

# mean-norm state init: linearly interpolated -60 -> -90 dB across bands;
# unit-norm init 0.001 -> 0.0001 across df bins (libDF state defaults)
_ERB_NORM_INIT = np.linspace(-60.0, -90.0, NB_ERB).astype(np.float32)
_UNIT_NORM_INIT = np.linspace(0.001, 0.0001, NB_DF).astype(np.float32)


# ---------------------------------------------------------------------------
# Parameters
# ---------------------------------------------------------------------------


def _conv_unit(rng, out_ch, in_ch, kt, kf, groups, separable):
    """Keys of one Conv(Transpose)2dNormAct: grouped/depthwise conv weight
    (torch layout [O, I/g, kt, kf]), optional 1x1 pointwise, BatchNorm."""
    fan_in = (in_ch // groups) * kt * kf
    unit = {
        "w": rng.normal(0, 1.0 / np.sqrt(fan_in),
                        (out_ch, in_ch // groups, kt, kf)).astype(np.float32),
        "bn.g": np.ones(out_ch, np.float32),
        "bn.b": np.zeros(out_ch, np.float32),
        "bn.m": np.zeros(out_ch, np.float32),
        "bn.v": np.ones(out_ch, np.float32),
    }
    if separable:
        unit["pw"] = rng.normal(
            0, 1.0 / np.sqrt(out_ch), (out_ch, out_ch, 1, 1)
        ).astype(np.float32)
    return unit


def _glinear(rng, in_dim, out_dim, groups):
    """GroupedLinearEinsum weight [g, in/g, out/g] (no bias)."""
    return rng.normal(
        0, 1.0 / np.sqrt(in_dim // groups),
        (groups, in_dim // groups, out_dim // groups),
    ).astype(np.float32)


def _gru_layer(rng, in_dim, hidden):
    """torch nn.GRU layer tensors (gate order r, z, n)."""
    s = 1.0 / np.sqrt(hidden)
    return {
        "wi": rng.uniform(-s, s, (3 * hidden, in_dim)).astype(np.float32),
        "wh": rng.uniform(-s, s, (3 * hidden, hidden)).astype(np.float32),
        "bi": np.zeros(3 * hidden, np.float32),
        "bh": np.zeros(3 * hidden, np.float32),
    }


def _flatten_into(params, prefix, tree):
    for key, value in tree.items():
        params[f"{prefix}.{key}"] = value


def init_params(seed: int = 0xDF3):
    """Seeded structural weights with the official DFN3 key/shape layout.

    The flat key set is the conversion contract: ``load_weights`` accepts
    only archives that match it exactly (see docs/dfn3_graph.md)."""
    rng = np.random.default_rng(seed)
    p: dict[str, np.ndarray] = {}

    # --- encoder ---
    _flatten_into(p, "enc.erb_conv0",
                  _conv_unit(rng, CONV_CH, 1, 3, 3, 1, False))
    _flatten_into(p, "enc.erb_conv1",
                  _conv_unit(rng, CONV_CH, CONV_CH, 1, 3, CONV_CH, True))
    _flatten_into(p, "enc.erb_conv2",
                  _conv_unit(rng, CONV_CH, CONV_CH, 1, 3, CONV_CH, True))
    _flatten_into(p, "enc.erb_conv3",
                  _conv_unit(rng, CONV_CH, CONV_CH, 1, 3, CONV_CH, True))
    _flatten_into(p, "enc.df_conv0",
                  _conv_unit(rng, CONV_CH, 2, 3, 3, 2, True))
    _flatten_into(p, "enc.df_conv1",
                  _conv_unit(rng, CONV_CH, CONV_CH, 1, 3, CONV_CH, True))
    p["enc.df_fc_emb.w"] = _glinear(rng, _DF_CEMB_DIM, EMB_DIM,
                                    ENC_LIN_GROUPS)
    p["enc.emb_gru.lin_in.w"] = _glinear(rng, EMB_DIM, EMB_HIDDEN, LIN_GROUPS)
    _flatten_into(p, "enc.emb_gru.gru_l0",
                  _gru_layer(rng, EMB_HIDDEN, EMB_HIDDEN))
    p["enc.emb_gru.lin_out.w"] = _glinear(rng, EMB_HIDDEN, EMB_DIM,
                                          LIN_GROUPS)
    p["enc.lsnr.w"] = rng.normal(
        0, 1.0 / np.sqrt(EMB_DIM), (1, EMB_DIM)).astype(np.float32)
    p["enc.lsnr.b"] = np.zeros(1, np.float32)

    # --- ERB-gain decoder ---
    p["erb_dec.emb_gru.lin_in.w"] = _glinear(rng, EMB_DIM, EMB_HIDDEN,
                                             LIN_GROUPS)
    _flatten_into(p, "erb_dec.emb_gru.gru_l0",
                  _gru_layer(rng, EMB_HIDDEN, EMB_HIDDEN))
    p["erb_dec.emb_gru.lin_out.w"] = _glinear(rng, EMB_HIDDEN, EMB_DIM,
                                              LIN_GROUPS)
    _flatten_into(p, "erb_dec.conv3p",
                  _conv_unit(rng, CONV_CH, CONV_CH, 1, 1, 1, False))
    _flatten_into(p, "erb_dec.convt3",
                  _conv_unit(rng, CONV_CH, CONV_CH, 1, 3, CONV_CH, True))
    _flatten_into(p, "erb_dec.conv2p",
                  _conv_unit(rng, CONV_CH, CONV_CH, 1, 1, 1, False))
    _flatten_into(p, "erb_dec.convt2",
                  _conv_unit(rng, CONV_CH, CONV_CH, 1, 3, CONV_CH, True))
    _flatten_into(p, "erb_dec.conv1p",
                  _conv_unit(rng, CONV_CH, CONV_CH, 1, 1, 1, False))
    _flatten_into(p, "erb_dec.convt1",
                  _conv_unit(rng, CONV_CH, CONV_CH, 1, 3, CONV_CH, True))
    _flatten_into(p, "erb_dec.conv0p",
                  _conv_unit(rng, CONV_CH, CONV_CH, 1, 1, 1, False))
    _flatten_into(p, "erb_dec.conv0_out",
                  _conv_unit(rng, 1, CONV_CH, 1, 3, 1, False))

    # --- deep-filtering decoder ---
    _flatten_into(p, "df_dec.df_convp",
                  _conv_unit(rng, DF_ORDER * 2, CONV_CH, DF_PATHWAY_KT, 1,
                             2, True))
    p["df_dec.df_gru.lin_in.w"] = _glinear(rng, EMB_DIM, DF_HIDDEN,
                                           LIN_GROUPS)
    for layer in range(DF_GRU_LAYERS):
        _flatten_into(p, f"df_dec.df_gru.gru_l{layer}",
                      _gru_layer(rng, DF_HIDDEN, DF_HIDDEN))
    p["df_dec.df_out.w"] = _glinear(rng, DF_HIDDEN, _DF_OUT_DIM, LIN_GROUPS)

    return {k: jnp.asarray(v) for k, v in p.items()}


def _torch_name_map() -> dict[str, str]:
    """Official DFN3 torch state-dict name -> framework key.

    The official module layout (DeepFilterNet `deepfilternet3.DfNet`):
    every Conv2dNormAct is an nn.Sequential whose indices depend on the
    presence of the causal time-pad layer (time kernel > 1) and of the
    separable pointwise conv — see docs/dfn3_graph.md for the layer table.
    """
    m: dict[str, str] = {}

    def conv(off: str, key: str, padded: bool, separable: bool):
        i = 1 if padded else 0
        m[f"{off}.{i}.weight"] = f"{key}.w"
        if separable:
            i += 1
            m[f"{off}.{i}.weight"] = f"{key}.pw"
        i += 1
        m[f"{off}.{i}.weight"] = f"{key}.bn.g"
        m[f"{off}.{i}.bias"] = f"{key}.bn.b"
        m[f"{off}.{i}.running_mean"] = f"{key}.bn.m"
        m[f"{off}.{i}.running_var"] = f"{key}.bn.v"

    def gru(off: str, key: str, layers: int):
        for layer in range(layers):
            m[f"{off}.weight_ih_l{layer}"] = f"{key}.gru_l{layer}.wi"
            m[f"{off}.weight_hh_l{layer}"] = f"{key}.gru_l{layer}.wh"
            m[f"{off}.bias_ih_l{layer}"] = f"{key}.gru_l{layer}.bi"
            m[f"{off}.bias_hh_l{layer}"] = f"{key}.gru_l{layer}.bh"

    conv("enc.erb_conv0", "enc.erb_conv0", True, False)
    conv("enc.erb_conv1", "enc.erb_conv1", False, True)
    conv("enc.erb_conv2", "enc.erb_conv2", False, True)
    conv("enc.erb_conv3", "enc.erb_conv3", False, True)
    conv("enc.df_conv0", "enc.df_conv0", True, True)
    conv("enc.df_conv1", "enc.df_conv1", False, True)
    m["enc.df_fc_emb.0.weight"] = "enc.df_fc_emb.w"
    m["enc.emb_gru.linear_in.0.weight"] = "enc.emb_gru.lin_in.w"
    gru("enc.emb_gru.gru", "enc.emb_gru", EMB_GRU_LAYERS)
    m["enc.emb_gru.linear_out.0.weight"] = "enc.emb_gru.lin_out.w"
    m["enc.lsnr_fc.0.weight"] = "enc.lsnr.w"
    m["enc.lsnr_fc.0.bias"] = "enc.lsnr.b"

    m["erb_dec.emb_gru.linear_in.0.weight"] = "erb_dec.emb_gru.lin_in.w"
    gru("erb_dec.emb_gru.gru", "erb_dec.emb_gru", ERB_DEC_GRU_LAYERS)
    m["erb_dec.emb_gru.linear_out.0.weight"] = "erb_dec.emb_gru.lin_out.w"
    conv("erb_dec.conv3p", "erb_dec.conv3p", False, False)
    conv("erb_dec.convt3", "erb_dec.convt3", False, True)
    conv("erb_dec.conv2p", "erb_dec.conv2p", False, False)
    conv("erb_dec.convt2", "erb_dec.convt2", False, True)
    conv("erb_dec.conv1p", "erb_dec.conv1p", False, False)
    conv("erb_dec.convt1", "erb_dec.convt1", False, True)
    conv("erb_dec.conv0p", "erb_dec.conv0p", False, False)
    conv("erb_dec.conv0_out", "erb_dec.conv0_out", False, False)

    conv("df_dec.df_convp", "df_dec.df_convp", True, True)
    m["df_dec.df_gru.linear_in.0.weight"] = "df_dec.df_gru.lin_in.w"
    gru("df_dec.df_gru.gru", "df_dec.df_gru", DF_GRU_LAYERS)
    m["df_dec.df_out.0.weight"] = "df_dec.df_out.w"
    return m


TORCH_NAME_MAP = _torch_name_map()

# torch ConvTranspose2d stores weight as [in, out/g, kt, kf]; the framework
# stores every conv as [out, in/g, kt, kf] with the kernel in forward-
# correlation orientation, so transposed-conv weights are re-grouped,
# transposed within each group, and freq-flipped during conversion.
# key -> groups of the transposed units (both are depthwise):
_TRANSPOSED_KEYS = {
    "erb_dec.convt2.w": CONV_CH,
    "erb_dec.convt1.w": CONV_CH,
}


def _convert_transposed(arr: np.ndarray, groups: int) -> np.ndarray:
    """[in, out/g, kt, kf] (torch ConvTranspose2d) -> [out, in/g, kt, kf]
    in forward-correlation orientation (within-group transpose + kf flip)."""
    i_total, og, kh, kw = arr.shape
    arr = arr.reshape(groups, i_total // groups, og, kh, kw)
    arr = arr.transpose(0, 2, 1, 3, 4)
    arr = arr.reshape(groups * og, i_total // groups, kh, kw)
    return arr[..., ::-1].copy()


def convert_torch_state_dict(state_dict: dict) -> dict:
    """Convert an official DFN3 torch state dict (tensor name -> array)
    into the framework archive, validating keys and shapes."""
    reference = init_params()
    out: dict[str, np.ndarray] = {}
    unknown = []
    for name, value in state_dict.items():
        if name.endswith("num_batches_tracked"):
            continue
        key = TORCH_NAME_MAP.get(name)
        if key is None:
            unknown.append(name)
            continue
        arr = np.asarray(value, np.float32)
        if key in _TRANSPOSED_KEYS:
            arr = _convert_transposed(arr, _TRANSPOSED_KEYS[key])
        out[key] = arr
    missing = set(reference) - set(out)
    if missing or unknown:
        raise ValueError(
            f"torch state dict does not match the DFN3 graph: "
            f"missing={sorted(missing)} unknown={sorted(unknown)}"
        )
    for key, ref in reference.items():
        if out[key].shape != ref.shape:
            raise ValueError(
                f"weight {key!r} shape {out[key].shape} != expected "
                f"{ref.shape}"
            )
    return out


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


# ---------------------------------------------------------------------------
# Inference layers (jit-traceable; batch axes broadcast through)
# ---------------------------------------------------------------------------


def _bn(p, key, x):
    """BatchNorm2d inference over the channel axis (axis -2 of [..., C, F])."""
    g = p[f"{key}.bn.g"][..., :, None]
    b = p[f"{key}.bn.b"][..., :, None]
    m = p[f"{key}.bn.m"][..., :, None]
    v = p[f"{key}.bn.v"][..., :, None]
    return (x - m) * jax.lax.rsqrt(v + _BN_EPS) * g + b


def _freq_conv(w_tap, x, stride, groups):
    """One time-tap of a conv: [O, I/g, kf] applied over the freq axis of
    ``x: [B, C, F]`` with 'same' padding."""
    kf = w_tap.shape[-1]
    pad = kf // 2
    return jax.lax.conv_general_dilated(
        x, w_tap,
        window_strides=(stride,),
        padding=[(pad, pad)],
        dimension_numbers=("NCH", "OIH", "NCH"),
        feature_group_count=groups,
    )


def _conv_step(p, key, frames, stride=1, groups=1, act="relu"):
    """Conv2dNormAct over a short time window, producing ONE output frame.

    ``frames``: [kt, B, C, F] — the causal window (oldest first), matching
    torch's left-only time padding. Applies grouped conv taps + optional
    pointwise + BatchNorm + activation."""
    w = p[f"{key}.w"]
    kt = w.shape[2]
    y = sum(
        _freq_conv(w[:, :, i, :], frames[i], stride, groups)
        for i in range(kt)
    )
    if f"{key}.pw" in p:
        y = _freq_conv(p[f"{key}.pw"][:, :, 0, :], y, 1, 1)
    y = _bn(p, key, y)
    if act == "relu":
        y = jax.nn.relu(y)
    elif act == "sigmoid":
        y = jax.nn.sigmoid(y)
    return y


def _convt_step(p, key, x):
    """ConvTranspose2dNormAct, freq stride 2, kernel (1,3), depthwise +
    pointwise + BN + ReLU, one frame: [B, C, F] -> [B, C, 2F].

    torch output size: (F-1)*2 - 2*pad + k = 2F with pad 1, output_pad 1.
    Implemented as zero-insertion (lhs dilation) + forward correlation with
    the converted (already re-laid-out and flipped) kernel."""
    w = p[f"{key}.w"][:, :, 0, :]  # [O, 1, 3]
    y = jax.lax.conv_general_dilated(
        x, w,
        window_strides=(1,),
        padding=[(1, 2)],  # k-1-pad = 1 left; +output_padding = 2 right
        lhs_dilation=(2,),
        dimension_numbers=("NCH", "OIH", "NCH"),
        feature_group_count=w.shape[0],
    )
    if f"{key}.pw" in p:
        y = _freq_conv(p[f"{key}.pw"][:, :, 0, :], y, 1, 1)
    y = _bn(p, key, y)
    return jax.nn.relu(y)


def _glinear_apply(w, x):
    """GroupedLinearEinsum: x [..., I] with w [g, I/g, O/g] -> [..., O]."""
    g, ig, og = w.shape
    xg = x.reshape(*x.shape[:-1], g, ig)
    y = jnp.einsum("...gi,gio->...go", xg, w)
    return y.reshape(*x.shape[:-1], g * og)


def _gru_step(p, key, x, h):
    """One torch-GRU cell step (gate order r, z, n)."""
    wi, wh = p[f"{key}.wi"], p[f"{key}.wh"]
    bi, bh = p[f"{key}.bi"], p[f"{key}.bh"]
    gi = x @ wi.T + bi
    gh = h @ wh.T + bh
    hs = wh.shape[1]
    r = jax.nn.sigmoid(gi[..., :hs] + gh[..., :hs])
    z = jax.nn.sigmoid(gi[..., hs:2 * hs] + gh[..., hs:2 * hs])
    n = jnp.tanh(gi[..., 2 * hs:] + r * gh[..., 2 * hs:])
    return (1.0 - z) * n + z * h


def _flatten_fc(x):
    """[B, C, F] -> [B, F*C] (freq-major, channel-minor — torch's
    ``permute(0, 2, 3, 1).flatten(2)``)."""
    return jnp.swapaxes(x, -1, -2).reshape(*x.shape[:-2], -1)


def _unflatten_cf(x, f):
    """[B, F*C] -> [B, C, F] inverse of :func:`_flatten_fc`."""
    c = x.shape[-1] // f
    return jnp.swapaxes(x.reshape(*x.shape[:-1], f, c), -1, -2)


# ---------------------------------------------------------------------------
# State
# ---------------------------------------------------------------------------


def dfn_state_init(batch_shape=(), lookahead: bool = False):
    """Streaming state pytree. ``lookahead=True`` selects the standard
    (2-frame lookahead) variant: the spectra of the two pending frames
    queue until their lookahead-informed gains exist; a state without the
    queue runs the LL variant. The variant is static under jit (pytree
    structure)."""
    bs = batch_shape
    state = {
        "analysis_mem": jnp.zeros(bs + (FRAME_SIZE,), jnp.float32),
        "synthesis_mem": jnp.zeros(bs + (FRAME_SIZE,), jnp.float32),
        # feature normalization (libDF band_mean_norm / band_unit_norm)
        "erb_norm": jnp.broadcast_to(
            jnp.asarray(_ERB_NORM_INIT), bs + (NB_ERB,)).astype(jnp.float32),
        "unit_norm": jnp.broadcast_to(
            jnp.asarray(_UNIT_NORM_INIT), bs + (NB_DF,)).astype(jnp.float32),
        # time-conv history buffers (oldest first)
        "erb_feat_hist": jnp.zeros(bs + (2, 1, NB_ERB), jnp.float32),
        "spec_feat_hist": jnp.zeros(bs + (2, 2, NB_DF), jnp.float32),
        "c0_hist": jnp.zeros(
            bs + (DF_PATHWAY_KT - 1, CONV_CH, NB_DF), jnp.float32),
        # recurrent states
        "enc_gru": jnp.zeros(bs + (EMB_HIDDEN,), jnp.float32),
        "erb_dec_gru": jnp.zeros(bs + (EMB_HIDDEN,), jnp.float32),
        "df_gru": jnp.zeros(bs + (DF_GRU_LAYERS, DF_HIDDEN), jnp.float32),
        # raw low-bin spectral history for order-5 deep filtering
        "spec_hist": jnp.zeros(bs + (DF_ORDER, NB_DF, 2), jnp.float32),
    }
    if lookahead:
        # standard variant: full spectra of the two pending frames
        # (t-2, t-1) awaiting their lookahead-informed gains
        state["spec_queue"] = jnp.zeros(
            bs + (2, FREQ_SIZE, 2), jnp.float32
        )
    return state


# ---------------------------------------------------------------------------
# Forward pass
# ---------------------------------------------------------------------------


def _dfn_analyze(params, state, x_frame):
    """Shared per-frame analysis: window/DFT the incoming frame, normalize
    features, run the encoder + both decoders, and emit the ERB bin gains,
    deep-filter output over the 5-frame low-bin history, and all updated
    state. Both latency variants share this exactly; they differ only in
    WHICH spectrum the outputs apply to (current frame for LL, frame t-2
    for the standard 2-frame-lookahead variant,
    `deepfilter_ffi.rs:40-43,226-243`)."""
    p = params
    windowed = jnp.concatenate(
        [state["analysis_mem"], x_frame], axis=-1) * _WINDOW
    X = rdft_auto(windowed, WINDOW_SIZE)
    power = jnp.square(jnp.abs(X)).astype(jnp.float32)

    # --- features ---
    # ERB log-power with exponential mean-norm (subtract EMA, /40)
    erb_db = 10.0 * jnp.log10(power @ _ERB_FB.T + 1e-10)
    erb_mean = (erb_db * (1.0 - _NORM_ALPHA)
                + state["erb_norm"] * _NORM_ALPHA)
    feat_erb = (erb_db - erb_mean) / 40.0
    # unit-norm complex spectrum of the low bins: EMA of |X|, x /= sqrt(s)
    low = X[..., :NB_DF]
    mag_low = jnp.abs(low).astype(jnp.float32)
    unit = (mag_low * (1.0 - _NORM_ALPHA)
            + state["unit_norm"] * _NORM_ALPHA)
    scale = jax.lax.rsqrt(jnp.maximum(unit, 1e-10))
    feat_spec = jnp.stack(
        [low.real * scale, low.imag * scale], axis=-2
    ).astype(jnp.float32)  # [..., 2, 96]

    # --- encoder ---
    erb_win = jnp.stack([
        state["erb_feat_hist"][..., 0, :, :],
        state["erb_feat_hist"][..., 1, :, :],
        feat_erb[..., None, :],
    ])  # [3, ..., 1, 32]
    spec_win = jnp.stack([
        state["spec_feat_hist"][..., 0, :, :],
        state["spec_feat_hist"][..., 1, :, :],
        feat_spec,
    ])  # [3, ..., 2, 96]
    e0 = _conv_step(p, "enc.erb_conv0", erb_win)                 # [.., C, 32]
    e1 = _conv_step(p, "enc.erb_conv1", e0[None], 2, CONV_CH)    # [.., C, 16]
    e2 = _conv_step(p, "enc.erb_conv2", e1[None], 2, CONV_CH)    # [.., C, 8]
    e3 = _conv_step(p, "enc.erb_conv3", e2[None], 1, CONV_CH)    # [.., C, 8]
    c0 = _conv_step(p, "enc.df_conv0", spec_win, 1, 2)           # [.., C, 96]
    c1 = _conv_step(p, "enc.df_conv1", c0[None], 2, CONV_CH)     # [.., C, 48]

    cemb = jax.nn.relu(_glinear_apply(p["enc.df_fc_emb.w"], _flatten_fc(c1)))
    emb = _flatten_fc(e3) + cemb                                 # [..., 512]
    g_in = jax.nn.relu(_glinear_apply(p["enc.emb_gru.lin_in.w"], emb))
    enc_h = _gru_step(p, "enc.emb_gru.gru_l0", g_in, state["enc_gru"])
    emb = jax.nn.relu(_glinear_apply(p["enc.emb_gru.lin_out.w"], enc_h))
    lsnr = (jax.nn.sigmoid(emb @ p["enc.lsnr.w"].T + p["enc.lsnr.b"])
            * (LSNR_MAX - LSNR_MIN) + LSNR_MIN)

    # --- ERB-gain decoder (skip pathway mirror) ---
    d_in = jax.nn.relu(_glinear_apply(p["erb_dec.emb_gru.lin_in.w"], emb))
    dec_h = _gru_step(p, "erb_dec.emb_gru.gru_l0", d_in,
                      state["erb_dec_gru"])
    demb = jax.nn.relu(_glinear_apply(p["erb_dec.emb_gru.lin_out.w"], dec_h))
    demb_cf = _unflatten_cf(demb, 8)                             # [.., C, 8]
    # convt3 is a regular stride-1 conv (kernel (1,3)); convt2/convt1 are
    # the true freq-upsampling transposed convs
    x3 = _conv_step(
        p, "erb_dec.convt3",
        (_conv_step(p, "erb_dec.conv3p", e3[None]) + demb_cf)[None],
        1, CONV_CH,
    )                                                            # [.., C, 8]
    x2 = _convt_step(
        p, "erb_dec.convt2",
        _conv_step(p, "erb_dec.conv2p", e2[None]) + x3,
    )                                                            # [.., C, 16]
    x1 = _convt_step(
        p, "erb_dec.convt1",
        _conv_step(p, "erb_dec.conv1p", e1[None]) + x2,
    )                                                            # [.., C, 32]
    mask = _conv_step(
        p, "erb_dec.conv0_out",
        (_conv_step(p, "erb_dec.conv0p", e0[None]) + x1)[None],
        1, 1, act="sigmoid",
    )                                                            # [.., 1, 32]
    erb_gains = mask[..., 0, :]

    # --- deep-filtering decoder ---
    f_in = jax.nn.relu(_glinear_apply(p["df_dec.df_gru.lin_in.w"], emb))
    df_h = state["df_gru"]
    new_df_h = []
    h = f_in
    for layer in range(DF_GRU_LAYERS):
        h = _gru_step(p, f"df_dec.df_gru.gru_l{layer}", h,
                      df_h[..., layer, :])
        new_df_h.append(h)
    df_hidden = jnp.stack(new_df_h, axis=-2)
    coefs = jnp.tanh(_glinear_apply(p["df_dec.df_out.w"], h))
    coefs = coefs.reshape(*coefs.shape[:-1], NB_DF, DF_ORDER * 2)
    # conv pathway from the spec encoder (time kernel 5, causal)
    c0_win = jnp.concatenate(
        [state["c0_hist"],
         c0[..., None, :, :]], axis=-3)                 # [.., 5, C, 96]
    cp = _conv_step(
        p, "df_dec.df_convp",
        jnp.moveaxis(c0_win, -3, 0), 1, 2,
    )                                                   # [.., O*2, 96]
    coefs = coefs + jnp.swapaxes(cp, -1, -2)            # [.., 96, O*2]
    df_c = coefs.reshape(*coefs.shape[:-1], DF_ORDER, 2)  # [.., 96, O, 2]
    df_c = jnp.swapaxes(df_c, -3, -2)                     # [.., O, 96, 2]

    # order-5 complex FIR over the RAW low-bin history. Tap i applies to
    # history frame i (oldest first); with lookahead the output frame is
    # the window's center, without it the newest (libDF df op semantics).
    low_ri = jnp.stack([low.real, low.imag], axis=-1).astype(jnp.float32)
    hist = jnp.concatenate(
        [state["spec_hist"][..., 1:, :, :], low_ri[..., None, :, :]],
        axis=-3,
    )
    hr, hi_ = hist[..., 0], hist[..., 1]
    cr, ci = df_c[..., 0], df_c[..., 1]
    df_re = jnp.sum(cr * hr - ci * hi_, axis=-2)
    df_im = jnp.sum(cr * hi_ + ci * hr, axis=-2)
    low_enh = df_re + 1j * df_im

    new_partial = {
        "analysis_mem": x_frame,
        "erb_norm": erb_mean,
        "unit_norm": unit,
        "erb_feat_hist": jnp.concatenate(
            [state["erb_feat_hist"][..., 1:, :, :],
             feat_erb[..., None, None, :]], axis=-3),
        "spec_feat_hist": jnp.concatenate(
            [state["spec_feat_hist"][..., 1:, :, :],
             feat_spec[..., None, :, :]], axis=-3),
        "c0_hist": c0_win[..., 1:, :, :],
        "enc_gru": enc_h,
        "erb_dec_gru": dec_h,
        "df_gru": df_hidden,
        "spec_hist": hist,
    }
    return X, new_partial, erb_gains, low_enh, lsnr


def _post_filter(gains, beta):
    """libDF post filter (Valin-style gain sharpening), applied to the ERB
    gains when beta > 0: g' = g(1+beta) / (1 + beta (g / sin(pi/2 g))^2)."""
    g_sin = jnp.sin(0.5 * jnp.pi * gains)
    ratio = gains / jnp.maximum(g_sin, 1e-6)
    return gains * (1.0 + beta) / (1.0 + beta * jnp.square(ratio))


def _dfn_synthesize(state, new_partial, X_tgt, erb_gains, low_enh,
                    atten_lim_db, post_filter_beta):
    """Apply the mask/deep-filter output to the target spectrum, mix the
    attenuation limit, and overlap-add one output frame."""
    beta = jnp.asarray(post_filter_beta, jnp.float32)
    gains = jnp.where(beta > 0, _post_filter(erb_gains, beta), erb_gains)
    bin_gains = gains @ _ERB_SPREAD.T  # rectangular spread to 481 bins
    Y = X_tgt * bin_gains
    # deep filtering REPLACES the low bins (mask applies only above nb_df —
    # DeepFilterNet enhance semantics)
    Y = Y.at[..., :NB_DF].set(low_enh)
    # attenuation limit, applied once: mix the noisy spectrum back in so no
    # bin is attenuated by more than the configured limit — this bounds the
    # ERB gains AND the deep-filtering stage together
    # (DeepFilterNet's df_set_atten_lim semantics, `deepfilter_ffi.rs:44-63`)
    gain_floor = jnp.power(
        10.0, -jnp.asarray(atten_lim_db, jnp.float32) / 20.0)
    Y = gain_floor * X_tgt + (1.0 - gain_floor) * Y

    y = irdft_auto(Y, WINDOW_SIZE).astype(jnp.float32) * _WINDOW
    out = state["synthesis_mem"] + y[..., :FRAME_SIZE]
    new_state = dict(new_partial)
    new_state["synthesis_mem"] = y[..., FRAME_SIZE:]
    return new_state, out, {"erb_gains": erb_gains}


def _dfn_frame_one_batch(params, state, x_frame, atten_lim_db,
                         post_filter_beta):
    """Core step with exactly one leading batch axis (the conv layers
    require [B, C, F] operands)."""
    X, new_partial, erb_gains, low_enh, lsnr = _dfn_analyze(
        params, state, x_frame
    )
    if "spec_queue" not in state:
        new_state, out, aux = _dfn_synthesize(
            state, new_partial, X, erb_gains, low_enh,
            atten_lim_db, post_filter_beta,
        )
        aux["lsnr"] = lsnr
        return new_state, out, aux
    queue = state["spec_queue"]
    X_tgt = (queue[..., 0, :, 0] + 1j * queue[..., 0, :, 1])
    X_ri = jnp.stack([X.real, X.imag], axis=-1).astype(jnp.float32)
    new_queue = jnp.concatenate(
        [queue[..., 1:, :, :], X_ri[..., None, :, :]], axis=-3
    )
    new_state, out, aux = _dfn_synthesize(
        state, new_partial, X_tgt, erb_gains, low_enh,
        atten_lim_db, post_filter_beta,
    )
    new_state["spec_queue"] = new_queue
    aux["lsnr"] = lsnr
    return new_state, out, aux


@jax.jit
def dfn_frame(params, state, x_frame, atten_lim_db=DEFAULT_ATTEN_LIM_DB,
              post_filter_beta=DEFAULT_POST_FILTER_BETA):
    """Enhance one 480-sample frame. Returns ``(new_state, y, aux)``.

    The latency variant is chosen by the STATE's pytree structure (static
    under jit): a state from ``dfn_state_init()`` runs the low-latency path
    (outputs apply to the current frame, 1-frame total latency); a state
    from ``dfn_state_init(lookahead=True)`` runs the standard
    2-frame-lookahead path, where the mask and order-5 deep filter
    predicted at frame ``t`` apply to the queued spectrum of frame ``t-2``
    — the FIR history ``t-4..t`` is then centred on the output frame,
    matching libDF's ``df_lookahead=2`` semantics
    (`deepfilter_ffi.rs:40-43,226-243`).

    ``x_frame: [..., 480]`` — any number of leading batch axes (including
    none); they are flattened into one for the conv layers and restored."""
    batch_shape = x_frame.shape[:-1]
    nb = len(batch_shape)
    if nb == 1:
        return _dfn_frame_one_batch(
            params, state, x_frame, atten_lim_db, post_filter_beta)

    def flat(a):
        return a.reshape((-1,) + a.shape[nb:])

    def unflat(a):
        return a.reshape(batch_shape + a.shape[1:])

    st = jax.tree_util.tree_map(flat, state)
    new_state, out, aux = _dfn_frame_one_batch(
        params, st, flat(x_frame), atten_lim_db, post_filter_beta)
    return (jax.tree_util.tree_map(unflat, new_state), unflat(out),
            jax.tree_util.tree_map(unflat, aux))


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
    delays — the standard variant's mask/deep-filter are trained to apply
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
