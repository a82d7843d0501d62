"""RNNoise noise suppression as batched XLA inference — exact graph.

The reference ships RNNoise via the pure-Rust ``nnnoiseless`` crate (a
faithful port of Xiph RNNoise, pinned at `rust-core/Cargo.toml:17`) wrapped
in a frame-staging processor (`rust-core/src/dsp/rnnoise.rs`):

- 480-sample (10 ms) frames buffered through fixed rings
  (`rnnoise.rs:9-11,122-164`); model I/O scaled ±1.0 -> PCM ±32768 with a
  soft-clip knee at 0.98 (`rnnoise.rs:13-19,88-111`).
- Wet/dry strength smoothed with a 15 ms per-frame EMA
  (`rnnoise.rs:33-41,79-86`); ``soft_reset`` clears staging but preserves
  the learned recurrent state (`rnnoise.rs:224-231`); latency is one frame
  = 480 samples (`rnnoise.rs:313-315`).

This module re-implements the published RNNoise processing graph
**exactly** (the binding contract for converted weight archives), batched
over a leading stream axis:

- input high-pass biquad ``b=[1,-2,1], a=[1,-1.99599,0.99600]``;
- Vorbis-windowed 960-point FFT at 480 hop with Opus forward 1/N scaling;
- 22 ``eband5ms`` triangular band energies with edge-band doubling and the
  20 kHz cutoff (bins >= 400 excluded from bands and zeroed on synthesis);
- the full Opus/CELT pitch tracker: 2x downsample + order-4 LPC
  pre-whitening FIR, two-stage (12 kHz coarse / 24 kHz refined)
  normalized-correlation search with top-2 candidate pruning, octave
  disambiguation (``remove_doubling`` with the ``second_check`` table and
  continuity thresholds), pseudo-interpolation;
- the 42-dim feature vector: 22 BFCC (orthonormal DCT-II with the
  sqrt(1/2) first-row scale, -12/-4 offsets, first 6 smoothed over 3
  frames), 6+6 delta/delta-delta cepstra, 6 pitch-correlation cepstra
  (-1.3/-0.9 offsets), normalized pitch period, spectral variability over
  an 8-frame cepstral memory;
- the RNN: dense(42->24, tanh) -> vad GRU(24, tanh) -> noise GRU(90->48,
  relu) -> denoise GRU(114->96, relu) -> sigmoid heads, with the RNNoise
  GRU form (gate order [z|r|h~], reset applied to the STATE before the
  recurrent matmul, ``h' = z*h + (1-z)*h~``);
- pitch comb filtering of the spectrum, band-gain hangover
  ``g = max(g, 0.6*lastg)``, per-bin gain interpolation, and the
  E < 0.04 silence bypass (RNN and gains skipped, recurrent state frozen).

Numerics note: the C implementation evaluates sigmoid/tanh via table
approximations; this graph uses the exact functions. The conversion
contract therefore budgets ~1e-3 absolute tolerance on activations and
gains rather than bit-exactness (`tools/convert_model_weights.py`).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from ..ops.biquad import apply_fixed as biquad_apply_fixed
from ..ops.dft import irdft_auto, rdft_auto

__all__ = [
    "FRAME_SIZE",
    "WINDOW_SIZE",
    "FREQ_SIZE",
    "NB_BANDS",
    "NB_FEATURES",
    "CEPS_MEM",
    "PITCH_MIN_PERIOD",
    "PITCH_MAX_PERIOD",
    "PITCH_FRAME_SIZE",
    "PITCH_BUF_SIZE",
    "init_params",
    "load_weights",
    "default_params",
    "weights_source",
    "discover_model_path",
    "rnnoise_state_init",
    "rnnoise_frame",
    "rnnoise_frames",
    "frame_features",
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
NB_DELTA_CEPS = 6
NB_FEATURES = NB_BANDS + 3 * NB_DELTA_CEPS + 2  # 42
CEPS_MEM = 8
LATENCY_SAMPLES = FRAME_SIZE

PITCH_MIN_PERIOD = 60
PITCH_MAX_PERIOD = 768
PITCH_FRAME_SIZE = 960
PITCH_BUF_SIZE = PITCH_MAX_PERIOD + PITCH_FRAME_SIZE  # 1728

PCM_SCALE = 32768.0
PCM_MODEL_LIMIT = 32760.0
SOFT_CLIP_THRESHOLD = 0.98

_SILENCE_ENERGY = 0.04
_GAIN_HANGOVER = 0.6

# input high-pass biquad (rnnoise denoise.c: b_hp / a_hp)
_HP_B = (-2.0, 1.0)
_HP_A = (-1.99599, 0.99600)

# Opus 5 ms band edges; <<2 for the 960-point transform (bin units; top
# edge bin 400 = 20 kHz at 48 kHz).
_EBAND5MS = np.array(
    [0, 1, 2, 3, 4, 5, 6, 7, 8, 10, 12, 14, 16, 20, 24, 28, 34, 40, 48, 60, 78, 100]
)
_BAND_EDGES = _EBAND5MS * 4
_TOP_BIN = int(_BAND_EDGES[-1])  # 400


def _vorbis_window() -> np.ndarray:
    n = np.arange(WINDOW_SIZE)
    s = np.sin(np.pi * (n + 0.5) / WINDOW_SIZE)
    return np.sin(0.5 * np.pi * s * s).astype(np.float32)


_WINDOW = _vorbis_window()


def _band_matrix() -> np.ndarray:
    """``(NB_BANDS, FREQ_SIZE)`` triangular analysis weights matching
    ``compute_band_energy``: each band pair splits its bins fractionally,
    edge bands are doubled, bins >= 400 contribute nothing."""
    m = np.zeros((NB_BANDS, FREQ_SIZE), np.float64)
    for b in range(NB_BANDS - 1):
        lo, hi = _BAND_EDGES[b], _BAND_EDGES[b + 1]
        size = hi - lo
        for j in range(size):
            frac = j / size
            m[b, lo + j] += 1.0 - frac
            m[b + 1, lo + j] += frac
    m[0] *= 2.0
    m[NB_BANDS - 1] *= 2.0
    return m


def _interp_matrix() -> np.ndarray:
    """``(FREQ_SIZE, NB_BANDS)`` per-bin gain interpolation matching
    ``interp_band_gain``: linear blend inside each band pair; bins >= 400
    stay at gain zero."""
    m = np.zeros((FREQ_SIZE, NB_BANDS), np.float64)
    for b in range(NB_BANDS - 1):
        lo, hi = _BAND_EDGES[b], _BAND_EDGES[b + 1]
        size = hi - lo
        for j in range(size):
            frac = j / size
            m[lo + j, b] = 1.0 - frac
            m[lo + j, b + 1] = frac
    return m


_BANDS = jnp.asarray(_band_matrix(), jnp.float32)  # (22, 481)
_INTERP = jnp.asarray(_interp_matrix(), jnp.float32)  # (481, 22)


def _dct_matrix() -> np.ndarray:
    """RNNoise's DCT-II table: ``out[k] = sum_j in[j] cos((j+.5) k pi/22)
    * sqrt(2/22)`` with the first output scaled by ``sqrt(1/2)``."""
    j = np.arange(NB_BANDS)
    k = np.arange(NB_BANDS)[:, None]
    m = np.cos(np.pi / NB_BANDS * (j[None, :] + 0.5) * k) * np.sqrt(2.0 / NB_BANDS)
    m[0] *= np.sqrt(0.5)
    return m


_DCT = jnp.asarray(_dct_matrix(), jnp.float32)  # (22, 22): ceps = logE @ _DCT.T

# remove_doubling's sub-period cross-check table (celt/pitch.c)
_SECOND_CHECK = np.array([0, 0, 3, 2, 3, 2, 5, 2, 3, 2, 3, 2, 5, 2, 3, 2])


# ---------------------------------------------------------------------------
# Weights
# ---------------------------------------------------------------------------

_GRU_DIMS = {
    "vad_gru": (24, 24),
    "noise_gru": (24 + 24 + NB_FEATURES, 48),
    "denoise_gru": (24 + 48 + NB_FEATURES, 96),
}
_GRU_ACT = {"vad_gru": jnp.tanh, "noise_gru": jax.nn.relu,
            "denoise_gru": jax.nn.relu}


def init_params(seed: int = 0x4242):
    """RNNoise topology: dense(42->24, tanh) -> GRU(24, tanh) ->
    GRU(48, relu) -> GRU(96, relu) -> dense(22, sigmoid) band gains +
    dense(1, sigmoid) VAD from the vad GRU state.

    Weight layout contract (the conversion target for published RNNoise
    model dumps): ``{name}_wi [din, 3h]`` / ``{name}_wh [h, 3h]`` /
    ``{name}_b [3h]`` with gate order ``[z | r | h~]``; dense weights are
    ``[din, dout]``, applied as ``x @ w + b``.
    """
    rng = np.random.default_rng(seed)

    def w(*shape):
        return jnp.asarray(
            rng.normal(0.0, 1.0 / np.sqrt(shape[0]), shape), jnp.float32
        )

    p = {
        "input_w": w(NB_FEATURES, 24),
        "input_b": jnp.zeros((24,), jnp.float32),
        "vad_out_w": w(24, 1),
        "vad_out_b": jnp.zeros((1,), jnp.float32),
        "denoise_out_w": w(96, NB_BANDS),
        "denoise_out_b": jnp.zeros((NB_BANDS,), jnp.float32),
    }
    for name, (din, dh) in _GRU_DIMS.items():
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
    """Load a weight archive (converted published RNNoise weights, or
    framework-trained weights from ``tools/train_rnnoise_weights.py``),
    validated against the framework graph's key/shape contract. Keys
    starting with ``__`` are provenance metadata, not weights."""
    data = np.load(path)
    params = {k: jnp.asarray(data[k], jnp.float32) for k in data.files
              if not k.startswith("__")}
    return _validate_loaded(params, init_params())


def archive_provenance(path) -> str:
    """The ``__provenance__`` metadata string of an archive (``"trained"``
    for in-repo synthetic-corpus training runs), else ``"converted"``."""
    data = np.load(path)
    if "__provenance__" in data.files:
        return str(np.asarray(data["__provenance__"]).item())
    return "converted"


def discover_model_path():
    """Weight-archive discovery mirroring the reference's model lookup
    pattern (`vad.rs:133-184` shape, applied to the suppressor):
    ``RNNOISE_MODEL_PATH`` env first, then ``models/rnnoise.npz`` next to
    the package root. Returns None when nothing is found."""
    import os
    from pathlib import Path

    env = os.environ.get("RNNOISE_MODEL_PATH")
    if env and Path(env).is_file():
        return Path(env)
    candidate = (
        Path(__file__).resolve().parents[2] / "models" / "rnnoise.npz"
    )
    return candidate if candidate.is_file() else None


_DEFAULT_PARAMS_CACHE: dict = {}


def default_params():
    """Resolve the default weight set once per process: a discovered
    archive (:func:`discover_model_path`) wins; otherwise the seeded
    structural weights. :func:`weights_source` reports which — callers
    that gate on denoising quality must check it."""
    if "params" not in _DEFAULT_PARAMS_CACHE:
        path = discover_model_path()
        if path is not None:
            _DEFAULT_PARAMS_CACHE["params"] = load_weights(path)
            _DEFAULT_PARAMS_CACHE["source"] = archive_provenance(path)
        else:
            _DEFAULT_PARAMS_CACHE["params"] = init_params()
            _DEFAULT_PARAMS_CACHE["source"] = "seeded"
    return _DEFAULT_PARAMS_CACHE["params"]


def weights_source() -> str:
    """``"converted"`` (published archive), ``"trained"`` (in-repo
    synthetic-corpus training), or ``"seeded"`` (structural weights —
    shape/state/latency faithful but not noise-discriminative)."""
    default_params()
    return _DEFAULT_PARAMS_CACHE["source"]


# ---------------------------------------------------------------------------
# State
# ---------------------------------------------------------------------------


def rnnoise_state_init(batch_shape=()):
    f32 = jnp.float32
    z = lambda *s: jnp.zeros(batch_shape + s, f32)
    return {
        "analysis_mem": z(FRAME_SIZE),
        "synthesis_mem": z(FRAME_SIZE),
        # rolled cepstral ring: index 0 = newest frame
        "cepstral_mem": z(CEPS_MEM, NB_BANDS),
        "vad_gru": z(24),
        "noise_gru": z(48),
        "denoise_gru": z(96),
        "pitch_buf": z(PITCH_BUF_SIZE),
        "last_period": jnp.zeros(batch_shape, jnp.int32),
        "last_gain": z(),
        "lastg": z(NB_BANDS),
        "hp_mem": z(2),
    }


# ---------------------------------------------------------------------------
# DSP pieces
# ---------------------------------------------------------------------------


_HP_COEFFS = np.array([1.0, _HP_B[0], _HP_B[1], _HP_A[0], _HP_A[1]],
                      dtype=np.float32)


def _hp_biquad(mem, x):
    """rnnoise's input DF2T biquad (b=[1,-2,1], a=[1,-1.99599,0.996]).

    Poles sit at |z|~0.998, so a plain-f32 recurrence drifts ~2e-2 relative
    over one 960-sample block. The coefficients are static, so the whole
    block is applied as host-precomputed f64-exact IR/state matmuls
    (:func:`audioforge_tpu.ops.biquad.apply_fixed`) — pure MXU work, more
    accurate than the compensated scan it replaces and ~15x cheaper per
    frame at fleet scale.
    """
    y, mem_out = biquad_apply_fixed(tuple(_HP_COEFFS), mem, x)
    return mem_out, y


def _fwd(x):
    """Opus forward transform: FFT with 1/N scaling."""
    return rdft_auto(x, WINDOW_SIZE) * (1.0 / WINDOW_SIZE)


def _inv(X):
    """Opus inverse transform (unscaled IFFT = numpy irfft * N)."""
    return irdft_auto(X, WINDOW_SIZE).astype(jnp.float32) * WINDOW_SIZE


def _band_energy(X):
    mag2 = (X.real * X.real + X.imag * X.imag).astype(jnp.float32)
    return mag2 @ _BANDS.T


def _band_corr(X, P):
    cross = (X.real * P.real + X.imag * P.imag).astype(jnp.float32)
    return cross @ _BANDS.T


def _sliding_inner(y, frame, n_lags):
    """``out[..., i] = sum_j frame[..., j] * y[..., j + i]`` for
    ``i < n_lags`` — batched sliding correlation as a grouped 1-D
    convolution (per-stream kernels; avoids materialising the
    ``[..., n_lags, L]`` window tensor inside the frame scan)."""
    L = frame.shape[-1]
    lead = y.shape[:-1]
    y2 = y.reshape((-1, y.shape[-1])) if lead else y[None]
    f2 = frame.reshape((-1, L)) if lead else frame[None]
    B = y2.shape[0]
    out = jax.lax.conv_general_dilated(
        y2[None],  # [1, B, Ly]
        f2[:, None, :],  # [B, 1, L]
        window_strides=(1,),
        padding="VALID",
        dimension_numbers=("NCH", "OIH", "NCH"),
        feature_group_count=B,
    )[0][..., :n_lags]  # [B, n_lags]
    return out.reshape(lead + (n_lags,)) if lead else out[0]


def _slice_rows(buf, start, length: int, max_start: int | None = None):
    """``out[..., i] = buf[..., start + i]`` for a per-stream integer
    ``start`` — a batched contiguous window.

    TPU lowering notes: ``take_along_axis`` (one index per ELEMENT) costs
    ~40 ms/frame at fleet 256 inside the frame scan; a vmapped
    ``lax.dynamic_slice`` (one index per row) is ~30x better but still
    ~1 ms/frame at fleet 1024 because per-row dynamic starts defeat the
    lane layout. With a known ``max_start`` the window is instead selected
    by a barrel shifter: a tree of STATIC slices blended with ``where``
    masks (strides 128/16/1 — ~30 masked adds, all fully lane-parallel)."""
    lead = buf.shape[:-1]
    if not lead:
        return jax.lax.dynamic_slice(buf, (start,), (length,))
    if max_start is None:
        max_start = buf.shape[-1] - length
    rem = jnp.broadcast_to(start, lead)
    cur = buf
    cur_max = max_start
    for stride in (128, 16, 1):
        if cur_max == 0:
            break
        if stride > 1 and cur_max < stride:
            continue
        n_q = cur_max // stride + 1
        next_max = (stride - 1) if stride > 1 else 0
        seg_len = length + next_max
        need = (n_q - 1) * stride + seg_len
        if cur.shape[-1] < need:
            pad = [(0, 0)] * (cur.ndim - 1) + [(0, need - cur.shape[-1])]
            cur = jnp.pad(cur, pad)
        q = rem // stride if stride > 1 else rem
        rem = rem - q * stride
        acc = None
        for qi in range(n_q):
            seg = cur[..., qi * stride : qi * stride + seg_len]
            m = (q == qi)[..., None]
            term = jnp.where(m, seg, 0.0)
            acc = term if acc is None else acc + term
        cur = acc
        cur_max = next_max
    return cur[..., :length]


def _find_best_pitch(xcorr, y, length):
    """Top-2 lags of ``xcorr[i]^2 / Syy_i`` over positive correlations
    (celt ``find_best_pitch``), vectorised. ``Syy_i = 1 + sum y[i..i+len)^2``
    floored at 1. Returns ``(best0, best1)`` int32 lags."""
    n_lags = xcorr.shape[-1]
    y2 = y * y
    csum = jnp.cumsum(y2, axis=-1)
    zero = jnp.zeros_like(csum[..., :1])
    csum = jnp.concatenate([zero, csum], axis=-1)
    i = jnp.arange(n_lags)
    syy = 1.0 + csum[..., i + length] - csum[..., i]
    syy = jnp.maximum(syy, 1.0)
    valid = xcorr > 0
    score = jnp.where(valid, (xcorr * xcorr) / syy, -1.0)
    best0 = jnp.argmax(score, axis=-1)
    masked = jnp.where(
        jnp.arange(n_lags) == best0[..., None], -2.0, score
    )
    best1 = jnp.argmax(masked, axis=-1)
    any_valid = jnp.any(valid, axis=-1)
    best0 = jnp.where(any_valid, best0, 0).astype(jnp.int32)
    best1 = jnp.where(any_valid, best1, 1).astype(jnp.int32)
    return best0, best1


def _lpc4(ac):
    """Order-4 Levinson-Durbin (celt ``_celt_lpc``) with the early-exit
    expressed as a freeze mask. ``ac: [..., 5]`` -> ``lpc: [..., 4]``."""
    lead = ac.shape[:-1]
    lpc = [jnp.zeros(lead, jnp.float32) for _ in range(4)]
    error = ac[..., 0]
    alive = ac[..., 0] != 0.0
    for i in range(4):
        rr = ac[..., i + 1]
        for j in range(i):
            rr = rr + lpc[j] * ac[..., i - j]
        r = -rr / jnp.where(error == 0.0, 1.0, error)
        upd = list(lpc)
        upd[i] = r
        for j in range((i + 1) // 2):
            t1, t2 = lpc[j], lpc[i - 1 - j]
            upd[j] = t1 + r * t2
            upd[i - 1 - j] = t2 + r * t1
        new_error = error - r * r * error
        lpc = [jnp.where(alive, u, o) for u, o in zip(upd, lpc)]
        error = jnp.where(alive, new_error, error)
        alive = alive & (error >= 0.001 * ac[..., 0])
    return jnp.stack(lpc, axis=-1)


def _pitch_downsample(buf48):
    """celt ``pitch_downsample``: 2x decimate with [.25 .5 .25], then
    pre-whiten with a 5-tap FIR built from lag-windowed order-4 LPC."""
    half = PITCH_BUF_SIZE // 2  # 864
    x = buf48
    even = x[..., 0::2]  # x[2i], i < 864
    # x_lp[i] = .25 x[2i-1] + .5 x[2i] + .25 x[2i+1]   (i >= 1)
    # x_lp[0] = .25 x[1] + .5 x[0]
    left = jnp.concatenate(
        [jnp.zeros_like(x[..., :1]), x[..., 1:-1:2]], axis=-1
    )  # x[2i-1] with 0 at i=0
    right = x[..., 1::2]  # x[2i+1]
    x_lp = 0.25 * left + 0.5 * even + 0.25 * right

    # autocorrelation lags 0..4
    ac = jnp.stack(
        [
            jnp.sum(x_lp[..., : half - k] * x_lp[..., k:], axis=-1)
            for k in range(5)
        ],
        axis=-1,
    )
    ac = ac.at[..., 0].multiply(1.0001)
    lagw = jnp.asarray(
        [1.0] + [1.0 - (0.008 * i) ** 2 for i in range(1, 5)], jnp.float32
    )
    ac = ac * lagw
    lpc = _lpc4(ac)
    decay = jnp.asarray([0.9**(i + 1) for i in range(4)], jnp.float32)
    lpc = lpc * decay
    # add a zero at 0.8: lpc2 (5 taps)
    l0, l1, l2, l3 = (lpc[..., k] for k in range(4))
    c = 0.8
    taps = jnp.stack(
        [l0 + c, l1 + c * l0, l2 + c * l1, l3 + c * l2, c * l3], axis=-1
    )
    # celt_fir5: y[i] = x[i] + sum_k taps[k] * x[i-1-k], zero history
    acc = x_lp
    for k in range(5):
        shifted = jnp.concatenate(
            [jnp.zeros_like(x_lp[..., : k + 1]), x_lp[..., : half - k - 1]],
            axis=-1,
        )
        acc = acc + taps[..., k : k + 1] * shifted
    return acc  # 24 kHz, length 864


def _pitch_search(x_lp, y24):
    """celt ``pitch_search``: coarse 12 kHz scan over all lags, refined
    24 kHz correlation only near the two coarse candidates (others
    contribute 0 exactly as the C loop leaves them). Returns the lag in
    48 kHz units and the refined xcorr row for interpolation."""
    max_pitch = PITCH_MAX_PERIOD - 3 * (PITCH_MIN_PERIOD // 2)  # 678
    len24 = PITCH_FRAME_SIZE // 2  # 480
    n12 = max_pitch // 4  # 169
    n24 = max_pitch // 2  # 339

    x4 = x_lp[..., 0::2][..., : PITCH_FRAME_SIZE // 4]  # 240 @ 12 kHz
    y4 = y24[..., 0::2]
    xc4 = _sliding_inner(y4, x4, n12)
    c0, c1 = _find_best_pitch(xc4, y4, PITCH_FRAME_SIZE // 4)

    # one extra tail of lags (339..384) so the same correlation row serves
    # remove_doubling's sub-period probes — the conv runs once per frame
    xc24_ext = _sliding_inner(y24, x_lp, PITCH_MAX_PERIOD // 2 + 1)
    xc24_full = xc24_ext[..., :n24]
    lags = jnp.arange(n24)
    near = (
        (jnp.abs(lags - 2 * c0[..., None]) <= 2)
        | (jnp.abs(lags - 2 * c1[..., None]) <= 2)
    )
    xc24 = jnp.where(near, jnp.maximum(xc24_full, -1.0), 0.0)
    b0, _ = _find_best_pitch(xc24, y24, len24)

    # pseudo-interpolation (celt pitch_search tail)
    interior = (b0 > 0) & (b0 < n24 - 1)
    idx = jnp.clip(b0, 1, n24 - 2)
    tri = jnp.stack([idx - 1, idx, idx + 1], axis=-1)
    hot = jax.nn.one_hot(tri, n24, dtype=xc24.dtype)
    abc = jnp.einsum("...kp,...p->...k", hot, xc24)
    a, b, c = abc[..., 0], abc[..., 1], abc[..., 2]
    offset = jnp.where(
        (c - a) > 0.7 * (b - a), 1,
        jnp.where((a - c) > 0.7 * (b - c), -1, 0),
    )
    offset = jnp.where(interior, offset, 0)
    return (2 * b0 - offset).astype(jnp.int32), xc24_ext  # 48 kHz units


def _compute_pitch_gain(xy, xx, yy):
    return xy / jnp.sqrt(1.0 + xx * yy)


def _remove_doubling(x24, T0_48, prev_period_48, prev_gain, corr_row=None):
    """celt ``remove_doubling`` at 2x decimation: checks each sub-period
    T0/k (k = 2..15) with the continuity thresholds and keeps the LAST
    passing candidate, then pseudo-interpolates. Returns
    ``(T0_48_new, gain)``."""
    maxp = PITCH_MAX_PERIOD // 2  # 384 @ 24 kHz
    minp = PITCH_MIN_PERIOD // 2  # 30
    N = PITCH_FRAME_SIZE // 2  # 480
    minperiod0 = PITCH_MIN_PERIOD

    T0 = jnp.minimum(T0_48 // 2, maxp - 1)
    prev_period = prev_period_48 // 2

    lead = x24.shape[:-1]
    # x "pointer" at offset maxp: x[k] = x24[maxp + k], x[-i] = x24[maxp - i]
    xw = x24[..., maxp : maxp + N]  # x[0..N)
    xx = jnp.sum(xw * xw, axis=-1)

    # yy_lookup[i] = max(0, xx + sum_{j<i} x[-1-j]^2 - x[N-1-j]^2)
    back = x24[..., maxp - maxp : maxp][..., ::-1]  # x[-1], x[-2], .. x[-maxp]
    fwd = x24[..., maxp + N - maxp : maxp + N][..., ::-1]  # x[N-1] .. x[N-maxp]
    deltas = back * back - fwd * fwd
    yy_lookup = jnp.concatenate(
        [xx[..., None], xx[..., None] + jnp.cumsum(deltas, axis=-1)], axis=-1
    )
    yy_lookup = jnp.maximum(yy_lookup, 0.0)  # (..., maxp+1)

    # One full correlation row corr_full[..., i] = sum_j xw[j] * x24[i+j]
    # (so corr_at(T) == corr_full[maxp - T]); every sub-period probe then
    # becomes a one-element lookup, and ALL lookups batch into single
    # gathers. Probing each T with a per-stream dynamic 480-slice instead
    # costs ~30 ms/frame at fleet 1024 on TPU (33 gathered windows/frame).
    # ``corr_row`` reuses the row the 24 kHz pitch search already computed.
    corr_full = (corr_row if corr_row is not None
                 else _sliding_inner(x24, xw, maxp + 1))

    # ---- stacked sub-period candidate table (k = 2..15) ----
    ks = np.arange(2, 16)
    T1s = (2 * T0[..., None] + ks) // (2 * ks)  # (..., 14)
    sec = _SECOND_CHECK[ks]
    T1bs = (2 * sec * T0[..., None] + ks) // (2 * ks)
    # k == 2 special case
    t1b2 = jnp.where(T1s[..., 0] + T0 > maxp, T0, T0 + T1s[..., 0])
    T1bs = T1bs.at[..., 0].set(t1b2)
    T1cs = jnp.clip(T1s, 0, maxp)
    T1bcs = jnp.clip(T1bs, 0, maxp)

    # all xy/yy probes (incl. T0 itself) via ONE-HOT MATMULS: a [.., 29]
    # element gather lowers poorly inside the frame scan on TPU, while
    # onehot[.., 29, 385] x row[.., 385] is a tiny batched matmul the MXU
    # eats (~22 MFLOP/frame at fleet 1024)
    probes = jnp.concatenate([T0[..., None], T1cs, T1bcs], axis=-1)
    hot_xy = jax.nn.one_hot(maxp - probes, maxp + 1, dtype=corr_full.dtype)
    hot_yy = jax.nn.one_hot(probes, maxp + 1, dtype=yy_lookup.dtype)
    xy_all = jnp.einsum("...kp,...p->...k", hot_xy, corr_full)
    yy_all = jnp.einsum("...kp,...p->...k", hot_yy, yy_lookup)

    xy0, yy0 = xy_all[..., 0], yy_all[..., 0]
    g0 = _compute_pitch_gain(xy0, xx, yy0)

    best_xy, best_yy = xy0, yy0
    T = T0
    g = g0

    for i, k in enumerate(range(2, 16)):
        T1 = T1s[..., i]
        live = T1 >= minp  # the C loop breaks here; T1 shrinks with k
        xy = 0.5 * (xy_all[..., 1 + i] + xy_all[..., 15 + i])
        yy = 0.5 * (yy_all[..., 1 + i] + yy_all[..., 15 + i])
        g1 = _compute_pitch_gain(xy, xx, yy)
        cont = jnp.where(
            jnp.abs(T1 - prev_period) <= 1,
            prev_gain,
            jnp.where(
                (jnp.abs(T1 - prev_period) <= 2) & (5 * k * k < T0),
                0.5 * prev_gain,
                0.0,
            ),
        )
        thresh = jnp.maximum(0.3, 0.7 * g0 - cont)
        thresh = jnp.where(
            T1 < 2 * minp,
            jnp.maximum(0.5, 0.9 * g0 - cont),
            jnp.where(
                T1 < 3 * minp, jnp.maximum(0.4, 0.85 * g0 - cont), thresh
            ),
        )
        take = live & (g1 > thresh)
        best_xy = jnp.where(take, xy, best_xy)
        best_yy = jnp.where(take, yy, best_yy)
        T = jnp.where(take, T1, T)
        g = jnp.where(take, g1, g)

    best_xy = jnp.maximum(0.0, best_xy)
    # float-build celt: pg = best_xy / (best_yy + best_xy) below the
    # Q15ONE saturation point
    pg = jnp.where(
        best_yy <= best_xy, 1.0, best_xy / (best_yy + best_xy)
    )
    # pseudo-interpolation around T (same one-hot-matmul lookup)
    Tsafe = jnp.clip(T, 1, maxp - 1)
    tri = jnp.stack([Tsafe - 1, Tsafe, Tsafe + 1], axis=-1)
    hot_tri = jax.nn.one_hot(maxp - tri, maxp + 1, dtype=corr_full.dtype)
    xc = jnp.einsum("...kp,...p->...k", hot_tri, corr_full)
    offset = jnp.where(
        (xc[..., 2] - xc[..., 0]) > 0.7 * (xc[..., 1] - xc[..., 0]), 1,
        jnp.where(
            (xc[..., 0] - xc[..., 2]) > 0.7 * (xc[..., 1] - xc[..., 2]),
            -1, 0,
        ),
    )
    pg = jnp.minimum(pg, g)
    T0_new = jnp.maximum(2 * T + offset, minperiod0)
    return T0_new.astype(jnp.int32), pg


def _gru(p, name, h, x):
    """RNNoise GRU: gate order [z|r|h~], reset applied to the state BEFORE
    the recurrent matmul, update ``h' = z*h + (1-z)*h~``."""
    dh = h.shape[-1]
    wi, wh, b = p[f"{name}_wi"], p[f"{name}_wh"], p[f"{name}_b"]
    zi = x @ wi[:, :dh] + h @ wh[:, :dh] + b[:dh]
    ri = x @ wi[:, dh : 2 * dh] + h @ wh[:, dh : 2 * dh] + b[dh : 2 * dh]
    z = jax.nn.sigmoid(zi)
    r = jax.nn.sigmoid(ri)
    hi = (
        x @ wi[:, 2 * dh :]
        + (r * h) @ wh[:, 2 * dh :]
        + b[2 * dh :]
    )
    h_tilde = _GRU_ACT[name](hi)
    return z * h + (1.0 - z) * h_tilde


def _spectral_floor(logE):
    """rnnoise's Ly loop: per-band log energy with the running ``follow``
    (-1.5 dB/band decay) and ``logMax - 7`` floors. 22 static steps."""
    lead = logE.shape[:-1]
    log_max = jnp.full(lead, -2.0, jnp.float32)
    follow = jnp.full(lead, -2.0, jnp.float32)
    out = []
    for i in range(NB_BANDS):
        ly = jnp.maximum(
            log_max - 7.0, jnp.maximum(follow - 1.5, logE[..., i])
        )
        out.append(ly)
        log_max = jnp.maximum(log_max, ly)
        follow = jnp.maximum(follow - 1.5, ly)
    return jnp.stack(out, axis=-1)


def frame_features(state, x_frame):
    """Exact ``compute_frame_features``: returns
    ``(features, X, P, Ex, Ep, Exp, silence, updates)`` where ``updates``
    carries the new pitch/cepstral state (cepstral memory advance is
    conditional on non-silence, applied by the caller)."""
    # analysis of the HP-filtered frame
    windowed = jnp.concatenate(
        [state["analysis_mem"], x_frame], axis=-1
    ) * _WINDOW
    X = _fwd(windowed)
    Ex = _band_energy(X)

    # pitch buffer advance + tracker
    pitch_buf = jnp.concatenate(
        [state["pitch_buf"][..., FRAME_SIZE:], x_frame], axis=-1
    )
    x24 = _pitch_downsample(pitch_buf)
    x_lp = x24[..., PITCH_MAX_PERIOD // 2 :]  # last 480 @ 24 kHz
    raw_idx, corr_row = _pitch_search(x_lp, x24)
    pitch_index = PITCH_MAX_PERIOD - raw_idx
    pitch_index, gain = _remove_doubling(
        x24, pitch_index, state["last_period"], state["last_gain"],
        corr_row=corr_row,
    )

    # pitch-delayed window: p[i] = pitch_buf[PITCH_BUF_SIZE - WINDOW_SIZE
    # - pitch_index + i]
    start = PITCH_BUF_SIZE - WINDOW_SIZE - pitch_index
    p = _slice_rows(pitch_buf, start, WINDOW_SIZE) * _WINDOW
    P = _fwd(p)
    Ep = _band_energy(P)
    Exp_raw = _band_corr(X, P)
    Exp = Exp_raw / jnp.sqrt(0.001 + Ex * Ep)

    pitch_ceps = Exp @ _DCT.T
    pc = pitch_ceps[..., :NB_DELTA_CEPS]
    pc = pc.at[..., 0].add(-1.3)
    pc = pc.at[..., 1].add(-0.9)

    # band log energies with spectral floor
    E = jnp.sum(Ex, axis=-1)
    Ly = _spectral_floor(jnp.log10(1e-2 + Ex))
    silence = E < _SILENCE_ENERGY

    ceps = Ly @ _DCT.T
    ceps = ceps.at[..., 0].add(-12.0)
    ceps = ceps.at[..., 1].add(-4.0)

    mem = state["cepstral_mem"]  # (..., 8, 22), newest first
    c0 = ceps
    c1 = mem[..., 0, :]
    c2 = mem[..., 1, :]
    smoothed = (c0 + c1 + c2)[..., :NB_DELTA_CEPS]
    d1 = (c0 - c2)[..., :NB_DELTA_CEPS]
    d2 = (c0 - 2.0 * c1 + c2)[..., :NB_DELTA_CEPS]
    bfcc = jnp.concatenate([smoothed, c0[..., NB_DELTA_CEPS:]], axis=-1)

    new_mem = jnp.concatenate([c0[..., None, :], mem[..., :-1, :]], axis=-2)
    # spectral variability over the (advanced) 8-frame memory
    diff = new_mem[..., :, None, :] - new_mem[..., None, :, :]
    dist = jnp.sum(diff * diff, axis=-1)
    eye = jnp.eye(CEPS_MEM, dtype=bool)
    dist = jnp.where(eye, jnp.inf, dist)
    variability = jnp.sum(jnp.min(dist, axis=-1), axis=-1) / CEPS_MEM - 2.1

    features = jnp.concatenate(
        [
            bfcc,                                   # 0..21
            d1,                                     # 22..27
            d2,                                     # 28..33
            pc,                                     # 34..39
            (0.01 * (pitch_index - 300))[..., None],  # 40
            variability[..., None],                 # 41
        ],
        axis=-1,
    ).astype(jnp.float32)

    updates = {
        "pitch_buf": pitch_buf,
        "last_period": pitch_index,
        "last_gain": gain,
        "cepstral_mem": new_mem,
    }
    return features, X, P, Ex, Ep, Exp, silence, updates


def _pitch_filter(X, P, Ex, Ep, Exp, g):
    """rnnoise ``pitch_filter``: per-band comb mix of the pitch-delayed
    spectrum followed by band-energy renormalisation."""
    r = jnp.where(
        Exp > g,
        1.0,
        (Exp * Exp) * (1.0 - g * g) / (0.001 + g * g * (1.0 - Exp * Exp)),
    )
    r = jnp.sqrt(jnp.clip(r, 0.0, 1.0))
    r = r * jnp.sqrt(Ex / (1e-8 + Ep))
    rf = r @ _INTERP.T
    Xc = X + rf * P
    newE = _band_energy(Xc)
    norm = jnp.sqrt(Ex / (1e-8 + newE))
    normf = norm @ _INTERP.T
    return Xc * normf


@jax.jit
def rnnoise_frame(params, state, x_frame):
    """Process one 480-sample frame (PCM-scaled input, batch leading).
    Exact ``rnnoise_process_frame`` graph. Returns
    ``(new_state, y_frame, {"gains", "vad"})``."""
    hp_mem, x = _hp_biquad(state["hp_mem"], x_frame)
    feats, X, P, Ex, Ep, Exp, silence, upd = frame_features(state, x)

    dense = jnp.tanh(feats @ params["input_w"] + params["input_b"])
    vad_h = _gru(params, "vad_gru", state["vad_gru"], dense)
    vad = jax.nn.sigmoid(
        vad_h @ params["vad_out_w"] + params["vad_out_b"]
    )[..., 0]
    noise_in = jnp.concatenate([dense, vad_h, feats], axis=-1)
    noise_h = _gru(params, "noise_gru", state["noise_gru"], noise_in)
    den_in = jnp.concatenate([vad_h, noise_h, feats], axis=-1)
    den_h = _gru(params, "denoise_gru", state["denoise_gru"], den_in)
    g = jax.nn.sigmoid(
        den_h @ params["denoise_out_w"] + params["denoise_out_b"]
    )  # [..., 22]

    # gain hangover + comb filtering (skipped entirely on silent frames)
    g = jnp.maximum(g, _GAIN_HANGOVER * state["lastg"])
    Xf = _pitch_filter(X, P, Ex, Ep, Exp, g)
    gf = g @ _INTERP.T
    Y_active = Xf * gf
    sil = silence[..., None]
    Y = jnp.where(sil, X, Y_active)

    y = _inv(Y) * _WINDOW
    out = state["synthesis_mem"] + y[..., :FRAME_SIZE]

    keep = lambda new, old: jnp.where(
        silence.reshape(silence.shape + (1,) * (new.ndim - silence.ndim)),
        old, new,
    )
    new_state = {
        "analysis_mem": x,
        "synthesis_mem": y[..., FRAME_SIZE:],
        "cepstral_mem": keep(upd["cepstral_mem"], state["cepstral_mem"]),
        "vad_gru": keep(vad_h, state["vad_gru"]),
        "noise_gru": keep(noise_h, state["noise_gru"]),
        "denoise_gru": keep(den_h, state["denoise_gru"]),
        "pitch_buf": upd["pitch_buf"],
        "last_period": upd["last_period"],
        "last_gain": upd["last_gain"],
        "lastg": keep(g, state["lastg"]),
        "hp_mem": hp_mem,
    }
    vad = jnp.where(silence, 0.0, vad)
    return new_state, out, {"gains": g, "vad": vad}


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
        params = default_params()
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
