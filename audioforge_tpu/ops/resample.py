"""Polyphase windowed-sinc resampling.

Mirrors the reference resampling layer
(`rust-core/src/audio/processor/resampling.rs`): the product resampler is a
sinc interpolator with sinc_len 128, Blackman window, cubic interpolation
between 256x-oversampled filter phases, chunk 1024
(`resampling.rs:122-156`; constants `processor.rs:51-53`), with an offline
evaluator `simulate_product_resampler` (`resampling.rs:170-272`) and
`product_resampler_configuration` (`resampling.rs:262-272`). Quality target:
<= -83 dB worst swept-noise alias (BASELINE: resampler-quality-report).

The implementation is a from-scratch polyphase design (not a port of the
rubato crate): output sample j at input position ``j/ratio`` is a dot of a
``sinc_len`` input window with a filter cubic-interpolated between adjacent
oversampled phases. The whole output is computed as one batched gather +
einsum, so offline conversions are a single device call.

Also provides the streaming 3:1 decimator used to feed 16 kHz VAD models
from the 48 kHz chain (`rust-core/src/dsp/vad.rs:530-578` uses a 31-tap
windowed sinc at the same cutoff).
"""

from __future__ import annotations

from functools import lru_cache

import numpy as np
import jax.numpy as jnp

__all__ = [
    "PRODUCT_SINC_LEN",
    "PRODUCT_WINDOW_NAME",
    "RESAMPLER_CHUNK_SIZE",
    "WINDOWS",
    "windowed_sinc",
    "decimate3_init",
    "decimate3",
    "resample",
    "simulate_product_resampler",
    "product_resampler_configuration",
]

PRODUCT_SINC_LEN = 128
PRODUCT_WINDOW_NAME = "blackman"
RESAMPLER_CHUNK_SIZE = 1024
OVERSAMPLING = 256


def _window(name: str, n: np.ndarray, length: int) -> np.ndarray:
    x = 2.0 * np.pi * n / length
    if name == "blackman":
        w = 0.42 - 0.5 * np.cos(x) + 0.08 * np.cos(2 * x)
    elif name == "blackman_squared":
        w = 0.42 - 0.5 * np.cos(x) + 0.08 * np.cos(2 * x)
        w = w * w
    elif name == "blackman_harris":
        w = (
            0.35875
            - 0.48829 * np.cos(x)
            + 0.14128 * np.cos(2 * x)
            - 0.01168 * np.cos(3 * x)
        )
    elif name == "blackman_harris_squared":
        w = (
            0.35875
            - 0.48829 * np.cos(x)
            + 0.14128 * np.cos(2 * x)
            - 0.01168 * np.cos(3 * x)
        )
        w = w * w
    elif name == "hann":
        w = 0.5 - 0.5 * np.cos(x)
    elif name == "hann_squared":
        w = 0.5 - 0.5 * np.cos(x)
        w = w * w
    else:
        raise ValueError(f"unsupported resampler window {name!r}")
    return w


WINDOWS = (
    "blackman",
    "blackman_squared",
    "blackman_harris",
    "blackman_harris_squared",
    "hann",
    "hann_squared",
)


def windowed_sinc(taps: int, cutoff: float, window: str = "blackman") -> np.ndarray:
    """Unit-DC-gain windowed-sinc low-pass; ``cutoff`` is relative to
    Nyquist."""
    n = np.arange(taps, dtype=np.float64)
    center = (taps - 1) / 2.0
    off = n - center
    fc = cutoff / 2.0  # cycles per sample
    sinc = np.where(
        np.abs(off) < 1e-12,
        2.0 * fc,
        np.sin(2.0 * np.pi * fc * off) / (np.pi * np.where(off == 0, 1.0, off)),
    )
    taps_arr = sinc * _window(window, n, taps)
    return taps_arr / taps_arr.sum()


@lru_cache(maxsize=8)
def _auto_cutoff(sinc_len: int, window: str) -> float:
    """Largest cutoff whose response at Nyquist stays below the window's
    achievable stopband (numeric equivalent of the reference's adaptive
    cutoff, `resampling.rs:147`).

    Two probe rules matter (both caught by the swept-noise alias gate
    pinned to the reference's -83.1 dB, BASELINE.md):

    - evaluate on the continuous (oversampled) prototype — a symmetric
      even-length FIR is Type II with a structural zero at Nyquist, so the
      L-tap response there reads -inf for every cutoff and the search runs
      away to 1.0; the applied filter interpolates fractional phases of
      the continuous prototype, which has no such null;
    - probe the MAX response over the whole folded band [Nyquist, 2fs],
      not the point response at Nyquist — sidelobe ripple makes the point
      probe non-monotone and bisection can land on a ripple null with the
      first (highest) sidelobe still above the floor.

    Target = the window's far-stopband sidelobe floor (-83.05 dB for
    128-tap Blackman — the same floor the reference's rubato path lands
    on, hence its measured -83.096 dB swept-noise attenuation)."""
    O = 32  # prototype oversampling for the response probes
    n_fft = sinc_len * O * 8

    def dense_response(cutoff):
        dense = windowed_sinc(sinc_len * O, cutoff / O, window) * O
        return np.abs(np.fft.rfft(dense, n_fft)) / O

    def band_max_db(H, lo_cyc, hi_cyc):
        lo = int(np.ceil(lo_cyc / O * n_fft))
        hi = int(np.floor(hi_cyc / O * n_fft))
        return 20.0 * np.log10(max(float(H[lo:hi].max()), 1e-15))

    # sidelobe floor: far stopband of a mid-cutoff design, past the
    # transition (half-width ~ 6/L cycles/sample for this window family)
    floor_db = band_max_db(dense_response(0.25), 0.125 + 6.0 / sinc_len, 2.0)
    target_db = min(floor_db, -60.0)

    def stop_atten(cutoff):
        return band_max_db(dense_response(cutoff), 0.5, 2.0)

    lo, hi = 0.2, 1.0
    for _ in range(30):
        mid = 0.5 * (lo + hi)
        if stop_atten(mid) <= target_db:
            lo = mid
        else:
            hi = mid
    return lo


@lru_cache(maxsize=16)
def _phase_table(sinc_len: int, window: str, cutoff: float | None = None):
    """``(OVERSAMPLING+3, sinc_len)`` float32 filter phases.

    For an output at input position ``base + d`` (``d = p/OVERSAMPLING``),
    the window covers input samples ``x[base-half+1 .. base+half]`` and
    ``f_p[k] = h((L-1-k) + p/O)`` sampled from the dense prototype
    ``h`` (length ``L*O``, centre ``L*O/2``). Rows are stored for
    ``p = -1 .. O+1`` (cubic interpolation needs one row on each side) at
    row index ``p + 1``.
    """
    L, O = sinc_len, OVERSAMPLING
    c = _auto_cutoff(L, window) if cutoff is None else cutoff
    dense = windowed_sinc(L * O, c / O, window) * O
    densep = np.concatenate([[0.0, 0.0], dense, [0.0, 0.0]])
    k = np.arange(L)
    table = np.stack(
        [densep[(L - 1 - k) * O + p + 2] for p in range(-1, O + 2)]
    )
    # NUMPY constant on purpose: a cached jnp array materialized during a
    # jit trace would leak that trace's tracer into later traces (see
    # ops/dft.py); callers re-embed per trace with jnp.asarray
    return table.astype(np.float32), c


def resample(x, in_rate: float, out_rate: float, sinc_len: int = PRODUCT_SINC_LEN,
             window: str = PRODUCT_WINDOW_NAME):
    """Offline high-quality resample of a whole take (one device call).

    Output sample ``j`` is time-aligned with input position ``j/ratio``
    (zero delay — the interpolation window is centred). Returns ``y`` with
    ``floor(n_in * ratio)`` samples.
    """
    x = jnp.asarray(x, jnp.float32)
    ratio = out_rate / in_rate
    # When downsampling, the anti-alias cutoff scales with the ratio so the
    # stopband covers everything above the OUTPUT Nyquist
    # (`resampling.rs:147` via rubato's ratio-scaled cutoff).
    base_cutoff = _auto_cutoff(sinc_len, window)
    eff_cutoff = round(base_cutoff * min(1.0, ratio), 9)
    table_np, _ = _phase_table(sinc_len, window, eff_cutoff)
    table = jnp.asarray(table_np)
    n_in = x.shape[-1]
    n_out = int(np.floor(n_in * ratio))
    half = sinc_len // 2

    j = np.arange(n_out, dtype=np.float64)
    pos = j * (in_rate / out_rate)  # input-time position of output j
    base = jnp.asarray(np.floor(pos), jnp.int32)
    frac = jnp.asarray(pos - np.floor(pos), jnp.float32)

    # pad input with half zeros each side; window for output j covers
    # x[base - half + 1 .. base + half] -> padded idx base + 1 + k
    xp = jnp.concatenate(
        [jnp.zeros(x.shape[:-1] + (half,), x.dtype), x,
         jnp.zeros(x.shape[:-1] + (half,), x.dtype)], axis=-1
    )
    win_idx = base[:, None] + jnp.arange(sinc_len)[None, :] + 1
    windows = xp[..., win_idx]  # [..., n_out, sinc_len]

    p = frac * OVERSAMPLING
    p0 = jnp.floor(p).astype(jnp.int32)  # 0 .. O-1
    t = (p - p0.astype(jnp.float32))[..., None]
    # Catmull-Rom over phase rows p0-1 .. p0+2 (row offset +1)
    f_m1 = table[p0]
    f_0 = table[p0 + 1]
    f_1 = table[p0 + 2]
    f_2 = table[p0 + 3]
    a = -0.5 * f_m1 + 1.5 * f_0 - 1.5 * f_1 + 0.5 * f_2
    b = f_m1 - 2.5 * f_0 + 2.0 * f_1 - 0.5 * f_2
    c = 0.5 * (f_1 - f_m1)
    filt = ((a * t + b) * t + c) * t + f_0
    y = jnp.einsum("...ot,ot->...o", windows, filt,
                   preferred_element_type=jnp.float32)
    return y


def product_resampler_configuration():
    """`resampling.rs:262-272`."""
    return (PRODUCT_SINC_LEN, PRODUCT_WINDOW_NAME, "cubic", OVERSAMPLING,
            RESAMPLER_CHUNK_SIZE)


def simulate_product_resampler(samples, input_rate, output_rate, chunk_size=1024,
                               sinc_len=None, window=None):
    """Offline evaluator with the reference contract
    (`resampling.rs:170-260`): returns
    ``(output, delay, expected_frames, block_times_ns)``. The output stream
    is delayed by ``delay`` frames and at least ``expected_frames + delay``
    long, exactly like the streaming reference; here the conversion happens
    in one device call and the block-time list reports the amortised cost
    per chunk-equivalent."""
    import time as _time

    if input_rate == 0 or output_rate == 0:
        raise ValueError("sample rates must be positive")
    if not (1 <= chunk_size <= RESAMPLER_CHUNK_SIZE):
        raise ValueError(f"chunk_size must be between 1 and {RESAMPLER_CHUNK_SIZE}")
    sinc_len = PRODUCT_SINC_LEN if sinc_len is None else int(sinc_len)
    if not (32 <= sinc_len <= 2048) or (sinc_len & (sinc_len - 1)):
        raise ValueError("sinc_len must be a power of two between 32 and 2048")
    window = PRODUCT_WINDOW_NAME if window is None else window
    if window not in WINDOWS:
        raise ValueError(f"unsupported resampler window {window!r}")
    x = np.asarray(samples, np.float64)
    if not np.all(np.isfinite(x)):
        raise ValueError("samples must be finite")

    ratio = output_rate / input_rate
    expected_frames = int(round(len(x) * ratio))
    delay = int(round(sinc_len / 2 * ratio))
    started = _time.perf_counter()
    # pad the tail so the flush region exists like the streaming reference
    pad = int(np.ceil(sinc_len / ratio)) + chunk_size
    y = resample(
        np.concatenate([x, np.zeros(pad)]), input_rate, output_rate,
        sinc_len=sinc_len, window=window,
    )
    # the reference stream is causal: the aligned render starts after
    # `delay` output frames
    y = np.concatenate([np.zeros(delay), np.asarray(y, np.float64)])
    elapsed_ns = int((_time.perf_counter() - started) * 1e9)
    flush_target = expected_frames + delay
    out = y[:max(flush_target, 0)]
    if len(out) < flush_target:
        out = np.concatenate([out, np.zeros(flush_target - len(out))])
    n_chunks = max(1, len(x) // chunk_size)
    block_times = [elapsed_ns // n_chunks] * n_chunks
    return out.tolist(), delay, expected_frames, block_times


# ---------------------------------------------------------------------------
# Streaming 3:1 decimator (48 kHz -> 16 kHz) for VAD feeds
# ---------------------------------------------------------------------------

VAD_DECIMATE_TAPS = 31


@lru_cache(maxsize=2)
def _decimate3_kernel():
    """31-tap anti-aliased windowed sinc at 1/3 band (`vad.rs:530-578`).

    Caches the NUMPY constant: a jnp array materialized during a jit trace
    would be a traced constant, and caching it leaks the tracer into later
    traces (same hazard as the DFT matrix cache, `ops/dft.py`). Callers
    re-embed it per trace via ``jnp.asarray`` — free for a 31-float
    constant."""
    return np.flip(
        windowed_sinc(VAD_DECIMATE_TAPS, 1.0 / 3.0, "blackman")
    ).astype(np.float32)


def decimate3_init(batch_shape=()):
    return {"hist": jnp.zeros(batch_shape + (VAD_DECIMATE_TAPS - 1,), jnp.float32)}


def decimate3(state, x):
    """Decimate a block by 3 (``x`` length must be a multiple of 3).
    Returns ``(new_state, y)`` with ``len(y) = len(x)//3``."""
    T = x.shape[-1]
    ext = jnp.concatenate([state["hist"], x], axis=-1)
    k = jnp.asarray(_decimate3_kernel())  # pre-flipped numpy constant
    idx = (jnp.arange(T // 3) * 3)[:, None] + jnp.arange(VAD_DECIMATE_TAPS)[None, :]
    windows = ext[..., idx]
    y = jnp.einsum("...ot,t->...o", windows, k, preferred_element_type=jnp.float32)
    return {"hist": ext[..., -(VAD_DECIMATE_TAPS - 1):]}, y


class StreamingResampler:
    """Chunked arbitrary-rate resampler for the live ingest path.

    Host-side numpy counterpart of the reference's streaming input
    resampler (`processor/resampling.rs:125-168`, rubato): the same
    windowed-sinc phase table and cubic phase interpolation as
    :func:`resample`, with carried input history so chunks concatenate to
    the exact offline result (measured 8e-8 RMS, chunk-size invariant).
    The stream is zero-offset time-aligned; ``delay_frames``
    (= sinc_len/2 * ratio) is the wall-clock latency before an output
    frame's full window has arrived, and the first ``delay_frames`` outputs
    lean on the pre-charged zero history — the same startup contract the
    product resampler reports (`resampling.rs:170-260`).
    """

    def __init__(self, in_rate: float, out_rate: float,
                 sinc_len: int = PRODUCT_SINC_LEN,
                 window: str = PRODUCT_WINDOW_NAME):
        if in_rate <= 0 or out_rate <= 0:
            raise ValueError("sample rates must be positive")
        ratio = out_rate / in_rate
        base_cutoff = _auto_cutoff(sinc_len, window)
        eff_cutoff = round(base_cutoff * min(1.0, ratio), 9)
        table, _ = _phase_table(sinc_len, window, eff_cutoff)
        self._table = np.asarray(table, np.float32)
        self._sinc_len = int(sinc_len)
        self._half = sinc_len // 2
        self._step = in_rate / out_rate
        self.delay_frames = int(round(self._half * ratio))
        # buffer holds input samples from absolute index _buf_start onward;
        # pre-charged with the left half-window of zeros
        self._buf = np.zeros(self._half, np.float32)
        self._buf_start = -self._half
        self._next_pos = 0.0

    def process(self, samples) -> np.ndarray:
        """Feed input samples; returns every output frame whose window is
        complete."""
        chunk = np.asarray(samples, np.float32).ravel()
        if chunk.size:
            self._buf = np.concatenate([self._buf, chunk])
        end = self._buf_start + self._buf.size  # one past last input index
        # output at pos needs inputs base-half+1 .. base+half (base=floor(pos))
        limit = end - self._half  # require base < limit
        n_out = int(np.floor((limit - 1 - self._next_pos) / self._step)) + 1
        if n_out <= 0:
            return np.zeros(0, np.float32)

        pos = self._next_pos + np.arange(n_out, dtype=np.float64) * self._step
        base = np.floor(pos).astype(np.int64)
        frac = (pos - base).astype(np.float32)
        rel = base - self._buf_start  # index of base within the buffer
        win_idx = rel[:, None] + np.arange(-self._half + 1, self._half + 1)
        windows = self._buf[win_idx]  # [n_out, sinc_len] oldest-first

        p = frac * OVERSAMPLING
        # f32 rounding of frac can land exactly on 1.0 -> clamp the phase
        p0 = np.minimum(np.floor(p).astype(np.int64), OVERSAMPLING - 1)
        t = (p - p0).astype(np.float32)[:, None]
        f_m1 = self._table[p0]
        f_0 = self._table[p0 + 1]
        f_1 = self._table[p0 + 2]
        f_2 = self._table[p0 + 3]
        a = -0.5 * f_m1 + 1.5 * f_0 - 1.5 * f_1 + 0.5 * f_2
        b = f_m1 - 2.5 * f_0 + 2.0 * f_1 - 0.5 * f_2
        c = 0.5 * (f_1 - f_m1)
        filt = ((a * t + b) * t + c) * t + f_0
        # table rows index taps newest-first relative to the window layout
        # used by resample(); windows here are oldest-first covering
        # base-half+1..base+half, same as xp[base+1+k] there
        y = np.einsum("ot,ot->o", windows, filt).astype(np.float32)

        self._next_pos = float(pos[-1] + self._step)
        keep_from = int(np.floor(self._next_pos)) - self._half + 1 - self._buf_start
        if keep_from > 0:
            self._buf = self._buf[keep_from:]
            self._buf_start += keep_from
        return y
