"""Fixed-size real DFTs as MXU matmuls.

The suppressor models transform 960-sample windows (480-hop Vorbis
overlap, `rnnoise.rs`/`deepfilter_ffi.rs` framing). 960 is not a power of
two: XLA:TPU lowers ``jnp.fft.rfft`` to a custom call that cannot fuse
into surrounding computations, and inside large fused scans (the serving
engine's multi-block step) the surrounding layout conversions dominate.
A fixed-size DFT is just a matmul — exactly what the MXU is for — so these
helpers precompute the [960, 481] cos/sin (and inverse) matrices once and
run the transform as ``dot_general`` at HIGHEST precision (true f32
accumulation; the default bf16 3-pass path costs ~2e-3 relative error,
too coarse for the synthesis path's 1e-4 parity budget).

Memory: ~7.5 MB of constant matrices per transform size — negligible.
"""

from __future__ import annotations

from functools import lru_cache

import jax
import jax.numpy as jnp
import numpy as np

__all__ = ["rdft", "irdft", "rdft_auto", "irdft_auto"]


@lru_cache(maxsize=4)
def _forward_matrices(n: int):
    # cache NUMPY constants: a jnp array materialized during a jit trace
    # would be a traced constant, and caching it leaks the tracer into
    # later traces (each trace re-embeds the numpy constant instead)
    bins = n // 2 + 1
    k = np.arange(n)[:, None] * np.arange(bins)[None, :]
    ang = -2.0 * np.pi * k / n
    return (np.cos(ang).astype(np.float32), np.sin(ang).astype(np.float32))


@lru_cache(maxsize=4)
def _inverse_matrices(n: int):
    bins = n // 2 + 1
    # irfft from the half spectrum: x_t = (1/n) * sum_k w_k *
    # (Re X_k cos(2pi k t / n) - Im X_k sin(2pi k t / n)),
    # w_k = 1 for DC and Nyquist, 2 otherwise (conjugate-symmetric fold)
    k = np.arange(bins)[:, None] * np.arange(n)[None, :]
    ang = 2.0 * np.pi * k / n
    w = np.full((bins, 1), 2.0)
    w[0, 0] = 1.0
    if n % 2 == 0:
        w[-1, 0] = 1.0
    return ((w * np.cos(ang) / n).astype(np.float32),
            (-w * np.sin(ang) / n).astype(np.float32))


def rdft(x, n: int | None = None):
    """``jnp.fft.rfft`` equivalent for fixed ``n`` as two f32 matmuls.
    ``x: [..., n]`` real -> complex ``[..., n//2+1]``."""
    if n is None:
        n = x.shape[-1]
    if x.shape[-1] != n:
        raise ValueError(f"expected last axis {n}, got {x.shape[-1]}")
    C, S = _forward_matrices(n)
    re = jax.lax.dot_general(
        x, C, (((x.ndim - 1,), (0,)), ((), ())),
        precision=jax.lax.Precision.HIGHEST,
    )
    im = jax.lax.dot_general(
        x, S, (((x.ndim - 1,), (0,)), ((), ())),
        precision=jax.lax.Precision.HIGHEST,
    )
    return jax.lax.complex(re, im)


def irdft(X, n: int):
    """``jnp.fft.irfft(X, n=n)`` equivalent as two f32 matmuls.
    ``X: [..., n//2+1]`` complex -> real ``[..., n]``."""
    bins = n // 2 + 1
    if X.shape[-1] != bins:
        raise ValueError(f"expected last axis {bins}, got {X.shape[-1]}")
    Ci, Si = _inverse_matrices(n)
    re = jnp.real(X).astype(jnp.float32)
    im = jnp.imag(X).astype(jnp.float32)
    yr = jax.lax.dot_general(
        re, Ci, (((re.ndim - 1,), (0,)), ((), ())),
        precision=jax.lax.Precision.HIGHEST,
    )
    yi = jax.lax.dot_general(
        im, Si, (((im.ndim - 1,), (0,)), ((), ())),
        precision=jax.lax.Precision.HIGHEST,
    )
    return yr + yi


def rdft_auto(x, n: int):
    """Backend-aware forward transform: MXU matmul on accelerators (the
    custom-call FFT cannot fuse inside large scans), pocketfft on CPU
    (where the matmul would be the slow path)."""
    if jax.default_backend() == "cpu":
        return jnp.fft.rfft(x, axis=-1)
    return rdft(x, n)


def irdft_auto(X, n: int):
    """Backend-aware inverse transform; see :func:`rdft_auto`."""
    if jax.default_backend() == "cpu":
        return jnp.fft.irfft(X, n=n, axis=-1)
    return irdft(X, n)
