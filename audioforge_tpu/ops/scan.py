"""Parallel scan primitives for streaming recurrences.

The reference engine evaluates every IIR/envelope recurrence sample-by-sample
on a CPU thread (e.g. `rust-core/src/dsp/biquad.rs:262-274`). On TPU the same
recurrences are re-expressed as *associative* scans evaluated with a
two-level blocked algorithm:

1. Split time into chunks of ``BLOCK`` samples. A ``lax.scan`` over the chunk
   axis computes local prefix compositions for EVERY chunk simultaneously
   (sequential in-chunk, vectorised across chunks x batch on the VPU) — the
   combine compiles exactly once.
2. Chunk summaries are combined across chunks (few elements), and the
   exclusive chunk prefixes are applied to the local prefixes with one more
   vectorised combine.

This matches how production TPU scan kernels are structured, and avoids
``jax.lax.associative_scan``'s trace-time log-depth unrolling, which made
XLA-CPU compiles of the compensated combine pathological (observed 137 s to
compile one biquad; the blocked form compiles in seconds and has sequential
depth ``BLOCK + B`` instead of ``T``).

Primitives:

- ``affine_scan_2x2``: 2-state linear recurrence ``s_t = A_t s_{t-1} + b_t``
  (the state-space form of a Direct Form II Transposed biquad).
- ``affine_scan_2x2_compensated``: same, in double-word f32 (the reference
  keeps biquad state in f64, `biquad.rs:2-3`; plain f32 recursion misses the
  <1e-4 parity budget for low-frequency/high-Q sections).
- ``max_affine_scan``: ``u_t = max(v_t, rho_t * u_{t-1} + c_t)`` — the
  instant-attack / one-pole-release-toward-target gain smoother of the
  lookahead limiter (`rust-core/src/dsp/limiter.rs:262-270`) and true-peak
  limiter (`true_peak.rs:350-362`).
- ``one_pole_scan``: generic sequential one-pole.
- ``sliding_window_max``: parallel van Herk / Gil-Werman windowed maximum
  replacing the monotonic max queue (`limiter.rs:9-69`).

All scans run over the LAST axis; leading axes are batch.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

__all__ = [
    "seq_unroll",
    "blocked_associative_scan",
    "affine_scan_2x2",
    "affine_scan_2x2_compensated",
    "max_affine_scan",
    "one_pole_scan",
    "sliding_window_max",
]

_BLOCK = 128


def seq_unroll() -> int:
    """Unroll factor for genuinely sequential per-sample scans: 8 on TPU
    (measured ~8x on the fused stage scans), 1 on CPU where deep unrolling
    blows up XLA compile time. ``AFX_SEQ_UNROLL`` overrides for tuning."""
    import os

    override = os.environ.get("AFX_SEQ_UNROLL")
    if override:
        return max(1, int(override))
    return 8 if jax.default_backend() != "cpu" else 1


def blocked_associative_scan(combine, identity, elems, block=None):
    """Inclusive associative scan over the last axis, blocked.

    ``combine(prev, next)`` maps two element pytrees to one; ``identity`` is
    the combine's identity element (a pytree of scalars, broadcastable);
    ``elems`` is a pytree of arrays sharing a trailing time axis.

    ``block`` defaults to roughly ``sqrt(T)`` (power of two, 16..128): total
    sequential depth is ``block + O(log(T/block))`` scan steps, and the
    square root balances in-chunk iterations against cross-chunk combine
    trace size.
    """
    leaves = jax.tree_util.tree_leaves(elems)
    T = leaves[0].shape[-1]
    lead = leaves[0].shape[:-1]
    if block is None:
        block = 16
        while block * block < T and block < _BLOCK:
            block *= 2
    # Unrolling the in-chunk scan is an ~8x runtime win on TPU (scan
    # iteration dispatch dominates at these tiny per-step shapes) but
    # multiplies XLA:CPU compile time; pick per backend.
    unroll = 8 if jax.default_backend() != "cpu" else 1
    if T <= block:
        # single chunk: plain sequential scan, combine compiled once
        ets = jax.tree_util.tree_map(lambda a: jnp.moveaxis(a, -1, 0), elems)
        id_full = jax.tree_util.tree_map(
            lambda i, a: jnp.broadcast_to(jnp.asarray(i, a.dtype), a.shape[1:]),
            identity,
            ets,
        )

        def step(carry, e):
            out = combine(carry, e)
            return out, out

        _, pref = jax.lax.scan(step, id_full, ets, unroll=unroll)
        return jax.tree_util.tree_map(lambda a: jnp.moveaxis(a, 0, -1), pref)

    B = -(-T // block)
    pad = B * block - T

    def to_chunks(a):
        if pad:
            # pad by repeating the final element: padded positions are never
            # read for outputs < T and only influence the final (unused)
            # chunk summary
            a = jnp.concatenate(
                [a, jnp.broadcast_to(a[..., -1:], lead + (pad,))], axis=-1
            )
        a = a.reshape(lead + (B, block))
        return jnp.moveaxis(a, -1, 0)  # (block, ..., B)

    ets = jax.tree_util.tree_map(to_chunks, elems)
    id_full = jax.tree_util.tree_map(
        lambda i, a: jnp.broadcast_to(jnp.asarray(i, a.dtype), a.shape[1:]),
        identity,
        ets,
    )

    def step(carry, e):
        out = combine(carry, e)
        return out, out

    summary, local = jax.lax.scan(step, id_full, ets, unroll=unroll)  # local: (block, ..., B)

    # exclusive prefix of chunk summaries along the B axis (B is small)
    def shift_identity(a, i):
        first = jnp.broadcast_to(jnp.asarray(i, a.dtype), a[..., :1].shape)
        return jnp.concatenate([first, a[..., :-1]], axis=-1)

    incl = jax.lax.associative_scan(combine, summary, axis=-1)
    excl = jax.tree_util.tree_map(shift_identity, incl, identity)

    # apply chunk prefixes to local prefixes: result = combine(excl_j, local_jt)
    excl_b = jax.tree_util.tree_map(lambda a: a[None], excl)  # broadcast over block axis
    local_t = local  # (block, ..., B)
    res = combine(
        jax.tree_util.tree_map(
            lambda a, l: jnp.broadcast_to(a, l.shape), excl_b, local_t
        ),
        local_t,
    )

    def from_chunks(a):
        a = jnp.moveaxis(a, 0, -1)  # (..., B, block)
        a = a.reshape(lead + (B * block,))
        return a[..., :T]

    return jax.tree_util.tree_map(from_chunks, res)


# --------------------------------------------------------------------------
# Affine 2x2 scan
# --------------------------------------------------------------------------


def _affine_combine(prev, nxt):
    pp, qp, rp, sp, b1p, b2p = prev
    pn, qn, rn, sn, b1n, b2n = nxt
    return (
        pn * pp + qn * rp,
        pn * qp + qn * sp,
        rn * pp + sn * rp,
        rn * qp + sn * sp,
        pn * b1p + qn * b2p + b1n,
        rn * b1p + sn * b2p + b2n,
    )


_AFFINE_IDENTITY = (1.0, 0.0, 0.0, 1.0, 0.0, 0.0)


def affine_scan_2x2(p, q, r, s, b1, b2, z1_0, z2_0):
    """Prefix states of ``z_t = A_t z_{t-1} + b_t`` with ``A_t = [[p,q],[r,s]]``.

    All of ``p,q,r,s,b1,b2`` are broadcast-compatible arrays whose last axis is
    time; ``z1_0``/``z2_0`` are the initial state (matching leading axes, no
    time axis). Returns ``(z1, z2)`` — the *post-update* state at every step.
    """
    p, q, r, s, b1, b2 = jnp.broadcast_arrays(p, q, r, s, b1, b2)
    P = blocked_associative_scan(_affine_combine, _AFFINE_IDENTITY, (p, q, r, s, b1, b2))
    Pp, Pq, Pr, Ps, Pb1, Pb2 = P
    z1_0 = jnp.asarray(z1_0)[..., None]
    z2_0 = jnp.asarray(z2_0)[..., None]
    z1 = Pp * z1_0 + Pq * z2_0 + Pb1
    z2 = Pr * z1_0 + Ps * z2_0 + Pb2
    return z1, z2


# --------------------------------------------------------------------------
# Compensated (float-float / "double-word f32") affine scan. Every
# accumulated quantity is an unevaluated (hi, lo) f32 pair giving ~2^-46
# effective precision using only f32 VPU ops (error-free transformations).
# --------------------------------------------------------------------------


def _two_sum(a, b):
    s = a + b
    bb = s - a
    return s, (a - (s - bb)) + (b - bb)


def _split(a):
    # Dekker split for f32 (24-bit mantissa -> 2^12 + 1).
    c = a * 4097.0
    hi = c - (c - a)
    return hi, a - hi


def _two_prod(a, b):
    p = a * b
    ah, al = _split(a)
    bh, bl = _split(b)
    err = ((ah * bh - p) + ah * bl + al * bh) + al * bl
    return p, err


def _df_renorm(h, l):
    rh = h + l
    return rh, l - (rh - h)


def _df_add(x, y):
    sh, sl = _two_sum(x[0], y[0])
    return _df_renorm(sh, sl + (x[1] + y[1]))


def _df_mul(x, y):
    ph, pl = _two_prod(x[0], y[0])
    return _df_renorm(ph, pl + (x[0] * y[1] + x[1] * y[0]))


def _df_madd3(a1, b1, a2, b2, c):
    """a1*b1 + a2*b2 + c in double-word f32."""
    return _df_add(_df_add(_df_mul(a1, b1), _df_mul(a2, b2)), c)


def _df_affine_combine(prev, nxt):
    pp = (prev[0], prev[1]); qp = (prev[2], prev[3])
    rp = (prev[4], prev[5]); sp = (prev[6], prev[7])
    b1p = (prev[8], prev[9]); b2p = (prev[10], prev[11])
    pn = (nxt[0], nxt[1]); qn = (nxt[2], nxt[3])
    rn = (nxt[4], nxt[5]); sn = (nxt[6], nxt[7])
    b1n = (nxt[8], nxt[9]); b2n = (nxt[10], nxt[11])
    zz = (jnp.zeros_like(prev[0]), jnp.zeros_like(prev[0]))
    P = _df_madd3(pn, pp, qn, rp, zz)
    Q = _df_madd3(pn, qp, qn, sp, zz)
    R = _df_madd3(rn, pp, sn, rp, zz)
    S = _df_madd3(rn, qp, sn, sp, zz)
    B1 = _df_madd3(pn, b1p, qn, b2p, b1n)
    B2 = _df_madd3(rn, b1p, sn, b2p, b2n)
    return (P[0], P[1], Q[0], Q[1], R[0], R[1], S[0], S[1],
            B1[0], B1[1], B2[0], B2[1])


_DF_AFFINE_IDENTITY = (1.0, 0.0, 0.0, 0.0, 0.0, 0.0, 1.0, 0.0, 0.0, 0.0, 0.0, 0.0)


def affine_scan_2x2_compensated(p, q, r, s, b1, b2, z1_0, z2_0):
    """Double-word-f32 version of :func:`affine_scan_2x2`.

    Same contract; ~10x the VPU flops, ~2^-46 effective precision. The
    reference keeps all biquad state in f64 (`biquad.rs:2-3`); measured on
    white noise, plain-f32 evaluation deviates ~7e-3 RMS for the 80 Hz
    high-pass and ~3e-4 for the Q=36 hum notch — both over the <1e-4 parity
    budget — while this form stays ~1e-5.
    """
    p, q, r, s, b1, b2 = jnp.broadcast_arrays(p, q, r, s, b1, b2)
    zero = jnp.zeros_like(p)
    flat = (p, zero, q, zero, r, zero, s, zero, b1, zero, b2, zero)
    res = blocked_associative_scan(_df_affine_combine, _DF_AFFINE_IDENTITY, flat)
    Pp = (res[0], res[1]); Pq = (res[2], res[3])
    Pr = (res[4], res[5]); Ps = (res[6], res[7])
    Pb1 = (res[8], res[9]); Pb2 = (res[10], res[11])
    z1h = jnp.asarray(z1_0)[..., None]
    z2h = jnp.asarray(z2_0)[..., None]
    zx = (z1h, jnp.zeros_like(z1h))
    zy = (z2h, jnp.zeros_like(z2h))
    z1 = _df_madd3(Pp, zx, Pq, zy, Pb1)
    z2 = _df_madd3(Pr, zx, Ps, zy, Pb2)
    return z1[0] + z1[1], z2[0] + z2[1]


# --------------------------------------------------------------------------
# Max-affine scan
# --------------------------------------------------------------------------


def _max_affine_combine(prev, nxt):
    vp, pp, cp = prev
    vn, pn, cn = nxt
    return (jnp.maximum(vn, pn * vp + cn), pn * pp, pn * cp + cn)


def max_affine_scan(v, rho, c, u0):
    """Prefix values of ``u_t = max(v_t, rho_t * u_{t-1} + c_t)``.

    ``v``, ``rho`` and ``c`` broadcast together with time on the last axis,
    ``u0`` is the initial value (no time axis). Requires ``rho >= 0``.
    Returns ``u`` for every step. Maps ``u -> max(v, rho*u + c)`` are closed
    under composition and associative; identity is ``(-inf, 1, 0)``.
    """
    v, rho, c = jnp.broadcast_arrays(v, rho, c)
    a, pprod, csum = blocked_associative_scan(
        _max_affine_combine, (-jnp.inf, 1.0, 0.0), (v, rho, c)
    )
    return jnp.maximum(a, pprod * jnp.asarray(u0)[..., None] + csum)


def one_pole_scan(x, coeff, y0):
    """Sequential one-pole ``y_t = c_t * y_{t-1} + (1 - c_t) * x_t``."""
    x, coeff = jnp.broadcast_arrays(x, coeff)
    xt = jnp.moveaxis(x, -1, 0)
    ct = jnp.moveaxis(coeff, -1, 0)

    def body(carry, xc):
        xv, cv = xc
        y = cv * carry + (1.0 - cv) * xv
        return y, y

    _, ys = jax.lax.scan(body, jnp.broadcast_to(y0, xt.shape[1:]), (xt, ct))
    return jnp.moveaxis(ys, 0, -1)


def sliding_window_max(x, window, init=None):
    """Causal sliding-window maximum: ``y_t = max(x_{t-window+1} .. x_t)``.

    Parallel van Herk / Gil-Werman: block-wise prefix and suffix maxima.
    ``init`` optionally supplies the ``window - 1`` samples preceding ``x``
    (history carried across streaming blocks). Time is the last axis.
    """
    if window <= 1:
        return x
    T = x.shape[-1]
    lead = x.shape[:-1]
    if init is None:
        pad = jnp.full(lead + (window - 1,), -jnp.inf, x.dtype)
    else:
        pad = jnp.broadcast_to(init, lead + (window - 1,))
    xp = jnp.concatenate([pad, x], axis=-1)  # length T + window - 1
    total = xp.shape[-1]
    nblk = -(-total // window)
    padded_len = nblk * window
    xp = jnp.concatenate(
        [xp, jnp.full(lead + (padded_len - total,), -jnp.inf, x.dtype)], axis=-1
    )
    blocks = xp.reshape(lead + (nblk, window))
    pref = jax.lax.cummax(blocks, axis=len(lead) + 1)
    suff = jnp.flip(
        jax.lax.cummax(jnp.flip(blocks, axis=-1), axis=len(lead) + 1), axis=-1
    )
    pref = pref.reshape(lead + (padded_len,))
    suff = suff.reshape(lead + (padded_len,))
    # Window ending at padded index j (j >= window-1) spans [j-window+1, j]:
    # max = suffix-max at (j-window+1) combined with prefix-max at j.
    j = jnp.arange(window - 1, window - 1 + T)
    out = jnp.maximum(
        jnp.take(suff, j - window + 1, axis=-1), jnp.take(pref, j, axis=-1)
    )
    return out
