"""Fused (single-scan) vs staged chain parity.

The fused path advances de-esser envelopes, dynamic EQ, the compacted EQ
cascade, and the compressor together each sample; it must match the staged
path bit-for-nearly-bit (per-sample DF2T vs blocked parallel scans differ
only in f32 rounding order).
"""

import jax.numpy as jnp
import numpy as np

from audioforge_tpu.ops import compressor as comp_ops
from audioforge_tpu.ops import deesser as des_ops
from audioforge_tpu.ops import eq as eq_ops
from audioforge_tpu.runtime import chain as chain_rt

FS = 48000.0
BLOCK = 480


def _config(fused):
    ccfg = comp_ops.CompressorConfig(
        sample_rate=FS, enabled=True, adaptive_release=True,
        auto_makeup_enabled=True, sidechain_highpass_enabled=True,
        block_samples=BLOCK,
    )
    return chain_rt.ChainConfig(
        sample_rate=FS, deesser_enabled=True, eq_enabled=True,
        compressor_enabled=True, limiter_enabled=True, fused=fused,
        deesser=des_ops.DeEsserConfig(sample_rate=FS, enabled=True),
        compressor=ccfg,
    )


def test_fused_matches_staged(rng):
    gains = [-2.5, 1.5, -1.0, 2.0, 3.0, 2.5, 1.5, -2.0, 1.0, -1.5]
    eq_bands = [
        eq_ops.EqBandConfig(b.filter_type, b.frequency_hz, g, 4.33,
                            b.slope_db_per_octave, True)
        for b, g in zip(eq_ops.default_bands(), gains)
    ]
    t = np.arange(10 * BLOCK) / FS
    x = (
        0.3 * np.sin(2 * np.pi * 220 * t) * ((t % 0.6) < 0.35)
        + 0.15 * np.sin(2 * np.pi * 7000 * t) * ((t % 0.4) < 0.1)
        + 0.01 * rng.standard_normal(len(t))
    ).astype(np.float32)
    blocks = jnp.asarray(x.reshape(10, BLOCK))

    outs = {}
    for fused in (False, True):
        cfg = _config(fused)
        params = comp_ops.compressor_params(
            cfg.compressor, threshold_db=-24.0, ratio=3.0
        )
        st = chain_rt.chain_init(cfg, params, eq_bands=eq_bands)
        st, y, stats = chain_rt.chain_run(cfg, params, st, blocks)
        outs[fused] = (np.asarray(y).reshape(-1), stats)

    rms = float(np.sqrt(np.mean((outs[False][0] - outs[True][0]) ** 2)))
    assert rms < 1e-5
    for key in ("deesser_gain_reduction_db", "compressor_gain_reduction_db",
                "output_true_peak"):
        np.testing.assert_allclose(
            np.asarray(outs[False][1][key]), np.asarray(outs[True][1][key]),
            atol=1e-4,
        )
