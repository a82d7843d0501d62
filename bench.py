"""Headline benchmark: full 48 kHz mono chain throughput per chip.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "audio-sec/sec/chip", "vs_baseline": N}

The metric is audio-seconds processed per wall second on one chip for the
full offline chain (de-esser + 10-band EQ + compressor + lookahead limiter +
4x true-peak limiter) batched over independent streams — the BASELINE.json
north star is >= 1000x realtime per chip. ``vs_baseline`` is value / 1000.

Methodology notes: the batch is shaped (16, 128) — 2048 streams, the
measured throughput knee on v5e (1024 leaves VPU lanes idle, 4096 spills;
measured 4.4k/6.1k/5.8k audio-sec/sec at 1024/2048/4096). The timed
computation reduces to a scalar inside jit and the value is fetched to the
host per iteration (on the tunnelled platform ``block_until_ready`` alone
does not reliably await completion).
"""

import json
import time

import jax
import jax.numpy as jnp
import numpy as np

# persistent compile cache: the 2048-stream chain scan is compile-heavy;
# re-runs (and the hardware validator's subprocess) must not pay it again
jax.config.update("jax_compilation_cache_dir", "/tmp/afx_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)


def main():
    from audioforge_tpu.ops import compressor as comp_ops
    from audioforge_tpu.ops import deesser as des_ops
    from audioforge_tpu.runtime import chain as chain_rt

    SHAPE = (16, 128)  # 2048 streams: the measured throughput knee
    BATCH = int(np.prod(SHAPE))
    BLOCK = 480
    N_BLOCKS = 200  # 2 s per stream per call
    FS = 48000.0

    cfg = chain_rt.ChainConfig(
        sample_rate=FS,
        deesser_enabled=True,
        eq_enabled=True,
        compressor_enabled=True,
        limiter_enabled=True,
        deesser=des_ops.DeEsserConfig(sample_rate=FS, enabled=True),
        compressor=comp_ops.CompressorConfig(
            sample_rate=FS,
            enabled=True,
            adaptive_release=True,
            auto_makeup_enabled=True,
            sidechain_highpass_enabled=True,
            block_samples=BLOCK,
        ),
    )
    params = comp_ops.compressor_params(cfg.compressor, threshold_db=-24.0, ratio=3.0)

    # a realistic applied Auto-EQ curve: every band active (nonzero gain)
    # so the compacted cascade still runs all 10 correction filters
    from audioforge_tpu.ops import eq as eq_ops

    gains = [-2.5, 1.5, -1.0, 2.0, 3.0, 2.5, 1.5, -2.0, 1.0, -1.5]
    eq_bands = [
        eq_ops.EqBandConfig(b.filter_type, b.frequency_hz, g, 4.33,
                            b.slope_db_per_octave, True)
        for b, g in zip(eq_ops.default_bands(), gains)
    ]

    rng = np.random.default_rng(0)
    t = np.arange(N_BLOCKS * BLOCK) / FS
    base = 0.25 * np.sin(2 * np.pi * 220 * t) * ((t % 0.6) < 0.35)
    audio = (
        base[None, None, :]
        + 0.01 * rng.standard_normal(SHAPE + (len(t),))
    ).astype(np.float32)
    blocks = jnp.asarray(audio.reshape(SHAPE + (N_BLOCKS, BLOCK)))

    state = chain_rt.chain_init(cfg, params, eq_bands=eq_bands, batch_shape=SHAPE)

    def whole(st, b):
        st, _, stats = chain_rt.chain_run(cfg, params, st, b, return_audio=False)
        return st, jnp.sum(stats["output_true_peak"])

    run = jax.jit(whole)

    # warmup / compile (the first few executions after compile are slow on
    # the tunnelled platform)
    st = state
    for _ in range(3):
        st, acc = run(st, blocks)
    float(acc)

    n_iters = 5
    start = time.perf_counter()
    for _ in range(n_iters):
        st, acc = run(st, blocks)
    float(acc)
    elapsed = time.perf_counter() - start

    audio_seconds = n_iters * BATCH * N_BLOCKS * BLOCK / FS
    throughput = audio_seconds / elapsed

    # single-stream block latency (includes host dispatch)
    one = chain_rt.chain_init(cfg, params, eq_bands=eq_bands)
    xb = jnp.asarray(audio[0, 0, :BLOCK])

    def one_block(s, x):
        s, y, _ = chain_rt.chain_block(cfg, params, s, x)
        return s, jnp.sum(y)

    block_fn = jax.jit(one_block)
    s1 = one
    for _ in range(5):
        s1, acc = block_fn(s1, xb)
    float(acc)
    lat = []
    for _ in range(100):
        t0 = time.perf_counter()
        s1, acc = block_fn(s1, xb)
        float(acc)
        lat.append(time.perf_counter() - t0)
    p99_ms = float(np.percentile(np.array(lat) * 1000.0, 99))

    result = {
        "metric": "full-chain throughput (deesser+EQ+comp+limiter+true-peak, 48kHz mono)",
        "value": round(throughput, 1),
        "unit": "audio-sec/sec/chip",
        "vs_baseline": round(throughput / 1000.0, 3),
        "batch": BATCH,
        "p99_block_latency_ms": round(p99_ms, 3),
        "platform": str(jax.devices()[0]),
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
