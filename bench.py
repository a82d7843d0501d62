"""Headline benchmark: FULL 48 kHz mono live-chain throughput per chip.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "audio-sec/sec/chip", "vs_baseline": N}

The headline is the TRUE full chain — routing (DC + adaptive cleanup) →
VAD auto-gate → smart gate → RNNoise suppressor → de-esser → 10-band EQ →
compressor → lookahead limiter → 4x true-peak limiter — the same fused
batched block step production serving runs (`runtime/serving.py`), batched
over independent streams. BASELINE.json's north star is >= 1000x realtime
per chip on this chain; ``vs_baseline`` is value / 1000.

Methodology: fleet 1024 (the measured knee for the stateful live chain —
512 underfills the VPU lanes, 2048 gains <3% while doubling memory), one
fused ``lax.scan`` over 100 blocks (1 s of audio) per device call, inputs
pre-staged on device and outputs reduced to a scalar inside jit so the
number isolates chip compute (production host<->chip links move the audio
in tens of µs; the dev tunnel's ~100 MB/s link is measured separately in
``evaluation/serving-harness-report.json``). The downstream offline chain
(de-esser → EQ → compressor → limiter → true-peak at batch 2048), round 1's
headline, is kept as a secondary metric.
"""

import json
import time

import jax
import jax.numpy as jnp
import numpy as np

from audioforge_tpu.cache import enable_compile_cache

enable_compile_cache()

FS = 48000.0
BLOCK = 480
BLOCK_S = BLOCK / FS


def bench_full_live_chain(vad_enabled: bool = False):
    """Fused serving step over the full live chain at fleet 1024.
    ``vad_enabled=True`` adds the in-step batched Silero VAD (one 576-input
    conv+LSTM per 32 ms window per stream) — the VAD-assisted gate is a
    flagship feature and its fleet-scale cost is a tracked headline."""
    from audioforge_tpu.runtime import live_chain as lc
    from audioforge_tpu.runtime import serving as srv
    from audioforge_tpu.runtime.serving import ServingConfig, ServingEngine

    FLEET = 1024
    SPAN = 100  # blocks per fused call = 1 s of audio per stream

    eng = ServingEngine(ServingConfig(
        capacity=FLEET, suppressor_model="rnnoise", vad_enabled=vad_enabled,
        chain=lc.LiveChainConfig(
            deesser_enabled=True,
            gate_mode=(lc.gate_ops.VAD_ASSISTED if vad_enabled
                       else lc.gate_ops.THRESHOLD_ONLY),
        )))
    rng = np.random.default_rng(1)
    params = eng._device_params()
    active = jnp.ones((FLEET,), jnp.bool_)
    reset = jnp.zeros((FLEET,), jnp.bool_)
    vp = jnp.zeros((FLEET,), jnp.float32)
    va = jnp.zeros((FLEET,), jnp.bool_)
    xs = jnp.asarray(
        (0.1 * rng.standard_normal((SPAN, FLEET, BLOCK))).astype(np.float32))

    @jax.jit
    def fused(params, state, xs):
        _, ys, _ = srv._serving_scan(eng.config, params, state, eng._fresh,
                                     xs, active, reset, vp, va)
        return jnp.sum(ys)

    float(fused(params, eng._state, xs))  # compile + settle
    best = 1e9
    for _ in range(5):
        t0 = time.perf_counter()
        float(fused(params, eng._state, xs))
        best = min(best, time.perf_counter() - t0)
    per_block_s = best / SPAN
    return FLEET * BLOCK_S / per_block_s, per_block_s, FLEET


def bench_downstream_chain():
    """Round 1's metric: offline downstream chain at batch 2048."""
    from audioforge_tpu.ops import compressor as comp_ops
    from audioforge_tpu.ops import deesser as des_ops
    from audioforge_tpu.ops import eq as eq_ops
    from audioforge_tpu.runtime import chain as chain_rt

    SHAPE = (16, 128)  # 2048 streams: the measured throughput knee
    BATCH = int(np.prod(SHAPE))
    N_BLOCKS = 200  # 2 s per stream per call

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
    params = comp_ops.compressor_params(cfg.compressor,
                                        threshold_db=-24.0, ratio=3.0)
    # a realistic applied Auto-EQ curve: every band active (nonzero gain)
    # so the compacted cascade still runs all 10 correction filters
    gains = [-2.5, 1.5, -1.0, 2.0, 3.0, 2.5, 1.5, -2.0, 1.0, -1.5]
    eq_bands = [
        eq_ops.EqBandConfig(b.filter_type, b.frequency_hz, g, 4.33,
                            b.slope_db_per_octave, True)
        for b, g in zip(eq_ops.default_bands(), gains)
    ]

    rng = np.random.default_rng(0)
    t = np.arange(N_BLOCKS * BLOCK) / FS
    base = 0.25 * np.sin(2 * np.pi * 220 * t) * ((t % 0.6) < 0.35)
    audio = (base[None, None, :]
             + 0.01 * rng.standard_normal(SHAPE + (len(t),))).astype(np.float32)
    blocks = jnp.asarray(audio.reshape(SHAPE + (N_BLOCKS, BLOCK)))
    state = chain_rt.chain_init(cfg, params, eq_bands=eq_bands,
                                batch_shape=SHAPE)

    def whole(st, b):
        st, _, stats = chain_rt.chain_run(cfg, params, st, b,
                                          return_audio=False)
        return st, jnp.sum(stats["output_true_peak"])

    run = jax.jit(whole)
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
    throughput = n_iters * BATCH * N_BLOCKS * BLOCK / FS / elapsed

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
    return throughput, p99_ms, BATCH


def main():
    full_tp, full_block_s, fleet = bench_full_live_chain()
    vad_tp, vad_block_s, _ = bench_full_live_chain(vad_enabled=True)
    down_tp, p99_ms, down_batch = bench_downstream_chain()

    result = {
        "metric": ("FULL live-chain throughput (routing+auto-gate+gate+"
                   "rnnoise+deesser+eq+compressor+limiter+true-peak, "
                   "48kHz mono)"),
        "value": round(full_tp, 1),
        "unit": "audio-sec/sec/chip",
        "vs_baseline": round(full_tp / 1000.0, 3),
        "fleet": fleet,
        "full_chain_ms_per_block": round(full_block_s * 1000.0, 3),
        "secondary_vad_on_audio_sec_per_sec": round(vad_tp, 1),
        "vad_on_vs_baseline": round(vad_tp / 1000.0, 3),
        "vad_on_ms_per_block": round(vad_block_s * 1000.0, 3),
        "secondary_downstream_chain_audio_sec_per_sec": round(down_tp, 1),
        "secondary_downstream_batch": down_batch,
        "p99_block_latency_ms": round(p99_ms, 3),
        "platform": str(jax.devices()[0]),
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
