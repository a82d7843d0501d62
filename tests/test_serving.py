"""Multi-stream serving harness: batched step semantics, slot lifecycle,
per-stream control, suppressor failure latch, and sharded execution.

The serving engine is the TPU-native transpose of the reference's
one-mic/five-threads design (SURVEY §2.9): N streams advance together in one
jitted block step. These tests pin the contracts that make that safe:
per-stream isolation, in-graph slot resets, branchless failure semantics
(`deepfilter_ffi.rs:841-864`, `dsp_loop.rs:1601-1641`), and identical
numerics to the single-stream live chain.
"""

import numpy as np
import pytest

# the jaxlib serializer can crash writing this module's large
# (mesh-sharded / lifecycle) executables — see conftest fixture
pytestmark = pytest.mark.usefixtures("no_persistent_cache")

import jax
import jax.numpy as jnp

from audioforge_tpu.runtime import live_chain as lc
from audioforge_tpu.runtime.serving import (
    BLOCK,
    ServingConfig,
    ServingEngine,
    _serving_step,
)


def _tone(n_blocks, freq=440.0, amp=0.1, fs=48000.0):
    t = np.arange(n_blocks * BLOCK) / fs
    return (amp * np.sin(2 * np.pi * freq * t)).astype(np.float32)


def _chain_cfg(**kw):
    kw.setdefault("deesser_enabled", False)
    kw.setdefault("cleanup_mode", "off")
    return lc.LiveChainConfig(**kw)


@pytest.fixture(scope="module")
def engine():
    """One compiled engine shared by the basic-behavior tests."""
    cfg = ServingConfig(capacity=4, suppressor_model=None, vad_enabled=False,
                        chain=_chain_cfg())
    return ServingEngine(cfg)


class TestLifecycle:
    def test_attach_detach_occupancy(self, engine):
        slots = [engine.attach() for _ in range(4)]
        assert sorted(slots) == [0, 1, 2, 3]
        assert engine.occupancy == 4
        with pytest.raises(RuntimeError):
            engine.attach()
        for s in slots:
            engine.detach(s)
        assert engine.occupancy == 0

    def test_push_to_detached_slot_rejected(self, engine):
        s = engine.attach()
        engine.detach(s)
        with pytest.raises(ValueError):
            engine.push(s, np.zeros(BLOCK, np.float32))

    def test_underruns_counted(self, engine):
        s = engine.attach()
        engine.step()  # nothing pushed -> underrun
        d = engine.stream_diagnostics(s)
        assert d["underrun_count"] == 1
        assert d["blocks_processed"] == 1
        engine.detach(s)

    def test_sink_receives_blocks(self, engine):
        got = []
        s = engine.attach(sink=lambda b: got.append(b.copy()))
        x = _tone(3)
        engine.push(s, x)
        engine.run_blocks(3)
        engine.detach(s)
        assert len(got) == 3
        y = np.concatenate(got)
        assert y.shape == (3 * BLOCK,)
        assert np.all(np.isfinite(y))
        assert np.max(np.abs(y)) > 1e-4  # signal actually flowed


class TestIsolationAndParity:
    def test_streams_are_isolated(self, engine):
        """A loud stream must not leak into a silent neighbour."""
        loud, quiet = [], []
        s0 = engine.attach(sink=lambda b: loud.append(b.copy()))
        s1 = engine.attach(sink=lambda b: quiet.append(b.copy()))
        for i in range(5):
            engine.push(s0, _tone(1, amp=0.5))
            engine.push(s1, np.zeros(BLOCK, np.float32))
            engine.step()
        engine.detach(s0)
        engine.detach(s1)
        assert np.max(np.abs(np.concatenate(loud))) > 0.01
        assert np.max(np.abs(np.concatenate(quiet))) == 0.0

    def test_matches_single_stream_chain(self):
        """Serving slot 0 must equal the raw front+back chain bit-for-bit
        (same jitted ops, no suppressor): the batch axis is free."""
        chain_cfg = _chain_cfg()
        cfg = ServingConfig(capacity=2, suppressor_model=None,
                            vad_enabled=False, chain=chain_cfg)
        eng = ServingEngine(cfg)
        got = []
        s = eng.attach(sink=lambda b: got.append(b.copy()))
        x = _tone(4, amp=0.2)
        eng.push(s, x)
        eng.run_blocks(4)
        served = np.concatenate(got)

        params = lc.live_params(chain_cfg)
        state = lc.live_init(chain_cfg)
        ref = []
        for i in range(4):
            blk = jnp.asarray(x[i * BLOCK:(i + 1) * BLOCK])
            state, y, fm = lc.front_block(
                chain_cfg, params, state, blk,
                jnp.float32(0.0), jnp.bool_(False),
            )
            evidence = {
                "vad_probability": jnp.float32(0.0),
                "vad_reliability": jnp.float32(0.0),
                "noise_floor_db": fm["noise_floor_db"],
                "live_noise_reliability": fm["noise_floor_reliability"],
            }
            state, y2, _ = lc.back_block(chain_cfg, params, state, y, evidence)
            ref.append(np.asarray(y2))
        ref = np.concatenate(ref)
        np.testing.assert_allclose(served, ref, atol=2e-6)

    def test_per_stream_params_differentiate(self):
        """Different compressor thresholds must produce different gain
        reduction on identical input — per-stream control pytrees work."""
        cfg = ServingConfig(
            capacity=2, suppressor_model=None, vad_enabled=False,
            chain=_chain_cfg(compressor_enabled=True),
        )
        eng = ServingEngine(cfg)
        s0, s1 = eng.attach(), eng.attach()
        eng.set_stream_params(s0, compressor_threshold_db=-50.0,
                              compressor_ratio=6.0)
        eng.set_stream_params(s1, compressor_threshold_db=-6.0)
        x = _tone(6, amp=0.5)
        for i in range(6):
            blk = x[i * BLOCK:(i + 1) * BLOCK]
            eng.push(s0, blk)
            eng.push(s1, blk)
            eng.step()
        d0 = eng.stream_diagnostics(s0)
        d1 = eng.stream_diagnostics(s1)
        assert d0["compressor_gain_reduction_db"] > 3.0
        assert d1["compressor_gain_reduction_db"] < 1.0

    def test_slot_reset_on_reattach(self):
        """Re-attaching a slot must not inherit the previous stream's
        filter/meter state (in-graph masked reset)."""
        cfg = ServingConfig(capacity=1, suppressor_model=None,
                            vad_enabled=False, chain=_chain_cfg())
        eng = ServingEngine(cfg)

        # stream A: loud, saturate meters/envelopes
        s = eng.attach()
        for _ in range(5):
            eng.push(s, _tone(1, amp=0.9))
            eng.step()
        eng.detach(s)

        # fresh engine as the no-history reference
        eng2 = ServingEngine(cfg)
        s2 = eng2.attach()

        # stream B on both engines: outputs must match exactly
        got_a, got_b = [], []
        sb = eng.attach(sink=lambda b: got_a.append(b.copy()))
        eng2._slots[s2].sink = lambda b: got_b.append(b.copy())
        xb = _tone(3, freq=330.0, amp=0.05)
        for i in range(3):
            blk = xb[i * BLOCK:(i + 1) * BLOCK]
            eng.push(sb, blk)
            eng2.push(s2, blk)
            eng.step()
            eng2.step()
        np.testing.assert_allclose(
            np.concatenate(got_a), np.concatenate(got_b), atol=1e-6
        )


class TestSuppressorServing:
    def test_suppressor_runs_and_is_finite(self):
        cfg = ServingConfig(capacity=2, suppressor_model="rnnoise",
                            vad_enabled=False, chain=_chain_cfg())
        eng = ServingEngine(cfg)
        got = []
        s = eng.attach(sink=lambda b: got.append(b.copy()))
        rng = np.random.default_rng(1)
        for _ in range(6):
            eng.push(s, (0.1 * rng.standard_normal(BLOCK)).astype(np.float32))
            eng.step()
        y = np.concatenate(got)
        assert np.all(np.isfinite(y))
        d = eng.stream_diagnostics(s)
        assert d["suppressor_backend_failed"] == 0
        assert d["suppressor_soft_resets"] == 0

    def test_strength_zero_is_latency_aligned_dry(self):
        """strength=0 must output the post-routing dry signal delayed by
        exactly one frame (the model's 480-sample latency,
        `rnnoise.rs:313-315`): identical to a no-suppressor engine shifted
        one block."""
        chain = _chain_cfg(
            gate_enabled=False, eq_enabled=False, compressor_enabled=False,
            limiter_enabled=False, careful_output_enabled=False,
        )
        eng = ServingEngine(ServingConfig(
            capacity=1, suppressor_model="rnnoise", vad_enabled=False,
            chain=chain))
        ref = ServingEngine(ServingConfig(
            capacity=1, suppressor_model=None, vad_enabled=False,
            chain=chain))
        got, want = [], []
        s = eng.attach(sink=lambda b: got.append(b.copy()))
        r = ref.attach(sink=lambda b: want.append(b.copy()))
        eng.set_stream_suppressor(s, strength=0.0)
        x = _tone(5, freq=500.0, amp=0.2)
        # burn in the 15 ms strength EMA from its 1.0 start with silence
        for _ in range(60):
            eng.push(s, np.zeros(BLOCK, np.float32))
            eng.step()
        got.clear()
        for i in range(5):
            blk = x[i * BLOCK:(i + 1) * BLOCK]
            eng.push(s, blk)
            ref.push(r, blk)
            eng.step()
            ref.step()
        y = np.concatenate(got)
        y_ref = np.concatenate(want)
        # one-frame delay alignment against the suppressor-free chain
        np.testing.assert_allclose(y[BLOCK:], y_ref[:4 * BLOCK], atol=1e-4)

    def test_standard_deepfilter_dry_is_three_blocks_behind(self):
        """The standard (2-frame lookahead) DeepFilter adds two blocks of
        model latency on top of the 1-block OLA latency; the serving dry
        path must follow (3-block delay) so strength=0 stays aligned
        (`deepfilter_ffi.rs:40-43`)."""
        chain = _chain_cfg(
            gate_enabled=False, eq_enabled=False, compressor_enabled=False,
            limiter_enabled=False, careful_output_enabled=False,
        )
        eng = ServingEngine(ServingConfig(
            capacity=1, suppressor_model="deepfilter", vad_enabled=False,
            chain=chain))
        ref = ServingEngine(ServingConfig(
            capacity=1, suppressor_model=None, vad_enabled=False,
            chain=chain))
        got, want = [], []
        s = eng.attach(sink=lambda b: got.append(b.copy()))
        r = ref.attach(sink=lambda b: want.append(b.copy()))
        eng.set_stream_suppressor(s, strength=0.0)
        x = _tone(7, freq=500.0, amp=0.2)
        for _ in range(60):
            eng.push(s, np.zeros(BLOCK, np.float32))
            eng.step()
        got.clear()
        for i in range(7):
            blk = x[i * BLOCK:(i + 1) * BLOCK]
            eng.push(s, blk)
            ref.push(r, blk)
            eng.step()
            ref.step()
        y = np.concatenate(got)
        y_ref = np.concatenate(want)
        np.testing.assert_allclose(y[3 * BLOCK:], y_ref[:4 * BLOCK],
                                   atol=1e-4)

    def test_nonfinite_input_does_not_poison_neighbours(self):
        """A NaN burst on one stream must be scrubbed (input sanitize +
        suppressor guard) and never contaminate the other slot."""
        cfg = ServingConfig(capacity=2, suppressor_model="rnnoise",
                            vad_enabled=False, chain=_chain_cfg())
        eng = ServingEngine(cfg)
        a, b = [], []
        s0 = eng.attach(sink=lambda blk: a.append(blk.copy()))
        s1 = eng.attach(sink=lambda blk: b.append(blk.copy()))
        bad = np.full(BLOCK, np.nan, np.float32)
        for i in range(4):
            eng.push(s0, bad if i == 1 else _tone(1))
            eng.push(s1, _tone(1, freq=330.0))
            eng.step()
        assert np.all(np.isfinite(np.concatenate(a)))
        assert np.all(np.isfinite(np.concatenate(b)))


class TestFusedScan:
    def test_step_many_matches_repeated_step(self):
        """The fused multi-block scan must produce exactly the per-block
        path's output (same compiled step inside lax.scan)."""
        cfg = ServingConfig(capacity=2, suppressor_model="rnnoise",
                            vad_enabled=False, chain=_chain_cfg())
        eng_a = ServingEngine(cfg)
        eng_b = ServingEngine(cfg)
        a, b = [], []
        sa = eng_a.attach(sink=lambda blk: a.append(blk.copy()))
        sb = eng_b.attach(sink=lambda blk: b.append(blk.copy()))
        rng = np.random.default_rng(3)
        x = (0.1 * rng.standard_normal(6 * BLOCK)).astype(np.float32)
        eng_a.push(sa, x)
        eng_b.push(sb, x)
        eng_a.step_many(6)
        eng_b.run_blocks(6)
        assert len(a) == 6
        np.testing.assert_allclose(
            np.concatenate(a), np.concatenate(b), atol=1e-6
        )
        assert eng_a.stream_diagnostics(sa)["blocks_processed"] == 6

    def test_control_write_dirties_device_params(self):
        """Params are device-cached between control writes; a write must
        take effect on the next step."""
        cfg = ServingConfig(capacity=1, suppressor_model=None,
                            vad_enabled=False,
                            chain=_chain_cfg(compressor_enabled=True))
        eng = ServingEngine(cfg)
        s = eng.attach()
        x = _tone(8, amp=0.5)
        for i in range(4):
            eng.push(s, x[i * BLOCK:(i + 1) * BLOCK])
            eng.step()
        gr_before = eng.stream_diagnostics(s)["compressor_gain_reduction_db"]
        eng.set_stream_params(s, compressor_threshold_db=-50.0,
                              compressor_ratio=6.0)
        for i in range(4, 8):
            eng.push(s, x[i * BLOCK:(i + 1) * BLOCK])
            eng.step()
        gr_after = eng.stream_diagnostics(s)["compressor_gain_reduction_db"]
        assert gr_after > gr_before + 2.0


class TestPipelinedStep:
    def test_pipelined_matches_step_with_one_block_delay(self):
        """step_pipelined overlaps device compute with host delivery; the
        delivered audio must equal the synchronous path exactly, one call
        later, with flush_pipeline draining the final block."""
        cfg = ServingConfig(capacity=2, suppressor_model=None,
                            vad_enabled=False, chain=_chain_cfg())
        sync_out, pipe_out = [], []
        es = ServingEngine(cfg)
        ep = ServingEngine(cfg)
        ss = es.attach(sink=lambda b: sync_out.append(b.copy()))
        sp = ep.attach(sink=lambda b: pipe_out.append(b.copy()))
        rng = np.random.default_rng(5)
        x = (0.1 * rng.standard_normal(5 * BLOCK)).astype(np.float32)
        es.push(ss, x)
        ep.push(sp, x)
        first = None
        for i in range(5):
            es.step()
            delivered = ep.step_pipelined()
            if i == 0:
                first = delivered
        assert first is None          # nothing delivered on the first call
        assert len(pipe_out) == 4     # one block in flight
        ep.flush_pipeline()
        assert len(pipe_out) == 5
        np.testing.assert_allclose(
            np.concatenate(sync_out), np.concatenate(pipe_out), atol=1e-6)

    def test_stop_flushes_pipeline(self):
        cfg = ServingConfig(capacity=1, suppressor_model=None,
                            vad_enabled=False, chain=_chain_cfg())
        out = []
        eng = ServingEngine(cfg)
        s = eng.attach(sink=lambda b: out.append(b.copy()))
        eng.push(s, _tone(2))
        eng.step_pipelined()
        eng.step_pipelined()
        eng.stop()  # drains the in-flight block
        assert len(out) == 2


class TestServingNoRetrace:
    def test_lifecycle_and_control_reuse_one_compile(self):
        """The serving equivalent of the reference's zero-allocation
        steady-state contract: attach/detach, control edits, suppressor
        tweaks, and slot resets must all hit ONE compiled step — retraces
        on the serving hot path are the TPU analogue of RT-thread
        allocation (SURVEY §4 tier 3)."""
        cfg = ServingConfig(capacity=2, suppressor_model=None,
                            vad_enabled=False, chain=_chain_cfg())
        eng = ServingEngine(cfg)
        s0 = eng.attach()
        eng.push(s0, _tone(1))
        eng.step()
        # the pjit cache is shared across engine instances of the same
        # underlying step function, so assert no GROWTH rather than an
        # absolute count (suite ordering populates it)
        baseline = eng._step._cache_size()
        # lifecycle churn + control edits
        s1 = eng.attach()
        eng.set_stream_params(s0, compressor_threshold_db=-35.0,
                              gate_threshold_db=-50.0)
        eng.step()
        eng.detach(s1)
        eng.step()
        s2 = eng.attach()  # slot reuse -> in-graph reset
        eng.set_stream_eq(s2, None)
        eng.push(s2, _tone(1))
        eng.step()
        assert eng._step._cache_size() == baseline, "serving hot path retraced"


class TestVadServing:
    def test_batched_vad_warms_up_and_reports(self):
        cfg = ServingConfig(capacity=2, suppressor_model=None,
                            vad_enabled=True, chain=_chain_cfg())
        eng = ServingEngine(cfg)
        s = eng.attach()
        eng.push(s, _tone(1))
        eng.step()
        assert eng.stream_diagnostics(s)["vad_available"] == 0.0
        for _ in range(5):
            eng.push(s, _tone(1))
            eng.step()
        d = eng.stream_diagnostics(s)
        assert d["vad_available"] == 1.0
        assert 0.0 <= d["vad_probability"] <= 1.0


class TestShardedServing:
    def test_stream_axis_shards_over_mesh(self):
        """The serving batch shards over an 8-device mesh and produces the
        same output as the unsharded engine (pure data parallelism)."""
        from jax.sharding import Mesh, NamedSharding, PartitionSpec

        devices = jax.devices()
        assert len(devices) == 8, "conftest forces an 8-device CPU mesh"
        mesh = Mesh(np.asarray(devices), ("streams",))
        sharding = NamedSharding(mesh, PartitionSpec("streams"))

        cfg = ServingConfig(capacity=8, suppressor_model=None,
                            vad_enabled=False, chain=_chain_cfg())
        eng_sharded = ServingEngine(cfg, sharding=sharding)
        eng_plain = ServingEngine(cfg)

        outs_s = {i: [] for i in range(8)}
        outs_p = {i: [] for i in range(8)}
        for i in range(8):
            si = eng_sharded.attach(
                sink=(lambda i: lambda b: outs_s[i].append(b.copy()))(i))
            pi = eng_plain.attach(
                sink=(lambda i: lambda b: outs_p[i].append(b.copy()))(i))
            assert si == pi == i

        rng = np.random.default_rng(7)
        for _ in range(3):
            for i in range(8):
                blk = (0.1 * rng.standard_normal(BLOCK)).astype(np.float32)
                eng_sharded.push(i, blk)
                eng_plain.push(i, blk)
            eng_sharded.step()
            eng_plain.step()

        for i in range(8):
            np.testing.assert_allclose(
                np.concatenate(outs_s[i]), np.concatenate(outs_p[i]),
                atol=1e-6,
            )


class TestServingPresets:
    def test_config_for_preset_matches_topology(self):
        from audioforge_tpu.config import BUILTIN_PRESETS
        from audioforge_tpu.runtime.preset_io import serving_config_for_preset

        preset = BUILTIN_PRESETS["voice"]
        cfg = serving_config_for_preset(preset, capacity=4)
        assert cfg.capacity == 4
        assert cfg.chain.gate_enabled == preset.gate.enabled
        assert cfg.chain.compressor_enabled == preset.compressor.enabled
        assert cfg.suppressor_model == (
            preset.rnnoise.model if preset.rnnoise.enabled else None)

    def test_apply_preset_to_stream_differentiates(self):
        """Two streams with different presets must process differently;
        a topology-matched engine yields no warnings."""
        from audioforge_tpu.config import BUILTIN_PRESETS
        from audioforge_tpu.runtime.preset_io import (
            apply_preset_to_stream,
            serving_config_for_preset,
        )

        preset = BUILTIN_PRESETS["voice"]
        cfg = serving_config_for_preset(preset, capacity=2,
                                        vad_enabled=False)
        eng = ServingEngine(cfg)
        a_out, b_out = [], []
        s0 = eng.attach(sink=lambda blk: a_out.append(blk.copy()))
        s1 = eng.attach(sink=lambda blk: b_out.append(blk.copy()))
        warnings = apply_preset_to_stream(eng, s0, preset)
        assert warnings == [], warnings
        # stream 1: same preset but a hard limiter ceiling
        import dataclasses

        limited = dataclasses.replace(
            preset, limiter=dataclasses.replace(preset.limiter,
                                                ceiling_db=-20.0))
        apply_preset_to_stream(eng, s1, limited)
        x = _tone(6, amp=0.9)
        for i in range(6):
            blk = x[i * BLOCK:(i + 1) * BLOCK]
            eng.push(s0, blk)
            eng.push(s1, blk)
            eng.step()
        a = np.concatenate(a_out)
        b = np.concatenate(b_out)
        assert np.max(np.abs(b)) < np.max(np.abs(a)) - 0.05

    def test_topology_mismatch_warns(self):
        from audioforge_tpu.config import BUILTIN_PRESETS
        from audioforge_tpu.runtime.preset_io import apply_preset_to_stream

        preset = BUILTIN_PRESETS["voice"]
        cfg = ServingConfig(capacity=1, suppressor_model=None,
                            vad_enabled=False,
                            chain=_chain_cfg(compressor_enabled=False))
        eng = ServingEngine(cfg)
        s = eng.attach()
        warnings = apply_preset_to_stream(eng, s, preset)
        assert any("compressor_enabled" in w for w in warnings)
        assert any("noise model" in w for w in warnings)


class TestStagedEqReplace:
    def test_set_stream_eq_applies_and_survives_state_swap(self):
        """set_stream_eq stages the fresh EQ tree under the lock and applies
        it at the next step boundary — a concurrent step replacing
        ``self._state`` between the call and the apply (the race in round-1
        review) must not discard the update."""
        from audioforge_tpu.ops import eq as eq_ops

        cfg = ServingConfig(capacity=2, suppressor_model=None,
                            vad_enabled=False, chain=_chain_cfg())
        eng = ServingEngine(cfg)
        sinks = [[], []]
        s0 = eng.attach(sink=lambda b: sinks[0].append(b.copy()))
        s1 = eng.attach(sink=lambda b: sinks[1].append(b.copy()))
        # keep the gate wide open so it cannot skew the comparison
        for s in (s0, s1):
            eng.set_stream_params(s, gate_threshold_db=-80.0)

        boost = [
            eq_ops.EqBandConfig(b.filter_type, b.frequency_hz,
                                12.0 if abs(b.frequency_hz - 1280.0) < 1.0
                                else 0.0,
                                1.0, b.slope_db_per_octave, True)
            for b in eq_ops.default_bands()
        ]
        eng.set_stream_eq(s0, boost)
        # simulate the concurrent step's state swap racing the update: the
        # old read-modify-write surgery would now be lost
        eng._state = jax.tree_util.tree_map(lambda a: a, eng._state)

        x = _tone(30, freq=1280.0, amp=0.05)
        eng.push(s0, x)
        eng.push(s1, x)
        for _ in range(30):
            eng.step()
        tail0 = np.concatenate(sinks[0][15:])
        tail1 = np.concatenate(sinks[1][15:])
        gain_db = 20.0 * np.log10(
            np.sqrt(np.mean(tail0**2)) / np.sqrt(np.mean(tail1**2)))
        assert gain_db > 6.0, f"staged +12 dB EQ not applied ({gain_db:.2f} dB)"


class TestMaskedResetAxes:
    def test_shared_leaves_survive_reset_at_matching_capacity(self):
        """`_masked_reset` must use the rank-vs-reference axis map: at
        capacity 2 the chain state contains shared leaves whose leading dim
        equals the capacity (e.g. [2, 5] K-weighting coefficient rows); the
        old shape heuristic mask-blended them."""
        from audioforge_tpu.runtime import serving as srv

        cfg = ServingConfig(capacity=2, suppressor_model=None,
                            vad_enabled=False, chain=_chain_cfg())
        state = srv._serving_state_init(cfg)
        axes = srv._serving_state_axes(cfg, state)
        # at least one shared leaf must have a leading dim == capacity for
        # this test to bite
        leaves = jax.tree_util.tree_leaves(
            jax.tree_util.tree_map(
                lambda leaf, ax: (ax is None and jnp.ndim(leaf) > 0
                                  and leaf.shape[0] == cfg.capacity),
                state, axes))
        assert any(bool(v) for v in leaves), (
            "fixture lost its teeth: no shared leaf with leading dim == "
            "capacity at capacity 2")

        poisoned = jax.tree_util.tree_map(lambda a: a + 1000.0, state)
        out = srv._masked_reset(state, poisoned,
                                jnp.asarray([True, False]), axes)

        def check(cur, new, ax, orig):
            if ax is None:
                np.testing.assert_array_equal(np.asarray(cur),
                                              np.asarray(orig))
        jax.tree_util.tree_map(check, out, poisoned, axes, state)
