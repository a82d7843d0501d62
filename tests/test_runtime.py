"""Live runtime: ring buffer, live chain step, AudioProcessor lifecycle.

Behavioural targets follow the reference engine tests
(`processor/tests.rs`): the control surface, recording tap, output probe,
diagnostics dict shape, and stream lifecycle — driven through virtual
devices since the runtime has no sound card.
"""

import time

import jax.numpy as jnp
import numpy as np
import pytest

from audioforge_tpu.runtime import live_chain as lc
from audioforge_tpu.runtime.processor import (
    AudioProcessor,
    list_input_devices,
    list_output_devices,
    register_virtual_input,
    register_virtual_output,
)
from audioforge_tpu.runtime.ringbuffer import AudioRing


class TestAudioRing:
    def test_write_read_roundtrip(self):
        r = AudioRing(1024)
        assert r.capacity == 1024
        assert r.write(np.arange(100, dtype=np.float32)) == 100
        out = r.read(100)
        assert np.array_equal(out, np.arange(100, dtype=np.float32))

    def test_overflow_drops_and_counts(self):
        r = AudioRing(256)
        written = r.write(np.ones(1000, np.float32))
        assert written == r.capacity
        assert r.dropped() == 1000 - r.capacity
        assert r.overflow_events() == 1
        r.reset_dropped()
        assert r.dropped() == 0

    def test_wraparound(self):
        r = AudioRing(128)
        for i in range(40):
            assert r.write(np.full(37, float(i), np.float32)) == 37
            assert np.all(r.read(37) == float(i))

    def test_discard_and_clear(self):
        r = AudioRing(256)
        r.write(np.ones(200, np.float32))
        assert r.discard(50) == 50
        assert r.available() == 150
        r.clear()
        assert r.available() == 0


class TestLiveChain:
    def test_front_back_shapes_and_stability(self, rng):
        cfg = lc.LiveChainConfig(gate_mode=1)
        params = lc.live_params(cfg)
        state = lc.live_init(cfg)
        x = jnp.asarray(
            0.1 * rng.standard_normal(lc.BLOCK_SAMPLES), jnp.float32
        )
        ev = {
            "vad_probability": jnp.float32(0.8),
            "vad_reliability": jnp.float32(1.0),
            "noise_floor_db": jnp.float32(-60.0),
            "live_noise_reliability": jnp.float32(0.5),
        }
        s = state
        for _ in range(3):
            s, y, fm = lc.front_block(
                cfg, params, s, x, jnp.float32(0.8), jnp.bool_(True)
            )
            s, y, bm = lc.back_block(cfg, params, s, y, ev)
        assert y.shape == x.shape
        assert np.all(np.isfinite(np.asarray(y)))
        assert float(bm["output_peak_db"]) <= 0.0

    def test_params_edit_no_retrace(self, rng):
        """Control edits reuse the compiled step (same state signature)."""
        cfg = lc.LiveChainConfig()
        state = lc.live_init(cfg)
        x = jnp.zeros(lc.BLOCK_SAMPLES, jnp.float32)
        p1 = lc.live_params(cfg)
        s, y, _ = lc.front_block(cfg, p1, state, x, jnp.float32(0.0),
                                 jnp.bool_(False))
        import jax.tree_util as jtu

        sig = lambda t: [
            (a.shape, a.dtype, a.weak_type) for a in jtu.tree_leaves(t)
        ]
        assert sig(s) == sig(state)
        p2 = lc.live_params(cfg, gate_threshold_db=-33.0, limiter_ceiling_db=-4.0)
        assert sig(p2) == sig(p1)

    def test_limiter_params_enforced(self, rng):
        """A traced ceiling edit actually changes limiting behaviour."""
        cfg = lc.LiveChainConfig(
            gate_enabled=False, compressor_enabled=False, eq_enabled=False,
            careful_output_enabled=False,
        )
        loud = jnp.asarray(
            0.99 * np.sign(rng.standard_normal(lc.BLOCK_SAMPLES)), jnp.float32
        )
        outs = {}
        for ceiling in (-1.0, -9.0):
            params = lc.live_params(cfg, limiter_ceiling_db=ceiling)
            s = lc.live_init(cfg)
            y = loud
            for _ in range(4):
                s, y2, _ = lc.front_block(
                    cfg, params, s, loud, jnp.float32(0.0), jnp.bool_(False)
                )
                s, y, _ = lc.back_block(cfg, params, s, y2, None)
            outs[ceiling] = float(jnp.max(jnp.abs(y)))
        assert outs[-1.0] > outs[-9.0]
        assert outs[-9.0] <= 10 ** (-9.0 / 20.0) + 1e-3

    def test_fused_drain_matches_per_block(self, rng):
        """front_run/back_run (the backlog-drain burst path) must produce
        exactly the per-block outputs: the engine catches up on dispatch
        backlog by fusing, never by approximating. The reference instead
        discards above 250 ms (`dsp_loop.rs:917-950`); fusing first keeps
        the audio."""
        cfg = lc.LiveChainConfig()
        params = lc.live_params(cfg)
        state = lc.live_init(cfg)
        xs = jnp.asarray(
            0.1 * rng.standard_normal((4, lc.BLOCK_SAMPLES)), jnp.float32
        )
        vp, va = jnp.float32(0.3), jnp.bool_(True)

        s = state
        ys_ref = []
        nf, nr = [], []
        for i in range(4):
            s, y, fm = lc.front_block(cfg, params, s, xs[i], vp, va)
            ys_ref.append(np.asarray(y))
            nf.append(fm["noise_floor_db"])
            nr.append(fm["noise_floor_reliability"])
        s2, ys, fms = lc.front_run(cfg, params, state, xs, vp, va)
        np.testing.assert_allclose(np.stack(ys_ref), np.asarray(ys),
                                   rtol=0, atol=1e-6)

        evid = {
            "vad_probability": jnp.broadcast_to(vp, (4,)),
            "vad_reliability": jnp.ones((4,), jnp.float32),
            "noise_floor_db": fms["noise_floor_db"],
            "live_noise_reliability": fms["noise_floor_reliability"],
        }
        sA = state
        outs_ref = []
        for i in range(4):
            ev = {
                "vad_probability": vp,
                "vad_reliability": jnp.float32(1.0),
                "noise_floor_db": jnp.stack(nf)[i],
                "live_noise_reliability": jnp.stack(nr)[i],
            }
            sA, z, _ = lc.back_block(cfg, params, sA, ys[i], ev)
            outs_ref.append(np.asarray(z))
        sB, zs, bms = lc.back_run(cfg, params, state, ys, evid)
        np.testing.assert_allclose(np.stack(outs_ref), np.asarray(zs),
                                   rtol=0, atol=1e-6)
        # stacked per-block metrics carry the burst axis
        assert np.asarray(bms["output_peak_db"]).shape == (4,)

    def test_latency_accounting(self):
        cfg = lc.LiveChainConfig()
        with_supp = lc.chain_latency_samples(cfg, 480)
        without = lc.chain_latency_samples(cfg, 0)
        assert with_supp - without == 480
        no_lim = lc.chain_latency_samples(
            lc.LiveChainConfig(limiter_enabled=False), 0
        )
        assert no_lim == 0


@pytest.fixture(scope="module")
def running_processor():
    captured = []
    register_virtual_output("test-capture", lambda block: captured.append(block))

    class Tone:
        def __init__(self):
            self.n = 0

        def __call__(self, n):
            t = (self.n + np.arange(n)) / 48000.0
            self.n += n
            return (0.1 * np.sin(2 * np.pi * 220 * t)).astype(np.float32)

    register_virtual_input("test-tone", Tone)
    p = AudioProcessor()
    p.realtime_pacing = False
    msg = p.start("test-tone", "test-capture")
    assert msg == "Started: test-tone -> test-capture"
    # wait until blocks flow
    deadline = time.time() + 120
    while p._counters["blocks_processed"] < 5 and time.time() < deadline:
        time.sleep(0.05)
    yield p, captured
    p.stop()


class TestAudioProcessor:
    def test_device_enumeration(self):
        names = [d.name for d in list_input_devices()]
        assert "Null Input" in names
        out_names = [d.name for d in list_output_devices()]
        assert "Null Output" in out_names
        default = [d for d in list_input_devices() if d.is_default]
        assert len(default) == 1

    def test_unknown_device_rejected(self):
        p = AudioProcessor()
        with pytest.raises(RuntimeError, match="Failed to resolve"):
            p.start("No Such Device")

    def test_lifecycle_and_metering(self, running_processor):
        p, captured = running_processor
        assert p.is_running()
        assert p.get_active_input_device() == "test-tone"
        assert p.sample_rate() == 48000
        assert p._counters["blocks_processed"] >= 5
        assert len(captured) > 0
        # -20 dBFS tone; the 300 ms RMS meter may still be charging after
        # only ~5 blocks, so accept anything between silence and overload
        assert -45.0 < p.get_input_rms_db() < -15.0

    def test_double_start_rejected(self, running_processor):
        p, _ = running_processor
        with pytest.raises(RuntimeError, match="Already running"):
            p.start("test-tone", "test-capture")

    def test_control_surface_roundtrip(self, running_processor):
        p, _ = running_processor
        p.set_gate_threshold(-35.0)
        p.set_compressor_ratio(3.0)
        p.set_limiter_ceiling(-2.0)
        p.set_rnnoise_strength(0.5)
        assert p.get_rnnoise_strength() == 0.5
        assert p.get_limiter_effective_ceiling_db() == -2.0
        p.set_limiter_careful_output_enabled(True)
        p.set_limiter_ceiling(-0.5)
        assert p.get_limiter_effective_ceiling_db() == -1.5  # careful clamp
        # out-of-range values are clamped, not errors
        p.set_compressor_ratio(999.0)
        assert p._params["compressor_ratio"] == 20.0

    def test_eq_band_controls(self, running_processor):
        p, _ = running_processor
        p.set_eq_band_gain(2, 3.0)
        freq, gain, q = p.get_eq_band_params(2)
        assert gain == 3.0
        cfg = p.get_eq_band_config(2)
        assert cfg[0] == "bell" and cfg[2] == 3.0
        with pytest.raises(ValueError):
            p.set_eq_band_gain(99, 0.0)
        p.apply_eq_settings([(100.0 * (i + 1), 0.0, 1.41) for i in range(10)])
        assert p.get_eq_band_params(0)[0] == 100.0

    def test_invalid_modes_rejected(self, running_processor):
        p, _ = running_processor
        with pytest.raises(ValueError):
            p.set_gate_mode(7)
        with pytest.raises(ValueError):
            p.set_input_cleanup_mode("extreme")
        assert p.set_noise_model("bogus") is False
        assert p.set_noise_model("rnnoise") is True

    def test_recording_tap(self, running_processor):
        p, _ = running_processor
        p.start_raw_recording(0.2)
        deadline = time.time() + 60
        while not p.is_recording_complete() and time.time() < deadline:
            time.sleep(0.05)
        assert p.is_recording_complete()
        audio = p.stop_raw_recording()
        assert len(audio) == int(0.2 * 48000)
        assert max(abs(v) for v in audio) > 0.01  # the tone is in the tap

    def test_recording_validation(self, running_processor):
        p, _ = running_processor
        with pytest.raises(ValueError):
            p.start_raw_recording(0.0)

    def test_output_probe(self, running_processor):
        p, _ = running_processor
        probe = np.full(2400, 0.25, np.float32)
        p.queue_output_probe(probe)
        deadline = time.time() + 60
        while not p.is_output_probe_complete() and time.time() < deadline:
            time.sleep(0.05)
        assert p.is_output_probe_complete()
        with pytest.raises(ValueError):
            p.queue_output_probe(np.array([np.nan], np.float32))

    def test_runtime_diagnostics_shape(self, running_processor):
        p, _ = running_processor
        d = p.get_runtime_diagnostics()
        required = {
            "noise_model", "input_dropped_samples", "output_underrun_total",
            "clip_event_count", "limiter_gain_reduction_db",
            "limiter_effective_ceiling_db", "gate_chatter_event_count",
            "engine_latency_ms", "total_latency_ms", "gate_fused_score",
            "output_short_term_lufs", "input_cleanup_mode",
            "output_true_peak_db", "rt_error_name", "recovery_suppressed",
            "limiter_gain_reduction_history_db",
        }
        assert required <= set(d)
        assert len(d["limiter_gain_reduction_history_db"]) == 100
        assert d["output_sample_rate"] == 48000

    def test_vad_worker_publishes(self, running_processor):
        p, _ = running_processor
        deadline = time.time() + 60
        while not p.is_vad_available() and time.time() < deadline:
            time.sleep(0.05)
        assert p.is_vad_available()
        assert 0.0 <= p.get_vad_probability() <= 1.0

    def test_bypass_passthrough(self, running_processor):
        p, _ = running_processor
        p.set_bypass(True)
        assert p.is_bypass()
        time.sleep(0.3)
        p.set_bypass(False)
        assert not p.is_bypass()

    def test_latency_reporting(self, running_processor):
        p, _ = running_processor
        engine = p.get_engine_latency_ms()
        assert 10.0 < engine < 100.0
        p.set_latency_compensation_ms(50.0)
        assert p.get_latency_ms() == pytest.approx(engine + 50.0, abs=1.0)
        p.set_latency_compensation_ms(0.0)


class TestPresetIO:
    def test_apply_and_capture_roundtrip(self, running_processor):
        import audioforge_tpu.config as cfg
        from audioforge_tpu.runtime.preset_io import apply_preset, capture_preset

        p, _ = running_processor
        preset = cfg.BUILTIN_PRESETS["aggressive_denoise"]
        warning = apply_preset(p, preset)
        assert warning is None
        assert p._params["gate_threshold_db"] == -35.0
        assert p.get_eq_band_params(0)[1] == -6.0
        captured = capture_preset(p, name="roundtrip")
        assert captured.gate.threshold_db == -35.0
        assert captured.eq.band_gains == preset.eq.band_gains
        assert captured.rnnoise.model == "rnnoise"

    def test_unavailable_model_falls_back(self, running_processor):
        import audioforge_tpu.config as cfg
        from audioforge_tpu.runtime.preset_io import apply_preset

        p, _ = running_processor
        preset = cfg.Preset(name="df")
        preset.rnnoise.model = "deepfilter"
        # deepfilter is env-gated off in tests -> falls back with a warning
        warning = apply_preset(p, preset)
        assert warning == "deepfilter was unavailable; using RNNoise"
        assert p.get_noise_model() == "rnnoise"

    def test_require_exact_raises(self, running_processor):
        import audioforge_tpu.config as cfg
        import pytest as _pytest
        from audioforge_tpu.runtime.preset_io import apply_preset

        p, _ = running_processor
        preset = cfg.Preset(name="df")
        preset.rnnoise.model = "deepfilter-ll"
        with _pytest.raises(RuntimeError, match="unavailable"):
            apply_preset(p, preset, require_exact=True)


class TestNativeIngest:
    def test_matches_python_resampler(self, rng):
        from audioforge_tpu.runtime.ingest import (
            NativeIngest,
            native_ingest_available,
        )
        from audioforge_tpu.ops.resample import StreamingResampler

        if not native_ingest_available():
            pytest.skip("native toolchain unavailable")
        ring = AudioRing(1 << 18)
        ing = NativeIngest(ring, channels=2, mix_mode="average",
                           device_rate=44100)
        t = np.arange(44100) / 44100.0
        mono = (0.5 * np.sin(2 * np.pi * 1000 * t)
                + 0.05 * rng.standard_normal(44100)).astype(np.float32)
        stereo = np.stack([mono, mono], axis=1)
        total = 0
        for i in range(0, 44100, 441):
            total += ing.push(stereo[i:i + 441])
        y_native = ring.read(total)
        sr = StreamingResampler(44100, 48000, sinc_len=128)
        y_py = np.concatenate(
            [sr.process(mono[i:i + 441]) for i in range(0, 44100, 441)]
        )
        n = min(len(y_native), len(y_py))
        assert np.sqrt(np.mean((y_native[200:n] - y_py[200:n]) ** 2)) < 1e-6

    def test_passthrough_and_modes(self, rng):
        from audioforge_tpu.runtime.ingest import (
            NativeIngest,
            native_ingest_available,
        )

        if not native_ingest_available():
            pytest.skip("native toolchain unavailable")
        left = (0.3 * rng.standard_normal(960)).astype(np.float32)
        right = (0.1 * rng.standard_normal(960)).astype(np.float32)
        stereo = np.stack([left, right], axis=1)
        for mode, expected in (
            ("left", left), ("right", right),
            ("average", 0.5 * (left + right)), ("max_rms", left),
        ):
            ring = AudioRing(4096)
            ing = NativeIngest(ring, channels=2, mix_mode=mode,
                               device_rate=48000)
            w = ing.push(stereo)
            np.testing.assert_allclose(ring.read(w), expected, atol=1e-6)


class TestLoopbackLatency:
    def test_probe_round_trip_measures_loopback_delay(self):
        """End-to-end latency: the packaged self-test flow over a
        sample-exact loopback must succeed and measure at least the
        configured ring delay."""
        import sys
        from pathlib import Path

        sys.path.insert(0, str(Path(__file__).resolve().parents[1] / "tools"))
        from self_test import _LoopbackBus, run_attempt

        DELAY_MS = 80.0
        bus = _LoopbackBus(DELAY_MS)
        register_virtual_input("lat-in2", lambda: bus.source)
        register_virtual_output("lat-out2", lambda: bus.sink)

        p = AudioProcessor()
        p.set_bypass(True)
        p.start("lat-in2", "lat-out2")
        try:
            result = run_attempt(
                p, duration=3.0, delay=0.7, probe_duration_ms=450.0,
                expected_min_ms=5.0, expected_max_ms=1500.0,
            )
        finally:
            p.stop()
        assert result.success, result.message
        assert result.confidence > 0.5
        assert result.round_trip_ms >= DELAY_MS - 5.0


def _read_padded(ring, n):
    out = ring.read(n)
    if out.size < n:
        out = np.concatenate([out, np.zeros(n - out.size, np.float32)])
    return out


class TestFusedDrainProcessor:
    def test_backlog_engages_burst_span(self, monkeypatch):
        """With AUDIOFORGE_MAX_DRAIN_BLOCKS>1 a backlog must flow through
        the fused burst path (span>1) once the background warm worker has
        compiled it — exercising the span>1 branch of ``_process_block``
        (suppressor over the whole burst, burst metric aggregation, drain
        trigger, warm worker) at the processor level."""
        monkeypatch.setenv("AUDIOFORGE_MAX_DRAIN_BLOCKS", "2")
        captured = []
        register_virtual_output(
            "drain-capture", lambda block: captured.append(block)
        )

        class Tone:
            def __init__(self):
                self.n = 0

            def __call__(self, n):
                t = (self.n + np.arange(n)) / 48000.0
                self.n += n
                return (0.1 * np.sin(2 * np.pi * 220 * t)).astype(np.float32)

        register_virtual_input("drain-tone", Tone)
        p = AudioProcessor()
        p.realtime_pacing = False  # free-running input builds a backlog
        assert p._max_drain_blocks == 2
        p.start("drain-tone", "drain-capture")
        try:
            deadline = time.time() + 600.0
            span_seen = 1
            while time.time() < deadline:
                span_seen = max(
                    span_seen, int(p._metrics["dsp_drain_span_blocks"])
                )
                if span_seen > 1 and p._counters["blocks_processed"] > 20:
                    break
                time.sleep(0.05)
            assert span_seen == 2, "fused drain burst never engaged"
            assert p._drain_warm_ready.is_set()
            out = np.concatenate(captured) if captured else np.zeros(1)
            assert np.all(np.isfinite(out))
            # burst spans keep one limiter-history entry per block
            hist = p._metrics["limiter_gr_history_db"]
            assert len(hist) > 0 and all(np.isfinite(hist))
        finally:
            p.stop()
