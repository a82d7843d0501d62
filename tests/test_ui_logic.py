"""Headless UI-logic: config history, health chips, recovery heuristics,
rate limiter — mirroring the reference's `ui` pure-logic behavior."""

import time

import pytest

import audioforge_tpu.config as cfg
from audioforge_tpu.ui_logic import (
    BoundedConfigurationHistory,
    ConfigurationSnapshot,
    RateLimiter,
    StreamRecoveryManager,
    changed_configuration_paths,
    explicit_provenance_after_edit,
    input_health_state,
    output_health_state,
)


def snap(preset, label="edit"):
    return ConfigurationSnapshot.from_preset(preset, label=label, source="test")


class TestConfigHistory:
    def test_undo_redo_cycle(self):
        h = BoundedConfigurationHistory(limit=5)
        p1 = cfg.Preset(name="a")
        p2 = cfg.Preset(name="a")
        p2.gate.threshold_db = -50.0
        h.initialize(snap(p1, "init"))
        assert h.record(snap(p2, "gate edit"))
        assert h.can_undo and not h.can_redo
        restored = []
        target = h.undo(restored.append)
        assert target is not None
        assert not h.can_undo and h.can_redo
        assert h.redo(restored.append) is not None
        assert len(restored) == 2

    def test_duplicate_not_recorded(self):
        h = BoundedConfigurationHistory()
        p = cfg.Preset(name="a")
        h.initialize(snap(p))
        assert h.record(snap(p)) is False
        assert h.size == 1

    def test_record_truncates_redo_branch(self):
        h = BoundedConfigurationHistory()
        presets = []
        for thr in (-40.0, -45.0, -50.0):
            p = cfg.Preset(name="a")
            p.gate.threshold_db = thr
            presets.append(p)
        h.initialize(snap(presets[0]))
        h.record(snap(presets[1]))
        h.undo(lambda s: None)
        h.record(snap(presets[2]))
        assert not h.can_redo
        assert h.size == 2

    def test_bounded_overflow(self):
        h = BoundedConfigurationHistory(limit=3)
        for i, thr in enumerate((-40.0, -45.0, -50.0, -55.0, -60.0)):
            p = cfg.Preset(name="a")
            p.gate.threshold_db = thr
            if i == 0:
                h.initialize(snap(p))
            else:
                h.record(snap(p))
        assert h.size == 3
        assert h.cursor == 2

    def test_failed_restore_keeps_cursor(self):
        h = BoundedConfigurationHistory()
        p1, p2 = cfg.Preset(name="a"), cfg.Preset(name="a")
        p2.bypass = True
        h.initialize(snap(p1))
        h.record(snap(p2))

        def boom(s):
            raise RuntimeError("restore failed")

        with pytest.raises(RuntimeError):
            h.undo(boom)
        assert h.cursor == 1  # unchanged

    def test_invalid_limit(self):
        with pytest.raises(ValueError):
            BoundedConfigurationHistory(limit=1)

    def test_changed_paths_excludes_metadata(self):
        p1, p2 = cfg.Preset(name="x"), cfg.Preset(name="y")
        p2.gate.threshold_db = -55.0
        changed = changed_configuration_paths(p1.to_dict(), p2.to_dict())
        assert "gate.threshold_db" in changed
        assert not any(c.startswith("name") for c in changed)

    def test_explicit_provenance_after_edit(self):
        base = cfg.Preset.from_dict({"name": "a", "version": "1.0.0"})
        s0 = snap(base)
        edited = cfg.Preset.from_dict(s0.payload())
        edited.compressor.ratio = 2.0
        prov = explicit_provenance_after_edit(s0, edited)
        assert prov["compressor.ratio"] == "explicit"


class TestHealthChips:
    def test_input_priority_ladder(self):
        assert input_health_state(rms_db=-20.0, clip_delta=True)[1] == "bad"
        assert input_health_state(rms_db=-20.0, phase_rescue_active=True)[1] == "warn"
        assert input_health_state(
            rms_db=-20.0, cleanup_rumble_detected=True, cleanup_mode="strong"
        )[1] == "warn"
        assert input_health_state(
            rms_db=-20.0, cleanup_rumble_detected=True, cleanup_mode="gentle"
        )[1] == "info"
        assert input_health_state(rms_db=None)[1] == "idle"
        assert input_health_state(rms_db=-70.0)[1] == "warn"
        assert input_health_state(rms_db=-2.0)[1] == "warn"
        text, state = input_health_state(rms_db=-20.0, crest_factor_db=12.0)
        assert state == "ok" and "CF:12" in text
        assert input_health_state(rms_db=-20.0, crest_factor_db=2.0)[1] == "warn"

    def test_output_priority_ladder(self):
        assert output_health_state(rms_db=-10.0, clip_delta=True)[1] == "bad"
        assert output_health_state(rms_db=-10.0, limiter_history_db=7.0)[1] == "warn"
        assert output_health_state(
            rms_db=-10.0, true_peak_limiter_history_db=4.0
        )[1] == "warn"
        assert output_health_state(rms_db=-10.0, true_peak_delta=True)[1] == "warn"
        assert output_health_state(
            rms_db=-10.0, true_peak_headroom_db=0.3
        )[1] == "warn"
        assert output_health_state(rms_db=-0.5)[1] == "warn"
        text, state = output_health_state(
            rms_db=-12.0, true_peak_db=-2.5, short_term_lufs=-18.0,
            true_peak_headroom_db=3.0,
        )
        assert state == "ok" and "TP:-2.5" in text and "LU:-18" in text


class TestStreamRecovery:
    def test_output_stall_grace_and_cooldown(self):
        m = StreamRecoveryManager()
        m.mark_processing_started(now=0.0)
        kw = dict(input_rms=-20.0, output_rms=-90.0, output_buf=30000,
                  calibration_dialog_open=False)
        # cooldown counts from epoch 0, so nothing fires before 20 s
        assert m.maybe_recover_output_stall(now=10.0, **kw) is False
        assert m.maybe_recover_output_stall(now=25.0, **kw) is False  # arms
        assert m.maybe_recover_output_stall(now=25.5, **kw) is False  # grace
        assert m.maybe_recover_output_stall(now=27.0, **kw) is True
        # cooldown blocks a repeat
        assert m.maybe_recover_output_stall(now=30.0, **kw) is False

    def test_output_stall_needs_suspicion(self):
        m = StreamRecoveryManager()
        m.mark_processing_started(now=0.0)
        assert m.maybe_recover_output_stall(
            now=10.0, input_rms=-60.0, output_rms=-90.0, output_buf=30000,
            calibration_dialog_open=False,
        ) is False

    def test_callback_stall_warmup_then_fire(self):
        m = StreamRecoveryManager()
        m.mark_processing_started(now=0.0)
        kw = dict(input_cb_age_ms=100, output_cb_age_ms=5000,
                  calibration_dialog_open=False)
        assert m.maybe_recover_callback_stall(now=2.0, **kw) is False  # warmup
        assert m.maybe_recover_callback_stall(now=30.0, **kw) is False  # arms
        assert m.maybe_recover_callback_stall(now=30.5, **kw) is False  # grace
        assert m.maybe_recover_callback_stall(now=32.0, **kw) is True

    def test_calibration_dialog_suppresses(self):
        m = StreamRecoveryManager()
        m.mark_processing_started(now=0.0)
        assert m.maybe_recover_callback_stall(
            now=30.0, input_cb_age_ms=0, output_cb_age_ms=9999,
            calibration_dialog_open=True,
        ) is False

    def test_input_stall_warmup_then_fire(self):
        """Input half of the dual heartbeat watch (`supervisor.rs:22-98`):
        a blocked/dead source with no output-side symptom still recovers."""
        m = StreamRecoveryManager()
        m.mark_processing_started(now=0.0)
        kw = dict(input_cb_age_ms=4000, calibration_dialog_open=False)
        assert m.maybe_recover_input_stall(now=2.0, **kw) is False  # warmup
        assert m.maybe_recover_input_stall(now=30.0, **kw) is False  # arms
        assert m.maybe_recover_input_stall(now=30.5, **kw) is False  # grace
        assert m.maybe_recover_input_stall(now=32.0, **kw) is True
        # cooldown after firing
        assert m.maybe_recover_input_stall(now=33.0, **kw) is False

    def test_input_stall_fresh_heartbeat_disarms(self):
        m = StreamRecoveryManager()
        m.mark_processing_started(now=0.0)
        assert m.maybe_recover_input_stall(
            now=30.0, input_cb_age_ms=4000,
            calibration_dialog_open=False) is False
        # heartbeat returns: timer resets, no spurious recovery
        assert m.maybe_recover_input_stall(
            now=31.0, input_cb_age_ms=100,
            calibration_dialog_open=False) is False
        assert m.maybe_recover_input_stall(
            now=32.0, input_cb_age_ms=4000,
            calibration_dialog_open=False) is False  # re-arms fresh


class TestRateLimiter:
    def test_first_call_immediate_latest_wins(self):
        calls = []
        limiter = RateLimiter(interval_ms=50)
        limiter.call(lambda: calls.append(1))
        assert calls == [1]
        limiter.call(lambda: calls.append(2))
        limiter.call(lambda: calls.append(3))  # replaces 2
        time.sleep(0.15)
        assert calls == [1, 3]

    def test_flush_applies_pending(self):
        calls = []
        limiter = RateLimiter(interval_ms=10_000)
        limiter.call(lambda: calls.append("a"))
        limiter.call(lambda: calls.append("b"))
        limiter.flush()
        assert calls == ["a", "b"]
        limiter.flush()  # idempotent
        assert calls == ["a", "b"]


class TestHealthCheckGates:
    def test_critical_failures_collects(self):
        import sys
        from pathlib import Path

        sys.path.insert(0, str(Path(__file__).resolve().parents[1] / "tools"))
        from health_check import critical_diagnostic_failures

        good = {k: 0 for k in (
            "input_dropped_samples", "input_backlog_dropped_samples",
            "input_backlog_recovery_count", "input_callback_error_count",
            "lock_contention_count", "output_callback_error_count",
            "output_recovery_count", "output_recovery_event_count",
            "output_short_write_dropped_samples", "output_underrun_streak",
            "rt_buffer_overflow_count", "rt_error_code",
            "stream_restart_count", "suppressor_non_finite_count",
        )}
        good.update(noise_backend_available=True, noise_backend_failed=False,
                    last_stream_error=None, output_underrun_total=5)
        assert critical_diagnostic_failures(
            good, output_underrun_baseline=5
        ) == []
        bad = dict(good, input_dropped_samples=10, output_underrun_total=9)
        failures = critical_diagnostic_failures(bad, output_underrun_baseline=5)
        assert any("input_dropped_samples=10" in f for f in failures)
        assert any("output_underrun_total=9" in f for f in failures)


class TestFirstRunSetupFlow:
    def test_full_pass_completes(self):
        from audioforge_tpu.ui_logic import FirstRunSetupFlow

        c = cfg.AppConfig()
        flow = FirstRunSetupFlow(c)
        assert c.first_run_setup_state == "in_progress"
        order = []
        while not flow.finished:
            order.append(flow.current_step)
            flow.complete_step()
        assert order == ["devices", "route", "latency", "voice"]
        assert c.first_run_setup_state == "completed"

    def test_skips_terminate_with_skips(self):
        from audioforge_tpu.ui_logic import FirstRunSetupFlow

        c = cfg.AppConfig()
        flow = FirstRunSetupFlow(c)
        flow.complete_step()   # devices
        flow.skip_step()       # route
        flow.complete_step()   # latency
        flow.skip_step()       # voice -> finish
        assert c.first_run_setup_state == "completed_with_skips"

    def test_resume_reopens_skipped_steps(self):
        from audioforge_tpu.ui_logic import FirstRunSetupFlow

        c = cfg.AppConfig()
        flow = FirstRunSetupFlow(c)
        flow.complete_step()
        flow.skip_step()
        flow.complete_step()
        flow.skip_step()
        # reopen: only the skipped steps come back as pending
        flow2 = FirstRunSetupFlow(c)
        assert flow2.current_step == "route"
        assert c.first_run_setup_steps["devices"] == "completed"
        assert c.first_run_setup_steps["route"] == "pending"

    def test_restart_completed_resets_everything(self):
        from audioforge_tpu.ui_logic import FirstRunSetupFlow

        c = cfg.AppConfig()
        flow = FirstRunSetupFlow(c)
        for _ in range(4):
            flow.complete_step()
        flow2 = FirstRunSetupFlow(c, restart_completed=True)
        assert flow2.current_step == "devices"
        assert all(v == "pending" or v == "completed"
                   for v in c.first_run_setup_steps.values())
        assert c.first_run_setup_steps["voice"] == "pending"

    def test_back_navigation(self):
        from audioforge_tpu.ui_logic import FirstRunSetupFlow

        c = cfg.AppConfig()
        flow = FirstRunSetupFlow(c)
        flow.complete_step()
        assert flow.current_step == "route"
        flow.go_back()
        assert flow.current_step == "devices"
        flow.go_back()  # at the start: no-op
        assert flow.current_step == "devices"
