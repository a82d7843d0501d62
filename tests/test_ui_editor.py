"""Headless UI-logic: EQ graph editor, analysis worker, theme, accessibility,
bootstrap."""

import threading
import time

import numpy as np
import pytest

from audioforge_tpu.ui_logic import (
    ANALYSIS_STEPS,
    AnalysisWorker,
    Control,
    EqCurveModel,
    PALETTE,
    audit_control_tree,
    bind_label,
    bootstrap_application,
    contrast_ratio,
    meets_contrast,
    prefers_reduced_motion,
    set_accessible,
)


class TestEqCurveModel:
    def test_coordinate_roundtrip(self):
        """Transforms quantize like the reference editor: x→frequency lands
        on whole hertz (`eq_curve.py:128`), y→gain on 0.1 dB
        (`eq_curve.py:139-150`)."""
        m = EqCurveModel()
        for f in (20.0, 80.0, 1000.0, 12000.0, 20000.0):
            back = m.x_to_frequency(m.frequency_to_x(f))
            assert back == pytest.approx(f, abs=0.5) and back == round(back)
        for g in (-12.0, -3.5, 0.0, 7.25, 12.0):
            back = m.y_to_gain(m.gain_to_y(g))
            assert back == pytest.approx(g, abs=0.05)
            assert back == pytest.approx(round(back * 10.0) / 10.0, abs=1e-12)

    def test_drag_lifecycle_updates_band_and_response(self):
        m = EqCurveModel()
        x, y = m.band_handle_position(4)
        started = m.press(x, y)
        assert started.name == "started" and started.band_index == 4
        flat = list(m.response_db)
        finished = m.release(x, m.gain_to_y(6.0))
        assert finished.name == "finished"
        assert m.bands[4][2] == pytest.approx(6.0, abs=0.2)
        assert max(m.response_db) > max(flat) + 3.0

    def test_press_off_handle_is_ignored(self):
        m = EqCurveModel()
        assert m.press(m.margin_left - 30, 0.0) is None
        assert m.move(10, 10) is None
        assert m.release(10, 10) is None

    def test_escape_restores_drag_origin(self):
        m = EqCurveModel()
        x, y = m.band_handle_position(3)
        origin = m.bands[3][1:3]
        m.press(x, y)
        m.move(x + 40, y - 30)
        assert m.bands[3][1:3] != origin
        cancelled = m.cancel_drag()
        assert cancelled.name == "cancelled"
        assert m.bands[3][1:3] == origin

    def test_highpass_band_drag_keeps_gain(self):
        m = EqCurveModel()
        m.set_band_config(0, "high_pass", 80.0, 0.0, 0.707, 12, True)
        x, y = m.band_handle_position(0)
        m.press(x, y)
        ev = m.release(x + 10, m.gain_to_y(9.0))
        assert ev.gain_db == 0.0  # pass filters have no gain handle

    def test_keyboard_nudges(self):
        m = EqCurveModel()
        m.selected_band_index = 5
        f0 = m.bands[5][1]
        events = m.nudge("right", coarse=True)
        assert [e.name for e in events] == ["started", "dragged", "finished"]
        assert m.bands[5][1] == pytest.approx(round(f0 * 2 ** (1 / 12)), abs=1.0)
        g0 = m.bands[5][2]
        m.nudge("down")
        assert m.bands[5][2] == pytest.approx(g0 - 0.1, abs=1e-9)

    def test_gain_nudge_clamps_at_limits(self):
        m = EqCurveModel()
        m.selected_band_index = 5
        m.set_band_config(5, "bell", 1000.0, 12.0, 1.41, 12, True)
        m.nudge("up", coarse=True)
        assert m.bands[5][2] == 12.0

    def test_selection_cycling_wraps(self):
        m = EqCurveModel()
        assert m.cycle_selection(1) == 0
        m.selected_band_index = 9
        assert m.cycle_selection(1) == 0
        assert m.cycle_selection(-1) == 9

    def test_overlay_independent_of_main_curve(self):
        m = EqCurveModel()
        # the reference overlay API takes legacy (freq, gain, Q) tuples
        # (`eq_curve.py:441-449`)
        overlay = [(b[1], 8.0 if i == 4 else b[2], b[3])
                   for i, b in enumerate(m.bands)]
        m.set_overlay_params(overlay)
        assert max(m.overlay_response_db) > max(m.response_db) + 3.0
        m.clear_overlay()
        assert m.overlay_response_db is None

    def test_boost_measures_exactly_at_band_center(self):
        m = EqCurveModel(response_points=400)
        m.set_band_config(4, "bell", 1280.0, 5.0, 4.33, 12, True)
        idx = int(np.argmin(np.abs(np.array(m.freq_points) - 1280.0)))
        assert m.response_db[idx] == pytest.approx(5.0, abs=0.15)


class TestAnalysisWorker:
    def _speechlike(self, seconds=2.0, fs=48000):
        rng = np.random.default_rng(7)
        t = np.arange(int(seconds * fs)) / fs
        syllable = (np.sin(2 * np.pi * 2.3 * t) > 0.0).astype(np.float32)
        voice = sum(
            np.sin(2 * np.pi * 150.0 * k * t) / k for k in (1, 2, 3, 4, 6)
        ).astype(np.float32)
        return (0.15 * syllable * voice / np.max(np.abs(voice))
                + 0.003 * rng.standard_normal(t.size)).astype(np.float32)

    def test_progress_and_finish(self):
        steps, results, failures = [], [], []
        worker = AnalysisWorker(
            self._speechlike(),
            48000.0,
            on_progress=lambda s, p: steps.append((s, p)),
            on_finished=lambda r: results.append(r),
            on_failed=lambda m: failures.append(m),
        )
        worker.start()
        assert worker.join(timeout=300)
        assert failures == []
        assert results and isinstance(results[0], tuple)
        names = [s for s, _ in steps]
        for expected in ("voice_activity", "spectrum", "optimize", "done"):
            assert expected in names
        pcts = [p for _, p in steps]
        assert pcts == sorted(pcts)

    def test_cancellation_stops_without_callbacks(self):
        finished, failed = [], []
        gate = threading.Event()

        def slow_progress(step, pct):
            gate.set()
            time.sleep(0.05)

        worker = AnalysisWorker(
            self._speechlike(),
            48000.0,
            on_progress=slow_progress,
            on_finished=lambda r: finished.append(r),
            on_failed=lambda m: failed.append(m),
        )
        worker.start()
        gate.wait(timeout=60)
        worker.stop()
        assert worker.join(timeout=300)
        assert finished == [] and failed == []
        assert worker.cancelled

    def test_failure_reduced_to_generic_message(self):
        failures = []
        worker = AnalysisWorker(
            np.zeros(100, np.float32),  # far too short: pipeline must fail
            48000.0,
            on_failed=lambda m: failures.append(m),
        )
        worker.start()
        assert worker.join(timeout=120)
        assert len(failures) == 1
        assert "Traceback" not in failures[0]


class TestTheme:
    def test_primary_text_contrast_meets_aa(self):
        assert meets_contrast(PALETTE.text_primary, PALETTE.app_surface)
        assert meets_contrast(PALETTE.text_primary, PALETTE.control_surface)

    def test_contrast_ratio_bounds(self):
        assert contrast_ratio("#000000", "#ffffff") == pytest.approx(21.0, abs=0.01)
        assert contrast_ratio("#808080", "#808080") == pytest.approx(1.0)

    def test_reduced_motion_env_override(self, monkeypatch):
        monkeypatch.setenv("AUDIOFORGE_REDUCED_MOTION", "1")
        assert prefers_reduced_motion()
        monkeypatch.setenv("AUDIOFORGE_REDUCED_MOTION", "0")
        assert not prefers_reduced_motion()


class TestAccessibility:
    def test_name_normalisation(self):
        control = Control(kind="slider", object_name="gain")
        set_accessible(control, "  &Gain   level ", "Adjusts  the gain")
        assert control.accessible_name == "Gain level"
        assert control.accessible_description == "Adjusts the gain"

    def test_empty_name_rejected(self):
        with pytest.raises(ValueError):
            set_accessible(Control(kind="slider"), "  & ")

    def test_audit_flags_unnamed_controls(self):
        root = Control(kind="panel", children=[
            Control(kind="slider", object_name="unnamed_slider"),
            Control(kind="button", object_name="ok", text="OK"),
            Control(kind="combo_box", object_name="qt_internal"),
            Control(kind="label", object_name="decor"),
        ])
        named = Control(kind="spin_box", object_name="th")
        bind_label(Control(kind="label", text="Threshold"), named)
        root.children.append(named)
        issues = audit_control_tree(root)
        assert [i.object_name for i in issues] == ["unnamed_slider"]


class TestBootstrap:
    def test_bootstrap_record(self, monkeypatch, tmp_path):
        monkeypatch.delenv("DEEPFILTER_LIB_PATH", raising=False)
        monkeypatch.delenv("DEEPFILTER_MODEL_PATH", raising=False)
        record = bootstrap_application(configure_logging=False)
        assert "audioforge" in record["application_root"].lower() or record[
            "application_root"
        ]
        assert record["registered_assets"]["deepfilter_model"] is None

    def test_env_override_wins(self, monkeypatch):
        monkeypatch.setenv("DEEPFILTER_LIB_PATH", "/explicit/lib.so")
        from audioforge_tpu.ui_logic.app_bootstrap import configure_model_assets

        registered = configure_model_assets()
        assert registered["deepfilter_library"] is None


class TestEqCurveReferenceParity:
    """Editor semantics added for parity with the reference widget's full
    surface (`python/mic_eq/ui/eq_curve.py:330-489`)."""

    def test_legacy_three_field_set_all_params(self):
        m = EqCurveModel()
        legacy = [(100.0 * (i + 1), 1.0, 2.0) for i in range(10)]
        m.set_all_params(legacy)
        assert m.bands[0][0] == "low_shelf"
        assert m.bands[9][0] == "high_shelf"
        assert all(m.bands[i][0] == "bell" for i in range(1, 9))
        assert m.bands[3][1] == 400.0 and m.bands[3][4] == 12
        assert all(b[5] is True for b in m.bands)

    def test_typed_six_field_set_all_params_and_arity_error(self):
        m = EqCurveModel()
        typed = [("notch", 500.0 + i, 0.0, 3.0, 12, True) for i in range(10)]
        m.set_all_params(typed)
        assert m.bands[2] == ("notch", 502.0, 0.0, 3.0, 12, True)
        with pytest.raises(ValueError, match="3 legacy or 6 typed"):
            m.set_all_params([(1.0, 2.0)])

    def test_extra_bands_ignored(self):
        m = EqCurveModel()
        m.set_all_params([(100.0, 0.0, 1.0)] * 14)  # 4 beyond capacity
        assert len(m.bands) == 10

    def test_set_band_params_preserves_typed_fields(self):
        m = EqCurveModel()
        m.set_band_config(5, "high_pass", 120.0, 0.0, 0.707, 24, True)
        m.set_band_params(5, 150.0, 3.0, 1.5)
        assert m.bands[5] == ("high_pass", 150.0, 3.0, 1.5, 24, True)
        m.set_band_params(99, 1.0, 1.0, 1.0)  # out of range: no-op

    def test_overlay_legacy_tuples_and_show_flag(self):
        m = EqCurveModel()
        assert m.show_overlay is False
        m.set_overlay_params([(100.0 * (i + 1), 2.0, 1.0)
                              for i in range(10)])
        assert m.show_overlay is True
        assert m.overlay_bands[0][0] == "low_shelf"
        assert m.overlay_bands[1][0] == "bell"
        assert m.overlay_bands[9][0] == "high_shelf"
        assert m.overlay_response_db is not None
        m.clear_overlay()
        assert m.show_overlay is False and m.overlay_response_db is None

    def test_drag_quantizes_to_whole_hz_and_tenth_db(self):
        m = EqCurveModel()
        x, y = m.band_handle_position(4)
        m.press(x, y)
        ev = m.release(x + 13.7, y - 17.3)
        assert ev.frequency_hz == round(ev.frequency_hz)
        assert ev.gain_db == pytest.approx(
            round(ev.gain_db * 10.0) / 10.0, abs=1e-12)

    def test_max_boost_warning_synthesized_and_sorted(self):
        m = EqCurveModel()
        # stack three +12 dB bells at the same frequency: the rendered
        # cascade exceeds 10.5 dB combined boost
        for i in (3, 4, 5):
            m.set_band_config(i, "bell", 1000.0, 12.0, 1.0, 12, True)
        kinds = [w.kind for w in m.interaction_warnings]
        assert "max_boost" in kinds
        sev = [w.severity for w in m.interaction_warnings]
        assert sev == sorted(sev, reverse=True)
        boost = next(w for w in m.interaction_warnings
                     if w.kind == "max_boost")
        assert 500.0 < boost.frequency_hz < 2000.0

    def test_pass_filter_gain_excluded_from_warnings(self):
        """A high-pass band's gain field is meaningless; it must not feed
        the interaction-warning evaluator (`eq_curve.py:330-336`)."""
        m = EqCurveModel()
        m.set_band_config(0, "high_pass", 80.0, 11.9, 0.707, 48, True)
        assert not any(w.kind == "max_boost"
                       for w in m.interaction_warnings)
