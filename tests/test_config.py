"""Config layer: preset migrations + provenance, persistence, app config.

Behavioural targets follow the reference's config tests
(`python/tests/test_config*.py`): the migration chain, value-provenance
rules, strict validation, atomic persistence, and corrupt-config resilience.
"""

import json

import pytest

import audioforge_tpu.config as cfg


@pytest.fixture()
def config_home(tmp_path, monkeypatch):
    """Point the config dir at a temp HOME so tests never touch real state."""
    monkeypatch.setenv("HOME", str(tmp_path))
    return tmp_path


class TestPresetMigrations:
    def test_v1_0_0_full_chain(self):
        p = cfg.Preset.from_dict({"name": "old", "version": "1.0.0"})
        assert p.version == cfg.CURRENT_VERSION
        assert p.rnnoise.strength == 1.0
        assert p.rnnoise.model == "rnnoise"
        assert p.compressor.auto_makeup_enabled is False
        assert p.compressor.target_lufs == -18.0
        assert p.gate.auto_threshold_enabled is True
        assert p.gate.gate_margin_db == 10.0
        assert p.deesser.enabled is False
        assert p.deesser.auto_enabled is True

    def test_vad_threshold_absent_gets_048(self):
        p = cfg.Preset.from_dict(
            {"name": "a", "version": "1.0.0", "gate": {"threshold_db": -40.0}}
        )
        assert p.gate.vad_threshold == 0.48

    def test_vad_threshold_present_is_explicit_and_kept(self):
        # A value present in the stored file without provenance metadata is
        # treated as explicit (`presets.py:138-140`): never rewritten.
        p = cfg.Preset.from_dict(
            {"name": "a", "version": "1.0.0", "gate": {"vad_threshold": 0.5}}
        )
        assert p.gate.vad_threshold == 0.5

    def test_vad_threshold_migration_default_04_fixed(self):
        p = cfg.Preset.from_dict(
            {
                "name": "b",
                "version": "1.8.0",
                "gate": {"vad_threshold": 0.4},
                "value_provenance": {"gate.vad_threshold": "migration_default"},
            }
        )
        assert p.gate.vad_threshold == 0.48

    def test_explicit_04_survives(self):
        p = cfg.Preset.from_dict(
            {
                "name": "b",
                "version": "1.8.0",
                "gate": {"vad_threshold": 0.4},
                "value_provenance": {"gate.vad_threshold": "explicit"},
            }
        )
        assert p.gate.vad_threshold == 0.4

    def test_newer_version_rejected(self):
        with pytest.raises(cfg.PresetValidationError):
            cfg.Preset.from_dict({"name": "c", "version": "99.0.0"})

    def test_unknown_provenance_path_rejected(self):
        with pytest.raises(cfg.PresetValidationError):
            cfg.Preset.from_dict(
                {"name": "c", "value_provenance": {"gate.nope": "explicit"}}
            )

    def test_invalid_provenance_source_rejected(self):
        with pytest.raises(cfg.PresetValidationError):
            cfg.Preset.from_dict(
                {"name": "c", "value_provenance": {"bypass": "guess"}}
            )

    def test_legacy_eq_arrays_parse(self):
        p = cfg.Preset.from_dict(
            {
                "name": "d",
                "version": "1.0.0",
                "eq": {"enabled": True, "band_gains": [2.0] * 10},
            }
        )
        assert p.eq.band_gains == [2.0] * 10
        assert len(p.eq.bands) == cfg.EQ_BAND_COUNT

    def test_out_of_range_rejected(self):
        with pytest.raises(cfg.PresetValidationError):
            cfg.Preset.from_dict(
                {"name": "e", "gate": {"threshold_db": -200.0}}
            )
        with pytest.raises(cfg.PresetValidationError):
            cfg.Preset.from_dict(
                {"name": "e", "compressor": {"ratio": 100.0}}
            )

    def test_bool_typed_strictly(self):
        with pytest.raises(cfg.PresetValidationError):
            cfg.Preset.from_dict({"name": "f", "gate": {"enabled": 1}})

    def test_deesser_band_ordering_repaired(self):
        p = cfg.Preset.from_dict(
            {
                "name": "g",
                "deesser": {"low_cut_hz": 11000.0, "high_cut_hz": 2200.0},
            }
        )
        assert p.deesser.high_cut_hz > p.deesser.low_cut_hz

    def test_roundtrip_marks_everything_explicit(self):
        p = cfg.Preset(name="rt")
        d = p.to_dict()
        assert set(d["value_provenance"].values()) == {"explicit"}
        p2 = cfg.Preset.from_dict(d)
        assert p2.to_dict() == d


class TestPresetPersistence:
    def test_save_load_roundtrip(self, config_home):
        p = cfg.BUILTIN_PRESETS["voice"]
        fp = cfg.save_preset(p)
        loaded = cfg.load_preset(fp)
        assert loaded.name == "Voice Clarity"
        assert loaded.eq.band_gains == p.eq.band_gains

    def test_list_presets_skips_corrupt(self, config_home):
        cfg.save_preset(cfg.BUILTIN_PRESETS["flat"])
        bad = cfg.get_presets_dir() / "bad.json"
        bad.write_text("{not json")
        names = [n for n, _ in cfg.list_presets()]
        assert names == ["Flat"]

    def test_load_outside_roots_rejected(self, config_home, tmp_path):
        rogue = tmp_path / "rogue.json"
        rogue.write_text(json.dumps(cfg.Preset(name="x").to_dict()))
        with pytest.raises(cfg.PresetValidationError):
            cfg.load_preset(rogue)

    def test_load_rejects_nan_constants(self, config_home):
        fp = cfg.get_presets_dir() / "nan.json"
        fp.write_text('{"name": "n", "gate": {"threshold_db": NaN}}')
        with pytest.raises(cfg.PresetValidationError):
            cfg.load_preset(fp)

    def test_imports_dir_allowed(self, config_home):
        fp = cfg.get_preset_imports_dir() / "imported.json"
        fp.write_text(json.dumps(cfg.Preset(name="imp").to_dict()))
        assert cfg.load_preset(fp).name == "imp"


class TestBuiltinCatalogs:
    def test_builtin_presets_complete(self):
        assert set(cfg.BUILTIN_PRESETS) == {
            "voice", "bass_cut", "presence", "flat", "minimal",
            "aggressive_denoise",
        }
        for p in cfg.BUILTIN_PRESETS.values():
            assert p.version == cfg.CURRENT_VERSION
            # every builtin revalidates cleanly
            cfg.Preset.from_dict(p.to_dict())

    def test_minimal_disables_eq(self):
        assert cfg.BUILTIN_PRESETS["minimal"].eq.enabled is False

    def test_target_curves(self):
        assert set(cfg.TARGET_CURVES) == {"broadcast", "podcast", "streaming", "flat"}
        for c in cfg.TARGET_CURVES.values():
            assert len(c.band_targets) == 10


class TestAppConfig:
    def test_default_roundtrip(self):
        c = cfg.AppConfig()
        c2 = cfg.AppConfig.from_dict(c.to_dict())
        assert c2.to_dict() == c.to_dict()

    def test_pre_setup_install_skips_wizard(self):
        c = cfg.AppConfig.from_dict({"last_input_device": "Mic"})
        assert c.first_run_setup_state == "completed_with_skips"
        assert all(v == "skipped" for v in c.first_run_setup_steps.values())

    def test_fresh_install_starts_wizard(self):
        c = cfg.AppConfig.from_dict({})
        assert c.first_run_setup_state == "not_started"

    def test_corrupt_values_degrade_to_defaults(self):
        c = cfg.AppConfig.from_dict(
            {
                "input_channel_mode": "bogus",
                "main_control_tab_index": 9999,
                "voice_setup_custom_p95_db": float("inf"),
                "window_geometry": {"x": 0, "y": 0, "width": 1, "height": None},
            }
        )
        assert c.input_channel_mode == "average"
        assert c.main_control_tab_index == 0
        assert c.voice_setup_custom_p95_db == 3.5
        assert c.window_geometry is None

    def test_window_geometry_min_size(self):
        c = cfg.AppConfig.from_dict(
            {"window_geometry": {"x": 5, "y": 6, "width": 10, "height": 10}}
        )
        assert c.window_geometry == {"x": 5, "y": 6, "width": 640, "height": 480}

    def test_latency_profile_key_roundtrip(self):
        di = cfg.DeviceIdentity(name="Mic", endpoint_id="e1",
                                host_api="WASAPI", direction="input")
        do = cfg.DeviceIdentity(name="Spk", endpoint_id="e2",
                                host_api="WASAPI", direction="output")
        key = cfg.build_latency_profile_key(di, do)
        prof = cfg.LatencyCalibrationProfile(
            measured_round_trip_ms=224.6, estimated_one_way_ms=112.3,
            applied_compensation_ms=112.3, confidence=0.9,
        )
        c = cfg.AppConfig(latency_calibration_profiles={key: prof})
        c2 = cfg.AppConfig.from_dict(c.to_dict())
        assert list(c2.latency_calibration_profiles) == [key]

    def test_legacy_profile_key_migrates(self):
        prof = cfg.LatencyCalibrationProfile(
            measured_round_trip_ms=100.0, estimated_one_way_ms=50.0,
            applied_compensation_ms=50.0, confidence=0.5,
        )
        c = cfg.AppConfig.from_dict(
            {"latency_calibration_profiles": {"Mic A||Out B": prof.to_dict()}}
        )
        (key,) = c.latency_calibration_profiles
        assert key.startswith("{")  # structured route key

    def test_device_binding_legacy_string(self):
        b = cfg.DevicePresetBinding.from_value("builtin:voice")
        assert b.provenance == "legacy_migration"
        b2 = cfg.DevicePresetBinding.from_value(
            {"preset_id": "custom:mine", "provenance": "explicit_user"}
        )
        assert b2.provenance == "explicit_user"
        assert cfg.DevicePresetBinding.from_value("") is None

    def test_save_load_config(self, config_home):
        c = cfg.AppConfig(last_preset="Voice Clarity", input_cleanup_mode="gentle")
        cfg.save_config(c)
        loaded = cfg.load_config()
        assert loaded.last_preset == "Voice Clarity"
        assert loaded.input_cleanup_mode == "gentle"

    def test_corrupt_config_file_returns_defaults(self, config_home):
        cfg.get_config_file().write_text("{broken")
        assert cfg.load_config().to_dict() == cfg.AppConfig().to_dict()


class TestEqSchemaV2:
    def test_octave_bandwidth_consistency(self):
        q = cfg.q_from_bandwidth_octaves(1000.0, 1.0)
        band = {
            "filter_type": "bell", "frequency_hz": 1000.0, "gain_db": 0.0,
            "q": q, "bandwidth_mode": "octaves", "bandwidth_octaves": 1.0,
            "slope_db_per_octave": 12, "stage": "combined", "enabled": True,
        }
        b = cfg.EQBandSettings.from_dict(band, index=0)
        assert b.bandwidth_octaves == 1.0

    def test_inconsistent_octave_q_rejected(self):
        band = {
            "filter_type": "bell", "frequency_hz": 1000.0, "gain_db": 0.0,
            "q": 5.0, "bandwidth_mode": "octaves", "bandwidth_octaves": 1.0,
            "slope_db_per_octave": 12, "stage": "combined", "enabled": True,
        }
        # plain ValueError at settings level, wrapped into
        # PresetValidationError only by Preset.from_dict (`settings.py:202`)
        with pytest.raises(ValueError):
            cfg.EQBandSettings.from_dict(band, index=0)
