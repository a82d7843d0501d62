"""Diagnostics export (privacy allowlist) + seeded stress harness."""

from datetime import datetime, timezone

import numpy as np
import pytest

import audioforge_tpu.config as cfg
from audioforge_tpu.diagnostics_export import (
    MAX_SERIALIZED_BYTES,
    build_diagnostics_snapshot,
    diagnostics_filename,
    serialize_diagnostics_snapshot,
    write_diagnostics_snapshot,
)

WHEN = datetime(2026, 8, 16, 12, 0, 0, tzinfo=timezone.utc)
KEY = b"0123456789abcdef0123456789abcdef"


def _snapshot(**overrides):
    diag = {
        "input_dropped_samples": 0,
        "output_underrun_total": 3,
        "noise_model": "rnnoise",
        "noise_backend_available": True,
        "noise_backend_failed": False,
        "last_stream_error": None,
        "input_channel_mode": "average",
        "rt_error_name": "none",
        "gate_fused_score": 0.4,
    }
    kwargs = dict(
        app_version="0.1.0",
        runtime_diagnostics=diag,
        config=cfg.AppConfig(),
        processing_settings=cfg.Preset(name="x").to_dict(),
        input_device={"name": "Secret Mic 3000", "endpoint_id": "ep1",
                      "host_api": "virtual", "direction": "input",
                      "is_default": True},
        output_device="Private Speakers",
        processing_sample_rate_hz=48000,
        output_sample_rate_hz=48000,
        running=True,
        generated_at=WHEN,
        pseudonym_key=KEY,
    )
    kwargs.update(overrides)
    return build_diagnostics_snapshot(**kwargs)


class TestDiagnosticsExport:
    def test_no_raw_device_names(self):
        snap = _snapshot()
        text = serialize_diagnostics_snapshot(snap).decode()
        assert "Secret Mic 3000" not in text
        assert "Private Speakers" not in text
        assert snap["audio_engine"]["input_device"]["pseudonym"].startswith(
            "device-"
        )
        assert snap["audio_engine"]["input_device"]["is_default"] is True

    def test_pseudonyms_deterministic_per_key(self):
        a = _snapshot()["audio_engine"]["input_device"]["pseudonym"]
        b = _snapshot()["audio_engine"]["input_device"]["pseudonym"]
        c = _snapshot(pseudonym_key=b"another-key-16bytes!")[
            "audio_engine"]["input_device"]["pseudonym"]
        assert a == b
        assert a != c

    def test_unknown_enums_collapse_to_other(self):
        snap = _snapshot(runtime_diagnostics={"noise_model": "evil-model"})
        assert snap["runtime"]["noise_model"] == "other"

    def test_paths_redacted_in_system_info(self):
        snap = _snapshot(system_info={
            "operating_system": "Linux",
            "os_version": "/home/someone/secret-build",
        })
        assert snap["system"]["os_version"] == "redacted"
        assert snap["system"]["operating_system"] == "Linux"

    def test_short_key_rejected(self):
        with pytest.raises(ValueError, match="key is too short"):
            _snapshot(pseudonym_key=b"short")

    def test_extra_root_field_rejected(self):
        snap = _snapshot()
        snap["debug_dump"] = {"audio": [1, 2, 3]}
        with pytest.raises(ValueError, match="unexpected root fields"):
            serialize_diagnostics_snapshot(snap)

    def test_extra_runtime_field_rejected(self):
        snap = _snapshot()
        snap["runtime"]["home_directory"] = "/home/x"
        with pytest.raises(ValueError, match="unexpected runtime fields"):
            serialize_diagnostics_snapshot(snap)

    def test_size_bound(self):
        snap = _snapshot()
        payload = serialize_diagnostics_snapshot(snap)
        assert len(payload) <= MAX_SERIALIZED_BYTES

    def test_filename_and_atomic_write(self, tmp_path):
        name = diagnostics_filename("0.1.0", WHEN)
        assert name == "AudioForge-diagnostics-v0.1.0-20260816-120000Z.json"
        snap = _snapshot()
        path = tmp_path / name
        write_diagnostics_snapshot(path, snap)
        assert path.exists()
        assert not list(tmp_path.glob("*.tmp"))

    def test_processing_sections_allowlisted(self):
        snap = _snapshot()
        assert set(snap["processing"]) <= {
            "gate", "eq", "rnnoise", "deesser", "compressor", "limiter",
            "bypass",
        }
        assert snap["processing"]["eq"]["schema_version"] == 2
        assert len(snap["processing"]["eq"]["bands"]) == 10

    def test_privacy_flags(self):
        privacy = _snapshot()["privacy"]
        assert privacy == {
            "raw_audio_included": False,
            "environment_variables_included": False,
            "arbitrary_paths_included": False,
            "raw_device_names_included": False,
            "secrets_included": False,
            "pseudonyms_are_report_local": True,
        }


class TestStressHarness:
    def test_seeded_contention_stays_finite(self):
        from audioforge_tpu.runtime.stress_harness import (
            MAX_OUTPUT_ABS,
            run_seeded_control_dsp_stress,
        )

        report = run_seeded_control_dsp_stress(seed=7, iterations=120)
        assert report.control_updates == 120
        # the release gate requires real work, not a bounded-but-idle run
        assert report.processed_blocks >= 100
        assert report.max_output_abs > 0.0
        assert np.isfinite(report.max_output_abs)
        assert report.max_output_abs <= MAX_OUTPUT_ABS

    def test_zero_iterations_rejected(self):
        from audioforge_tpu.runtime.stress_harness import (
            run_seeded_control_dsp_stress,
        )

        with pytest.raises(ValueError):
            run_seeded_control_dsp_stress(seed=1, iterations=0)
