"""Versioned preset migration matrix.

Exercises every structural transition of the migration chain
(`config/presets.py`, mirroring `python/mic_eq/config_parts/presets.py`)
across multi-version hops, with explicit-value provenance preservation as
the central contract: a value the user set explicitly must survive EVERY
migration unchanged, while migration-added defaults must be labeled
``migration_default`` so later corrections may still rewrite them.

Matrix rows (origin version -> current 1.11.2):
  1.0.0  adds rnnoise {strength@1.1, model@1.2}, compressor auto-makeup
         family @1.3, gate auto-threshold family + 0.5->0.48 vad threshold
         @1.6, de-esser @1.7, then passthrough bumps
  1.0.0  legacy EQ arrays -> schema-v2 typed bands w/ provenance carry
  1.2.0  compressor section exists: only the three @1.3 fields are added
  1.5.0  gate exists: auto-threshold family added, explicit thresholds kept
  1.6.0  de-esser added @1.7 with defaults; partial sections completed
  1.9.x  0.4 -> 0.48 vad re-correction unless explicit
  1.11.x passthrough: values bit-identical, only the version string moves
"""

import json

import pytest

from audioforge_tpu.config import presets as pz
from audioforge_tpu.config.presets import (
    PROVENANCE_EXPLICIT,
    PROVENANCE_MIGRATION_DEFAULT,
    Preset,
)
from audioforge_tpu.config.shared import CURRENT_VERSION, PresetValidationError


def _load(data):
    return Preset.from_dict(json.loads(json.dumps(data)))


# ---------------------------------------------------------------------------
# Full-span chains from each historical origin
# ---------------------------------------------------------------------------


class TestFullSpanChains:
    def test_v1_0_bare_preset_gains_every_section_as_migration_default(self):
        p = _load({"name": "old", "version": "1.0.0"})
        assert p.version == CURRENT_VERSION
        # every added value is a labeled migration default, none explicit
        assert p.value_provenance
        assert set(p.value_provenance.values()) == {
            PROVENANCE_MIGRATION_DEFAULT
        }
        # the @1.1/@1.2 rnnoise additions
        assert p.rnnoise.strength == 1.0 and p.rnnoise.model == "rnnoise"
        # the @1.3 compressor additions
        assert p.compressor.auto_makeup_enabled is False
        assert p.compressor.target_lufs == -18.0
        assert p.compressor.sidechain_highpass_enabled is True
        # the @1.6 gate additions (incl. the corrected vad threshold)
        assert p.gate.auto_threshold_enabled is True
        assert p.gate.gate_margin_db == 10.0
        assert p.gate.vad_threshold == 0.48
        # the @1.7 de-esser addition
        assert p.deesser.auto_enabled is True and p.deesser.ratio == 4.0

    def test_v1_0_explicit_values_survive_the_entire_chain(self):
        p = _load({
            "name": "tuned",
            "version": "1.0.0",
            "gate": {"enabled": True, "threshold_db": -33.0,
                     "vad_threshold": 0.5},
            "compressor": {"enabled": True, "threshold_db": -17.5,
                           "ratio": 2.5},
            "value_provenance": {
                "gate.threshold_db": "explicit",
                "gate.vad_threshold": "explicit",
                "compressor.threshold_db": "explicit",
                "compressor.ratio": "explicit",
            },
        })
        assert p.version == CURRENT_VERSION
        assert p.gate.threshold_db == -33.0
        # explicitly-set 0.5 must NOT be rewritten to 0.48 by the @1.6 fix
        assert p.gate.vad_threshold == 0.5
        assert p.compressor.threshold_db == -17.5
        assert p.compressor.ratio == 2.5
        for path in ("gate.threshold_db", "gate.vad_threshold",
                     "compressor.threshold_db", "compressor.ratio"):
            assert p.value_provenance[path] == PROVENANCE_EXPLICIT
        # values the chain ADDED around the explicit ones stay defaults
        assert (p.value_provenance["compressor.auto_makeup_enabled"]
                == PROVENANCE_MIGRATION_DEFAULT)

    def test_values_without_provenance_metadata_default_to_explicit(self):
        """Pre-provenance files carry no value_provenance at all; every
        value present in such a file is the user's and must be kept."""
        p = _load({
            "name": "ancient", "version": "1.0.0",
            "gate": {"enabled": False, "vad_threshold": 0.5},
        })
        assert p.gate.enabled is False
        assert p.gate.vad_threshold == 0.5  # treated explicit -> not fixed
        assert p.value_provenance["gate.vad_threshold"] == PROVENANCE_EXPLICIT


# ---------------------------------------------------------------------------
# Single-hop structural transitions
# ---------------------------------------------------------------------------


class TestPerVersionTransitions:
    def test_1_0_to_1_1_adds_rnnoise_strength(self):
        p = _load({"name": "x", "version": "1.0.0",
                   "rnnoise": {"enabled": False}})
        assert p.rnnoise.enabled is False  # user value kept
        assert p.rnnoise.strength == 1.0   # added default
        assert (p.value_provenance["rnnoise.strength"]
                == PROVENANCE_MIGRATION_DEFAULT)
        assert p.value_provenance["rnnoise.enabled"] == PROVENANCE_EXPLICIT

    def test_1_1_to_1_2_adds_model_keeps_strength(self):
        p = _load({"name": "x", "version": "1.1.0",
                   "rnnoise": {"enabled": True, "strength": 0.35}})
        assert p.rnnoise.strength == 0.35
        assert p.rnnoise.model == "rnnoise"
        assert (p.value_provenance["rnnoise.model"]
                == PROVENANCE_MIGRATION_DEFAULT)

    def test_1_2_to_1_3_completes_compressor_in_place(self):
        p = _load({"name": "x", "version": "1.2.0",
                   "compressor": {"enabled": True, "threshold_db": -11.0,
                                  "attack_ms": 3.0}})
        assert p.compressor.threshold_db == -11.0
        assert p.compressor.attack_ms == 3.0
        assert p.compressor.auto_makeup_enabled is False
        assert p.compressor.target_lufs == -18.0
        assert p.compressor.sidechain_highpass_enabled is True

    def test_1_5_to_1_6_adds_auto_threshold_family(self):
        p = _load({"name": "x", "version": "1.5.0",
                   "gate": {"enabled": True, "threshold_db": -47.0}})
        assert p.gate.threshold_db == -47.0
        assert p.gate.auto_threshold_enabled is True
        assert p.gate.gate_margin_db == 10.0

    def test_1_6_to_1_7_completes_partial_deesser(self):
        p = _load({"name": "x", "version": "1.6.0",
                   "deesser": {"enabled": True, "auto_amount": 0.9}})
        assert p.deesser.enabled is True
        assert p.deesser.auto_amount == 0.9
        # everything else filled from defaults
        assert p.deesser.low_cut_hz == 4000.0
        assert p.deesser.max_reduction_db == 6.0

    def test_pre_1_10_vad_04_recorrected_unless_explicit(self):
        fixed = _load({"name": "x", "version": "1.9.0",
                       "gate": {"enabled": True, "vad_threshold": 0.4},
                       "value_provenance": {
                           "gate.vad_threshold": "migration_default"}})
        assert fixed.gate.vad_threshold == 0.48
        kept = _load({"name": "x", "version": "1.9.0",
                      "gate": {"enabled": True, "vad_threshold": 0.4},
                      "value_provenance": {
                          "gate.vad_threshold": "explicit"}})
        assert kept.gate.vad_threshold == 0.4

    @pytest.mark.parametrize("version", ["1.7.2", "1.8.5", "1.9.0",
                                         "1.10.1", "1.11.1"])
    def test_passthrough_versions_change_nothing_but_the_version(self, version):
        body = {
            "name": "x", "version": version,
            "gate": {"enabled": True, "threshold_db": -41.5,
                     "vad_threshold": 0.52},
            "rnnoise": {"enabled": True, "strength": 0.7,
                        "model": "rnnoise"},
        }
        p = _load(body)
        assert p.version == CURRENT_VERSION
        assert p.gate.threshold_db == -41.5
        assert p.gate.vad_threshold == 0.52
        assert p.rnnoise.strength == 0.7


# ---------------------------------------------------------------------------
# Legacy EQ arrays -> schema v2
# ---------------------------------------------------------------------------


class TestLegacyEqMigration:
    LEGACY = {
        "enabled": True,
        "band_freqs": [31.0, 62.0, 125.0, 250.0, 500.0,
                       1000.0, 2000.0, 4000.0, 8000.0, 16000.0],
        "band_gains": [1.0, -2.0, 0.5, 0.0, 3.0, -1.5, 0.0, 2.0, -3.0, 0.0],
        "band_qs": [1.41] * 10,
    }

    def test_arrays_become_typed_bands_with_values_preserved(self):
        p = _load({"name": "x", "version": "1.0.0", "eq": dict(self.LEGACY)})
        assert p.eq.schema_version == 2
        assert len(p.eq.bands) == 10
        assert [b.gain_db for b in p.eq.bands] == self.LEGACY["band_gains"]
        assert [b.frequency_hz for b in p.eq.bands] == self.LEGACY["band_freqs"]

    def test_legacy_array_provenance_carries_onto_band_fields(self):
        p = _load({
            "name": "x", "version": "1.0.0", "eq": dict(self.LEGACY),
            "value_provenance": {"eq.band_gains": "explicit",
                                 "eq.band_freqs": "migration_default"},
        })
        for i in range(10):
            assert (p.value_provenance[f"eq.bands.{i}.gain_db"]
                    == PROVENANCE_EXPLICIT)
            assert (p.value_provenance[f"eq.bands.{i}.frequency_hz"]
                    == PROVENANCE_MIGRATION_DEFAULT)
        # no legacy paths may survive into the migrated provenance map
        assert not any(".band_" in k for k in p.value_provenance)

    def test_v2_payload_with_legacy_fields_rejected(self):
        bad = {"schema_version": 2, "enabled": True, "bands": [],
               "band_gains": [0.0] * 10}
        with pytest.raises(PresetValidationError):
            _load({"name": "x", "version": "1.11.2", "eq": bad})


# ---------------------------------------------------------------------------
# Chain composition and idempotence
# ---------------------------------------------------------------------------


class TestChainComposition:
    ORIGIN = {
        "name": "journey", "version": "1.0.0",
        "gate": {"enabled": True, "threshold_db": -38.0},
        "eq": {"enabled": True, "band_gains": [0.5] * 10},
        "value_provenance": {"gate.threshold_db": "explicit",
                             "eq.band_gains": "explicit"},
    }

    def test_one_shot_equals_stepwise_resave(self):
        """Migrating 1.0 -> current in one load must equal loading,
        persisting, and re-loading (a user who upgraded through an
        intermediate release and re-saved on the way)."""
        direct = _load(self.ORIGIN).to_dict()
        stepped = _load(_load(self.ORIGIN).to_dict()).to_dict()
        assert direct == stepped

    def test_migration_is_idempotent_at_current_version(self):
        once = _load(self.ORIGIN)
        twice = _load(once.to_dict())
        assert once.to_dict() == twice.to_dict()

    def test_resave_keeps_migration_defaults_until_marked(self):
        """Migration defaults deliberately survive re-save (so later
        corrections can still rewrite them); only mark_value_explicit
        promotes a path to user ownership (`presets.py:122-125`)."""
        p = _load({"name": "x", "version": "1.0.0"})
        saved = p.to_dict()
        assert (saved["value_provenance"]["gate.vad_threshold"]
                == PROVENANCE_MIGRATION_DEFAULT)
        p.mark_value_explicit("gate.vad_threshold")
        assert (p.to_dict()["value_provenance"]["gate.vad_threshold"]
                == PROVENANCE_EXPLICIT)

    def test_future_version_rejected_not_migrated(self):
        with pytest.raises(PresetValidationError):
            _load({"name": "x", "version": "99.0.0"})


# ---------------------------------------------------------------------------
# Persistence round-trip of migrated state
# ---------------------------------------------------------------------------


class TestMigratedPersistence:
    def test_migrated_preset_roundtrips_through_disk(self, tmp_path,
                                                     monkeypatch):
        monkeypatch.setattr(pz, "get_presets_dir", lambda: tmp_path)
        p = _load({
            "name": "roundtrip", "version": "1.2.0",
            "gate": {"enabled": True, "vad_threshold": 0.5},
            "value_provenance": {"gate.vad_threshold": "explicit"},
        })
        path = pz.save_preset(p, tmp_path / "roundtrip.json")
        reloaded = pz.load_preset(path)
        assert reloaded.version == CURRENT_VERSION
        assert reloaded.gate.vad_threshold == 0.5
        assert (reloaded.value_provenance["gate.vad_threshold"]
                == PROVENANCE_EXPLICIT)
