"""Paired tests for the Auto-EQ experiment evaluators and lifecycle tools.

House rule (SURVEY §4): every evaluation tool has a paired test checking
its tracked report's schema and gate wiring; heavy evaluators are not
re-run here — their tracked ``evaluation/*.json`` records are validated
instead, plus unit tests of the decision math that is cheap to call
directly.
"""

import hashlib
import json
import subprocess
import sys
from pathlib import Path

import numpy as np
import pytest

REPO = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO / "tools"))


def _report(name):
    path = REPO / "evaluation" / name
    if not path.exists():
        pytest.skip(f"{name} not generated yet")
    return json.loads(path.read_text())


class TestCrossTakeCorpus:
    def test_manifest_hashes_pin_the_takes(self):
        root = REPO / "models" / "cross_take_eval"
        if not root.exists():
            pytest.skip("cross-take corpus not generated")
        manifest = json.loads((root / "manifest.json").read_text())
        assert manifest["sample_rate"] == 48_000
        assert len(manifest["entries"]) == (
            len(manifest["speakers"]) * len(manifest["statements"])
            * len(manifest["takes"])
        )
        entry = manifest["entries"][0]
        actual = hashlib.sha256(
            (root / entry["path"]).read_bytes()).hexdigest()
        assert actual == entry["sha256"]

    def test_generator_is_deterministic(self, tmp_path):
        import fetch_cross_take_corpus as fc

        voice_a = fc._statement_voice(150.0, 2.5, "alpha",
                                      np.random.default_rng(7))
        voice_b = fc._statement_voice(150.0, 2.5, "alpha",
                                      np.random.default_rng(7))
        np.testing.assert_array_equal(voice_a, voice_b)
        # statements differ, takes of one statement share the rhythm
        other = fc._statement_voice(150.0, 2.5, "bravo",
                                    np.random.default_rng(7))
        assert np.abs(voice_a - other).max() > 1e-3

    def test_coloration_is_speaker_stable(self):
        import fetch_cross_take_corpus as fc

        freqs = np.asarray([100.0, 1000.0, 8000.0])
        g1 = fc._coloration_gain(freqs, fc.SPEAKERS["felix"][2])
        g2 = fc._coloration_gain(freqs, fc.SPEAKERS["felix"][2])
        np.testing.assert_array_equal(g1, g2)
        assert g1[2] > g1[0]  # felix is the bright speaker


class TestCrossTakeReport:
    def test_tracked_report_schema(self):
        report = _report("cross-take-auto-eq-report.json")
        assert report["report"] == "cross-take-auto-eq"
        assert set(report["gates"]) == {"thresholds", "results"}
        metrics = report["metrics"]
        assert metrics["pair_count"] >= metrics["comparable_pair_count"]
        assert 0.0 <= metrics["cross_take_retry_rate"] <= 1.0
        # like the reference, the candidate stays evaluation-only
        assert report["decision"]["retained_in_product"] is False


class TestEqCandidatePoolReport:
    def test_tracked_report_schema(self):
        report = _report("eq-candidate-pool-report.json")
        assert set(report["pools"]) == {"12", "14", "16"}
        for pool in report["pools"].values():
            assert len(pool["rows"]) == len(report["cases"])
            assert set(pool["gates"]) == {
                "median_improvement", "improved_fraction", "lower_decile",
                "runtime", "risk",
            }
        assert report["decision"]["product_path_changed"] is False

    def test_synthetic_spectra_distinct(self):
        import evaluate_eq_candidate_pool as pool

        freqs = np.geomspace(60.0, 16000.0, 64)
        kinds = [c for c, _ in pool.CASES]
        spectra = {k: pool._spectrum(freqs, k) for k in kinds}
        for a in kinds:
            for b in kinds:
                if a != b:
                    assert np.abs(spectra[a] - spectra[b]).max() > 0.5


class TestSparseFilterReport:
    def test_tracked_report_schema(self):
        report = _report("sparse-auto-eq-filter-report.json")
        assert report["report"] == "sparse-auto-eq-filter"
        assert set(report["gates"]["results"]) >= {
            "comparable_cases", "median_improvement", "section_reduction",
            "overshoot", "runtime",
        }
        for row in report["rows"]:
            if row.get("comparable"):
                assert row["candidate_active_sections"] <= 10

    def test_greedy_operations_reduce_objective(self):
        import evaluate_sparse_auto_eq_filters as sparse

        grid = np.geomspace(80.0, 16000.0, 128)
        view = {
            "grid": grid,
            # residual favours disabling everything: zero target
            "residual": np.zeros_like(grid),
            "weights": np.ones_like(grid),
        }
        incumbent = [
            ("low_shelf" if i == 0 else "high_shelf" if i == 9 else "bell",
             float(f), 1.0, 1.41, 12, True)
            for i, f in enumerate(np.geomspace(80, 12000, 10))
        ]
        confidences = np.full(10, 0.9)
        selected, trace = sparse._select_sparse(view, incumbent, confidences)
        # flat target: sparsity pressure must disable sections
        assert sparse._active_count(selected) < sparse._active_count(incumbent)
        assert all(t["improvement_db"] > 0 for t in trace)


class TestConfidenceCalibrationReport:
    def test_tracked_report_schema(self):
        report = _report("auto-eq-confidence-calibration.json")
        for key in ("local_abstention", "global_capture",
                    "reduced_recommendation"):
            entry = report["decision"][key]
            assert entry["selection"] in {"current", "candidate"}
            assert 0.0 <= entry["selected_threshold"] <= 1.0

    def test_classification_math(self):
        import calibrate_auto_eq_confidence as cal

        scores = np.asarray([0.9, 0.8, 0.2, 0.1])
        labels = np.asarray([True, True, False, False])
        result = cal._classification(scores, labels, 0.5)
        assert result["precision"] == 1.0 and result["recall"] == 1.0
        result = cal._classification(scores, labels, 0.05)
        assert result["recall"] == 1.0 and result["precision"] == 0.5

    def test_conservative_retention_rule(self):
        import calibrate_auto_eq_confidence as cal

        rows = []
        rng = np.random.default_rng(0)
        # training: threshold 0.5 separates perfectly; current 0.45 too
        for split in ("train", "validation"):
            for _ in range(20):
                good = bool(rng.random() < 0.5)
                rows.append({
                    "split": split,
                    "score": 0.7 + 0.1 * rng.random() if good
                    else 0.2 + 0.1 * rng.random(),
                    "label": good,
                })
        out = cal._calibrate(rows, score_key="score", label_key="label",
                             current_threshold=0.45)
        # candidate cannot beat a perfect current threshold by +0.03 F1
        assert out["selection"] == "current"
        assert out["selected_threshold"] == 0.45


class TestCorrectionToneReport:
    def test_tracked_report_schema(self):
        report = _report("correction-tone-stage-report.json")
        assert report["experiment"]["scope"] == "evaluation_only"
        assert report["decision"]["adopted_in_product"] is False
        agg = report["aggregate"]
        assert agg["schema_roundtrip"] is True
        assert agg["tone_payload_preserved"] is True

    def test_payload_schema_strictness(self):
        import evaluate_correction_tone_stages as ct

        good = ct._candidate_payload(ct._default_bands(enabled=False),
                                     ct._default_bands(enabled=False))
        corr, tone = ct._decode_candidate(json.loads(json.dumps(good)))
        assert len(corr) == len(tone) == 10
        with pytest.raises(ValueError):
            ct._decode_candidate({"schema_version": 1})
        bad = dict(good, enabled=False)
        with pytest.raises(ValueError):
            ct._decode_candidate(bad)


class TestHardwareMatrix:
    def test_aggregator_rejects_bad_cases(self, tmp_path):
        import evaluate_hardware_matrix as hm

        case = {
            "schema_version": 3,
            "qualification_kind": "exact-artifact-hardware",
            "status": "passed", "passed": True,
            "source_revision": "abc123",
            "artifact": {"archive_sha256": "0" * 64},
            "case": {
                "id": "virtual-baseline", "device_class": "virtual",
                "nominal_sample_rate_hz": 48_000, "scenario": "baseline",
                "evidence_kind": "automated",
                "scenario_evidence_valid": True,
            },
            "machine": {"system": "Linux", "release": "6.18.5"},
            "package_smoke": {"passed": True},
            "engine_startup": {"passed": True},
            "model_discovery": {"passed": True},
            "routes": {"selected": {
                "input": "device-0123456789abcdef",
                "output": "device-fedcba9876543210",
            }},
        }
        good = tmp_path / "case-good.json"
        good.write_text(json.dumps(case))
        _, errors = hm._load_case(good)
        assert errors == []

        # raw device name must be rejected (privacy contract)
        leaky = json.loads(json.dumps(case))
        leaky["routes"]["selected"]["input"] = "Blue Yeti USB"
        bad = tmp_path / "case-leaky.json"
        bad.write_text(json.dumps(leaky))
        _, errors = hm._load_case(bad)
        assert any("device identity" in e for e in errors)

        # physical lifecycle case without attestation must be rejected
        physical = json.loads(json.dumps(case))
        physical["case"]["device_class"] = "usb"
        physical["case"]["scenario"] = "device_reconnect"
        physical["case"]["evidence_kind"] = "operator_observed"
        bad2 = tmp_path / "case-usb.json"
        bad2.write_text(json.dumps(physical))
        _, errors = hm._load_case(bad2)
        assert any("attestation" in e for e in errors)

    def test_aggregate_coverage(self, tmp_path):
        import evaluate_hardware_matrix as hm

        report = hm.aggregate([])
        assert report["passed"] is False
        assert report["coverage"]["missing_scenarios"]

    def test_tracked_matrix_report(self):
        report = _report("hardware-matrix-report.json")
        assert report["qualification_kind"] == (
            "exact-artifact-hardware-matrix")
        assert report["passed"] is True
        assert report["coverage"]["missing_scenarios"] == []


class TestMicNoiseCapture:
    def test_assessment_gates(self):
        import capture_microphone_noise as mic

        rng = np.random.default_rng(0)
        quiet = (10.0 ** (-50.0 / 20.0)
                 * rng.standard_normal(11 * 48_000)).astype(np.float32)
        result = mic.assess_capture(quiet, [0.01] * 100)
        assert result["passed"], result["checks"]

        hot = (0.9 * rng.standard_normal(11 * 48_000)).astype(np.float32)
        result = mic.assess_capture(hot, [0.01] * 100)
        assert not result["checks"]["peak"]

        speechy = mic.assess_capture(quiet, [0.9] * 100)
        assert not speechy["checks"]["speech_activity"]

        short = mic.assess_capture(quiet[: 48_000], [0.01] * 100)
        assert not short["checks"]["duration"]


class TestConvertedWeightParity:
    def test_tracked_report_schema(self):
        report = _report("converted-weight-parity-report.json")
        assert set(report["models"]) == {"silero", "rnnoise", "dfn3"}
        for entry in report["models"].values():
            assert entry["weights_in_use"] in {"seeded", "converted"}
        # pending models are listed explicitly, never silently passed
        for name in report["pending_conversions"]:
            assert report["models"][name]["archive_present"] is False
        assert report["contracts"]["dfn3"]["available"] is True

    def test_silero_weights_source_reports(self):
        from audioforge_tpu.models.silero import weights_source

        assert weights_source() in {"seeded", "converted", "trained"}


class TestSuppressorModelSelection:
    def test_tracked_report_schema(self):
        report = _report("suppressor-model-selection-report.json")
        assert set(report["aggregates"]) == {
            "rnnoise", "deepfilter-ll", "deepfilter"}
        assert report["aggregates"]["rnnoise"]["latency_samples"] == 480
        assert report["aggregates"]["deepfilter"]["latency_samples"] == 1440
        assert report["decision"]["default_model"] == "rnnoise"
        if report["weights"]["source"] == "seeded":
            assert report["weights"]["quality_gates_binding"] is False


class TestChildVadCorpus:
    def test_manifest_schema_matches_adult_corpus(self):
        root = REPO / "models" / "vad_child_corpus"
        if not root.exists():
            pytest.skip("child corpus not generated")
        manifest = json.loads((root / "manifest.json").read_text())
        adult = json.loads(
            (REPO / "models" / "vad_eval_corpus" / "manifest.json")
            .read_text())
        # same capture schema so evaluate_vad_models consumes it unchanged
        assert set(manifest["captures"][0]) == set(adult["captures"][0])
        cap = manifest["captures"][0]
        actual = hashlib.sha256((root / cap["file"]).read_bytes()).hexdigest()
        assert actual == cap["sha256"]

    def test_child_voices_are_higher_pitched(self):
        import fetch_vad_child_validation_corpus as child

        rng = np.random.default_rng(1)
        audio, intervals = child._child_speech((310.0, 0.7, 3.6), rng, 3.0)
        assert intervals, "child speech must contain utterances"
        # dominant frequency of the voiced region sits in the child range
        lo, hi = intervals[0]
        seg = audio[lo:hi]
        spec = np.abs(np.fft.rfft(seg * np.hanning(seg.size)))
        freqs = np.fft.rfftfreq(seg.size, 1.0 / 48_000)
        dominant = freqs[np.argmax(spec)]
        assert 200.0 <= dominant <= 1300.0  # f0 or low harmonic


class TestUiSnapshots:
    def test_tracked_snapshot_report(self):
        report = _report("ui-snapshot-report.json")
        pins = report["snapshots_sha256"]
        assert report["snapshot_count"] == len(pins)
        # every pinned snapshot exists and hashes to its pin
        for name, expected in pins.items():
            path = REPO / "docs" / "snapshots" / f"{name}.json"
            assert path.exists(), name
            actual = hashlib.sha256(path.read_bytes()).hexdigest()
            assert actual == expected, name
        assert report["capture_contract"]["device_names_included"] is False
