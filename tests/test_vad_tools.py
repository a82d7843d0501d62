"""VAD corpus builders and backend evaluators (tools layer)."""

import json
import sys
from pathlib import Path

import numpy as np
import pytest

REPO = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO / "tools"))

import build_vad_evaluation_corpus as corpus  # noqa: E402
import evaluate_vad_models as evm  # noqa: E402


class TestCorpusBuilder:
    def test_speech_intervals_match_activity(self):
        rng = np.random.default_rng(1)
        audio, intervals = corpus._speech((150.0, 1.0, 2.5), rng, 2.0)
        assert intervals, "syllabic speech must yield labeled intervals"
        for lo, hi in intervals:
            seg = audio[lo:hi]
            assert np.sqrt(np.mean(seg**2)) > 1e-4
        # padding regions are silent
        pad = int(corpus.PADDING_SECONDS * corpus.SAMPLE_RATE)
        assert np.all(audio[:pad] == 0.0)

    def test_speech_level_pinned(self):
        rng = np.random.default_rng(2)
        audio, intervals = corpus._speech((180.0, 1.1, 3.0), rng, 3.0)
        active = np.zeros(audio.size, bool)
        for lo, hi in intervals:
            active[lo:hi] = True
        rms_db = 20 * np.log10(np.sqrt(np.mean(audio[active] ** 2)))
        assert rms_db == pytest.approx(corpus.TARGET_SPEECH_RMS_DBFS, abs=3.0)

    def test_noise_categories_unit_rms(self):
        rng = np.random.default_rng(3)
        for category in corpus.NOISE_CATEGORIES:
            x = corpus._noise(category, np.random.default_rng(3), 24000)
            assert np.isfinite(x).all()
            assert np.sqrt(np.mean(x**2)) == pytest.approx(1.0, rel=1e-3)

    def test_deterministic_for_fixed_seed(self, tmp_path):
        a = corpus.build_corpus(tmp_path / "a", seconds_per_clip=0.5)
        b = corpus.build_corpus(tmp_path / "b", seconds_per_clip=0.5)
        hashes_a = [c["sha256"] for c in a["captures"]]
        hashes_b = [c["sha256"] for c in b["captures"]]
        assert hashes_a == hashes_b

    def test_wav_roundtrip(self, tmp_path):
        audio = np.sin(np.linspace(0, 100, 4800)).astype(np.float32) * 0.5
        corpus._write_wav(tmp_path / "x.wav", audio)
        back = evm._read_wav(tmp_path / "x.wav")
        assert np.max(np.abs(back - audio)) < 1e-3


class TestEvaluatorMath:
    def test_window_truth_majority(self):
        n = evm.WINDOW_48K * 4
        truth = evm._window_truth(n, [(0, evm.WINDOW_48K * 2 - 10)])
        assert truth.tolist() == [True, True, False, False]

    def test_energy_posterior_separates_bursts(self):
        rng = np.random.default_rng(5)
        n = evm.WINDOW_48K * 40
        audio = 0.001 * rng.standard_normal(n).astype(np.float32)
        audio[: n // 2] += 0.3 * np.sin(
            2 * np.pi * 200 * np.arange(n // 2) / 48000
        ).astype(np.float32)
        p = evm._energy_posterior(audio)
        assert p[: 18].mean() > 0.9
        assert p[22:].mean() < 0.1

    def test_event_metrics_perfect_prediction(self):
        truth = np.array([False, True, True, False, False, True])
        m = evm._event_metrics(np.where(truth, 0.9, 0.1), truth)
        assert m["macro_f1"] == 1.0
        assert m["event_recall"] == 1.0
        assert m["false_openings_per_min"] == 0.0
        assert m["events"] == 2

    def test_false_openings_debounced(self):
        truth = np.zeros(200, bool)
        post = np.zeros(200, np.float32)
        post[50] = 0.9  # 1-window blip: debounced away
        post[100:105] = 0.9  # sustained: counts
        m = evm._event_metrics(post, truth)
        minutes = 200 * evm.WINDOW_48K / 48000 / 60
        assert m["false_openings_per_min"] == pytest.approx(1 / minutes, rel=1e-6)

    def test_ece_zero_for_perfect_calibration(self):
        post = np.concatenate([np.full(50, 0.95), np.full(50, 0.05)])
        truth = np.concatenate([
            np.ones(50, bool), np.zeros(50, bool),
        ])
        assert evm._ece(post, truth) == pytest.approx(0.05, abs=0.011)


class TestTrackedReports:
    def test_vad_models_report(self):
        report = json.loads(
            (REPO / "evaluation" / "vad-models-report.json").read_text()
        )
        assert report["status"] == "passed"
        assert report["weight_provenance"] in (
            "seeded-structural", "converted-official",
        )
        assert report["runtime_single_stream"]["rtf"] <= report["gates"][
            "max_batched_rtf"
        ]
        # honesty contract: seeded weights never ship as the default backend
        if report["weight_provenance"] == "seeded-structural":
            assert report["decision"]["offline_default_backend"] == "energy"

    def test_vad_selection_report(self):
        report = json.loads(
            (REPO / "evaluation" / "vad-model-selection-report.json").read_text()
        )
        assert report["decision"]["baseline"] == "energy"
        if report["weight_provenance"] == "seeded-structural":
            assert report["decision"]["retain_candidate"] is False
        cases = report["edge_screen"]["cases"]
        assert cases["digital_silence"]["baseline"]["open_window_ratio"] == 0.0
        assert cases["mains_hum_only"]["baseline"]["open_window_ratio"] == 0.0
