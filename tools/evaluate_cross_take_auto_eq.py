"""Evaluate cross-take Auto-EQ agreement evidence on held-out statements.

Counterpart of the reference's `python/tools/evaluate_cross_take_auto_eq.py`
(`cross-take-auto-eq-report.json`): for every speaker and statement fold,
fit Auto-EQ two ways —

- **single**: the product pipeline on one take
  (:func:`audioforge_tpu.analysis.auto_eq.analyze_auto_eq`);
- **cross-take**: the evaluation-only candidate that feeds
  :func:`audioforge_tpu.analysis.cross_take.cross_take_evidence` from two
  takes of the same statement into ``calculate_eq_bands``
  (`cross_take_confidence`), shrinking gains where the takes disagree —

then score both on the OTHER statement (lexical holdout): weighted RMS
error between the held-out smoothed spectrum, the adaptive target, and the
predicted EQ response. Gates mirror the reference's decision record: the
cross-take candidate must not regress held-out error (median/p10), must
not raise retry or abstention rates, and every applied correction must
stay headroom-safe through the native chain simulation.

Corpus: ``models/cross_take_eval`` (synthetic, hash-pinned —
``tools/fetch_cross_take_corpus.py``). Regenerates
``evaluation/cross-take-auto-eq-report.json``.
"""

from __future__ import annotations

import hashlib
import json
import sys
import time
import wave
from pathlib import Path

REPO_ROOT = Path(__file__).resolve().parents[1]
if str(REPO_ROOT) not in sys.path:
    sys.path.insert(0, str(REPO_ROOT))

# Analysis-layer evaluation: thousands of small device calls (per-window VAD
# inference, per-fold chain sims) — on the tunnelled dev TPU each call pays
# network RTT, so this record runs on host CPU; the TPU throughput story is
# covered by bench.py / evaluate_serving_harness.py.
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
from audioforge_tpu.cache import enable_compile_cache
enable_compile_cache()

import numpy as np  # noqa: E402

from tools._evaluation_common import write_report  # noqa: E402

CORPUS = REPO_ROOT / "models" / "cross_take_eval"
TARGET_PRESET = "broadcast"
GATES = {
    "min_comparable_test_pairs": 10,
    "min_comparable_test_speakers": 5,
    "min_median_heldout_improvement_db": 0.0,
    "min_p10_heldout_improvement_db": -0.5,
    "max_cross_take_retry_rate": 0.15,
    "max_abstention_rate_increase": 0.10,
    "min_headroom_safe_rate": 1.0,
}


def _read_wav(path: Path) -> np.ndarray:
    with wave.open(str(path), "rb") as handle:
        assert handle.getframerate() == 48_000 and handle.getnchannels() == 1
        raw = handle.readframes(handle.getnframes())
    return (np.frombuffer(raw, "<i2").astype(np.float32) / 32767.0)


def _load_corpus():
    manifest = json.loads((CORPUS / "manifest.json").read_text())
    takes = {}
    for entry in manifest["entries"]:
        path = CORPUS / entry["path"]
        actual = hashlib.sha256(path.read_bytes()).hexdigest()
        if actual != entry["sha256"]:
            raise ValueError(f"corpus hash mismatch: {entry['path']}")
        audio = _read_wav(path)
        if audio.size != entry["frames"]:
            raise ValueError(f"corpus frame mismatch: {entry['path']}")
        takes[(entry["speaker"], entry["statement"], entry["take"])] = audio
    return manifest, takes


def _heldout_target_error(spectrum, eq_settings) -> float:
    """Weighted RMS of (target - measured - response) on the dense grid —
    the reference's held-out metric."""
    from audioforge_tpu.analysis.auto_eq import (
        _dense_log_grid,
        _voice_weights,
        get_target_curve,
        predict_eq_response,
    )
    from audioforge_tpu.analysis.spectrum import smooth_spectrum_perceptual

    freqs = spectrum.freqs
    measured = smooth_spectrum_perceptual(freqs, spectrum.median_spectrum_db)
    voice = (freqs >= 100.0) & (freqs <= 8_000.0)
    measured_norm = measured - float(np.mean(measured[voice]))
    target = get_target_curve(freqs, TARGET_PRESET, measured_db=measured,
                              target_mode="adaptive")
    dense = _dense_log_grid(freqs)
    measured_d = np.interp(dense, freqs, measured_norm)
    target_d = np.interp(dense, freqs, target)
    response = predict_eq_response(
        dense, eq_settings["band_gains"], eq_settings["band_qs"],
        eq_settings["band_freqs"],
    )
    w = _voice_weights(dense)
    return float(np.sqrt(np.sum(w * np.square(target_d - measured_d - response))
                         / np.sum(w)))


def _headroom_safe(audio, eq_settings):
    from audioforge_tpu.analysis.headroom import simulate_candidate_chain

    result = simulate_candidate_chain(
        audio, 48_000, eq_settings,
        {
            "deesser": {"enabled": False},
            "compressor": {"enabled": False},
            "limiter": {"enabled": True, "ceiling_db": -1.0,
                        "release_ms": 80.0, "careful_output_enabled": True},
        },
    )
    true_peak = float(result.get("output_true_peak_db", 120.0))
    ceiling = float(result.get("limiter_effective_ceiling_db", -1.0))
    return bool(
        result.get("simulation_backend") == "native"
        and np.isfinite(true_peak)
        and true_peak <= ceiling + 0.15
    )


def _cross_take_candidate(first, second):
    """The rejected-candidate path: cross-take evidence feeds the solver."""
    from audioforge_tpu.analysis.auto_eq import (
        calculate_eq_bands,
        get_target_curve,
    )
    from audioforge_tpu.analysis.cross_take import cross_take_evidence
    from audioforge_tpu.analysis.failure_detection import validate_analysis
    from audioforge_tpu.analysis.headroom import apply_headroom_validation
    from audioforge_tpu.analysis.spectrum import (
        analyze_voice_spectrum,
        smooth_spectrum_perceptual,
    )
    from audioforge_tpu.analysis.vad import analyze_offline_vad

    first_vad, _ = analyze_offline_vad(first, 48_000)
    second_vad, _ = analyze_offline_vad(second, 48_000)
    s1 = analyze_voice_spectrum(first, 48_000, vad_probabilities=first_vad)
    s2 = analyze_voice_spectrum(second, 48_000, vad_probabilities=second_vad)
    sm1 = smooth_spectrum_perceptual(s1.freqs, s1.median_spectrum_db,
                                     strength="conservative")
    sm2 = smooth_spectrum_perceptual(s2.freqs, s2.median_spectrum_db,
                                     strength="conservative")
    evidence = cross_take_evidence(
        s1.freqs, sm1, s1.measurement_uncertainty_db, s1.phonetic_coverage,
        s2.freqs, sm2, s2.measurement_uncertainty_db, s2.phonetic_coverage,
    )
    target = get_target_curve(s1.freqs, TARGET_PRESET, measured_db=sm1,
                              target_mode="adaptive")
    settings = calculate_eq_bands(
        s1.freqs, sm1, target,
        spectral_repeatability=s1.spectral_repeatability,
        spectral_uncertainty_db=s1.measurement_uncertainty_db,
        cross_take_confidence=evidence.confidence,
        phonetic_coverage=s1.phonetic_coverage,
        voiced_window_ratio=s1.voiced_window_ratio,
        analysis_confidence=s1.residual_confidence,
        global_snr_db=s1.snr_db,
        spectral_snr_db=s1.spectral_snr_db,
        noise_reference_source=s1.noise_reference_source,
        target_profile=f"{TARGET_PRESET}:adaptive",
        used_spectrum_fallback=s1.used_single_spectrum_fallback,
        smoothing_strength="conservative",
        tilt_policy="preserve",
    )
    settings["cross_take_evidence"] = evidence.diagnostics()
    settings = apply_headroom_validation(first, 48_000, settings)
    validation = validate_analysis(settings, sm1, s1.freqs)
    if not validation.passed:
        raise ValueError(validation.reason)
    return settings


def evaluate():
    from audioforge_tpu.analysis.auto_eq import analyze_auto_eq
    from audioforge_tpu.analysis.spectrum import analyze_voice_spectrum
    from audioforge_tpu.analysis.vad import analyze_offline_vad

    manifest, takes = _load_corpus()
    rows = []
    for speaker in manifest["speakers"]:
        statements = manifest["statements"]
        for fit_stmt, held_stmt in ((statements[0], statements[1]),
                                    (statements[1], statements[0])):
            first = takes[(speaker, fit_stmt, "a")]
            second = takes[(speaker, fit_stmt, "b")]
            held = takes[(speaker, held_stmt, "a")]
            held_vad, _ = analyze_offline_vad(held, 48_000)
            held_spectrum = analyze_voice_spectrum(
                held, 48_000, vad_probabilities=held_vad
            )

            row = {"speaker": speaker, "fit_statement": fit_stmt,
                   "heldout_statement": held_stmt}
            for label, runner in (
                ("single", lambda: analyze_auto_eq(
                    first, 48_000, TARGET_PRESET)[0]),
                ("cross_take", lambda: _cross_take_candidate(first, second)),
            ):
                started = time.perf_counter()
                try:
                    settings = runner()
                    err = None
                except Exception as exc:  # noqa: BLE001 — retry accounting
                    settings, err = None, str(exc)
                entry = {
                    "settings_available": settings is not None,
                    "error": err,
                    "runtime_seconds": time.perf_counter() - started,
                }
                if settings is not None:
                    entry["recommendation_status"] = settings.get(
                        "recommendation_status")
                    entry["heldout_target_error_db"] = _heldout_target_error(
                        held_spectrum, settings)
                    entry["headroom_safe"] = _headroom_safe(first, settings)
                    entry["active_band_count"] = settings.get(
                        "active_band_count")
                    if label == "cross_take":
                        entry["cross_take_evidence"] = settings.get(
                            "cross_take_evidence")
                row[label] = entry
            rows.append(row)

    comparable = [r for r in rows
                  if r["single"]["settings_available"]
                  and r["cross_take"]["settings_available"]]
    by_speaker: dict[str, list[float]] = {}
    for r in comparable:
        imp = (r["single"]["heldout_target_error_db"]
               - r["cross_take"]["heldout_target_error_db"])
        by_speaker.setdefault(r["speaker"], []).append(float(imp))
    speaker_medians = {s: float(np.median(v))
                       for s, v in sorted(by_speaker.items())}
    improvements = list(speaker_medians.values())

    def rate(label, pred):
        vals = [pred(r[label]) for r in rows if r[label]["settings_available"]]
        return float(np.mean(vals)) if vals else 1.0

    metrics = {
        "pair_count": len(rows),
        "comparable_pair_count": len(comparable),
        "comparable_speaker_count": len(speaker_medians),
        "speaker_median_heldout_improvements_db": speaker_medians,
        "median_heldout_improvement_db": (
            float(np.median(improvements)) if improvements else None),
        "p10_heldout_improvement_db": (
            float(np.percentile(improvements, 10)) if improvements else None),
        "single_retry_rate": float(np.mean(
            [not r["single"]["settings_available"] for r in rows])),
        "cross_take_retry_rate": float(np.mean(
            [not r["cross_take"]["settings_available"] for r in rows])),
        "single_abstention_rate": rate(
            "single", lambda e: e.get("recommendation_status") == "abstain"),
        "cross_take_abstention_rate": rate(
            "cross_take",
            lambda e: e.get("recommendation_status") == "abstain"),
        "cross_take_headroom_safe_rate": rate(
            "cross_take", lambda e: bool(e.get("headroom_safe"))),
    }

    gate_results = {
        "comparable_pairs": metrics["comparable_pair_count"]
        >= GATES["min_comparable_test_pairs"],
        "comparable_speakers": metrics["comparable_speaker_count"]
        >= GATES["min_comparable_test_speakers"],
        "median_improvement": metrics["median_heldout_improvement_db"]
        is not None
        and metrics["median_heldout_improvement_db"]
        >= GATES["min_median_heldout_improvement_db"],
        "p10_improvement": metrics["p10_heldout_improvement_db"] is not None
        and metrics["p10_heldout_improvement_db"]
        >= GATES["min_p10_heldout_improvement_db"],
        "retry_rate": metrics["cross_take_retry_rate"]
        <= GATES["max_cross_take_retry_rate"],
        "abstention_increase": (
            metrics["cross_take_abstention_rate"]
            - metrics["single_abstention_rate"]
        ) <= GATES["max_abstention_rate_increase"],
        "headroom_safety": metrics["cross_take_headroom_safe_rate"]
        >= GATES["min_headroom_safe_rate"],
    }
    all_pass = all(gate_results.values())

    return {
        "schema_version": 1,
        "report": "cross-take-auto-eq",
        "corpus": manifest["corpus"],
        "target_preset": TARGET_PRESET,
        "gates": {"thresholds": GATES, "results": gate_results},
        "metrics": metrics,
        "rows": rows,
        "decision": {
            "status": "pass" if all_pass else "fail",
            "retained_in_product": False,
            "summary": (
                "cross-take evidence "
                + ("meets" if all_pass else "DOES NOT meet")
                + " the retention gates on the synthetic repeated-reading "
                  "corpus; like the reference, the candidate stays "
                  "evaluation-only (analysis/cross_take.py) and the product "
                  "pipeline remains single-take"
            ),
        },
    }


def main() -> int:
    report = evaluate()
    write_report("cross-take-auto-eq-report.json", report)
    print(report["decision"]["summary"])
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
