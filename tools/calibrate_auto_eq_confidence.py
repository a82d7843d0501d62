"""Calibrate Auto-EQ confidence cutoffs against paired-noise stability.

Counterpart of the reference's `python/tools/calibrate_auto_eq_confidence.py`
(`auto-eq-confidence-calibration.json`): the Auto-EQ solver exposes three
confidence thresholds —

- per-band local abstention
  (:data:`~audioforge_tpu.analysis.auto_eq.LOCAL_ABSTENTION_CONFIDENCE_THRESHOLD`),
- global capture abstention (``GLOBAL_CAPTURE_CONFIDENCE_THRESHOLD``),
- reduced recommendation (``REDUCED_RECOMMENDATION_CONFIDENCE_THRESHOLD``) —

and this experiment asks whether those cutoffs actually predict *stability
under noise*: each clean take is rendered at a controlled SNR grid with
seeded shaped noise, Auto-EQ runs on clean and noisy versions with the
same noise reference, and a confidence score "supports" its correction
when the noisy response stays within 1.5 dB / consistent sign of the clean
response. Thresholds are swept on the training speakers (F1), validated
on held-out speakers, and the current cutoff is retained unless the
candidate clearly wins (F1 +0.03 at precision within 0.02) — the
reference's conservative retention rule.

Corpus: clean takes from ``models/cross_take_eval`` (broadband synthetic
voices, hash-pinned); noise rendered in-process from the seeded category
generators. Runs on host CPU (analysis-layer record). Regenerates
``evaluation/auto-eq-confidence-calibration.json``.
"""

from __future__ import annotations

import hashlib
import json
import sys
import wave
from pathlib import Path

REPO_ROOT = Path(__file__).resolve().parents[1]
if str(REPO_ROOT) not in sys.path:
    sys.path.insert(0, str(REPO_ROOT))

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
from audioforge_tpu.cache import enable_compile_cache
enable_compile_cache()

import numpy as np  # noqa: E402

from tools._evaluation_common import write_report  # noqa: E402

CORPUS = REPO_ROOT / "models" / "cross_take_eval"
SAMPLE_RATE = 48_000
THRESHOLD_GRID = np.round(np.arange(0.20, 0.801, 0.025), 3)
EVALUATION_SNRS_DB = (0.0, 10.0, 30.0)
NOISE_SEED = 0xCA1B
VALIDATION_SPEAKERS = ("ilona", "jasper", "henrik")
STABLE_RESPONSE_ERROR_DB = 1.5
STABLE_SIGN_AGREEMENT = 0.80


def _read_wav(path: Path) -> np.ndarray:
    with wave.open(str(path), "rb") as handle:
        raw = handle.readframes(handle.getnframes())
    return np.frombuffer(raw, "<i2").astype(np.float32) / 32767.0


def _shaped_noise(n: int, rng) -> np.ndarray:
    """Pink-ish room noise with a mild 120 Hz hum component."""
    white = rng.standard_normal(n)
    spec = np.fft.rfft(white)
    freqs = np.maximum(np.fft.rfftfreq(n, 1.0 / SAMPLE_RATE), 1.0)
    pink = np.fft.irfft(spec / np.sqrt(freqs), n=n)
    t = np.arange(n) / SAMPLE_RATE
    hum = 0.15 * np.sin(2 * np.pi * 120.0 * t + rng.uniform(0, 6.0))
    noise = pink / max(np.abs(pink).max(), 1e-9) + hum
    return noise.astype(np.float32)


def _render_at_snr(clean, noise, target_snr_db):
    clean_rms = float(np.sqrt(np.mean(np.square(clean, dtype=np.float64))))
    noise_rms = float(np.sqrt(np.mean(np.square(noise, dtype=np.float64))))
    scale = clean_rms / (noise_rms * 10.0 ** (target_snr_db / 20.0))
    scaled = (noise * scale).astype(np.float32)
    return (clean + scaled).astype(np.float32), scaled


def _solve(audio, noise):
    from audioforge_tpu.analysis import auto_eq
    from audioforge_tpu.analysis.spectrum import (
        analyze_voice_spectrum,
        smooth_spectrum_perceptual,
    )
    from audioforge_tpu.analysis.vad import analyze_offline_vad

    probabilities, _ = analyze_offline_vad(audio, SAMPLE_RATE)
    spectrum = analyze_voice_spectrum(
        audio, SAMPLE_RATE, vad_probabilities=probabilities,
        noise_audio=noise,
    )
    measured = smooth_spectrum_perceptual(
        spectrum.freqs, spectrum.median_spectrum_db, strength="conservative"
    )
    target = auto_eq.get_target_curve(
        spectrum.freqs, "broadcast", measured_db=measured,
        target_mode="static",
    )
    result = auto_eq.calculate_eq_bands(
        spectrum.freqs, measured, target,
        spectral_repeatability=spectrum.spectral_repeatability,
        spectral_uncertainty_db=spectrum.measurement_uncertainty_db,
        phonetic_coverage=spectrum.phonetic_coverage,
        voiced_window_ratio=spectrum.voiced_window_ratio,
        analysis_confidence=spectrum.residual_confidence,
        global_snr_db=spectrum.snr_db,
        spectral_snr_db=spectrum.spectral_snr_db,
        noise_reference_source=spectrum.noise_reference_source,
        noise_reference_quality=1.0,
        noise_reference_status="usable",
        target_profile="broadcast:static",
        used_spectrum_fallback=spectrum.used_single_spectrum_fallback,
        smoothing_strength="conservative",
        tilt_policy="preserve",
    )
    result["measurement_confidence"] = spectrum.residual_confidence
    return result


def _response(result, grid):
    from audioforge_tpu.analysis.auto_eq import predict_eq_response

    return predict_eq_response(
        grid, result["pre_abstention_band_gains"], result["band_qs"],
        result["band_freqs"],
    )


def _case(case_id, speaker, split, clean, rng, target_snr_db):
    noise = _shaped_noise(clean.size, rng)
    rendered, scaled = _render_at_snr(clean, noise, target_snr_db)
    clean_result = _solve(clean, scaled)
    noisy_result = _solve(rendered, scaled)
    grid = np.geomspace(80.0, 8_000.0, 256)
    clean_resp = _response(clean_result, grid)
    noisy_resp = _response(noisy_result, grid)
    response_error_db = float(np.sqrt(np.mean((clean_resp - noisy_resp) ** 2)))
    active = np.abs(clean_resp) >= 0.25
    sign_agreement = (
        float(np.mean(np.sign(clean_resp[active])
                      == np.sign(noisy_resp[active])))
        if np.any(active) else 1.0
    )
    capture_row = {
        "id": f"{case_id}-snr{target_snr_db:g}",
        "speaker": speaker,
        "split": split,
        "target_snr_db": target_snr_db,
        "capture_confidence_score": float(
            noisy_result.get("capture_confidence", 0.0)),
        "overall_confidence_score": float(
            noisy_result.get("analysis_confidence", 0.0)),
        "response_error_db": response_error_db,
        "response_sign_agreement": sign_agreement,
        "stable_capture": bool(response_error_db <= STABLE_RESPONSE_ERROR_DB
                               and sign_agreement >= STABLE_SIGN_AGREEMENT),
    }
    band_rows = []
    freqs_n = np.asarray(noisy_result["band_freqs"], float)
    gains_n = np.asarray(noisy_result["pre_abstention_band_gains"], float)
    conf_n = np.asarray(noisy_result["band_confidences"], float)
    for i, (center, gain, confidence) in enumerate(
            zip(freqs_n, gains_n, conf_n)):
        if abs(gain) < 0.25:
            continue
        band_clean = np.interp(center, grid, clean_resp)
        band_noisy = np.interp(center, grid, noisy_resp)
        difference = abs(float(band_clean - band_noisy))
        sign_agrees = np.sign(band_clean) == np.sign(band_noisy) or (
            abs(band_clean) < 0.25)
        band_rows.append({
            "capture_id": capture_row["id"],
            "split": split,
            "band_index": i,
            "center_hz": float(center),
            "confidence": float(confidence),
            "response_difference_db": difference,
            "supported": bool(difference <= STABLE_RESPONSE_ERROR_DB
                              and sign_agrees),
        })
    return capture_row, band_rows


def _classification(scores, labels, threshold):
    predicted = scores >= threshold
    tp = int(np.count_nonzero(predicted & labels))
    fp = int(np.count_nonzero(predicted & ~labels))
    fn = int(np.count_nonzero(~predicted & labels))
    tn = int(np.count_nonzero(~predicted & ~labels))
    precision = tp / max(1, tp + fp)
    recall = tp / max(1, tp + fn)
    return {
        "threshold": float(threshold),
        "precision": precision,
        "recall": recall,
        "f1": 2.0 * precision * recall / max(1e-12, precision + recall),
        "true_positive": tp, "false_positive": fp,
        "false_negative": fn, "true_negative": tn,
    }


def _calibrate(rows, *, score_key, label_key, current_threshold):
    train = [r for r in rows if r["split"] == "train"]
    validation = [r for r in rows if r["split"] == "validation"]
    ts = np.asarray([r[score_key] for r in train], float)
    tl = np.asarray([r[label_key] for r in train], bool)
    candidates = [_classification(ts, tl, t) for t in THRESHOLD_GRID]
    best = max(candidates, key=lambda c: (
        c["f1"], c["precision"], -abs(c["threshold"] - current_threshold)))
    vs = np.asarray([r[score_key] for r in validation], float)
    vl = np.asarray([r[label_key] for r in validation], bool)
    current_val = _classification(vs, vl, current_threshold)
    candidate_val = _classification(vs, vl, best["threshold"])
    enough = bool(np.count_nonzero(vl) >= 3 and np.count_nonzero(~vl) >= 3)
    retain_candidate = bool(
        enough
        and candidate_val["f1"] >= current_val["f1"] + 0.03
        and candidate_val["precision"] >= current_val["precision"] - 0.02
    )
    return {
        "current_threshold": current_threshold,
        "training_best_threshold": best["threshold"],
        "selected_threshold": (best["threshold"] if retain_candidate
                               else current_threshold),
        "selection": "candidate" if retain_candidate else "current",
        "minimum_validation_class_count_met": enough,
        "current_validation": current_val,
        "candidate_validation": candidate_val,
    }


def evaluate():
    from audioforge_tpu.analysis.auto_eq import (
        GLOBAL_CAPTURE_CONFIDENCE_THRESHOLD,
        LOCAL_ABSTENTION_CONFIDENCE_THRESHOLD,
        REDUCED_RECOMMENDATION_CONFIDENCE_THRESHOLD,
    )

    manifest = json.loads((CORPUS / "manifest.json").read_text())
    rng = np.random.default_rng(NOISE_SEED)
    captures, bands = [], []
    for entry in manifest["entries"]:
        if entry["take"] != "a":
            continue  # one clean take per statement
        path = CORPUS / entry["path"]
        if hashlib.sha256(path.read_bytes()).hexdigest() != entry["sha256"]:
            raise ValueError(f"corpus hash mismatch: {entry['path']}")
        clean = _read_wav(path)
        split = ("validation" if entry["speaker"] in VALIDATION_SPEAKERS
                 else "train")
        for snr in EVALUATION_SNRS_DB:
            capture_row, band_rows = _case(
                f"{entry['speaker']}-{entry['statement']}", entry["speaker"],
                split, clean, rng, snr,
            )
            captures.append(capture_row)
            bands.extend(band_rows)

    calibration = {
        "local_abstention": _calibrate(
            bands, score_key="confidence", label_key="supported",
            current_threshold=LOCAL_ABSTENTION_CONFIDENCE_THRESHOLD,
        ),
        "global_capture": _calibrate(
            captures, score_key="capture_confidence_score",
            label_key="stable_capture",
            current_threshold=GLOBAL_CAPTURE_CONFIDENCE_THRESHOLD,
        ),
        "reduced_recommendation": _calibrate(
            captures, score_key="overall_confidence_score",
            label_key="stable_capture",
            current_threshold=REDUCED_RECOMMENDATION_CONFIDENCE_THRESHOLD,
        ),
    }
    changed = {k: v for k, v in calibration.items()
               if v["selection"] == "candidate"}
    return {
        "schema_version": 1,
        "report": "auto-eq-confidence-calibration",
        "corpus": manifest["corpus"],
        "noise_seed": NOISE_SEED,
        "evaluation_snrs_db": list(EVALUATION_SNRS_DB),
        "capture_count": len(captures),
        "active_band_observation_count": len(bands),
        "decision": calibration,
        "summary": {
            "status": "pass",
            "thresholds_changed": sorted(changed),
            "text": (
                "confidence thresholds retained"
                if not changed else
                "candidate thresholds selected for: " + ", ".join(
                    sorted(changed))
            ) + " (conservative retention rule on held-out speakers)",
        },
    }


def main() -> int:
    report = evaluate()
    write_report("auto-eq-confidence-calibration.json", report)
    print(report["summary"]["text"])
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
