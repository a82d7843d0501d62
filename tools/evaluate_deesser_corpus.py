"""De-esser corpus decision record.

Framework re-run of `python/tools/evaluate_deesser_corpus.py`: the corpus
scores the calibrated soft-fusion *recommendation* model — for each
generated clip, the voice-setup de-esser evidence pipeline (VAD-masked
frame features -> frozen logistic fusion) produces an enable probability,
classified against the clip label at the committed threshold. Gates match
the reference record: zero clip-level false positives/negatives and a
Brier score under 0.05 on the generated corpus.
"""

from __future__ import annotations

import argparse

import numpy as np

from _evaluation_common import utc_now, write_report


def main() -> int:
    parser = argparse.ArgumentParser()
    parser.add_argument("--max-cases", type=int, default=0,
                        help="limit cases for a quick run (0 = all)")
    parser.add_argument("--sample-rate", type=int, default=48000)
    args = parser.parse_args()

    from audioforge_tpu.analysis.deesser_corpus import (
        CORPUS_CASES,
        CORPUS_VERSION,
        generate_deesser_case,
    )
    from audioforge_tpu.analysis.deesser_fusion import (
        ENABLE_PROBABILITY_THRESHOLD,
        MODEL_VERSION,
    )
    from audioforge_tpu.analysis.spectrum import compute_voice_spectrum
    from audioforge_tpu.analysis import voice_setup as vs

    cases = [c for c in CORPUS_CASES if c.sample_rate == args.sample_rate]
    if args.max_cases:
        cases = cases[: args.max_cases]

    rows = []
    for case in cases:
        generated = generate_deesser_case(case)
        fs = case.sample_rate
        noise = generated.noise_audio
        noise_rms_db = 10.0 * np.log10(float(np.mean(noise**2)) + 1e-12)
        features = vs._vad_masked_speech_features(
            generated.speech_audio, fs, noise_rms_db,
            vad_probabilities=generated.vad_probabilities,
            noise_audio=noise,
        )
        freqs, spectrum_db = compute_voice_spectrum(generated.speech_audio, fs)
        _, diag = vs._recommend_deesser(
            freqs=freqs,
            spectrum_db=spectrum_db,
            capture_confidence=0.8,
            robust_sibilance_excess_db=float(
                features["sibilance_excess_db"]
            ),
            frame_evidence=features["deesser_frame_evidence"],
        )
        rows.append({
            "name": case.name,
            "condition": case.condition,
            "label": case.needs_deesser,
            "probability": float(diag["detection_probability"]),
            "predicted": bool(diag["enabled"]),
        })

    labels = np.array([r["label"] for r in rows])
    probs = np.array([r["probability"] for r in rows])
    preds = np.array([r["predicted"] for r in rows])
    tp = int(np.sum(preds & labels))
    tn = int(np.sum(~preds & ~labels))
    fp = int(np.sum(preds & ~labels))
    fn = int(np.sum(~preds & labels))
    brier = float(np.mean((probs - labels.astype(float)) ** 2))

    by_condition = {}
    for condition in sorted({r["condition"] for r in rows}):
        sub = [r for r in rows if r["condition"] == condition]
        sub_probs = np.array([r["probability"] for r in sub])
        by_condition[condition] = {
            "samples": len(sub),
            "false_positive": int(
                sum(r["predicted"] and not r["label"] for r in sub)
            ),
            "false_negative": int(
                sum(not r["predicted"] and r["label"] for r in sub)
            ),
            "probability_max": round(float(sub_probs.max()), 4),
            "probability_median": round(float(np.median(sub_probs)), 4),
        }

    gates = {"false_positive_max": 0, "false_negative_max": 0,
             "brier_score_max": 0.05}
    passed = fp <= gates["false_positive_max"] and fn <= gates[
        "false_negative_max"] and brier <= gates["brier_score_max"]

    report = {
        "schema_version": 1,
        "generated_at_utc": utc_now(),
        "corpus": {
            "version": CORPUS_VERSION,
            "license": "CC0-1.0",
            "generated": True,
            "real_recordings": False,
            "clip_count": len(rows),
            "sample_rate": args.sample_rate,
        },
        "model": {
            "version": MODEL_VERSION,
            "enable_probability_threshold": ENABLE_PROBABILITY_THRESHOLD,
        },
        "predefined_gates": gates,
        "metrics": {
            "clip": {
                "samples": len(rows),
                "true_positive": tp,
                "true_negative": tn,
                "false_positive": fp,
                "false_negative": fn,
                "recall": round(tp / max(tp + fn, 1), 4),
                "precision": round(tp / max(tp + fp, 1), 4),
                "brier_score": round(brier, 5),
                "positive_probability_median": round(
                    float(np.median(probs[labels])) if labels.any() else 0.0, 4
                ),
                "negative_probability_max": round(
                    float(probs[~labels].max()) if (~labels).any() else 0.0, 4
                ),
            },
            "clip_by_condition": by_condition,
        },
        "decision": {
            "deesser_fusion": "retain" if passed else "investigate",
            "reason": (
                "Zero clip-level errors and Brier inside the gate."
                if passed else "A corpus gate failed; see metrics."
            ),
        },
        "limitations": [
            "Generated fixtures validate detector behavior, not listening quality.",
            "Real-speaker evaluation remains required before perceptual claims.",
        ],
    }
    write_report("deesser-corpus-v1-report.json", report)
    return 0 if passed else 1


if __name__ == "__main__":
    raise SystemExit(main())
