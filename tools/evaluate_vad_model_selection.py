"""VAD backend selection decision record.

Counterpart of the reference's `python/tools/evaluate_vad_model_selection.py`
(`evaluation/vad-model-selection-report.json`): a predefined non-inferiority
comparison between the candidate neural backend (`silero-native`, the
framework's batched XLA Silero-structure model) and the shipping baseline
(the explicit `energy` fallback posterior), with bootstrap confidence
intervals on the held-out split and an edge-corpus behavioural screen
(whisper speech, loud transients, tonal music, silence, hum, abrupt start).

The candidate is retained only if every non-inferiority margin holds on the
held-out split AND the weights are the converted official archive — a
seeded structural network must never ship as the default VAD.
"""

from __future__ import annotations

import argparse
import json
import wave
from pathlib import Path

import numpy as np

from _evaluation_common import _REPO_ROOT, utc_now, write_report
from evaluate_vad_models import (
    CORPUS_DIR,
    OPEN_THRESHOLD,
    WINDOW_48K,
    _energy_posterior,
    _event_metrics,
    _silero_posterior,
    _window_truth,
)

EDGE_DIR = _REPO_ROOT / "models" / "vad_edge_corpus"
BOOTSTRAP_REPETITIONS = 600
SEED = 0xB007
MARGINS = {
    "held_out_macro_f1_ci95_low": -0.02,
    "held_out_event_recall_ci95_low": -0.02,
    "false_openings_within_five_percent_or_one": True,
}


def _read_wav(path: Path) -> np.ndarray:
    with wave.open(str(path), "rb") as handle:
        frames = handle.readframes(handle.getnframes())
    return np.frombuffer(frames, "<i2").astype(np.float32) / 32767.0


def _per_capture_metrics(captures, params):
    rows = []
    for cap in captures:
        audio = _read_wav(CORPUS_DIR / cap["file"])
        truth = _window_truth(audio.size, cap["speech_intervals_samples"])
        row = {"capture": cap["file"]}
        for name, posterior in (
            ("baseline", _energy_posterior(audio)),
            ("candidate", _silero_posterior(audio, params)),
        ):
            n = min(posterior.size, truth.size)
            row[name] = _event_metrics(posterior[:n], truth[:n])
        rows.append(row)
    return rows


def _bootstrap_delta(rows, metric: str, rng) -> dict:
    deltas = np.array(
        [r["candidate"][metric] - r["baseline"][metric] for r in rows]
    )
    samples = np.array([
        deltas[rng.integers(0, deltas.size, deltas.size)].mean()
        for _ in range(BOOTSTRAP_REPETITIONS)
    ])
    return {
        "mean_delta": round(float(deltas.mean()), 4),
        "ci95_low": round(float(np.percentile(samples, 2.5)), 4),
        "ci95_high": round(float(np.percentile(samples, 97.5)), 4),
    }


def _edge_screen(params) -> dict:
    """Non-speech edge cases must not open; speech edge cases must."""
    if not (EDGE_DIR / "manifest.json").is_file():
        return {"available": False}
    manifest = json.loads((EDGE_DIR / "manifest.json").read_text())
    results = {}
    for cap in manifest["captures"]:
        audio = _read_wav(EDGE_DIR / cap["file"])
        truth_any = cap["contains_speech"]
        per_backend = {}
        for name, posterior in (
            ("baseline", _energy_posterior(audio)),
            ("candidate", _silero_posterior(audio, params)),
        ):
            open_ratio = float(np.mean(posterior >= OPEN_THRESHOLD))
            per_backend[name] = {
                "open_window_ratio": round(open_ratio, 3),
                "expected_speech": truth_any,
            }
        results[cap["case"]] = per_backend
    return {"available": True, "cases": results}


def main() -> int:
    parser = argparse.ArgumentParser()
    parser.add_argument("--max-captures", type=int, default=0)
    args = parser.parse_args()

    manifest = json.loads((CORPUS_DIR / "manifest.json").read_text())
    captures = [c for c in manifest["captures"] if c["split"] == "held_out"]
    if args.max_captures:
        captures = captures[: args.max_captures]

    from audioforge_tpu.models.silero import (
        discover_model_path,
        init_params,
        load_weights,
    )

    weight_path = discover_model_path()
    params = load_weights(weight_path) if weight_path else init_params()
    weight_provenance = (
        "converted-official" if weight_path else "seeded-structural"
    )

    rows = _per_capture_metrics(captures, params)
    rng = np.random.default_rng(SEED)
    macro_f1 = _bootstrap_delta(rows, "macro_f1", rng)
    event_recall = _bootstrap_delta(rows, "event_recall", rng)
    base_fo = float(np.mean([r["baseline"]["false_openings_per_min"] for r in rows]))
    cand_fo = float(np.mean([r["candidate"]["false_openings_per_min"] for r in rows]))
    fo_ok = cand_fo <= max(base_fo * 1.05, base_fo + 1.0)

    gates = {
        "macro_f1_noninferior": macro_f1["ci95_low"]
        >= MARGINS["held_out_macro_f1_ci95_low"],
        "event_recall_noninferior": event_recall["ci95_low"]
        >= MARGINS["held_out_event_recall_ci95_low"],
        "false_openings_within_five_percent_or_one": fo_ok,
        "weights_are_converted_official": weight_provenance == "converted-official",
    }
    retain_candidate = all(gates.values())

    report = {
        "schema_version": 1,
        "generated_at": utc_now(),
        "corpus": {
            "manifest": "models/vad_eval_corpus/manifest.json",
            "held_out_captures": len(captures),
            "license": manifest["license"],
        },
        "method": {
            "bootstrap_repetitions": BOOTSTRAP_REPETITIONS,
            "seed": SEED,
            "predefined_margins": MARGINS,
            "open_threshold": OPEN_THRESHOLD,
        },
        "weight_provenance": weight_provenance,
        "deltas_candidate_minus_baseline": {
            "macro_f1": macro_f1,
            "event_recall": event_recall,
            "false_openings_per_min": {
                "baseline_mean": round(base_fo, 3),
                "candidate_mean": round(cand_fo, 3),
            },
        },
        "edge_screen": _edge_screen(params),
        "gates": gates,
        "decision": {
            "baseline": "energy",
            "candidate": "silero-native",
            "retain_candidate": retain_candidate,
            "reason": (
                "Candidate meets every non-inferiority margin with converted "
                "official weights."
                if retain_candidate
                else "Candidate rejected: "
                + ", ".join(k for k, v in gates.items() if not v)
                + ". The explicit energy fallback remains the offline default."
            ),
        },
        "limitations": [
            "Synthetic corpus; real-speech selection re-runs this tool after "
            "installing converted official weights.",
        ],
    }
    write_report("vad-model-selection-report.json", report)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
