"""Gate <-> suppressor processing-order decision record.

Re-runs the reference's ordering experiment
(`python/tools/evaluate_processing_order.py`) on this framework: generated
speech-in-noise takes processed both ways through
``simulate_gate_suppressor_order``, with predefined objective gates —
a candidate (suppressor-first) order must materially win on chatter /
false-closure / tail-retention without regressing pumping or runtime, else
the shipping order (gate before suppressor) is retained.
"""

from __future__ import annotations

import argparse

import numpy as np

from _evaluation_common import utc_now, write_report

SAMPLE_RATE = 48000
BLOCK = 480

GATES = {
    "material_win": (
        ">=10% chatter reduction, >=1 point false-closure reduction, "
        "or >=5% tail retention improvement"
    ),
    "active_and_tail_retention_min_ratio_vs_baseline": 0.98,
    "pumping_regression_max": 0.03,
    "runtime_ratio_max": 1.1,
}


def _take(seed: int, snr_db: float, seconds: float = 6.0):
    """Deterministic syllabic speech-like take + VAD truth at 10 ms."""
    rng = np.random.default_rng(seed)
    n = int(seconds * SAMPLE_RATE)
    t = np.arange(n) / SAMPLE_RATE
    syllable = (np.sin(2 * np.pi * 1.9 * t) > 0.15).astype(np.float32)
    voice = np.zeros(n, np.float32)
    for harmonic in (1, 2, 3, 5):
        voice += np.sin(2 * np.pi * 160.0 * harmonic * t).astype(np.float32) / harmonic
    speech = 0.22 * syllable * voice / np.max(np.abs(voice))
    noise_rms = 0.22 / (10.0 ** (snr_db / 20.0))
    noise = noise_rms * rng.standard_normal(n).astype(np.float32)
    audio = (speech + noise).astype(np.float32)
    blocks = -(-n // BLOCK)
    frame_active = syllable[: blocks * BLOCK].reshape(blocks, -1).mean(axis=1) > 0.5
    probs = np.where(frame_active, 0.9, 0.05).astype(np.float32)
    return audio, probs, frame_active


def _retention(output, active_mask):
    out = np.asarray(output, np.float32)
    blocks = out[: active_mask.size * BLOCK].reshape(active_mask.size, BLOCK)
    energy = np.sqrt(np.mean(blocks**2, axis=1))
    act = float(np.mean(energy[active_mask])) if active_mask.any() else 0.0
    tail_idx = np.flatnonzero(np.diff(active_mask.astype(int)) == -1) + 1
    tails = [i for i in tail_idx if i < active_mask.size]
    tail = float(np.mean(energy[tails])) if tails else 0.0
    return act, tail


def main() -> int:
    parser = argparse.ArgumentParser()
    parser.add_argument("--takes", type=int, default=6)
    args = parser.parse_args()

    from audioforge_tpu import simulate_gate_suppressor_order
    from audioforge_tpu.api import compressor_pumping_score

    rows = {"baseline": [], "candidate": []}
    for i in range(args.takes):
        snr = (18.0, 10.0, 4.0)[i % 3]
        audio, probs, active = _take(1000 + i, snr)
        input_act, input_tail = _retention(audio, active)
        for label, supp_first in (("baseline", False), ("candidate", True)):
            d = simulate_gate_suppressor_order(audio, probs, supp_first, 1.0)
            act, tail = _retention(np.array(d["output_audio"]), active)
            gains = np.array(d["gate_gain"], np.float32)
            gr_db = -20.0 * np.log10(np.maximum(gains, 1e-5))
            false_closure = float(np.mean(gains[active] < 0.25)) if active.any() else 0.0
            rows[label].append({
                "chatter": d["gate_chatter_event_count"],
                "false_closure": false_closure,
                "active_ratio": act / max(input_act, 1e-9),
                "tail_ratio": tail / max(input_tail, 1e-9),
                "pumping": compressor_pumping_score(gr_db, 100.0),
                "runtime_ms": d["runtime_ms"],
            })

    def med(label, key):
        return float(np.median([r[key] for r in rows[label]]))

    metrics = {
        "baseline_chatter_events": int(sum(r["chatter"] for r in rows["baseline"])),
        "candidate_chatter_events": int(sum(r["chatter"] for r in rows["candidate"])),
        "median_baseline_false_closure_rate": med("baseline", "false_closure"),
        "median_candidate_false_closure_rate": med("candidate", "false_closure"),
        "median_baseline_active_retained_ratio": med("baseline", "active_ratio"),
        "median_candidate_active_retained_ratio": med("candidate", "active_ratio"),
        "median_baseline_tail_retained_ratio": med("baseline", "tail_ratio"),
        "median_candidate_tail_retained_ratio": med("candidate", "tail_ratio"),
        "median_baseline_pumping_score": med("baseline", "pumping"),
        "median_candidate_pumping_score": med("candidate", "pumping"),
        "median_runtime_ratio": med("candidate", "runtime_ms")
        / max(med("baseline", "runtime_ms"), 1e-9),
    }

    min_ratio = GATES["active_and_tail_retention_min_ratio_vs_baseline"]
    non_regression = {
        "false_closure": metrics["median_candidate_false_closure_rate"]
        <= metrics["median_baseline_false_closure_rate"] + 1e-9,
        "active_retention": metrics["median_candidate_active_retained_ratio"]
        >= min_ratio * metrics["median_baseline_active_retained_ratio"],
        "tail_retention": metrics["median_candidate_tail_retained_ratio"]
        >= min_ratio * metrics["median_baseline_tail_retained_ratio"],
        "pumping": metrics["median_candidate_pumping_score"]
        <= metrics["median_baseline_pumping_score"]
        + GATES["pumping_regression_max"],
        "runtime": metrics["median_runtime_ratio"] <= GATES["runtime_ratio_max"],
    }
    chatter_win = (
        metrics["candidate_chatter_events"]
        <= 0.9 * metrics["baseline_chatter_events"]
        and metrics["baseline_chatter_events"] > 0
    )
    closure_win = (
        metrics["median_baseline_false_closure_rate"]
        - metrics["median_candidate_false_closure_rate"]
        >= 0.01
    )
    tail_win = (
        metrics["median_candidate_tail_retained_ratio"]
        >= 1.05 * metrics["median_baseline_tail_retained_ratio"]
    )
    material_win = chatter_win or closure_win or tail_win
    adopt = material_win and all(non_regression.values())

    report = {
        "schema_version": 1,
        "generated_at_utc": utc_now(),
        "experiment": {
            "takes": args.takes,
            "snr_db_cycle": [18.0, 10.0, 4.0],
            "suppressor_strength": 1.0,
        },
        "predefined_gates": GATES,
        "metrics": metrics,
        "non_regression": non_regression,
        "material_win": material_win,
        "decision": {
            "gate_suppressor": (
                "adopt_suppressor_before_gate"
                if adopt
                else "retain_gate_before_suppressor"
            ),
            "reason": (
                "Candidate met its material-win and non-regression gates."
                if adopt
                else "Candidate failed its predefined objective gates, so the "
                "shipping order (gate before suppressor) is retained."
            ),
        },
        "limitations": [
            "Generated speech-in-noise takes, not recorded voice.",
            "Single suppressor model (RNNoise graph with framework weights).",
        ],
    }
    write_report("processing-order-report.json", report)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
