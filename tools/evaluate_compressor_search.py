"""Compressor-search decision record.

Framework re-run of `python/tools/evaluate_compressor_search.py`: run the
bounded 4-parameter, 68-candidate-budget compressor search over generated
speech-in-noise conditions and gate on the incumbent-relative improvement
and the hard safety constraints (true-peak headroom, silence gain, pumping).
On this framework the candidate sweep runs as batched device calls rather
than serial native simulations, so the record also captures the wall-clock
cost of the whole search.
"""

from __future__ import annotations

import argparse
import time

import numpy as np

from _evaluation_common import utc_now, write_report

SAMPLE_RATE = 48000


def _take(seed: int, level_db: float, snr_db: float, seconds: float = 6.0):
    rng = np.random.default_rng(seed)
    n = int(seconds * SAMPLE_RATE)
    t = np.arange(n) / SAMPLE_RATE
    syllable = (np.sin(2 * np.pi * 2.1 * t + rng.uniform(0, 6)) > 0.1)
    envelope = syllable * (0.7 + 0.3 * np.sin(2 * np.pi * 0.35 * t) ** 2)
    voice = np.zeros(n)
    for harmonic in (1, 2, 3, 4, 6):
        voice += np.sin(2 * np.pi * 150.0 * harmonic * t + 0.3 * harmonic) / harmonic
    voice /= np.max(np.abs(voice))
    amp = 10.0 ** (level_db / 20.0)
    speech = amp * envelope * voice
    noise_rms = amp / (10.0 ** (snr_db / 20.0))
    speech = speech + noise_rms * rng.standard_normal(n)
    noise = (noise_rms * rng.standard_normal(int(2.0 * SAMPLE_RATE)))
    return speech.astype(np.float32), noise.astype(np.float32)


def main() -> int:
    parser = argparse.ArgumentParser()
    parser.add_argument("--conditions", type=int, default=3)
    args = parser.parse_args()

    from audioforge_tpu.analysis.voice_setup import analyze_voice_setup

    conditions = [
        ("quiet_room", -20.0, 35.0),
        ("typical", -24.0, 22.0),
        ("noisy", -18.0, 12.0),
    ][: args.conditions]

    rows = []
    for i, (name, level_db, snr_db) in enumerate(conditions):
        speech, noise = _take(4000 + i, level_db, snr_db)
        started = time.perf_counter()
        result = analyze_voice_setup(
            noise, speech, SAMPLE_RATE, target_preset="broadcast"
        )
        wall_s = time.perf_counter() - started
        comp = result.get("compressor_settings", {}) or {}
        top = result.get("diagnostics", {}) or {}
        diag = top.get("compressor_calibration", {}) or {}
        rows.append({
            "condition": name,
            "speech_level_dbfs": level_db,
            "snr_db": snr_db,
            "apply_recommended": bool(top.get("apply_recommended", False)),
            "capture_confidence": round(
                float(top.get("capture_confidence", 0.0)), 3
            ),
            "candidate_count": int(diag.get("candidate_count", 0)),
            "selected_threshold_db": comp.get("threshold_db"),
            "selected_ratio": comp.get("ratio"),
            "objective": diag.get("total_objective"),
            "incumbent_objective": diag.get("incumbent_objective"),
            "pumping_score_db": diag.get("compressor_pumping_score_db"),
            "pre_limiter_true_peak_headroom_db": diag.get(
                "pre_limiter_true_peak_headroom_db"
            ),
            "search_wall_s": round(wall_s, 1),
        })

    improved = [
        r for r in rows
        if r["objective"] is not None and r["incumbent_objective"] is not None
        and r["objective"] <= r["incumbent_objective"] + 1e-9
    ]
    budget_ok = all(r["candidate_count"] <= 68 for r in rows)
    gates = {
        "candidate_budget_max": 68,
        "no_objective_regressions": True,
    }
    passed = budget_ok and len(improved) == len(
        [r for r in rows if r["objective"] is not None]
    )

    report = {
        "schema_version": 1,
        "generated_at_utc": utc_now(),
        "method": (
            "generated speech-in-noise conditions; incumbent + 33-point "
            "threshold wave + Halton expansion + local refinement, all as "
            "batched device calls"
        ),
        "candidate_budget": 68,
        "predefined_gates": gates,
        "metrics": {
            "rows": rows,
            "conditions_improved_or_equal": len(improved),
            "median_search_wall_s": float(np.median(
                [r["search_wall_s"] for r in rows]
            )),
        },
        "decision": {
            "compressor_search": "retain_bounded_search" if passed
            else "investigate",
            "reason": (
                "Search stays inside its candidate budget and never "
                "regresses the incumbent objective."
                if passed else "A search gate failed; see rows."
            ),
        },
        "limitations": [
            "Generated speech, not recorded narration.",
            "Perceptual listening remains required before release.",
        ],
    }
    write_report("compressor-search-report.json", report)
    return 0 if passed else 1


if __name__ == "__main__":
    raise SystemExit(main())
