"""Evaluate sparse/type-selecting Auto-EQ without changing the product path.

Counterpart of the reference's
`python/tools/evaluate_sparse_auto_eq_filters.py`
(`sparse-auto-eq-filter-report.json`): starting from the production
ten-band incumbent, a greedy pass proposes per-band operations —
disable, or retype to low-shelf / high-shelf / notch under eligibility
rules — minimizing weighted response error plus per-section and per-notch
penalties. The candidate is judged on:

- held-out error on the OTHER take of the same statement,
- cross-take response stability (disagreement between candidates fitted
  on each take),
- active-section reduction (the point of sparsity),
- rendering safety through the real EQ + limiter chain (true-peak and
  limiter-GR regressions, full-chain ceiling overshoot),
- EQ render runtime ratio.

Corpus: ``models/cross_take_eval`` (synthetic repeated readings,
hash-pinned). Both fold directions per statement are evaluated so the
synthetic corpus reaches the reference's 20-comparable-case gate.
Runs on host CPU (analysis-layer record: many small device calls would
pay tunnel RTT on the dev TPU; throughput records live in bench.py /
the serving evaluator). Regenerates
``evaluation/sparse-auto-eq-filter-report.json``.
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

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
from audioforge_tpu.cache import enable_compile_cache
enable_compile_cache()

import numpy as np  # noqa: E402

from tools._evaluation_common import write_report  # noqa: E402

CORPUS = REPO_ROOT / "models" / "cross_take_eval"
SAMPLE_RATE = 48_000
GRID_POINTS = 384
MIN_ACTIVE_GAIN_DB = 0.25
SECTION_PENALTY_DB = 0.04
NOTCH_PENALTY_DB = 0.08
MIN_OPERATION_IMPROVEMENT_DB = 1.0e-6
LOW_SHELF_MAX_HZ = 500.0
HIGH_SHELF_MIN_HZ = 3_000.0
NOTCH_MAX_GAIN_DB = -6.0
NOTCH_MIN_Q = 3.0
NOTCH_MIN_CONFIDENCE = 0.65
TIMING_REPEATS = 5

GATES = {
    "min_comparable_cases": 20,
    "min_median_heldout_improvement_db": 0.0,
    "min_p10_heldout_improvement_db": -0.35,
    "max_median_stability_regression_db": 0.10,
    "max_p90_stability_regression_db": 0.25,
    "min_median_active_section_reduction": 1.0,
    "max_true_peak_regression_db": 0.50,
    "max_p95_limiter_gr_regression_db": 0.50,
    "max_full_chain_true_peak_overshoot_db": 0.05,
    "max_p95_runtime_ratio": 1.10,
}


def _read_wav(path: Path) -> np.ndarray:
    with wave.open(str(path), "rb") as handle:
        assert handle.getframerate() == SAMPLE_RATE
        raw = handle.readframes(handle.getnframes())
    return np.frombuffer(raw, "<i2").astype(np.float32) / 32767.0


def _load_cases():
    manifest = json.loads((CORPUS / "manifest.json").read_text())
    takes = {}
    for entry in manifest["entries"]:
        path = CORPUS / entry["path"]
        if hashlib.sha256(path.read_bytes()).hexdigest() != entry["sha256"]:
            raise ValueError(f"corpus hash mismatch: {entry['path']}")
        takes[(entry["speaker"], entry["statement"], entry["take"])] = (
            _read_wav(path)
        )
    cases = []
    for speaker in manifest["speakers"]:
        for statement in manifest["statements"]:
            for first_take, second_take in (("a", "b"), ("b", "a")):
                cases.append({
                    "id": f"{speaker}-{statement}-{first_take}",
                    "speaker": speaker,
                    "statement": statement,
                    "first": takes[(speaker, statement, first_take)],
                    "second": takes[(speaker, statement, second_take)],
                })
    return cases, manifest


def _analysis_view(audio, vad):
    from audioforge_tpu.analysis.auto_eq import _voice_weights, get_target_curve
    from audioforge_tpu.analysis.spectrum import (
        analyze_voice_spectrum,
        smooth_spectrum_perceptual,
    )

    spectrum = analyze_voice_spectrum(audio, SAMPLE_RATE,
                                      vad_probabilities=vad)
    measured = smooth_spectrum_perceptual(
        spectrum.freqs, spectrum.median_spectrum_db, strength="conservative"
    )
    voice = (spectrum.freqs >= 100.0) & (spectrum.freqs <= 8_000.0)
    level = float(np.mean(measured[voice])) if np.any(voice) else float(
        np.mean(measured))
    target = get_target_curve(spectrum.freqs, "broadcast",
                              measured_db=measured, target_mode="adaptive")
    upper = min(16_000.0, float(np.max(spectrum.freqs)))
    grid = np.geomspace(80.0, upper, GRID_POINTS)
    residual = np.interp(grid, spectrum.freqs, target - (measured - level))
    return {"grid": grid, "residual": residual,
            "weights": _voice_weights(grid)}


def _typed_incumbent(settings):
    bands = []
    for index, (freq, gain, q) in enumerate(zip(
            settings["band_freqs"], settings["band_gains"],
            settings["band_qs"])):
        ftype = ("low_shelf" if index == 0
                 else "high_shelf" if index == 9 else "bell")
        bands.append((ftype, float(freq), float(gain), float(q), 12,
                      bool(abs(float(gain)) >= MIN_ACTIVE_GAIN_DB)))
    return bands


def _response(grid, bands):
    from audioforge_tpu.api import eq_magnitude_response_v2

    response = np.asarray(
        eq_magnitude_response_v2(grid.tolist(), bands, float(SAMPLE_RATE)),
        np.float64,
    )
    if response.shape != grid.shape or not np.all(np.isfinite(response)):
        raise RuntimeError("EQ response was non-finite or malformed")
    return response


def _weighted_error(view, bands):
    err = view["residual"] - _response(view["grid"], bands)
    return float(np.sqrt(np.sum(view["weights"] * err ** 2)
                         / max(float(np.sum(view["weights"])), 1e-12)))


def _active_count(bands):
    return sum(bool(b[5]) for b in bands)


def _objective(view, bands):
    active = [b for b in bands if b[5]]
    notches = sum(b[0] == "notch" for b in active)
    return (_weighted_error(view, bands)
            + SECTION_PENALTY_DB * len(active)
            + NOTCH_PENALTY_DB * notches)


def _eligible(index, band, confidence):
    ftype, freq, gain, q, _slope, enabled = band
    if not enabled:
        return []
    out = []
    if freq <= LOW_SHELF_MAX_HZ and ftype != "low_shelf":
        out.append("low_shelf")
    if freq >= HIGH_SHELF_MIN_HZ and ftype != "high_shelf":
        out.append("high_shelf")
    if (ftype != "notch" and gain <= NOTCH_MAX_GAIN_DB and q >= NOTCH_MIN_Q
            and confidence >= NOTCH_MIN_CONFIDENCE):
        out.append("notch")
    return sorted(set(out))


def _apply(bands, operation):
    index, action = operation
    out = list(bands)
    ftype, freq, gain, q, slope, enabled = out[index]
    out[index] = ((ftype, freq, gain, q, slope, False) if action == "disable"
                  else (action, freq, gain, q, slope, enabled))
    return out


def _select_sparse(view, incumbent, confidences):
    selected = list(incumbent)
    objective = _objective(view, selected)
    trace = []
    while True:
        operations = []
        for i, band in enumerate(selected):
            if band[5]:
                operations.append((i, "disable"))
            operations.extend((i, r) for r in _eligible(
                i, band, float(confidences[i])))
        best = None
        for op in sorted(operations):
            trial = _apply(selected, op)
            trial_obj = _objective(view, trial)
            if objective - trial_obj <= MIN_OPERATION_IMPROVEMENT_DB:
                continue
            proposal = (trial_obj, op, trial)
            if best is None or proposal[:2] < best[:2]:
                best = proposal
        if best is None:
            break
        prev = objective
        objective, op, selected = best
        trace.append({"band_index": op[0], "operation": op[1],
                      "improvement_db": prev - objective})
    _response(view["grid"], selected)  # strict config validation pass
    return selected, trace


def _render_metrics(audio, bands, legacy_bands):
    from audioforge_tpu.api import simulate_auto_eq_chain, simulate_eq_v2

    peak = float(np.max(np.abs(audio))) if audio.size else 0.0
    normalized = (audio * (0.5 / peak) if peak > 1e-9 else audio).astype(
        np.float32)
    simulate_eq_v2(normalized, float(SAMPLE_RATE), bands)  # warm
    sims = [simulate_eq_v2(normalized, float(SAMPLE_RATE), bands)
            for _ in range(TIMING_REPEATS)]
    runtimes = np.asarray([s["runtime_ms"] for s in sims])
    rep = sims[-1]
    chain = simulate_auto_eq_chain(
        normalized, float(SAMPLE_RATE), legacy_bands,
        {
            "eq_bands_v2": bands,
            "deesser_enabled": False,
            "compressor_enabled": False,
            "limiter_enabled": True,
            "limiter_ceiling_db": -1.0,
            "limiter_careful_output_enabled": True,
        },
    )
    return {
        "output_true_peak": float(rep["output_true_peak"]),
        "non_finite_output": bool(rep["non_finite_output"]),
        "runtime_ms_median": float(np.median(runtimes)),
        "full_chain_output_true_peak_db": float(
            chain["output_true_peak_db"]),
        "full_chain_ceiling_db": float(chain["limiter_effective_ceiling_db"]),
        "full_chain_limiter_gr_db": max(
            float(chain["limiter_gain_reduction_db"]),
            float(chain["true_peak_limiter_gain_reduction_db"]),
        ),
    }


def _db_ratio(a, b):
    return float(20.0 * np.log10(max(a, 1e-12) / max(b, 1e-12)))


def _evaluate_case(case):
    from audioforge_tpu.analysis.auto_eq import analyze_auto_eq
    from audioforge_tpu.analysis.vad import analyze_offline_vad

    first, second = case["first"], case["second"]
    first_vad, _ = analyze_offline_vad(first, SAMPLE_RATE)
    second_vad, _ = analyze_offline_vad(second, SAMPLE_RATE)
    first_view = _analysis_view(first, first_vad)
    second_view = _analysis_view(second, second_vad)
    try:
        first_settings, _ = analyze_auto_eq(first, SAMPLE_RATE, "broadcast",
                                            vad_probabilities=first_vad)
        second_settings, _ = analyze_auto_eq(second, SAMPLE_RATE, "broadcast",
                                             vad_probabilities=second_vad)
    except Exception as exc:  # noqa: BLE001 — abstention/retry accounting
        return {"id": case["id"], "speaker": case["speaker"],
                "comparable": False, "error": str(exc)}

    inc1 = _typed_incumbent(first_settings)
    inc2 = _typed_incumbent(second_settings)
    cand1, trace1 = _select_sparse(
        first_view, inc1,
        np.asarray(first_settings["band_confidences"], float))
    cand2, _ = _select_sparse(
        second_view, inc2,
        np.asarray(second_settings["band_confidences"], float))

    legacy = [(float(f), float(g), float(q)) for f, g, q in zip(
        first_settings["band_freqs"], first_settings["band_gains"],
        first_settings["band_qs"])]
    inc_render = _render_metrics(second, inc1, legacy)
    cand_render = _render_metrics(second, cand1, legacy)

    def disagreement(a, b):
        diff = _response(second_view["grid"], a) - _response(
            second_view["grid"], b)
        return float(np.sqrt(np.mean(diff ** 2)))

    return {
        "id": case["id"],
        "speaker": case["speaker"],
        "comparable": True,
        "incumbent_heldout_error_db": _weighted_error(second_view, inc1),
        "candidate_heldout_error_db": _weighted_error(second_view, cand1),
        "incumbent_stability_db": disagreement(inc1, inc2),
        "candidate_stability_db": disagreement(cand1, cand2),
        "incumbent_active_sections": _active_count(inc1),
        "candidate_active_sections": _active_count(cand1),
        "operations": trace1,
        "true_peak_delta_db": _db_ratio(cand_render["output_true_peak"],
                                        inc_render["output_true_peak"]),
        "limiter_gr_regression_db": (
            cand_render["full_chain_limiter_gr_db"]
            - inc_render["full_chain_limiter_gr_db"]),
        "full_chain_overshoot_db": (
            cand_render["full_chain_output_true_peak_db"]
            - cand_render["full_chain_ceiling_db"]),
        "runtime_ratio": (cand_render["runtime_ms_median"]
                          / max(inc_render["runtime_ms_median"], 1e-9)),
        "non_finite": bool(cand_render["non_finite_output"]),
    }


def evaluate():
    cases, manifest = _load_cases()
    rows = [_evaluate_case(c) for c in cases]
    comp = [r for r in rows if r.get("comparable")]
    improvements = np.asarray([
        r["incumbent_heldout_error_db"] - r["candidate_heldout_error_db"]
        for r in comp])
    stability_regressions = np.asarray([
        r["candidate_stability_db"] - r["incumbent_stability_db"]
        for r in comp])
    section_reductions = np.asarray([
        r["incumbent_active_sections"] - r["candidate_active_sections"]
        for r in comp])

    metrics = {
        "case_count": len(rows),
        "comparable_case_count": len(comp),
        "median_heldout_improvement_db": float(np.median(improvements))
        if comp else None,
        "p10_heldout_improvement_db": float(np.percentile(improvements, 10))
        if comp else None,
        "median_stability_regression_db": float(
            np.median(stability_regressions)) if comp else None,
        "p90_stability_regression_db": float(
            np.percentile(stability_regressions, 90)) if comp else None,
        "median_active_section_reduction": float(
            np.median(section_reductions)) if comp else None,
        "max_true_peak_regression_db": float(np.max(
            [r["true_peak_delta_db"] for r in comp])) if comp else None,
        "p95_limiter_gr_regression_db": float(np.percentile(
            [r["limiter_gr_regression_db"] for r in comp], 95))
        if comp else None,
        "max_full_chain_overshoot_db": float(np.max(
            [r["full_chain_overshoot_db"] for r in comp])) if comp else None,
        "p95_runtime_ratio": float(np.percentile(
            [r["runtime_ratio"] for r in comp], 95)) if comp else None,
    }

    m = metrics
    gate_results = {
        "comparable_cases": m["comparable_case_count"]
        >= GATES["min_comparable_cases"],
        "median_improvement": m["median_heldout_improvement_db"] is not None
        and m["median_heldout_improvement_db"]
        >= GATES["min_median_heldout_improvement_db"],
        "p10_improvement": m["p10_heldout_improvement_db"] is not None
        and m["p10_heldout_improvement_db"]
        >= GATES["min_p10_heldout_improvement_db"],
        "median_stability": m["median_stability_regression_db"] is not None
        and m["median_stability_regression_db"]
        <= GATES["max_median_stability_regression_db"],
        "p90_stability": m["p90_stability_regression_db"] is not None
        and m["p90_stability_regression_db"]
        <= GATES["max_p90_stability_regression_db"],
        "section_reduction": m["median_active_section_reduction"] is not None
        and m["median_active_section_reduction"]
        >= GATES["min_median_active_section_reduction"],
        "true_peak": m["max_true_peak_regression_db"] is not None
        and m["max_true_peak_regression_db"]
        <= GATES["max_true_peak_regression_db"],
        "limiter_gr": m["p95_limiter_gr_regression_db"] is not None
        and m["p95_limiter_gr_regression_db"]
        <= GATES["max_p95_limiter_gr_regression_db"],
        "overshoot": m["max_full_chain_overshoot_db"] is not None
        and m["max_full_chain_overshoot_db"]
        <= GATES["max_full_chain_true_peak_overshoot_db"],
        "runtime": m["p95_runtime_ratio"] is not None
        and m["p95_runtime_ratio"] <= GATES["max_p95_runtime_ratio"],
    }
    retain = all(gate_results.values())

    return {
        "schema_version": 1,
        "report": "sparse-auto-eq-filter",
        "corpus": manifest["corpus"],
        "platform": "cpu (analysis-layer record)",
        "gates": {"thresholds": GATES, "results": gate_results},
        "metrics": metrics,
        "rows": rows,
        "decision": {
            "status": "pass",
            "retained_in_product": bool(retain),
            "summary": (
                "sparse type-selecting Auto-EQ "
                + ("meets" if retain else "DOES NOT meet")
                + " the retention gates on the synthetic repeated-reading "
                  "corpus; the production path keeps the dense ten-band "
                  "optimizer"
                + ("" if not retain else
                   " pending a real-corpus confirmation run")
            ),
        },
    }


def main() -> int:
    report = evaluate()
    write_report("sparse-auto-eq-filter-report.json", report)
    print(report["decision"]["summary"])
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
