"""Rerun the sparse Auto-EQ candidate-pool experiment on this framework.

Counterpart of the reference's `python/tools/evaluate_eq_candidate_pool.py`
(`eq-candidate-pool-report.json`): swap the production dynamic band-layout
selector (:func:`audioforge_tpu.analysis.auto_eq._select_band_layout`) for
an experimental enlarged-pool greedy selector — residual extrema plus a
log-spaced filler pool, greedy forward selection of 8 interior centers by
weighted least-squares fit — and measure, over the canonical synthetic
capture cases, whether it beats the production layout enough to retain:

- median relative improvement in weighted response error >= 5 %,
- >= 60 % of cases improved, lower decile regression >= -2 %,
- p95 runtime ratio <= 2.0, no risk-score increase (gain extremity,
  validation shrink, abstention).

The experiment stays out of the product path either way — this record
keeps the decision reproducible. Regenerates
``evaluation/eq-candidate-pool-report.json``.
"""

from __future__ import annotations

import sys
import time
from contextlib import contextmanager
from pathlib import Path

REPO_ROOT = Path(__file__).resolve().parents[1]
if str(REPO_ROOT) not in sys.path:
    sys.path.insert(0, str(REPO_ROOT))

import numpy as np  # noqa: E402

from tools._evaluation_common import write_report  # noqa: E402

CASES = (
    ("bassy", "broadcast"),
    ("bright", "flat"),
    ("dark", "podcast"),
    ("midscooped", "streaming"),
    ("proximity", "broadcast"),
    ("harsh", "flat"),
    ("extreme", "flat"),
    ("flat", "broadcast"),
)
POOL_SIZES = (12, 14, 16)
SEED = 991
RUNTIME_REPEATS = 3
GATE = {
    "required_median_relative_improvement": 0.05,
    "required_improved_fraction": 0.60,
    "maximum_lower_decile_regression": -0.02,
    "maximum_p95_runtime_ratio": 2.0,
    "maximum_risk_score_delta": 0.0,
}


def _spectrum(freqs: np.ndarray, kind: str) -> np.ndarray:
    """The canonical synthetic capture shapes (same family as the Auto-EQ
    scenario tests)."""
    base = np.full_like(freqs, -70.0)
    if kind == "bassy":
        return base + 10.0 / (1.0 + (freqs / 200.0) ** 2)
    if kind == "bright":
        return base + 10.0 * (freqs / 4000.0) ** 2 / (1.0 + (freqs / 4000.0) ** 2)
    if kind == "dark":
        return base - 10.0 / (1.0 + (8000.0 / freqs) ** 2)
    if kind == "midscooped":
        return base - 8.0 * np.exp(
            -((np.log10(freqs) - np.log10(1500.0)) ** 2) / (2.0 * 0.18 ** 2)
        )
    if kind == "proximity":
        return base + 15.0 / (1.0 + (freqs / 100.0) ** 3)
    if kind == "harsh":
        return base + 12.0 * np.exp(-((freqs - 4000.0) ** 2) / (2.0 * 1500.0 ** 2))
    if kind == "extreme":
        return base + 20.0 * np.sin(3.0 * np.log10(freqs / 100.0))
    return base


def _smooth_perturbation(freqs, rng) -> np.ndarray:
    knots = np.geomspace(float(freqs[0]), float(freqs[-1]), 18)
    values = rng.normal(0.0, 0.25, knots.size)
    return np.interp(np.log(freqs), np.log(knots), values)


def _pool_selector(pool_size: int):
    """Enlarged candidate pool + greedy forward selection (the experiment).
    Keeps the production selector's shelf endpoints; replaces the interior
    peak placement."""
    from audioforge_tpu.analysis import auto_eq as ae

    def select(dense_freqs, residual_db, weights):
        production_centers, _ = _PRODUCTION_SELECT(
            dense_freqs, residual_db, weights
        )
        interior = (dense_freqs >= 200.0) & (dense_freqs <= 9000.0)
        idxs = np.flatnonzero(interior)
        extrema = [
            int(i) for i in idxs[1:-1]
            if abs(residual_db[i]) >= abs(residual_db[i - 1])
            and abs(residual_db[i]) >= abs(residual_db[i + 1])
        ]
        extrema.sort(key=lambda i: abs(float(residual_db[i])) * weights[i],
                     reverse=True)
        candidates = [float(dense_freqs[i]) for i in extrema]
        candidates.extend(
            float(v) for v in np.geomspace(200.0, 9000.0,
                                           max(10, pool_size * 2))
        )
        unique: list[float] = []
        for center in candidates:
            if all(abs(np.log2(center / u)) >= 0.08 for u in unique):
                unique.append(center)
            if len(unique) >= pool_size - 2:
                break
        for center in production_centers[1:-1]:
            if all(abs(np.log2(center / u)) >= 0.02 for u in unique):
                unique.append(float(center))
        unique = unique[: max(pool_size - 2, ae.NUM_EQ_BANDS - 2)]

        cand_q = np.asarray([
            ae._estimate_q(dense_freqs, residual_db, c, ae.Q_MIN, ae.Q_MAX,
                           1.41)
            for c in unique
        ])
        basis = np.column_stack([
            ae.predict_eq_response(dense_freqs, [1.0], [cand_q[i]], [c])
            for i, c in enumerate(unique)
        ])
        wb = basis * np.sqrt(weights)[:, None]
        wt = residual_db * np.sqrt(weights)
        selected: list[int] = []
        remaining = list(range(len(unique)))
        for _ in range(ae.NUM_EQ_BANDS - 2):
            best_i, best_err = remaining[0], float("inf")
            for ci in remaining:
                trial = selected + [ci]
                gains, *_ = np.linalg.lstsq(wb[:, trial], wt, rcond=None)
                gains = np.clip(gains, -12.0, 12.0)
                err = float(np.sqrt(np.average(
                    (residual_db - basis[:, trial] @ gains) ** 2,
                    weights=weights,
                )))
                if err < best_err:
                    best_err, best_i = err, ci
            selected.append(best_i)
            remaining.remove(best_i)

        interiors = sorted(float(unique[i]) for i in selected)
        centers = np.asarray([float(production_centers[0]), *interiors,
                              float(production_centers[-1])])
        qs = np.asarray([
            ae._estimate_q(dense_freqs, residual_db, float(c), ae.Q_MIN,
                           ae.Q_MAX, 1.41)
            for c in centers
        ])
        return centers, qs

    return select


_PRODUCTION_SELECT = None


@contextmanager
def _patched_selector(selector):
    from audioforge_tpu.analysis import auto_eq as ae

    original = ae._select_band_layout
    ae._select_band_layout = selector
    try:
        yield
    finally:
        ae._select_band_layout = original


def _run(freqs, measured, target, selector):
    from audioforge_tpu.analysis import auto_eq as ae

    started = time.perf_counter()
    ctx = _patched_selector(selector) if selector is not None else None
    if ctx is not None:
        ctx.__enter__()
    try:
        result = ae.calculate_eq_bands(
            freqs, measured, target,
            spectral_repeatability=np.full(freqs.size, 0.90),
            spectral_uncertainty_db=np.full(freqs.size, 0.40),
            phonetic_coverage=0.90,
            voiced_window_ratio=0.90,
            analysis_confidence=0.90,
            global_snr_db=24.0,
            spectral_snr_db=np.full(freqs.size, 24.0),
            noise_reference_quality=0.95,
            noise_reference_status="usable",
        )
    finally:
        if ctx is not None:
            ctx.__exit__(None, None, None)
    return result, (time.perf_counter() - started) * 1000.0


def _bench(freqs, measured, target, selector):
    _run(freqs, measured, target, selector)  # warm caches
    runs = [_run(freqs, measured, target, selector)
            for _ in range(RUNTIME_REPEATS)]
    return runs[-1][0], float(np.median([r[1] for r in runs]))


def _error(freqs, measured, target, result) -> float:
    from audioforge_tpu.analysis.auto_eq import predict_eq_response

    voice = (freqs >= 100.0) & (freqs <= 8000.0)
    normalized = measured - float(np.mean(measured[voice]))
    response = predict_eq_response(
        freqs, result["band_gains"], result["band_qs"], result["band_freqs"]
    )
    weights = np.where(voice, 1.0, 0.25)
    return float(np.sqrt(np.average((normalized + response - target) ** 2,
                                    weights=weights)))


def _risk(result) -> float:
    gains = np.asarray(result["band_gains"], float)
    vscale = result.get("validation_gain_scale")
    vscale = 1.0 if vscale is None else float(vscale)
    return float(
        np.max(np.abs(gains)) / 12.0
        + max(0.0, 0.70 - vscale)
        + (2.0 if result.get("recommendation_status") == "abstain" else 0.0)
    )


def evaluate():
    global _PRODUCTION_SELECT
    from audioforge_tpu.analysis import auto_eq as ae

    _PRODUCTION_SELECT = ae._select_band_layout
    rng = np.random.default_rng(SEED)
    freqs = np.geomspace(60.0, 16000.0, 240)

    pools = {}
    for pool_size in POOL_SIZES:
        rows = []
        selector = _pool_selector(pool_size)
        for kind, preset in CASES:
            measured = _spectrum(freqs, kind) + _smooth_perturbation(freqs, rng)
            target = ae.get_target_curve(freqs, preset, measured_db=measured,
                                         target_mode="adaptive")
            baseline, base_ms = _bench(freqs, measured, target, None)
            candidate, cand_ms = _bench(freqs, measured, target, selector)
            base_err = _error(freqs, measured, target, baseline)
            cand_err = _error(freqs, measured, target, candidate)
            rows.append({
                "case": kind,
                "target_preset": preset,
                "baseline_error_db": base_err,
                "candidate_error_db": cand_err,
                "relative_improvement": float(
                    (base_err - cand_err) / max(base_err, 1e-9)
                ),
                "runtime_ratio": float(cand_ms / max(base_ms, 1e-9)),
                "risk_score_delta": float(_risk(candidate) - _risk(baseline)),
                "baseline_runtime_ms": base_ms,
                "candidate_runtime_ms": cand_ms,
            })
        improvements = np.asarray([r["relative_improvement"] for r in rows])
        summary = {
            "median_relative_improvement": float(np.median(improvements)),
            "improved_fraction": float(np.mean(improvements > 0.0)),
            "lower_decile_relative_improvement": float(
                np.quantile(improvements, 0.10)
            ),
            "p95_runtime_ratio": float(np.quantile(
                [r["runtime_ratio"] for r in rows], 0.95)),
            "maximum_risk_score_delta": float(np.max(
                [r["risk_score_delta"] for r in rows])),
        }
        gates = {
            "median_improvement": summary["median_relative_improvement"]
            >= GATE["required_median_relative_improvement"],
            "improved_fraction": summary["improved_fraction"]
            >= GATE["required_improved_fraction"],
            "lower_decile": summary["lower_decile_relative_improvement"]
            >= GATE["maximum_lower_decile_regression"],
            "runtime": summary["p95_runtime_ratio"]
            <= GATE["maximum_p95_runtime_ratio"],
            "risk": summary["maximum_risk_score_delta"]
            <= GATE["maximum_risk_score_delta"],
        }
        pools[str(pool_size)] = {
            "rows": rows,
            "summary": summary,
            "gates": gates,
            "retain": all(gates.values()),
        }

    retained = [p for p, data in pools.items() if data["retain"]]
    return {
        "schema_version": 1,
        "report": "eq-candidate-pool",
        "seed": SEED,
        "cases": [c for c, _ in CASES],
        "pool_sizes": list(POOL_SIZES),
        "gate_thresholds": GATE,
        "pools": pools,
        "decision": {
            "status": "pass",
            "retained_pools": retained,
            "product_path_changed": False,
            "summary": (
                ("pool sizes " + ",".join(retained) + " meet the gates"
                 if retained else
                 "no pool size meets the retention gates")
                + "; the production dynamic band layout stays unchanged "
                  "(experiment recorded for reproducibility, matching the "
                  "reference's decision)"
            ),
        },
    }


def main() -> int:
    report = evaluate()
    write_report("eq-candidate-pool-report.json", report)
    print(report["decision"]["summary"])
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
