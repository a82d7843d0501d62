"""Suppressor model-family selection record: RNNoise vs DeepFilterNet3.

Counterpart of the reference's upstream model-family comparisons
(`evaluate_dpdfnet_evalset.py` over the pinned official EvalSet with
PESQ/STOI, and `dpdfnet-vs-deepfilternet3-report.json`): this environment
has no egress for the official eval set and no PESQ/STOI packages, so the
in-framework equivalents are compared on the hash-pinned synthetic
fullband corpus with license-clean metrics —

- SI-SDR improvement against the clean reference (per SNR tier),
- log-spectral distortion (LSD) of the enhanced output vs clean,
- the latency contract of each engine (480 / 480 / 1440 samples),
- host realtime factor per engine.

Scope note (recorded in the report): with seeded structural weights the
absolute enhancement numbers characterize the *implementation*, not the
published models; the quality gates become binding once converted official
archives are supplied (``tools/convert_model_weights.py`` +
``evaluate_converted_weight_parity.py``). The latency/finiteness/ordering
contracts bind regardless. Regenerates
``evaluation/suppressor-model-selection-report.json``.
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

CORPUS = REPO_ROOT / "models" / "deepfilter_fullband_eval"
MODELS = ("rnnoise", "deepfilter-ll", "deepfilter")
PAIRS_PER_SNR = 2
GATES = {
    "latency_samples": {"rnnoise": 480, "deepfilter-ll": 480,
                        "deepfilter": 1440},
    "outputs_finite": True,
    "min_si_sdr_improvement_db_when_converted": 0.5,
}


def _read_wav(path: Path) -> np.ndarray:
    with wave.open(str(path), "rb") as handle:
        raw = handle.readframes(handle.getnframes())
    return np.frombuffer(raw, "<i2").astype(np.float32) / 32767.0


def _si_sdr(reference, estimate):
    alpha = float(np.dot(estimate, reference)
                  / max(np.dot(reference, reference), 1e-12))
    target = alpha * reference
    noise = estimate - target
    return 10.0 * np.log10(max(np.dot(target, target), 1e-12)
                           / max(np.dot(noise, noise), 1e-12))


def _lsd(reference, estimate, n_fft=1024):
    def spec(x):
        n = (len(x) // n_fft) * n_fft
        frames = x[:n].reshape(-1, n_fft) * np.hanning(n_fft)
        return 20.0 * np.log10(np.abs(np.fft.rfft(frames, axis=1)) + 1e-9)

    a, b = spec(reference), spec(estimate)
    n = min(a.shape[0], b.shape[0])
    return float(np.mean(np.sqrt(np.mean((a[:n] - b[:n]) ** 2, axis=1))))


def _run_engine(model: str, noisy: np.ndarray):
    from audioforge_tpu.models import suppressor as supp

    engine = supp.engine_init(model)
    n = noisy.size
    started = time.perf_counter()
    engine, _ = supp.engine_push(engine, noisy)
    engine, _ = supp.engine_process(engine)
    engine, out = supp.engine_pop(engine, n)
    elapsed = time.perf_counter() - started
    lat = engine["latency_samples"]
    aligned = np.asarray(out)[lat:]
    return aligned, lat, elapsed, supp.engine_diagnostics(engine)


def evaluate():
    import os

    from audioforge_tpu.models.silero import weights_source

    os.environ.setdefault("AUDIOFORGE_ENABLE_DEEPFILTER", "1")
    manifest = json.loads((CORPUS / "manifest.json").read_text())

    # stratify: PAIRS_PER_SNR pairs per SNR tier
    by_snr: dict[float, list] = {}
    for pair in manifest["pairs"]:
        by_snr.setdefault(float(pair["snr_db"]), []).append(pair)
    selected = []
    for snr in sorted(by_snr):
        selected.extend(by_snr[snr][:PAIRS_PER_SNR])

    per_model: dict[str, dict] = {m: {"rows": []} for m in MODELS}
    for pair in selected:
        clean_path = CORPUS / pair["clean"]
        noisy_path = CORPUS / pair["noisy"]
        for path, key in ((clean_path, "clean_sha256"),
                          (noisy_path, "noisy_sha256")):
            if hashlib.sha256(path.read_bytes()).hexdigest() != pair[key]:
                raise ValueError(f"corpus hash mismatch: {path.name}")
        clean = _read_wav(clean_path)
        noisy = _read_wav(noisy_path)
        n = min(clean.size, noisy.size)
        for model in MODELS:
            enhanced, lat, elapsed, diag = _run_engine(model, noisy[:n])
            m = min(enhanced.size, n - lat)
            before = _si_sdr(clean[:m], noisy[:m])
            after = _si_sdr(clean[:m], enhanced[:m])
            per_model[model]["rows"].append({
                "pair": pair["noisy"],
                "snr_db": pair["snr_db"],
                "si_sdr_improvement_db": after - before,
                "lsd_db": _lsd(clean[:m], enhanced[:m]),
                "finite": bool(np.all(np.isfinite(enhanced))),
                "latency_samples": lat,
                "realtime_factor": elapsed / (n / 48_000.0),
                "backend_failed": diag["backend_failed"],
            })

    # real weights = trained in-repo archives or converted official ones;
    # bind each engine's enhancement gate on ITS model's resolved source
    from audioforge_tpu.models import dfn3 as _dfn3
    from audioforge_tpu.models import rnnoise as _rnnoise

    sources = {
        "rnnoise": _rnnoise.weights_source(),
        "deepfilter-ll": _dfn3.weights_source(),
        "deepfilter": _dfn3.weights_source(),
    }
    real = {m: sources[m] in ("trained", "converted") for m in MODELS}
    weights_converted = all(real.values())
    aggregates = {}
    checks = {}
    for model, data in per_model.items():
        rows = data["rows"]
        by_tier = {}
        for snr in sorted(by_snr):
            tier = [r["si_sdr_improvement_db"] for r in rows
                    if r["snr_db"] == snr]
            by_tier[f"snr_{snr:g}"] = float(np.median(tier))
        aggregates[model] = {
            "median_si_sdr_improvement_db": float(np.median(
                [r["si_sdr_improvement_db"] for r in rows])),
            "per_snr_median_improvement_db": by_tier,
            "median_lsd_db": float(np.median([r["lsd_db"] for r in rows])),
            "median_realtime_factor": float(np.median(
                [r["realtime_factor"] for r in rows])),
            "latency_samples": rows[0]["latency_samples"],
        }
        checks[f"{model}_latency"] = (
            rows[0]["latency_samples"] == GATES["latency_samples"][model])
        checks[f"{model}_finite"] = all(r["finite"] for r in rows)
        checks[f"{model}_no_backend_failures"] = not any(
            r["backend_failed"] for r in rows)
        if real[model]:
            checks[f"{model}_enhances"] = (
                aggregates[model]["median_si_sdr_improvement_db"]
                >= GATES["min_si_sdr_improvement_db_when_converted"])

    ranked = sorted(
        MODELS,
        key=lambda m: -aggregates[m]["median_si_sdr_improvement_db"],
    )
    return {
        "schema_version": 1,
        "report": "suppressor-model-selection",
        "corpus": {"manifest": "models/deepfilter_fullband_eval/manifest.json",
                   "pairs_evaluated": len(selected)},
        "weights": {
            "source": ("trained/converted" if weights_converted
                       else "seeded"),
            "per_engine_source": sources,
            "quality_gates_binding": weights_converted,
            "note": ("enhancement gates bind per engine whenever its "
                     "model resolves trained or converted archives; "
                     "seeded structural weights characterize the "
                     "implementation, not the published models"),
        },
        "aggregates": aggregates,
        "checks": checks,
        "ranking_by_si_sdr": ranked,
        "decision": {
            "status": "pass" if all(checks.values()) else "fail",
            "default_model": "rnnoise",
            "summary": (
                "latency/finiteness/failure contracts hold for all three "
                "engines; rnnoise stays the default (10 ms latency, lowest "
                "cost), DeepFilter variants remain env-gated opt-in — the "
                "reference's shipping posture"
                + ("" if weights_converted else
                   "; enhancement-quality ranking deferred to converted "
                   "official weights")
            ),
        },
    }


def main() -> int:
    report = evaluate()
    write_report("suppressor-model-selection-report.json", report)
    print(report["decision"]["summary"])
    return 0 if report["decision"]["status"] == "pass" else 1


if __name__ == "__main__":
    raise SystemExit(main())
