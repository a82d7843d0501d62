"""DeepFilter runtime-config hardening decision record.

Counterpart of the reference's `python/tools/evaluate_deepfilter_hardening.py`
(`evaluation/deepfilter-hardening-report.json`): sweep the runtime knobs the
C API exposed (attenuation limit, post-filter beta), verify the validation
ranges reject out-of-contract values (atten 0.01–100 dB, beta 0–0.05,
`deepfilter_ffi.rs:44-79`), verify the attenuation limit actually bounds
per-frame attenuation, and retain the shipping configuration (30 dB, β=0).
Also probes the asset trust model: external weight paths require the
explicit `AUDIOFORGE_ALLOW_EXTERNAL_DF=1` opt-in.
"""

from __future__ import annotations

import argparse
import os
import wave
from pathlib import Path

import numpy as np

from _evaluation_common import _REPO_ROOT, utc_now, write_report

CORPUS_DIR = _REPO_ROOT / "models" / "deepfilter_fullband_eval"
FRAME = 480
ATTEN_GRID_DB = (6.0, 12.0, 30.0, 60.0)
BETA_GRID = (0.0, 0.02, 0.05)
SELECTED = {"atten_lim_db": 30.0, "post_filter_beta": 0.0}
INVALID_CONFIGS = (
    {"atten_lim_db": 0.0},
    {"atten_lim_db": 101.0},
    {"atten_lim_db": float("nan")},
    {"post_filter_beta": -0.01},
    {"post_filter_beta": 0.06},
    {"post_filter_beta": float("inf")},
)


def _read_wav(path: Path) -> np.ndarray:
    with wave.open(str(path), "rb") as handle:
        frames = handle.readframes(handle.getnframes())
    return np.frombuffer(frames, "<i2").astype(np.float32) / 32767.0


def _frame_attenuation_db(noisy: np.ndarray, out: np.ndarray, lat: int):
    """Per-frame attenuation of the aligned wet path."""
    n = min(out.size - lat, noisy.size)
    n -= n % FRAME
    x = noisy[:n].reshape(-1, FRAME)
    y = out[lat : lat + n].reshape(-1, FRAME)
    in_rms = np.sqrt(np.mean(x**2, axis=1))
    out_rms = np.sqrt(np.mean(y**2, axis=1))
    keep = in_rms > 1e-5
    return 20.0 * np.log10(np.maximum(in_rms[keep], 1e-9) /
                           np.maximum(out_rms[keep], 1e-9))


def main() -> int:
    parser = argparse.ArgumentParser()
    parser.add_argument("--pairs", type=int, default=2)
    args = parser.parse_args()

    import json

    manifest = json.loads((CORPUS_DIR / "manifest.json").read_text())
    pairs = manifest["pairs"][: args.pairs]

    from audioforge_tpu.models import dfn3

    params = dfn3.init_params()

    # 1. validation contract
    rejected = 0
    for bad in INVALID_CONFIGS:
        try:
            dfn3.validate_runtime_config(**bad)
        except ValueError:
            rejected += 1
    validation_ok = rejected == len(INVALID_CONFIGS)

    # 2. attenuation-limit sweep: max per-frame attenuation must respect the
    # configured bound (+1 dB measurement slack)
    sweep = []
    atten_bound_ok = True
    for atten in ATTEN_GRID_DB:
        worst = 0.0
        for pair in pairs:
            noisy = _read_wav(CORPUS_DIR / pair["noisy"])
            state = dfn3.processor_init(
                params, strength=1.0, low_latency=True, atten_lim_db=atten
            )
            state, _ = dfn3.processor_push(state, noisy)
            state, _ = dfn3.processor_process(state)
            state, out = dfn3.processor_pop(state, noisy.size)
            att = _frame_attenuation_db(
                noisy, np.asarray(out), dfn3.latency_samples(True)
            )
            if att.size:
                worst = max(worst, float(att.max()))
        ok = worst <= atten + 1.0
        atten_bound_ok &= ok
        sweep.append(
            {"atten_lim_db": atten, "max_frame_attenuation_db": round(worst, 2),
             "bound_respected": ok}
        )

    # 3. beta grid compiles and stays finite
    beta_ok = True
    noisy = _read_wav(CORPUS_DIR / pairs[0]["noisy"])[: FRAME * 40]
    for beta in BETA_GRID:
        state = dfn3.processor_init(
            params, strength=1.0, low_latency=True, post_filter_beta=beta
        )
        state, _ = dfn3.processor_push(state, noisy)
        state, _ = dfn3.processor_process(state)
        state, out = dfn3.processor_pop(state, noisy.size)
        beta_ok &= bool(np.isfinite(np.asarray(out)).all())

    # 4. asset trust model: external paths need the explicit opt-in
    from audioforge_tpu.models.dfn3 import external_paths_allowed

    saved = os.environ.pop("AUDIOFORGE_ALLOW_EXTERNAL_DF", None)
    try:
        default_denied = not external_paths_allowed()
        os.environ["AUDIOFORGE_ALLOW_EXTERNAL_DF"] = "1"
        optin_allowed = external_paths_allowed()
    finally:
        if saved is None:
            os.environ.pop("AUDIOFORGE_ALLOW_EXTERNAL_DF", None)
        else:
            os.environ["AUDIOFORGE_ALLOW_EXTERNAL_DF"] = saved
    trust_ok = default_denied and optin_allowed

    checks = {
        "invalid_configs_rejected": validation_ok,
        "attenuation_limit_bounds_attenuation": atten_bound_ok,
        "post_filter_beta_grid_finite": beta_ok,
        "external_assets_require_optin": trust_ok,
    }
    report = {
        "schema_version": 1,
        "generated_at": utc_now(),
        "corpus": {
            "manifest": "models/deepfilter_fullband_eval/manifest.json",
            "pairs_evaluated": len(pairs),
        },
        "validation_contract": {
            "atten_lim_db_range": [0.01, 100.0],
            "post_filter_beta_range": [0.0, 0.05],
            "invalid_configs_tested": len(INVALID_CONFIGS),
            "invalid_configs_rejected": rejected,
        },
        "attenuation_sweep": sweep,
        "selected_runtime_config": SELECTED,
        "checks": checks,
        "status": "passed" if all(checks.values()) else "failed",
        "decision": {
            "retained": SELECTED,
            "reason": (
                "The reference's shipping config (30 dB attenuation limit, "
                "post-filter off) is retained: the sweep confirms the limit "
                "is enforced and no beta value is needed for stability."
            ),
        },
        "limitations": [
            "Attenuation behaviour measured with seeded structural weights; "
            "the bound enforcement is weight-independent (applied in the "
            "gain stage).",
        ],
    }
    write_report("deepfilter-hardening-report.json", report)
    return 0 if all(checks.values()) else 1


if __name__ == "__main__":
    raise SystemExit(main())
