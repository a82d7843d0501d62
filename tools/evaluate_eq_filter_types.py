"""Manual typed-EQ decision record.

Framework re-run of `python/tools/evaluate_eq_filter_types.py`: every
manual filter type (bell, notch, low/high shelf, high/low pass at each
supported slope) is rendered over white noise through ``simulate_eq_v2``
and its measured response compared against the analytic
``eq_magnitude_response_v2`` the UI draws — the graph must tell the truth
about the audio. Measurement = steady tone probes at log-spaced
frequencies (band-averaged noise Welch biases steep slopes by several dB
within a third-octave). Gate: mean error <= 0.1 dB, max <= 0.3 dB per case
above the -35 dB measurement floor.
"""

from __future__ import annotations

import numpy as np

from _evaluation_common import utc_now, write_report

SAMPLE_RATE = 48000.0


def _flat_bands():
    freqs = [80, 160, 320, 640, 1280, 2500, 5000, 8000, 12000, 16000]
    return [("bell", float(f), 0.0, 1.41, 12, True) for f in freqs]


def _tone_response_db(simulate, bands, freqs):
    """Measured gain at each probe tone (steady-state RMS after 1 s)."""
    out = []
    t = np.arange(2 * int(SAMPLE_RATE)) / SAMPLE_RATE
    for f0 in freqs:
        probe = (0.1 * np.sin(2 * np.pi * f0 * t)).astype(np.float32)
        diag = simulate(probe, SAMPLE_RATE, bands, return_output_audio=True)
        y = np.asarray(diag["output_audio"])[int(SAMPLE_RATE):]
        rms = np.sqrt(np.mean(y.astype(np.float64) ** 2))
        out.append(20.0 * np.log10(max(rms, 1e-12) / (0.1 / np.sqrt(2.0))))
    return np.asarray(out)


def main() -> int:
    from audioforge_tpu import eq_magnitude_response_v2, simulate_eq_v2

    cases = [
        ("bell_boost", 4, ("bell", 1280.0, 6.0, 2.0, 12, True)),
        ("bell_cut", 4, ("bell", 1280.0, -6.0, 2.0, 12, True)),
        ("notch", 5, ("notch", 2500.0, 0.0, 8.0, 12, True)),
        ("low_shelf", 0, ("low_shelf", 120.0, -6.0, 0.707, 12, True)),
        ("high_shelf", 9, ("high_shelf", 8000.0, 4.0, 0.707, 12, True)),
        ("high_pass_12", 0, ("high_pass", 150.0, 0.0, 0.707, 12, True)),
        ("high_pass_24", 0, ("high_pass", 150.0, 0.0, 0.707, 24, True)),
        ("high_pass_48", 0, ("high_pass", 150.0, 0.0, 0.707, 48, True)),
        ("low_pass_24", 9, ("low_pass", 6000.0, 0.0, 0.707, 24, True)),
    ]

    probe_freqs = np.geomspace(60.0, 18000.0, 25)
    rows = []
    for name, band_index, band in cases:
        bands = _flat_bands()
        bands[band_index] = band
        analytic = np.asarray(
            eq_magnitude_response_v2(list(probe_freqs), bands, SAMPLE_RATE)
        )
        compare = analytic > -35.0
        measured = _tone_response_db(
            simulate_eq_v2, bands, probe_freqs[compare]
        )
        err = np.abs(measured - analytic[compare])
        rows.append({
            "case": name,
            "mean_abs_error_db": round(float(np.mean(err)), 4),
            "max_abs_error_db": round(float(np.max(err)), 4),
            "points": int(compare.sum()),
        })

    worst_mean = max(r["mean_abs_error_db"] for r in rows)
    worst_max = max(r["max_abs_error_db"] for r in rows)
    gates = {"mean_abs_error_db_max": 0.1, "max_abs_error_db_max": 0.3}
    passed = (worst_mean <= gates["mean_abs_error_db_max"]
              and worst_max <= gates["max_abs_error_db_max"])

    report = {
        "schema_version": 1,
        "generated_at_utc": utc_now(),
        "method": (
            "steady tone probes through simulate_eq_v2 vs the analytic "
            "eq_magnitude_response_v2 the UI renders"
        ),
        "predefined_gates": gates,
        "metrics": {"cases": rows, "worst_mean_abs_error_db": worst_mean,
                    "worst_max_abs_error_db": worst_max},
        "decision": {
            "manual_eq_types": "retain" if passed else "investigate",
            "reason": (
                "Rendered audio matches the drawn response for every type "
                "and slope." if passed else "A response gate failed."
            ),
        },
        "limitations": ["Tone probes below the -35 dB response floor skipped."],
    }
    write_report("eq-filter-types-report.json", report)
    return 0 if passed else 1


if __name__ == "__main__":
    raise SystemExit(main())
