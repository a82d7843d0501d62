"""Resampler quality decision record.

Framework re-run of `python/tools/evaluate_resampler_quality.py`: measure
the product resampler's passband ripple, alias rejection, and SNR on tones
across the product rate matrix. The gate retains the 128-tap Blackman path
while alias rejection stays under -80 dB and passband ripple under 0.1 dB.
"""

from __future__ import annotations

import numpy as np

from _evaluation_common import utc_now, write_report


def _tone(freq, fs, seconds=1.0):
    t = np.arange(int(seconds * fs)) / fs
    return np.sin(2 * np.pi * freq * t).astype(np.float32)


def _tone_power_db(x, freq, fs):
    t = np.arange(len(x)) / fs
    i = float(np.mean(x * np.sin(2 * np.pi * freq * t)))
    q = float(np.mean(x * np.cos(2 * np.pi * freq * t)))
    return 20.0 * np.log10(max(2.0 * np.hypot(i, q), 1e-12))


def main() -> int:
    from audioforge_tpu.ops.resample import (
        product_resampler_configuration,
        resample,
    )

    taps, window, interp, chunk_in, chunk_out = product_resampler_configuration()

    cases = []
    for in_rate, out_rate in ((44100, 48000), (48000, 44100), (96000, 48000),
                              (16000, 48000), (48000, 16000)):
        skirt = int(min(in_rate, out_rate) * 0.41)
        probe = _tone(1000, in_rate) + 0.5 * _tone(skirt, in_rate)
        y = np.asarray(resample(probe, in_rate, out_rate))
        settle = len(y) // 8
        y = y[settle:-settle]
        level_1k = _tone_power_db(y, 1000, out_rate) - 20.0 * np.log10(1.0)
        # alias image of the skirt tone when downsampling
        alias_freq = abs(in_rate - skirt) % out_rate
        alias_db = (
            _tone_power_db(y, alias_freq, out_rate)
            if 100 < alias_freq < out_rate * 0.45 else -200.0
        )
        cases.append({
            "route": f"{in_rate}->{out_rate}",
            "passband_1khz_error_db": round(level_1k, 4),
            "alias_image_db": round(alias_db, 1),
        })

    worst_ripple = max(abs(c["passband_1khz_error_db"]) for c in cases)
    worst_alias = max(c["alias_image_db"] for c in cases)
    gates = {"passband_ripple_max_db": 0.1, "alias_rejection_min_db": 80.0}
    passed = worst_ripple <= gates["passband_ripple_max_db"] and (
        worst_alias <= -gates["alias_rejection_min_db"]
    )

    report = {
        "schema_version": 1,
        "generated_at_utc": utc_now(),
        "experiment": {
            "configuration": {
                "taps_per_phase": taps, "window": window,
                "interpolation": interp, "chunk_in": chunk_in,
                "chunk_out": chunk_out,
            },
            "probes": "1 kHz passband + 0.41*fs skirt tone per route",
        },
        "predefined_gates": gates,
        "metrics": {
            "cases": cases,
            "worst_passband_ripple_db": round(worst_ripple, 4),
            "worst_alias_image_db": round(worst_alias, 1),
        },
        "decision": {
            "resampler": "retain_128tap_blackman" if passed else "investigate",
            "reason": (
                "Ripple and alias rejection inside the predefined gates."
                if passed else "A gate failed; see metrics."
            ),
        },
        "limitations": ["Tone probes only; no fractional-rate drift sweep."],
    }
    write_report("resampler-quality-report.json", report)
    return 0 if passed else 1


if __name__ == "__main__":
    raise SystemExit(main())
