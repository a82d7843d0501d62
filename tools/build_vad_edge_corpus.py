"""Build the deterministic VAD edge-case corpus.

Counterpart of the reference's `python/tools/build_vad_edge_corpus.py`:
adversarial captures the ordinary corpus misses — whisper-level speech,
loud non-speech transients, sustained tonal content (music-like), silence,
mains hum, and speech that starts mid-file with no leading pad. Labels are
exact because everything is synthesized from the pinned seed.

Output: ``models/vad_edge_corpus/{manifest.json, *.wav}``.
"""

from __future__ import annotations

import argparse
import json
from pathlib import Path

import numpy as np

from build_vad_evaluation_corpus import (
    SAMPLE_RATE,
    _noise,
    _speech,
    _write_wav,
)

REPO_ROOT = Path(__file__).resolve().parents[1]
DEFAULT_OUT = REPO_ROOT / "models" / "vad_edge_corpus"
SEED = 0xEDFE


def _case_whisper(rng):
    audio, intervals = _speech((150.0, 0.7, 2.0), rng, 4.0)
    return 0.06 * audio, intervals, "whisper_level_speech"


def _case_transients(rng):
    n = 4 * SAMPLE_RATE
    audio = 0.002 * rng.standard_normal(n).astype(np.float32)
    for start in (SAMPLE_RATE, 2 * SAMPLE_RATE, 3 * SAMPLE_RATE):
        burst = rng.standard_normal(1200) * np.exp(-np.arange(1200) / 120.0)
        audio[start : start + 1200] += 0.8 * burst.astype(np.float32)
    return audio, [], "loud_nonspeech_transients"


def _case_tonal(rng):
    t = np.arange(4 * SAMPLE_RATE) / SAMPLE_RATE
    audio = (0.2 * np.sin(2 * np.pi * 440.0 * t)
             + 0.12 * np.sin(2 * np.pi * 660.0 * t)).astype(np.float32)
    return audio, [], "sustained_tonal_music"


def _case_silence(rng):
    return np.zeros(4 * SAMPLE_RATE, np.float32), [], "digital_silence"


def _case_hum(rng):
    audio = 0.15 * _noise("hum", rng, 4 * SAMPLE_RATE)
    return audio, [], "mains_hum_only"


def _case_abrupt_start(rng):
    audio, intervals = _speech((170.0, 1.0, 2.8), rng, 3.0)
    pad = int(0.4 * SAMPLE_RATE)
    trimmed = audio[pad:]  # speech starts at sample 0
    shifted = [(max(0, lo - pad), hi - pad) for lo, hi in intervals]
    return trimmed, shifted, "speech_from_first_sample"


CASES = (_case_whisper, _case_transients, _case_tonal, _case_silence,
         _case_hum, _case_abrupt_start)


def build_corpus(out_dir: Path) -> dict:
    out_dir.mkdir(parents=True, exist_ok=True)
    rng = np.random.default_rng(SEED)
    captures = []
    for case in CASES:
        audio, intervals, label = case(rng)
        name = f"{label}.wav"
        digest = _write_wav(out_dir / name, audio)
        captures.append(
            {
                "file": name,
                "sha256": digest,
                "case": label,
                "sample_rate_hz": SAMPLE_RATE,
                "speech_intervals_samples": [list(i) for i in intervals],
                "contains_speech": bool(intervals),
            }
        )
    manifest = {
        "schema_version": 1,
        "license": "CC0 (fully synthetic, generated from the pinned seed)",
        "seed": SEED,
        "captures": captures,
    }
    (out_dir / "manifest.json").write_text(
        json.dumps(manifest, indent=2, sort_keys=True) + "\n"
    )
    return manifest


def main() -> int:
    parser = argparse.ArgumentParser()
    parser.add_argument("--out", type=Path, default=DEFAULT_OUT)
    args = parser.parse_args()
    manifest = build_corpus(args.out)
    print(f"built {len(manifest['captures'])} edge captures")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
