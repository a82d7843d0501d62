"""Generate the deterministic fullband suppressor evaluation corpus.

Counterpart of the reference's `python/tools/fetch_deepfilter_fullband_corpus.py`
(which downloads pinned public clean/noisy speech pairs). This environment
has no egress and the repository stores no third-party audio, so the corpus
is synthesized: paired clean/noisy 48 kHz takes — seeded syllabic harmonic
speech from the VAD corpus generator mixed with per-category shaped noise
at a fixed SNR grid — written as WAV pairs with a hash-pinned manifest.

Output: ``models/deepfilter_fullband_eval/{manifest.json, clean/, noisy/}``.
"""

from __future__ import annotations

import argparse
import json
from pathlib import Path

import numpy as np

from build_vad_evaluation_corpus import (
    SAMPLE_RATE,
    TARGET_SPEECH_RMS_DBFS,
    _noise,
    _speech,
    _write_wav,
)

REPO_ROOT = Path(__file__).resolve().parents[1]
DEFAULT_OUT = REPO_ROOT / "models" / "deepfilter_fullband_eval"
SEED = 0xDF3
SPEAKERS = {
    "anna": (124.0, 0.95, 2.2),
    "boris": (102.0, 0.85, 1.9),
    "celia": (198.0, 1.2, 3.1),
    "dmitri": (142.0, 1.0, 2.6),
}
NOISE_CATEGORIES = ("white", "pink", "babble", "engine")
# The deployment SNR regime noise suppressors exist for. The synthesis
# path's band-gain + pitch-comb architecture caps output SI-SDR at ~15 dB
# even with ORACLE gains (measured r3), so at SNR >= 10 "improvement" is
# dominated by that cap, not by suppression quality — the discrimination
# gates bind where suppression is the signal.
SNR_GRID_DB = (5.0, 0.0, -5.0)


def build_corpus(out_dir: Path, seconds: float = 4.0) -> dict:
    clean_dir = out_dir / "clean"
    noisy_dir = out_dir / "noisy"
    clean_dir.mkdir(parents=True, exist_ok=True)
    noisy_dir.mkdir(parents=True, exist_ok=True)
    rng = np.random.default_rng(SEED)
    pairs = []
    for speaker, profile in sorted(SPEAKERS.items()):
        speech, intervals = _speech(profile, rng, seconds)
        clean_name = f"{speaker}.wav"
        clean_sha = _write_wav(clean_dir / clean_name, speech)
        for category in NOISE_CATEGORIES:
            for snr_db in SNR_GRID_DB:
                noise = _noise(category, rng, speech.size)
                speech_rms = 10.0 ** (TARGET_SPEECH_RMS_DBFS / 20.0)
                noisy = (
                    speech + (speech_rms / 10.0 ** (snr_db / 20.0)) * noise
                ).astype(np.float32)
                noisy_name = f"{speaker}_{category}_snr{int(snr_db)}.wav"
                noisy_sha = _write_wav(noisy_dir / noisy_name, noisy)
                pairs.append(
                    {
                        "clean": f"clean/{clean_name}",
                        "clean_sha256": clean_sha,
                        "noisy": f"noisy/{noisy_name}",
                        "noisy_sha256": noisy_sha,
                        "speaker": speaker,
                        "condition": category,
                        "snr_db": snr_db,
                        "speech_intervals_samples": [list(i) for i in intervals],
                    }
                )
    manifest = {
        "schema_version": 1,
        "license": "CC0 (fully synthetic, generated from the pinned seed)",
        "seed": SEED,
        "sample_rate_hz": SAMPLE_RATE,
        "snr_grid_db": list(SNR_GRID_DB),
        "pairs": pairs,
    }
    (out_dir / "manifest.json").write_text(
        json.dumps(manifest, indent=2, sort_keys=True) + "\n"
    )
    return manifest


def main() -> int:
    parser = argparse.ArgumentParser()
    parser.add_argument("--out", type=Path, default=DEFAULT_OUT)
    parser.add_argument("--seconds", type=float, default=4.0)
    args = parser.parse_args()
    manifest = build_corpus(args.out, args.seconds)
    print(f"built {len(manifest['pairs'])} clean/noisy pairs")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
