"""Build a deterministic child-voice VAD validation subset.

Counterpart of the reference's
`python/tools/fetch_vad_child_validation_corpus.py`, which range-reads a
6.8 GB public child-speech archive (Samromur Children) and downloads a
per-age/gender speaker selection. This environment has no egress and the
repository stores no third-party audio, so the subset is synthesized with
child-voice acoustics — the VAD robustness axis the reference validates:

- fundamentals 250–400 Hz (well above the adult corpus' 100–225 Hz),
- faster syllable rates and shorter utterances,
- lighter glottal weight (steeper harmonic roll-off, breathier noise
  floor between syllables).

Output follows the adult corpus' manifest schema
(``tools/build_vad_evaluation_corpus.py``) so the same backend evaluator
consumes it unchanged:
``python tools/evaluate_vad_models.py --corpus models/vad_child_corpus``.

Writes ``models/vad_child_corpus/{manifest.json, *.wav}`` (hash-pinned).
"""

from __future__ import annotations

import argparse
import json
from pathlib import Path

import numpy as np

from build_vad_evaluation_corpus import (
    PADDING_SECONDS,
    SAMPLE_RATE,
    TARGET_SPEECH_RMS_DBFS,
    _noise,
    _write_wav,
)

REPO_ROOT = Path(__file__).resolve().parents[1]
DEFAULT_OUT = REPO_ROOT / "models" / "vad_child_corpus"
SEED = 0xC411D
# child profiles: (f0 Hz, harmonic tilt, syllable rate Hz), split
CHILD_SPEAKERS = {
    "aldis": ((310.0, 0.7, 3.6), "validation"),
    "bjarni": ((265.0, 0.8, 3.2), "validation"),
    "dagny": ((395.0, 0.6, 4.0), "validation"),
    "einar": ((285.0, 0.75, 3.4), "validation"),
}
NOISE_CATEGORIES = ("white", "babble")
SNR_GRID_DB = (10.0, 5.0)


def _child_speech(profile, rng, seconds: float):
    """Child-voice variant of the adult generator: higher f0, faster
    syllables, steeper harmonic roll-off, breathy inter-syllable floor."""
    f0, tilt, rate = profile
    n = int(seconds * SAMPLE_RATE)
    t = np.arange(n) / SAMPLE_RATE
    phase = rng.uniform(0, 2 * np.pi)
    syllable = 0.5 * (1 + np.sin(2 * np.pi * rate * t + phase))
    active = syllable > 0.5  # shorter utterances than the adult 0.45
    vibrato = 1.0 + 0.015 * np.sin(2 * np.pi * 6.1 * t)
    voice = np.zeros(n)
    for k in (1, 2, 3, 4):
        weight = (1.0 / k ** 1.5) * (tilt if k in (2, 3) else 1.0)
        voice += weight * np.sin(
            2 * np.pi * f0 * k * np.cumsum(vibrato) / SAMPLE_RATE
        )
    voice *= active * np.clip((syllable - 0.5) / 0.18, 0.0, 1.0)
    # breathiness: low-level shaped noise riding the syllable envelope
    breath = rng.standard_normal(n) * 0.06 * syllable
    voice = voice + breath * active
    rms = np.sqrt(np.mean(np.square(voice[active]))) if active.any() else 1.0
    gain = 10.0 ** (TARGET_SPEECH_RMS_DBFS / 20.0) / max(rms, 1e-9)
    voice = (voice * gain).astype(np.float32)

    pad = int(PADDING_SECONDS * SAMPLE_RATE)
    audio = np.concatenate([np.zeros(pad, np.float32), voice,
                            np.zeros(pad, np.float32)])
    edges = np.flatnonzero(np.diff(active.astype(int)))
    bounds = np.concatenate([[0], edges + 1, [n]])
    intervals = []
    for lo, hi in zip(bounds[:-1], bounds[1:]):
        if active[lo]:
            intervals.append((int(lo + pad), int(hi + pad)))
    return audio, intervals


def build_corpus(out_dir: Path, seconds_per_clip: float = 4.0) -> dict:
    out_dir.mkdir(parents=True, exist_ok=True)
    rng = np.random.default_rng(SEED)
    captures = []
    for speaker, (profile, split) in sorted(CHILD_SPEAKERS.items()):
        for category in NOISE_CATEGORIES:
            for snr_db in SNR_GRID_DB:
                speech, intervals = _child_speech(profile, rng,
                                                  seconds_per_clip)
                noise = _noise(category, rng, speech.size)
                speech_rms = 10.0 ** (TARGET_SPEECH_RMS_DBFS / 20.0)
                noise_gain = speech_rms / (10.0 ** (snr_db / 20.0))
                mixed = (speech + noise_gain * noise).astype(np.float32)
                name = f"{speaker}_{category}_snr{int(snr_db)}.wav"
                digest = _write_wav(out_dir / name, mixed)
                captures.append({
                    "file": name,
                    "sha256": digest,
                    "speaker": speaker,
                    "split": split,
                    "condition": category,
                    "snr_db": snr_db,
                    "sample_rate_hz": SAMPLE_RATE,
                    "speech_intervals_samples": intervals,
                })
    manifest = {
        "schema_version": 1,
        "license": "CC0 (fully synthetic, generated from the pinned seed)",
        "corpus": "vad-child-validation-synthetic-v1",
        "seed": SEED,
        "sample_rate_hz": SAMPLE_RATE,
        "target_speech_rms_dbfs": TARGET_SPEECH_RMS_DBFS,
        "padding_seconds": PADDING_SECONDS,
        "snr_grid_db": list(SNR_GRID_DB),
        "splits": sorted({s for _, (_, s) in CHILD_SPEAKERS.items()}),
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
    print(f"wrote {len(manifest['captures'])} captures to "
          f"{args.out.relative_to(REPO_ROOT)}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
