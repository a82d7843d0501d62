"""Build a deterministic labeled VAD corpus from seeded synthetic signals.

Counterpart of the reference's `python/tools/build_vad_evaluation_corpus.py`,
which assembles a labeled corpus from pinned public speech/noise recordings
(FSDD + ESC-50). This environment has no network egress and the repository
policy stores no third-party audio, so the corpus is generated in-process:
speaker-profiled syllabic harmonic "speech" (distinct pitch/formant/rate per
speaker) mixed with category-shaped noise at a controlled SNR grid, with
exact speech-interval labels, speaker→split assignment, and a hash-pinned
manifest (CC0 — every sample is computed from the seed).

Output: ``models/vad_eval_corpus/{manifest.json, *.wav}``.
"""

from __future__ import annotations

import argparse
import hashlib
import json
import sys
import wave
from pathlib import Path

import numpy as np

REPO_ROOT = Path(__file__).resolve().parents[1]
if str(REPO_ROOT) not in sys.path:
    sys.path.insert(0, str(REPO_ROOT))
DEFAULT_OUT = REPO_ROOT / "models" / "vad_eval_corpus"
SAMPLE_RATE = 48000
SEED = 0xA0D10F0
TARGET_SPEECH_RMS_DBFS = -22.0
PADDING_SECONDS = 0.4

# speaker profile: (f0_hz, formant_tilt, syllable_rate_hz) → split
SPEAKERS = {
    "alpha": ((118.0, 0.9, 2.1), "calibration"),
    "bravo": ((146.0, 1.0, 2.6), "calibration"),
    "carol": ((191.0, 1.15, 3.0), "development"),
    "delta": ((165.0, 0.8, 2.3), "development"),
    "echo": ((210.0, 1.25, 3.4), "held_out"),
    "fox": ((132.0, 1.05, 1.9), "held_out"),
}
NOISE_CATEGORIES = ("white", "pink", "hum", "keyboard", "engine", "babble")
SNR_GRID_DB = (20.0, 10.0, 4.0)


def _pink(rng, n):
    white = rng.standard_normal(n + 1024)
    b = np.array([0.049922035, -0.095993537, 0.050612699, -0.004408786])
    a = np.array([1.0, -2.494956002, 2.017265875, -0.522189400])
    out = np.zeros_like(white)
    # direct-form IIR, cheap and deterministic
    for i in range(len(white)):
        acc = b[0] * white[i]
        if i >= 1:
            acc += b[1] * white[i - 1] - a[1] * out[i - 1]
        if i >= 2:
            acc += b[2] * white[i - 2] - a[2] * out[i - 2]
        if i >= 3:
            acc += b[3] * white[i - 3] - a[3] * out[i - 3]
        out[i] = acc
    return out[1024:]


def _noise(category: str, rng, n: int) -> np.ndarray:
    t = np.arange(n) / SAMPLE_RATE
    if category == "white":
        x = rng.standard_normal(n)
    elif category == "pink":
        x = _pink(rng, n)
    elif category == "hum":
        x = sum(
            np.sin(2 * np.pi * 50.4 * k * t + rng.uniform(0, 2 * np.pi)) / k
            for k in (1, 2, 3)
        ) + 0.05 * rng.standard_normal(n)
    elif category == "keyboard":
        x = np.zeros(n)
        for start in rng.integers(0, max(1, n - 2400), size=max(1, n // 24000)):
            click = rng.standard_normal(2400) * np.exp(-np.arange(2400) / 300.0)
            x[start : start + 2400] += click
        x += 0.02 * rng.standard_normal(n)
    elif category == "engine":
        am = 0.6 + 0.4 * np.sin(2 * np.pi * 27.0 * t)
        x = am * _pink(rng, n)
    else:  # babble: overlapped talkers from the speech generator itself
        from audioforge_tpu.analysis.speech_synth import synthesize_babble

        x = synthesize_babble(rng, n / SAMPLE_RATE, n_talkers=6,
                              sample_rate=SAMPLE_RATE)[:n].astype(np.float64)
        if x.size < n:
            x = np.pad(x, (0, n - x.size))
    rms = np.sqrt(np.mean(np.square(x))) or 1.0
    return (x / rms).astype(np.float32)


def _speech(profile, rng, seconds: float):
    """Formant-synthesized utterance (glottal pulse train through 3 vowel
    resonators, fricative/plosive consonants, word prosody —
    `analysis/speech_synth.py`); returns (audio, speech_intervals_samples).
    The ``(f0, tilt, rate)`` profile triple is preserved from the original
    tonal generator so every trainer's speaker-randomization code keeps
    working; ``tilt`` maps to vocal-tract scale + high-formant emphasis."""
    from audioforge_tpu.analysis.speech_synth import (
        SpeechProfile,
        synthesize_utterance,
    )

    f0, tilt, rate = profile
    voice_profile = SpeechProfile(
        f0_hz=float(f0),
        f0_span=float(rng.uniform(0.25, 0.45)),
        tract_scale=float(np.clip(0.7 + 0.3 * tilt, 0.75, 1.25)),
        rate_hz=float(rate),
        breathiness=float(rng.uniform(0.05, 0.12)),
        tilt=float(tilt),
    )
    voice, raw_intervals = synthesize_utterance(
        rng, seconds, voice_profile, SAMPLE_RATE)
    n = voice.size
    active_samples = (np.concatenate([voice[lo:hi]
                                      for lo, hi in raw_intervals])
                      if raw_intervals else voice)
    rms = float(np.sqrt(np.mean(np.square(active_samples)))) or 1.0
    gain = 10.0 ** (TARGET_SPEECH_RMS_DBFS / 20.0) / max(rms, 1e-9)
    voice = (voice * gain).astype(np.float32)

    pad = int(PADDING_SECONDS * SAMPLE_RATE)
    audio = np.concatenate([np.zeros(pad, np.float32), voice,
                            np.zeros(pad, np.float32)])
    intervals = [(int(lo + pad), int(min(hi, n) + pad))
                 for lo, hi in raw_intervals]
    return audio, intervals


def _write_wav(path: Path, audio: np.ndarray) -> str:
    pcm = np.clip(audio, -1.0, 1.0)
    data = (pcm * 32767.0).astype("<i2").tobytes()
    with wave.open(str(path), "wb") as handle:
        handle.setnchannels(1)
        handle.setsampwidth(2)
        handle.setframerate(SAMPLE_RATE)
        handle.writeframes(data)
    return hashlib.sha256(path.read_bytes()).hexdigest()


def build_corpus(out_dir: Path, seconds_per_clip: float = 4.0) -> dict:
    out_dir.mkdir(parents=True, exist_ok=True)
    rng = np.random.default_rng(SEED)
    captures = []
    for speaker, (profile, split) in sorted(SPEAKERS.items()):
        for category in NOISE_CATEGORIES:
            for snr_db in SNR_GRID_DB:
                speech, intervals = _speech(profile, rng, seconds_per_clip)
                noise = _noise(category, rng, speech.size)
                speech_rms = 10.0 ** (TARGET_SPEECH_RMS_DBFS / 20.0)
                noise_gain = speech_rms / (10.0 ** (snr_db / 20.0))
                mixed = (speech + noise_gain * noise).astype(np.float32)
                name = f"{speaker}_{category}_snr{int(snr_db)}.wav"
                digest = _write_wav(out_dir / name, mixed)
                captures.append(
                    {
                        "file": name,
                        "sha256": digest,
                        "speaker": speaker,
                        "split": split,
                        "condition": category,
                        "snr_db": snr_db,
                        "sample_rate_hz": SAMPLE_RATE,
                        "speech_intervals_samples": intervals,
                    }
                )
    # NON-speech tone confounders (steady/AM harmonic stacks, mains hum):
    # an energy- or pitch-based detector scores these as speech; a real
    # discriminator must not. They carry empty speech intervals and are the
    # hard-negative half of the AUC gates.
    from audioforge_tpu.analysis.speech_synth import (
        TONE_CONFOUNDER_KINDS,
        tone_confounder,
    )

    splits = ("calibration", "development", "held_out")
    for idx, kind in enumerate(TONE_CONFOUNDER_KINDS):
        for rep in range(2):
            tone = tone_confounder(rng, seconds_per_clip, kind)
            level = 10.0 ** (TARGET_SPEECH_RMS_DBFS / 20.0)
            name = f"confounder_{kind}_{rep}.wav"
            digest = _write_wav(out_dir / name, tone * level)
            captures.append(
                {
                    "file": name,
                    "sha256": digest,
                    "speaker": None,
                    "split": splits[(idx * 2 + rep) % len(splits)],
                    "condition": f"confounder_{kind}",
                    "snr_db": None,
                    "sample_rate_hz": SAMPLE_RATE,
                    "speech_intervals_samples": [],
                }
            )
    manifest = {
        "schema_version": 2,
        "generator": ("formant speech synthesizer "
                      "(audioforge_tpu/analysis/speech_synth.py) + shaped "
                      "noise + tone confounders"),
        "license": "CC0 (fully synthetic, generated from the pinned seed)",
        "seed": SEED,
        "sample_rate_hz": SAMPLE_RATE,
        "target_speech_rms_dbfs": TARGET_SPEECH_RMS_DBFS,
        "padding_seconds": PADDING_SECONDS,
        "snr_grid_db": list(SNR_GRID_DB),
        "splits": sorted({s for _, (_, s) in SPEAKERS.items()}),
        "captures": captures,
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
    print(
        f"built {len(manifest['captures'])} captures in "
        f"{args.out.relative_to(REPO_ROOT) if args.out.is_relative_to(REPO_ROOT) else args.out}"
    )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
