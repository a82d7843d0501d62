"""Generate the deterministic cross-take Auto-EQ evaluation corpus.

Counterpart of the reference's `python/tools/fetch_cross_take_corpus.py`
(which downloads pinned repeated readings of real speakers). This
environment has no egress and the repository stores no third-party audio,
so the corpus is synthesized: per speaker, TWO lexically distinct
"statements" (different syllabic rhythm/pitch contour) each recorded in
TWO takes (independent consonant-noise realisations, small level jitter) —
the structure the cross-take experiment needs (fit on one statement's
takes, hold the other statement out).

Each speaker carries a fixed spectral coloration (bass proximity boost,
presence dip, brightness tilt, …) applied in the FFT domain, so Auto-EQ
has a stable, correctable signature that repeats across takes and
statements. Voices are broadband: harmonic stack + formant-shaped
consonant noise + sibilant bursts (spectrum analysis needs evidence up to
12 kHz, unlike the narrowband VAD corpus voices).

Output: ``models/cross_take_eval/{manifest.json, takes/}`` with per-file
SHA-256 pins (same integrity model as the DeepFilter fullband corpus).
"""

from __future__ import annotations

import argparse
import hashlib
import json
import wave
from pathlib import Path

import numpy as np

REPO_ROOT = Path(__file__).resolve().parents[1]
DEFAULT_OUT = REPO_ROOT / "models" / "cross_take_eval"
SEED = 0xC7055
SAMPLE_RATE = 48_000
TAKE_SECONDS = 6.0
TARGET_RMS_DBFS = -22.0

# speaker -> (f0 Hz, syllable rate Hz, coloration curve control points
# [(hz, dB), ...] interpolated in log-f; the correctable signature)
SPEAKERS = {
    "ekaterina": (196.0, 2.6, [(80, 5.0), (200, 4.0), (800, 0.0),
                               (3000, -3.5), (8000, -1.0), (16000, -2.0)]),
    "felix": (110.0, 2.1, [(80, -4.0), (300, -2.0), (1200, 0.5),
                           (4000, 3.0), (10000, 4.0), (16000, 3.0)]),
    "greta": (225.0, 3.0, [(80, 1.0), (400, 2.5), (1000, -4.5),
                           (2500, -4.0), (6000, 1.5), (16000, 0.0)]),
    "henrik": (132.0, 2.3, [(80, 3.0), (250, 3.5), (900, 1.0),
                            (3500, -2.0), (9000, -4.0), (16000, -5.0)]),
    "ilona": (178.0, 2.8, [(80, -2.0), (500, 0.0), (1500, 2.0),
                           (5000, -1.0), (12000, 2.5), (16000, 2.0)]),
    "jasper": (121.0, 1.9, [(80, 2.0), (350, -3.0), (1100, -2.5),
                            (2800, 1.5), (7000, 2.0), (16000, 1.0)]),
}
STATEMENTS = ("alpha", "bravo")
TAKES = ("a", "b")


def _coloration_gain(freqs_hz: np.ndarray, points) -> np.ndarray:
    fs = np.maximum(np.asarray([p[0] for p in points], float), 1.0)
    db = np.asarray([p[1] for p in points], float)
    curve_db = np.interp(np.log10(np.maximum(freqs_hz, 1.0)),
                         np.log10(fs), db)
    return 10.0 ** (curve_db / 20.0)


def _apply_coloration(audio: np.ndarray, points) -> np.ndarray:
    spec = np.fft.rfft(audio)
    freqs = np.fft.rfftfreq(audio.size, 1.0 / SAMPLE_RATE)
    return np.fft.irfft(spec * _coloration_gain(freqs, points),
                        n=audio.size).astype(np.float32)


def _statement_voice(f0, rate, statement: str, take_rng) -> np.ndarray:
    """Broadband syllabic voice. The statement fixes the rhythm/contour
    (the lexical identity); the take rng drives only the noise-excited
    components and micro-jitter."""
    n = int(TAKE_SECONDS * SAMPLE_RATE)
    t = np.arange(n) / SAMPLE_RATE
    # statement-deterministic rhythm and pitch contour
    srng = np.random.default_rng(
        int.from_bytes(hashlib.sha256(
            f"{statement}:{f0}:{rate}".encode()).digest()[:8], "big")
    )
    phase = srng.uniform(0, 2 * np.pi)
    contour = 1.0 + 0.06 * np.sin(2 * np.pi * 0.35 * t + srng.uniform(0, 6.0))
    syllable = 0.5 * (1 + np.sin(2 * np.pi * rate * t + phase))
    active = syllable > 0.42
    env = active * np.clip((syllable - 0.42) / 0.2, 0.0, 1.0)

    vibrato = 1.0 + 0.008 * np.sin(2 * np.pi * 5.1 * t
                                   + take_rng.uniform(0, 2 * np.pi))
    inst_f = f0 * contour * vibrato
    phi = 2 * np.pi * np.cumsum(inst_f) / SAMPLE_RATE
    voice = np.zeros(n)
    for k, w in ((1, 1.0), (2, 0.55), (3, 0.5), (4, 0.35), (5, 0.2),
                 (6, 0.16), (8, 0.08), (10, 0.05)):
        voice += w * np.sin(k * phi)
    voice *= env

    # formant-shaped consonant noise (take-specific realisation)
    noise = take_rng.standard_normal(n)
    spec = np.fft.rfft(noise)
    freqs = np.fft.rfftfreq(n, 1.0 / SAMPLE_RATE)
    formants = (
        0.6 * np.exp(-0.5 * ((freqs - 1200) / 500) ** 2)
        + 0.5 * np.exp(-0.5 * ((freqs - 2600) / 700) ** 2)
        + 0.25 * np.exp(-0.5 * ((freqs - 4200) / 900) ** 2)
    )
    consonant = np.fft.irfft(spec * formants, n=n) * env
    voice += 0.45 * consonant / max(np.abs(consonant).max(), 1e-9)

    # sibilant bursts at syllable onsets (6-9 kHz)
    sib_noise = take_rng.standard_normal(n)
    sib_spec = np.fft.rfft(sib_noise)
    sib_band = np.exp(-0.5 * ((freqs - 7200) / 1400) ** 2)
    sib = np.fft.irfft(sib_spec * sib_band, n=n)
    onsets = np.flatnonzero(np.diff(active.astype(int)) > 0)
    sib_env = np.zeros(n)
    dur = int(0.05 * SAMPLE_RATE)
    ramp = np.hanning(2 * dur)[:dur]
    for onset in onsets[::2]:
        hi = min(onset + dur, n)
        sib_env[onset:hi] = ramp[:hi - onset]
    voice += 0.5 * sib * sib_env / max(np.abs(sib).max(), 1e-9)

    rms = np.sqrt(np.mean(np.square(voice[active]))) if active.any() else 1.0
    level_jitter_db = take_rng.uniform(-0.4, 0.4)
    gain = 10.0 ** ((TARGET_RMS_DBFS + level_jitter_db) / 20.0) / max(rms, 1e-9)
    return (voice * gain).astype(np.float32)


def _write_wav(path: Path, audio: np.ndarray) -> str:
    pcm = np.clip(audio, -1.0, 1.0)
    data = (pcm * 32767.0).astype("<i2").tobytes()
    with wave.open(str(path), "wb") as handle:
        handle.setnchannels(1)
        handle.setsampwidth(2)
        handle.setframerate(SAMPLE_RATE)
        handle.writeframes(data)
    return hashlib.sha256(path.read_bytes()).hexdigest()


def build_corpus(out_dir: Path) -> dict:
    takes_dir = out_dir / "takes"
    takes_dir.mkdir(parents=True, exist_ok=True)
    rng = np.random.default_rng(SEED)
    entries = []
    for speaker, (f0, rate, coloration) in sorted(SPEAKERS.items()):
        for statement in STATEMENTS:
            for take in TAKES:
                take_rng = np.random.default_rng(rng.integers(0, 2**63))
                voice = _statement_voice(f0, rate, statement, take_rng)
                voice = _apply_coloration(voice, coloration)
                # mic noise floor, take-specific
                voice = voice + (10.0 ** (-62.0 / 20.0)
                                 * take_rng.standard_normal(voice.size)
                                 ).astype(np.float32)
                name = f"{speaker}_{statement}_{take}.wav"
                sha = _write_wav(takes_dir / name, voice)
                entries.append({
                    "speaker": speaker,
                    "statement": statement,
                    "take": take,
                    "path": f"takes/{name}",
                    "sha256": sha,
                    "frames": int(voice.size),
                })
    manifest = {
        "schema_version": 1,
        "corpus": "cross-take-auto-eq-synthetic-v1",
        "license": "CC0 (synthesized in-repo, no third-party audio)",
        "seed": SEED,
        "sample_rate": SAMPLE_RATE,
        "take_seconds": TAKE_SECONDS,
        "speakers": sorted(SPEAKERS),
        "statements": list(STATEMENTS),
        "takes": list(TAKES),
        "entries": entries,
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
    print(f"wrote {len(manifest['entries'])} takes to "
          f"{args.out.relative_to(REPO_ROOT)}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
