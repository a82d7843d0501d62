"""Capture and validate a quiet native-48-kHz microphone noise sample.

Counterpart of the reference's `python/tools/capture_microphone_noise.py`:
records room tone through the engine's sanitized recording tap
(`start_raw_recording`, post-mixdown/post-resample — the same signal the
calibration pipelines consume) and gates the capture on the reference's
quietness contract before it may serve as a noise reference:

- finite samples, >= 10 s duration, RMS above -120 dBFS (not dead),
- peak <= -12 dBFS,
- Silero speech evidence: active fraction (p >= 0.48) <= 2 %,
  posterior p95 <= 0.30.

On this headless framework the ``--input-device`` may be any registered
device — a real capture shim or a virtual source (the default
``Noise Input`` profiles a quiet synthetic room, useful for exercising
the gate contract end-to-end without hardware). Output WAV + assessment
JSON are hash-pinned alongside.
"""

from __future__ import annotations

import argparse
import hashlib
import json
import math
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

DEFAULT_OUTPUT = REPO_ROOT / "models" / "microphone-noise.wav"
MAX_ACTIVE_FRACTION = 0.02
MAX_VAD_P95 = 0.30
MAX_PEAK_DBFS = -12.0


def _dbfs(value: float) -> float:
    return 20.0 * math.log10(max(abs(value), 1e-12))


def assess_capture(audio, vad_probabilities) -> dict:
    """The reference's quietness contract, verbatim thresholds."""
    probabilities = np.asarray(vad_probabilities, np.float64)
    peak_dbfs = _dbfs(float(np.max(np.abs(audio))) if audio.size else 0.0)
    rms_dbfs = _dbfs(float(np.sqrt(np.mean(np.square(audio,
                                                     dtype=np.float64))
                                   + 1e-15)))
    active_fraction = (float(np.mean(probabilities >= 0.48))
                       if probabilities.size else 1.0)
    vad_p95 = (float(np.percentile(probabilities, 95))
               if probabilities.size else 1.0)
    checks = {
        "finite": bool(np.all(np.isfinite(audio))),
        "duration": audio.size >= 10 * 48_000,
        "speech_activity": active_fraction <= MAX_ACTIVE_FRACTION,
        "vad_p95": vad_p95 <= MAX_VAD_P95,
        "peak": peak_dbfs <= MAX_PEAK_DBFS,
        "non_silent": rms_dbfs >= -120.0,
    }
    return {
        "passed": all(checks.values()),
        "checks": checks,
        "peak_dbfs": peak_dbfs,
        "rms_dbfs": rms_dbfs,
        "vad_active_fraction": active_fraction,
        "vad_p95": vad_p95,
    }


def _energy_activity_proxy(audio: np.ndarray) -> np.ndarray:
    """Speech-evidence proxy for hosts without converted Silero weights:
    per-32 ms-frame RMS relative to the capture's p20 floor, mapped through
    a smoothstep 6..18 dB above floor. Same cadence and [0, 1] semantics as
    the posterior so the capture gates apply unchanged; the assessment
    records which backend produced the evidence."""
    frame = 1536  # one Silero window at 48 kHz
    n = audio.size // frame
    if n == 0:
        return np.ones(1)
    frames = audio[: n * frame].reshape(n, frame)
    rms_db = 20.0 * np.log10(
        np.sqrt(np.mean(np.square(frames, dtype=np.float64), axis=1)) + 1e-12
    )
    floor = np.percentile(rms_db, 20.0)
    x = np.clip((rms_db - floor - 6.0) / 12.0, 0.0, 1.0)
    return x * x * (3.0 - 2.0 * x)


def capture(processor, analyze_vad, *, duration_seconds: float):
    from audioforge_tpu.models.silero import weights_source

    processor.set_output_mute(True)
    processor.start_raw_recording(duration_seconds)
    deadline = time.monotonic() + duration_seconds * 8.0 + 30.0
    while not processor.is_recording_complete():
        if time.monotonic() >= deadline:
            raise TimeoutError("microphone-noise recording did not complete")
        time.sleep(0.05)
    audio = np.asarray(processor.stop_raw_recording(), np.float32)
    if weights_source() == "converted":
        probabilities = analyze_vad(audio, 48_000, 0.48)
        backend = "silero"
    else:
        # seeded structural weights hover near 0.5 on any input — never
        # gate on them (same honesty rule as analyze_offline_vad's
        # energy_fallback label, `analysis/vad.py:15-52`)
        probabilities = _energy_activity_proxy(audio)
        backend = "energy_fallback"
    assessment = assess_capture(audio, probabilities)
    assessment["vad_backend"] = backend
    return audio, assessment


def _write_wav(path: Path, audio: np.ndarray) -> str:
    pcm = np.clip(audio, -1.0, 1.0)
    with wave.open(str(path), "wb") as handle:
        handle.setnchannels(1)
        handle.setsampwidth(2)
        handle.setframerate(48_000)
        handle.writeframes((pcm * 32767.0).astype("<i2").tobytes())
    return hashlib.sha256(path.read_bytes()).hexdigest()


def main() -> int:
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--input-device", default="Noise Input")
    parser.add_argument("--output-device", default="Null Output")
    parser.add_argument("--duration", type=float, default=12.0)
    parser.add_argument("--output", type=Path, default=DEFAULT_OUTPUT)
    args = parser.parse_args()
    if not 10.0 <= args.duration <= 30.0:
        raise ValueError("--duration must be between 10 and 30 seconds")

    from audioforge_tpu import AudioProcessor
    from audioforge_tpu.models.silero import analyze_vad_probabilities

    processor = AudioProcessor()
    processor.realtime_pacing = False  # headless hosts record faster than RT
    try:
        processor.start(args.input_device, args.output_device)
        if int(processor.sample_rate()) != 48_000:
            raise RuntimeError(
                f"microphone runs at {processor.sample_rate()} Hz, "
                "expected 48000"
            )
        audio, assessment = capture(
            processor, analyze_vad_probabilities,
            duration_seconds=args.duration,
        )
    finally:
        processor.stop()

    args.output.parent.mkdir(parents=True, exist_ok=True)
    if assessment["passed"]:
        sha = _write_wav(args.output, audio)
        assessment["output"] = {
            "path": str(args.output.relative_to(REPO_ROOT)),
            "sha256": sha,
            "frames": int(audio.size),
        }
    args.output.with_suffix(".assessment.json").write_text(
        json.dumps(assessment, indent=2, sort_keys=True) + "\n"
    )
    status = "PASS" if assessment["passed"] else "FAIL"
    print(f"{status}: peak {assessment['peak_dbfs']:.1f} dBFS, "
          f"rms {assessment['rms_dbfs']:.1f} dBFS, "
          f"vad p95 {assessment['vad_p95']:.3f}, "
          f"active {assessment['vad_active_fraction']:.3f}")
    return 0 if assessment["passed"] else 1


if __name__ == "__main__":
    raise SystemExit(main())
