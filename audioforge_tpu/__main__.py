"""Headless command-line entry point.

The reference's ``python -m mic_eq`` launches the desktop app
(`python/mic_eq/__main__.py`); the TPU deployment is headless, so this
entry point exposes the serving/ops surface instead: run the live engine on
named devices, print diagnostics, and invoke the self-test/health-check
batteries.
"""

from __future__ import annotations

import argparse
import json
import sys
import time


def _strip_platform_args(raw_args: list[str]) -> list[str]:
    """Rebuild argv for the platform re-exec, dropping only the
    ``--platform`` option itself (both ``--platform X`` and
    ``--platform=X`` forms) — never positional args that happen to equal
    the platform string (a file named ``cpu`` must survive)."""
    kept, skip = [], False
    for a in raw_args:
        if skip:
            skip = False
            continue
        if a == "--platform":
            skip = True
            continue
        if a.startswith("--platform="):
            continue
        kept.append(a)
    return kept


def _cmd_devices(_args) -> int:
    from .runtime.processor import list_input_devices, list_output_devices

    for direction, devices in (("input", list_input_devices()),
                               ("output", list_output_devices())):
        for d in devices:
            default = " (default)" if d.is_default else ""
            print(f"{direction}: {d.name}{default} @ {d.sample_rate} Hz")
    return 0


def _cmd_run(args) -> int:
    from . import AudioProcessor, load_preset
    from .runtime.preset_io import apply_preset

    processor = AudioProcessor()
    if args.preset:
        warning = apply_preset(processor, load_preset(args.preset))
        if warning:
            print(f"note: {warning}")
    print(processor.start(args.input_device, args.output_device))
    try:
        deadline = time.monotonic() + args.duration if args.duration else None
        while deadline is None or time.monotonic() < deadline:
            time.sleep(1.0)
            processor.service_recovery()
            if args.verbose:
                d = processor.get_runtime_diagnostics()
                print(
                    f"in {d['input_crest_factor_db']:.0f}dB CF | "
                    f"lufs {d['output_short_term_lufs']:.1f} | "
                    f"gr {d['limiter_gain_reduction_db']:.1f} dB | "
                    f"drops {d['input_dropped_samples']}"
                )
    except KeyboardInterrupt:
        pass
    finally:
        processor.stop()
    return 0


def _read_wav_48k_mono(path):
    """Strictly validated WAV reader for the serve path: 48 kHz, mono,
    16-bit PCM only — a 24-bit or float32 file must error, never be
    silently reinterpreted as int16."""
    import wave

    import numpy as np

    with wave.open(str(path), "rb") as handle:
        if handle.getframerate() != 48000 or handle.getnchannels() != 1:
            raise ValueError(f"{path} must be 48 kHz mono")
        if handle.getsampwidth() != 2:
            raise ValueError(
                f"{path} must be 16-bit PCM (got sample width "
                f"{handle.getsampwidth() * 8} bits)")
        raw = handle.readframes(handle.getnframes())
    return np.frombuffer(raw, "<i2").astype(np.float32) / 32767.0


def _cmd_serve(args) -> int:
    """Bulk multi-stream processing: N WAVs advance together through one
    batched device step (`runtime/serving.py`), full live chain per
    stream."""
    import wave
    from pathlib import Path

    import numpy as np

    from .runtime import live_chain as lc
    from .runtime.serving import BLOCK, ServingConfig, ServingEngine

    paths = [Path(p) for p in args.inputs]
    if not paths:
        print("no inputs", file=sys.stderr)
        return 2

    audios = [_read_wav_48k_mono(p) for p in paths]
    n_blocks = max(-(-a.size // BLOCK) for a in audios)
    cfg = ServingConfig(
        capacity=len(paths),
        suppressor_model=(None if args.suppressor == "none"
                          else args.suppressor),
        vad_enabled=args.vad,
        chain=lc.LiveChainConfig(deesser_enabled=args.deesser),
    )
    engine = ServingEngine(cfg)
    outputs = [[] for _ in paths]
    for i, audio in enumerate(audios):
        slot = engine.attach(
            sink=(lambda i: lambda blk: outputs[i].append(blk.copy()))(i))
        padded = np.zeros(n_blocks * BLOCK, np.float32)
        padded[: audio.size] = audio
        engine.push(slot, padded)

    start = time.perf_counter()
    done = 0
    while done < n_blocks:
        span = min(args.span, n_blocks - done)
        engine.step_many(span)
        done += span
    elapsed = time.perf_counter() - start

    out_dir = Path(args.output_dir)
    out_dir.mkdir(parents=True, exist_ok=True)
    for path, audio, blocks in zip(paths, audios, outputs):
        y = np.concatenate(blocks)[: audio.size]
        out = out_dir / f"{path.stem}.processed.wav"
        with wave.open(str(out), "wb") as handle:
            handle.setnchannels(1)
            handle.setsampwidth(2)
            handle.setframerate(48000)
            handle.writeframes(
                (np.clip(y, -1.0, 1.0) * 32767.0).astype("<i2").tobytes())
        print(f"wrote {out}")
    audio_s = sum(a.size for a in audios) / 48000.0
    print(f"{len(paths)} streams, {audio_s:.1f} audio-s in {elapsed:.1f}s "
          f"({audio_s / max(elapsed, 1e-9):.1f}x realtime aggregate)")
    return 0


def _cmd_diagnostics(args) -> int:
    from . import AudioProcessor

    processor = AudioProcessor()
    print(processor.start(args.input_device, args.output_device))
    try:
        time.sleep(args.settle)
        print(json.dumps(processor.get_runtime_diagnostics(), indent=2,
                         default=str))
    finally:
        processor.stop()
    return 0


def main(argv=None) -> int:
    parser = argparse.ArgumentParser(
        prog="audioforge_tpu",
        description="TPU-native AudioForge: headless engine and ops entry.",
    )
    parser.add_argument(
        "--platform", default=None, choices=("cpu", "tpu"),
        help="force the JAX platform (some launchers pin it via a preloaded "
             "module, so plain env vars are ignored)")
    sub = parser.add_subparsers(dest="command", required=True)

    sub.add_parser("devices", help="list virtual audio endpoints")

    run = sub.add_parser("run", help="run the live engine")
    run.add_argument("--input-device", default=None)
    run.add_argument("--output-device", default=None)
    run.add_argument("--preset", default=None,
                     help="path to a preset .json to apply")
    run.add_argument("--duration", type=float, default=0.0,
                     help="seconds to run (0 = until interrupted)")
    run.add_argument("--verbose", action="store_true")

    diag = sub.add_parser("diagnostics",
                          help="start, settle, print the diagnostics dict")
    diag.add_argument("--input-device", default=None)
    diag.add_argument("--output-device", default=None)
    diag.add_argument("--settle", type=float, default=2.0)

    serve = sub.add_parser(
        "serve",
        help="process N WAVs together through the batched serving engine")
    serve.add_argument("inputs", nargs="+", help="48 kHz mono WAV files")
    serve.add_argument("--output-dir", default="processed")
    serve.add_argument("--suppressor", default="rnnoise",
                       choices=("none", "rnnoise", "deepfilter-ll",
                                "deepfilter"))
    serve.add_argument("--vad", action="store_true",
                       help="run batched in-step Silero VAD")
    serve.add_argument("--deesser", action="store_true")
    serve.add_argument("--span", type=int, default=100,
                       help="blocks per fused device call")

    args = parser.parse_args(argv)
    if args.platform:
        import os

        if os.environ.get("AUDIOFORGE_PLATFORM") != args.platform:
            # the package import (already done under ``python -m``) pins
            # the backend; re-exec with the env hook so the override lands
            # before any device constant materializes
            os.environ["AUDIOFORGE_PLATFORM"] = args.platform
            kept = _strip_platform_args(
                list(argv if argv is not None else sys.argv[1:]))
            os.execv(sys.executable,
                     [sys.executable, "-m", "audioforge_tpu"] + kept)
    import jax

    # persistent compile cache: the fused chain kernels are compile-heavy
    from audioforge_tpu.cache import enable_compile_cache
    enable_compile_cache()
    if args.command == "devices":
        return _cmd_devices(args)
    if args.command == "run":
        return _cmd_run(args)
    if args.command == "diagnostics":
        return _cmd_diagnostics(args)
    if args.command == "serve":
        return _cmd_serve(args)
    parser.error("unknown command")
    return 2


if __name__ == "__main__":
    sys.exit(main())
