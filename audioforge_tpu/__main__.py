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

    args = parser.parse_args(argv)
    if args.command == "devices":
        return _cmd_devices(args)
    if args.command == "run":
        return _cmd_run(args)
    if args.command == "diagnostics":
        return _cmd_diagnostics(args)
    parser.error("unknown command")
    return 2


if __name__ == "__main__":
    sys.exit(main())
