"""AudioForge-TPU self-test (headless).

Plays a Barker-coded probe through the engine's output-probe path, captures
the raw input tap across a loopback route, and verifies the correlation and
round-trip latency with the production latency analyzer — mirroring
`python/tools/self_test.py` probe/capture/correlation flow end-to-end.

With no sound card available, the default route is a **virtual loopback**:
the output sink feeds a delay line that the input source replays
(``--loopback-delay-ms``, default 60). A real deployment passes its own
registered devices instead.
"""

from __future__ import annotations

import sys
from pathlib import Path

# allow running directly from a source checkout
_REPO_ROOT = str(Path(__file__).resolve().parents[1])
if _REPO_ROOT not in sys.path:
    sys.path.insert(0, _REPO_ROOT)

import argparse
import sys
import threading
import time
from dataclasses import dataclass

import numpy as np

SAMPLE_RATE = 48000


@dataclass
class SelfTestAttempt:
    confidence: float
    round_trip_ms: float
    message: str
    success: bool


class _LoopbackBus:
    """Output → input delay line shared by the loopback pair.

    ``loop_gain`` < 1 makes re-circulated echoes decay (a unity loop echoes
    the probe forever and the analyzer correctly rejects the measurement as
    ambiguous)."""

    def __init__(self, delay_ms: float, loop_gain: float = 0.35):
        from audioforge_tpu.runtime.ringbuffer import AudioRing

        self._ring = AudioRing(SAMPLE_RATE * 4)
        # pre-charge the line with silence = the loop delay
        self._ring.write(np.zeros(int(delay_ms / 1e3 * SAMPLE_RATE), np.float32))
        self._gain = float(loop_gain)
        self._lock = threading.Lock()

    def sink(self, block: np.ndarray) -> None:
        self._ring.write(np.asarray(block, np.float32) * self._gain)

    def source(self, n: int) -> np.ndarray:
        out = self._ring.read(n)
        if out.size < n:
            out = np.concatenate([out, np.zeros(n - out.size, np.float32)])
        return out


def run_attempt(processor, *, duration: float, delay: float,
                probe_duration_ms: float, expected_min_ms: float,
                expected_max_ms: float) -> SelfTestAttempt:
    from audioforge_tpu.analysis.latency_calibration import (
        analyze_latency,
        generate_probe_signal,
    )

    probe = generate_probe_signal(
        sample_rate=SAMPLE_RATE, duration_ms=probe_duration_ms
    )
    # mute the engine path: the probe renders post-mute in the output
    # callback, so the loop carries exactly one clean probe instead of an
    # ambiguous echo train
    processor.set_output_mute(True)
    processor.start_raw_recording(duration)
    start = time.time()
    played = False
    while True:
        elapsed = time.time() - start
        if not played and elapsed >= delay:
            print("Queueing probe on the selected output...")
            processor.queue_output_probe(probe)
            played = True
        if elapsed >= duration:
            break
        time.sleep(0.02)

    deadline = time.time() + 30.0
    while not processor.is_recording_complete() and time.time() < deadline:
        time.sleep(0.05)
    captured = np.asarray(processor.stop_raw_recording(), np.float32)
    processor.set_output_mute(False)
    if not played or not processor.is_output_probe_complete():
        return SelfTestAttempt(0.0, 0.0, "probe was not played", False)
    if captured.size == 0:
        return SelfTestAttempt(0.0, 0.0, "no audio captured", False)

    result = analyze_latency(
        probe,
        captured,
        sample_rate=SAMPLE_RATE,
        expected_latency_min_ms=expected_min_ms,
        expected_latency_max_ms=expected_max_ms,
        max_search_ms=1500.0,
    )
    return SelfTestAttempt(
        confidence=float(result.confidence),
        round_trip_ms=float(result.measured_round_trip_ms),
        message=str(result.message),
        success=bool(result.success),
    )


def main() -> int:
    parser = argparse.ArgumentParser(description="AudioForge-TPU self-test.")
    parser.add_argument("--duration", type=float, default=4.0,
                        help="Capture window seconds (default 4).")
    parser.add_argument("--delay", type=float, default=1.0,
                        help="Seconds before the probe plays (default 1).")
    parser.add_argument("--probe-ms", type=float, default=450.0)
    parser.add_argument("--attempts", type=int, default=2)
    parser.add_argument("--min-confidence", type=float, default=0.5)
    parser.add_argument("--loopback-delay-ms", type=float, default=60.0)
    parser.add_argument("--input-device", type=str, default=None,
                        help="Use this device instead of the loopback.")
    parser.add_argument("--output-device", type=str, default=None)
    args = parser.parse_args()

    from audioforge_tpu import (
        AudioProcessor,
        register_virtual_input,
        register_virtual_output,
    )

    if args.input_device is None and args.output_device is None:
        bus = _LoopbackBus(args.loopback_delay_ms)
        register_virtual_input("selftest-loopback-in", lambda: bus.source)
        register_virtual_output("selftest-loopback-out", lambda: bus.sink)
        in_dev, out_dev = "selftest-loopback-in", "selftest-loopback-out"
    else:
        in_dev, out_dev = args.input_device, args.output_device

    processor = AudioProcessor()
    # probe/capture fidelity: bypass gives the cleanest loop estimate,
    # matching the reference's calibration-time raw routing
    processor.set_bypass(True)
    try:
        print(processor.start(in_dev, out_dev))
        best: SelfTestAttempt | None = None
        for attempt in range(1, args.attempts + 1):
            result = run_attempt(
                processor,
                duration=args.duration,
                delay=args.delay,
                probe_duration_ms=args.probe_ms,
                expected_min_ms=5.0,
                expected_max_ms=1500.0,
            )
            print(
                f"Attempt {attempt}: success={result.success} "
                f"confidence={result.confidence:.3f} "
                f"round_trip={result.round_trip_ms:.2f}ms {result.message}"
            )
            if best is None or result.confidence > best.confidence:
                best = result
            if result.success and result.confidence >= args.min_confidence:
                print(
                    "Self-test PASSED: round trip "
                    f"{result.round_trip_ms:.2f} ms, confidence "
                    f"{result.confidence:.3f}."
                )
                return 0
        print(
            "Self-test FAILED: best confidence "
            f"{(best.confidence if best else 0.0):.3f} "
            f"({best.message if best else 'no attempt'})."
        )
        return 1
    finally:
        processor.stop()


if __name__ == "__main__":
    sys.exit(main())
