"""Stream-recovery decision heuristics (supervisor side).

Mirrors `python/mic_eq/ui/stream_recovery.py`: two independent stall
detectors polled by the supervisor timer, both pure state-machine logic —

- **output stall**: live input but silent output with a swollen output
  buffer, sustained past a grace period, rate-limited by a cooldown
  (`stream_recovery.py:69-103`);
- **callback stall**: the output callback stopped aging-in while the input
  callback stays fresh, after warmup, past grace, outside cooldown
  (`stream_recovery.py:9-46`).

When either fires, the caller invokes
:meth:`..runtime.processor.AudioProcessor.service_recovery`.
"""

from __future__ import annotations

import time
from dataclasses import dataclass

__all__ = ["StreamRecoveryManager", "update_callback_stall_state"]


def update_callback_stall_state(
    stall_started_at,
    now: float,
    input_cb_age_ms: int,
    output_cb_age_ms: int,
    processing_started_at,
    last_recovery_at: float,
    calibration_dialog_open: bool,
    warmup_s: float = 5.0,
    cooldown_s: float = 20.0,
    grace_s: float = 1.5,
    output_age_threshold_ms: int = 2000,
    input_age_threshold_ms: int = 1500,
):
    """Next callback-stall state and whether recovery should run."""
    if calibration_dialog_open or processing_started_at is None:
        return None, False
    if now - processing_started_at < warmup_s:
        return None, False
    if now - last_recovery_at < cooldown_s:
        return None, False
    suspicious = (
        output_cb_age_ms > output_age_threshold_ms
        and input_cb_age_ms < input_age_threshold_ms
    )
    if not suspicious:
        return None, False
    if stall_started_at is None:
        return now, False
    if now - stall_started_at < grace_s:
        return stall_started_at, False
    return None, True


@dataclass(slots=True)
class StreamRecoveryManager:
    """UI-free recovery heuristics state."""

    output_stall_started_at: float | None = None
    output_callback_stall_started_at: float | None = None
    input_callback_stall_started_at: float | None = None
    last_output_recovery_at: float = 0.0
    processing_started_at: float | None = None

    def mark_processing_started(self, now=None) -> None:
        self.processing_started_at = time.monotonic() if now is None else now
        self.output_stall_started_at = None
        self.output_callback_stall_started_at = None
        self.input_callback_stall_started_at = None

    def mark_processing_stopped(self) -> None:
        self.processing_started_at = None
        self.output_stall_started_at = None
        self.output_callback_stall_started_at = None
        self.input_callback_stall_started_at = None

    def maybe_recover_input_stall(
        self,
        *,
        input_cb_age_ms: int,
        calibration_dialog_open: bool,
        now=None,
        warmup_s: float = 5.0,
        cooldown_s: float = 20.0,
        grace_s: float = 1.5,
        input_age_threshold_ms: int = 2500,
    ) -> bool:
        """True when input-stall recovery should run: the input callback's
        heartbeat aged past 2.5 s, sustained past the grace period — the
        input half of the reference supervisor's dual heartbeat watch
        (`supervisor.rs:22-98`: "checks callback heartbeats"); a device
        that disappears without an error surfaces here."""
        current = time.monotonic() if now is None else now
        if calibration_dialog_open or self.processing_started_at is None:
            self.input_callback_stall_started_at = None
            return False
        if current - self.processing_started_at < warmup_s:
            return False
        if current - self.last_output_recovery_at < cooldown_s:
            return False
        if input_cb_age_ms <= input_age_threshold_ms:
            self.input_callback_stall_started_at = None
            return False
        if self.input_callback_stall_started_at is None:
            self.input_callback_stall_started_at = current
            return False
        if current - self.input_callback_stall_started_at < grace_s:
            return False
        self.input_callback_stall_started_at = None
        self.last_output_recovery_at = current
        return True

    def maybe_recover_output_stall(
        self,
        *,
        input_rms: float,
        output_rms: float,
        output_buf: int,
        calibration_dialog_open: bool,
        now=None,
        cooldown_s: float = 20.0,
        grace_s: float = 1.5,
    ) -> bool:
        """True when output-stall recovery should run
        (`stream_recovery.py:69-103`)."""
        if calibration_dialog_open:
            self.output_stall_started_at = None
            return False
        current = time.monotonic() if now is None else now
        if current - self.last_output_recovery_at < cooldown_s:
            self.output_stall_started_at = None
            return False
        suspicious = (
            input_rms > -50.0 and output_rms < -85.0 and output_buf > 20000
        )
        if not suspicious:
            self.output_stall_started_at = None
            return False
        if self.output_stall_started_at is None:
            self.output_stall_started_at = current
            return False
        if current - self.output_stall_started_at < grace_s:
            return False
        self.output_stall_started_at = None
        self.last_output_recovery_at = current
        return True

    def maybe_recover_callback_stall(
        self,
        *,
        input_cb_age_ms: int,
        output_cb_age_ms: int,
        calibration_dialog_open: bool,
        now=None,
    ) -> bool:
        """True when callback-stall recovery should run."""
        current = time.monotonic() if now is None else now
        new_state, should_recover = update_callback_stall_state(
            stall_started_at=self.output_callback_stall_started_at,
            now=current,
            input_cb_age_ms=input_cb_age_ms,
            output_cb_age_ms=output_cb_age_ms,
            processing_started_at=self.processing_started_at,
            last_recovery_at=self.last_output_recovery_at,
            calibration_dialog_open=calibration_dialog_open,
        )
        self.output_callback_stall_started_at = new_state
        if should_recover:
            self.last_output_recovery_at = current
        return should_recover
