"""Non-blocking analysis worker.

Headless equivalent of the reference's `AnalysisWorker(QThread)`
(`python/mic_eq/ui/analysis_worker.py:17-121`): runs the Auto-EQ pipeline in
a background thread, reports step-by-step progress through plain callbacks
instead of Qt signals, supports cooperative cancellation, and reduces raw
exceptions to a generic user-facing failure message (the detailed error goes
to the log, never to the UI).
"""

from __future__ import annotations

import logging
import threading
from typing import Any, Callable

__all__ = ["AnalysisWorker", "ANALYSIS_STEPS"]

logger = logging.getLogger(__name__)

# step name → progress percentage when the step starts
ANALYSIS_STEPS = (
    ("voice_activity", 10),
    ("spectrum", 35),
    ("target", 55),
    ("optimize", 70),
    ("headroom", 90),
    ("done", 100),
)

GENERIC_FAILURE_MESSAGE = (
    "Analysis failed. Check the recording and try again."
)


class AnalysisWorker:
    """Background Auto-EQ analysis with progress/finished/failed callbacks."""

    def __init__(
        self,
        audio_data,
        sample_rate: float,
        target_preset: str = "broadcast",
        target_mode: str = "adaptive",
        smoothing_strength: str = "conservative",
        chain_settings: dict | None = None,
        *,
        on_progress: Callable[[str, int], None] | None = None,
        on_finished: Callable[[dict], None] | None = None,
        on_failed: Callable[[str], None] | None = None,
    ) -> None:
        self.audio_data = audio_data
        self.sample_rate = float(sample_rate)
        self.target_preset = target_preset
        self.target_mode = target_mode
        self.smoothing_strength = smoothing_strength
        self.chain_settings = chain_settings
        self._on_progress = on_progress or (lambda step, pct: None)
        self._on_finished = on_finished or (lambda result: None)
        self._on_failed = on_failed or (lambda message: None)
        self._stop_event = threading.Event()
        self._thread: threading.Thread | None = None
        self.result: dict[str, Any] | None = None
        self.error: str | None = None

    # -- lifecycle --------------------------------------------------------

    def start(self) -> None:
        if self._thread is not None:
            raise RuntimeError("analysis worker already started")
        self._thread = threading.Thread(
            target=self._run, name="auto-eq-analysis", daemon=True
        )
        self._thread.start()

    def stop(self) -> None:
        """Request cooperative cancellation (`analysis_worker.py:60-66`)."""
        self._stop_event.set()

    def join(self, timeout: float | None = None) -> bool:
        if self._thread is None:
            return True
        self._thread.join(timeout)
        return not self._thread.is_alive()

    @property
    def cancelled(self) -> bool:
        return self._stop_event.is_set()

    # -- worker body -------------------------------------------------------

    def _progress(self, step: str) -> bool:
        """Emit progress; returns False when cancellation was requested."""
        if self._stop_event.is_set():
            return False
        pct = dict(ANALYSIS_STEPS).get(step, 0)
        self._on_progress(step, pct)
        return True

    def _run(self) -> None:
        from ..analysis.auto_eq import AnalysisCancelled, analyze_auto_eq

        try:
            if not self._progress("voice_activity"):
                return
            result = analyze_auto_eq(
                self.audio_data,
                self.sample_rate,
                target_preset=self.target_preset,
                target_mode=self.target_mode,
                smoothing_strength=self.smoothing_strength,
                chain_settings=self.chain_settings,
                progress_callback=self._analysis_progress,
            )
            if self._stop_event.is_set():
                return
            self._progress("done")
            self.result = result
            self._on_finished(result)
        except AnalysisCancelled:
            return
        except Exception:
            # detailed error only in the log; generic message to the UI
            logger.exception("Auto-EQ analysis failed")
            if not self._stop_event.is_set():
                self.error = GENERIC_FAILURE_MESSAGE
                self._on_failed(GENERIC_FAILURE_MESSAGE)

    def _analysis_progress(self, step: str) -> bool:
        """Adapter passed into the pipeline; doubles as a cancel poll."""
        return self._progress(step)
