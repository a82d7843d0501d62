"""Throttling rate limiter for control-surface updates.

Mirrors `python/mic_eq/ui/rate_limiter.py` without Qt: at most one call per
interval, the latest pending callable wins, and ``flush()`` applies the final
value immediately (slider-release semantics). Throttling — not debouncing —
so the first call in a burst fires immediately.

The deferred execution uses a ``threading.Timer`` in place of the
reference's ``QTimer``; all mutation is lock-protected so UI/control threads
can share one limiter.
"""

from __future__ import annotations

import threading
import time
from typing import Any, Callable

__all__ = ["RateLimiter"]


class RateLimiter:
    def __init__(self, interval_ms: int = 33):
        self.interval_ms = int(interval_ms)
        self._last_call_time = 0.0
        self._pending_fn: Callable[[], Any] | None = None
        self._timer: threading.Timer | None = None
        self._lock = threading.Lock()

    def call(self, fn: Callable[[], Any]) -> None:
        """Run ``fn`` now if the interval elapsed; otherwise stage it (the
        newest staged call replaces any older one)."""
        now = time.monotonic() * 1000.0
        with self._lock:
            elapsed = now - self._last_call_time
            if elapsed >= self.interval_ms:
                self._last_call_time = now
                run_now = fn
            else:
                self._pending_fn = fn
                if self._timer is None:
                    remaining = (self.interval_ms - elapsed) / 1000.0
                    self._timer = threading.Timer(
                        max(remaining, 0.0), self._execute_pending
                    )
                    self._timer.daemon = True
                    self._timer.start()
                return
        run_now()

    def _execute_pending(self) -> None:
        with self._lock:
            self._timer = None
            fn = self._pending_fn
            self._pending_fn = None
            if fn is not None:
                self._last_call_time = time.monotonic() * 1000.0
        if fn is not None:
            fn()

    def flush(self) -> None:
        """Apply any staged call immediately (slider release / teardown)."""
        with self._lock:
            if self._timer is not None:
                self._timer.cancel()
                self._timer = None
            fn = self._pending_fn
            self._pending_fn = None
            if fn is not None:
                self._last_call_time = time.monotonic() * 1000.0
        if fn is not None:
            fn()
