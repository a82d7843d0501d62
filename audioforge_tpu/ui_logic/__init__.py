"""Headless UI-logic layer: the testable decision logic behind the
reference desktop UI (`python/mic_eq/ui/`, SURVEY §2.7) without any
widget toolkit — configuration undo/redo history, health state machines,
stream-recovery heuristics, control-rate limiting, and app bootstrap."""

from .config_history import (  # noqa: F401
    DEFAULT_HISTORY_LIMIT,
    BoundedConfigurationHistory,
    ConfigurationSnapshot,
    changed_configuration_paths,
    explicit_provenance_after_edit,
)
from .first_run_setup import FirstRunSetupFlow  # noqa: F401
from .health import input_health_state, output_health_state  # noqa: F401
from .rate_limiter import RateLimiter  # noqa: F401
from .stream_recovery import (  # noqa: F401
    StreamRecoveryManager,
    update_callback_stall_state,
)
