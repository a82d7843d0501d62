"""Headless UI-logic layer: the testable decision logic behind the
reference desktop UI (`python/mic_eq/ui/`, SURVEY §2.7) without any
widget toolkit — configuration undo/redo history, health state machines,
stream-recovery heuristics, control-rate limiting, and app bootstrap."""

from .accessibility import (  # noqa: F401
    AccessibilityIssue,
    Control,
    audit_control_tree,
    bind_label,
    set_accessible,
    set_accessible_group,
)
from .analysis_worker import ANALYSIS_STEPS, AnalysisWorker  # noqa: F401
from .app_bootstrap import (  # noqa: F401
    application_root,
    bootstrap_application,
    configure_model_assets,
    trusted_runtime_roots,
)
from .config_history import (  # noqa: F401
    DEFAULT_HISTORY_LIMIT,
    BoundedConfigurationHistory,
    ConfigurationSnapshot,
    changed_configuration_paths,
    explicit_provenance_after_edit,
)
from .eq_curve import DragEvent, EqCurveModel  # noqa: F401
from .first_run_setup import FirstRunSetupFlow  # noqa: F401
from .health import input_health_state, output_health_state  # noqa: F401
from .rate_limiter import RateLimiter  # noqa: F401
from .stream_recovery import (  # noqa: F401
    StreamRecoveryManager,
    update_callback_stall_state,
)
from .theme import (  # noqa: F401
    PALETTE,
    SemanticPalette,
    contrast_ratio,
    meets_contrast,
    prefers_reduced_motion,
    relative_luminance,
)
