"""Config / persistence layer: versioned app config, presets with per-value
provenance, EQ schema v2, builtin catalogs."""

from .catalogs import (  # noqa: F401
    ANALYSIS_MAX_SPECTRAL_FLATNESS,
    ANALYSIS_MIN_DYNAMIC_RANGE,
    ANALYSIS_MIN_PEAK_COUNT,
    ANALYSIS_MIN_SNR,
    AUTO_EQ_DEFAULT_Q,
    EQ_FREQUENCIES,
    EQ_SCHEMA_VERSION,
    TARGET_CURVES,
    TargetCurve,
)
