"""TPU-native DSP kernels: filters, dynamics, metering, scan primitives."""

from . import (  # noqa: F401
    util,
    scan,
    biquad,
    eq,
    gate,
    compressor,
    deesser,
    limiter,
    true_peak,
    loudness,
    routing,
)
