"""audioforge_tpu — TPU-native real-time audio processing framework.

A brand-new JAX/XLA/Pallas framework with the capabilities of AudioForge
(reference: FueledByRedBull/audio-forge): the full 48 kHz mic-processing chain
(input cleanup, smart gate, neural noise suppression, de-esser, 10-band
parametric EQ, compressor with speech-aware auto makeup, lookahead + true-peak
limiting) plus offline calibration pipelines (Auto-EQ, Auto Voice Setup,
latency calibration), re-designed TPU-first: every stage is a pure functional
``(state, block) -> (state, block)`` transform built from parallel scans,
batched over streams and calibration candidates with ``vmap``/``pjit``.
"""

__version__ = "0.1.0"

CORE_AVAILABLE = True

from .api import (  # noqa: E402,F401
    eq_magnitude_response,
    eq_magnitude_response_v2,
    simulate_eq_v2,
    measure_integrated_loudness,
    simulate_auto_eq_chain,
    simulate_auto_makeup_control,
    compressor_pumping_score,
)

__all__ = [
    "CORE_AVAILABLE",
    "eq_magnitude_response",
    "eq_magnitude_response_v2",
    "simulate_eq_v2",
    "measure_integrated_loudness",
    "simulate_auto_eq_chain",
    "simulate_auto_makeup_control",
    "compressor_pumping_score",
]
