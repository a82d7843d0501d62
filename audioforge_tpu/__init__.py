"""audioforge_tpu — TPU-native real-time audio processing framework.

A brand-new JAX/XLA/Pallas framework with the capabilities of AudioForge
(reference: FueledByRedBull/audio-forge): the full 48 kHz mic-processing chain
(input cleanup, smart gate, neural noise suppression, de-esser, 10-band
parametric EQ, compressor with speech-aware auto makeup, lookahead + true-peak
limiting) plus offline calibration pipelines (Auto-EQ, Auto Voice Setup,
latency calibration), re-designed TPU-first: every stage is a pure functional
``(state, block) -> (state, block)`` transform built from parallel scans,
batched over streams and calibration candidates with ``vmap``/``pjit``.

The public surface mirrors the reference package root
(`python/mic_eq/__init__.py:176-210`) so code written against it runs
unchanged. There is no optional native extension to fail to import — the
compute core is JAX — so ``CORE_AVAILABLE`` is always True.
"""

__version__ = "0.1.0"

CORE_AVAILABLE = True

# Platform selection must precede the submodule imports below: they
# materialize device constants (filter banks, windows), which initializes
# the JAX backend — after that, platform overrides are ignored. Launchers
# that pin the platform via a preloaded module (e.g. a tunnelled dev TPU)
# ignore plain XLA env vars, so this hook goes through jax.config.
import os as _os  # noqa: E402

if _os.environ.get("AUDIOFORGE_PLATFORM"):
    import jax as _jax  # noqa: E402

    _jax.config.update("jax_platforms",
                       _os.environ["AUDIOFORGE_PLATFORM"])

from .api import (  # noqa: E402,F401
    compressor_pumping_score,
    eq_magnitude_response,
    eq_magnitude_response_v2,
    measure_integrated_loudness,
    simulate_auto_eq_chain,
    simulate_auto_makeup_control,
    simulate_eq_v2,
    simulate_gate_suppressor_order,
)
from .ops.resample import (  # noqa: E402,F401
    product_resampler_configuration,
    simulate_product_resampler,
)
from .models.silero import analyze_vad_probabilities  # noqa: E402,F401
from .models.dfn3 import configure_deepfilter_runtime_paths  # noqa: E402,F401
from .runtime.processor import (  # noqa: E402,F401
    AudioProcessor,
    DeviceInfo,
    list_input_devices,
    list_output_devices,
    register_virtual_input,
    register_virtual_output,
)
from .config import (  # noqa: E402,F401
    BUILTIN_PRESETS,
    Preset,
    list_presets,
    load_preset,
    save_preset,
)

__all__ = [
    "CORE_AVAILABLE",
    "AudioProcessor",
    "BUILTIN_PRESETS",
    "DeviceInfo",
    "Preset",
    "analyze_vad_probabilities",
    "list_input_devices",
    "list_output_devices",
    "register_virtual_input",
    "register_virtual_output",
    "compressor_pumping_score",
    "configure_deepfilter_runtime_paths",
    "eq_magnitude_response",
    "eq_magnitude_response_v2",
    "list_presets",
    "load_preset",
    "measure_integrated_loudness",
    "product_resampler_configuration",
    "save_preset",
    "simulate_auto_eq_chain",
    "simulate_auto_makeup_control",
    "simulate_eq_v2",
    "simulate_gate_suppressor_order",
    "simulate_product_resampler",
]
