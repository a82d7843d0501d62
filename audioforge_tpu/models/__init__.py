"""Neural models (RNNoise, DeepFilterNet3-style, Silero-style VAD) and the
control-rate model-adjacent logic (VAD auto-gate, suppressor engine)."""

from . import dfn3, rnnoise, silero, suppressor, vad_gate  # noqa: F401
