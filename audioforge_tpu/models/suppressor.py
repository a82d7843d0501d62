"""Noise-suppressor interface and runtime-swappable engine.

Mirrors `rust-core/src/dsp/noise_suppressor.rs`:

- Common interface: push / process_frames / pop / strength / enabled /
  soft_reset / pending / latency (`noise_suppressor.rs:100-165`).
- ``NoiseSuppressionEngine`` selects {RNNoise, DeepFilterLL, DeepFilter} for
  runtime model swap (`noise_suppressor.rs:171-284`).
- DeepFilter availability is an env-gated opt-in
  (``AUDIOFORGE_ENABLE_DEEPFILTER``, `noise_suppressor.rs:10-17,80-93`);
  backend_available / backend_failed / error diagnostics
  (`noise_suppressor.rs:216-261`).
- Model ids ``rnnoise`` / ``deepfilter-ll`` / ``deepfilter`` with
  10 / 10 / 30 ms latency labels (`noise_suppressor.rs:20-94`).

The hot-swap mechanism itself (staged engine exchange between jitted step
calls, `dsp_loop.rs:1440-1511`) lives in the runtime layer; here an engine
is a state dict plus module functions, so swapping is building a new state
off the hot path and exchanging references between blocks.
"""

from __future__ import annotations

import os

import numpy as np

from . import dfn3, rnnoise

__all__ = [
    "NOISE_MODELS",
    "model_latency_ms",
    "deepfilter_enabled",
    "engine_init",
    "engine_push",
    "engine_process",
    "engine_pop",
    "engine_soft_reset",
    "engine_set_strength",
    "engine_diagnostics",
]

NOISE_MODELS = ("rnnoise", "deepfilter-ll", "deepfilter")
_LATENCY_MS = {"rnnoise": 10.0, "deepfilter-ll": 10.0, "deepfilter": 30.0}


def model_latency_ms(model: str) -> float:
    """`noise_suppressor.rs:20-94`."""
    if model not in NOISE_MODELS:
        raise ValueError(f"unknown noise model {model!r}")
    return _LATENCY_MS[model]


def deepfilter_enabled() -> bool:
    """Env-gated opt-in (`noise_suppressor.rs:10-17`)."""
    return os.environ.get("AUDIOFORGE_ENABLE_DEEPFILTER", "") == "1"


def engine_init(model: str = "rnnoise", strength: float = 1.0,
                rnnoise_params=None, dfn_params=None):
    """Build an engine for ``model``. DeepFilter variants require the env
    opt-in; otherwise the engine reports backend_available=False and passes
    audio through at the model's latency (`noise_suppressor.rs:216-261`)."""
    if model not in NOISE_MODELS:
        raise ValueError(f"unknown noise model {model!r}")
    available = True
    error = None
    if model.startswith("deepfilter") and not deepfilter_enabled():
        available = False
        error = "DeepFilter runtime not enabled (set AUDIOFORGE_ENABLE_DEEPFILTER=1)"
    elif model.startswith("deepfilter") and dfn_params is None and \
            dfn3.weights_source(model == "deepfilter-ll") == "seeded":
        # No trained/converted archive resolved for this latency variant:
        # refuse to run seeded structural weights (they emit garbage gains)
        # and fall back to the latency-preserving passthrough, mirroring
        # the reference's backend-failed semantics
        # (`noise_suppressor.rs:216-261`). Callers that really want the
        # structural graph (tests, training) pass ``dfn_params`` explicitly.
        available = False
        error = (f"no trained or converted weights for {model!r} "
                 "(seeded structural weights refused; supply "
                 "models/dfn3_ll.npz / dfn3.npz or DEEPFILTER_MODEL_PATH)")
    if model == "rnnoise":
        proc = rnnoise.processor_init(rnnoise_params, strength)
        latency = rnnoise.LATENCY_SAMPLES
    else:
        low_latency = model == "deepfilter-ll"
        proc = dfn3.processor_init(dfn_params, strength, low_latency=low_latency)
        latency = dfn3.latency_samples(low_latency)
    return {
        "model": model,
        "proc": proc,
        "latency_samples": latency,
        "backend_available": available,
        "error": error,
        # passthrough delay used when the backend is unavailable
        "pt_delay": np.zeros(latency, np.float32),
        "pt_buf": np.zeros(0, np.float32),
    }


def _passthrough_push(engine, samples):
    stream = np.concatenate([engine["pt_delay"], np.asarray(samples, np.float32)])
    lat = engine["latency_samples"]
    out, engine["pt_delay"] = stream[:-lat] if lat else stream, stream[-lat:]
    engine["pt_buf"] = np.concatenate([engine["pt_buf"], out])


def engine_push(engine, samples):
    engine = dict(engine)
    if not engine["backend_available"]:
        _passthrough_push(engine, samples)
        return engine, len(np.asarray(samples))
    if engine["model"] == "rnnoise":
        engine["proc"], n = rnnoise.processor_push(engine["proc"], samples)
    else:
        engine["proc"], n = dfn3.processor_push(engine["proc"], samples)
    return engine, n


def engine_process(engine):
    engine = dict(engine)
    if not engine["backend_available"]:
        return engine, 0
    if engine["model"] == "rnnoise":
        engine["proc"], n = rnnoise.processor_process(engine["proc"])
    else:
        engine["proc"], n = dfn3.processor_process(engine["proc"])
    return engine, n


def engine_pop(engine, count):
    engine = dict(engine)
    if not engine["backend_available"]:
        n = min(count, len(engine["pt_buf"]))
        out = engine["pt_buf"][:n]
        engine["pt_buf"] = engine["pt_buf"][n:]
        return engine, out
    if engine["model"] == "rnnoise":
        engine["proc"], out = rnnoise.processor_pop(engine["proc"], count)
    else:
        engine["proc"], out = dfn3.processor_pop(engine["proc"], count)
    return engine, out


def engine_soft_reset(engine):
    engine = dict(engine)
    if engine["model"] == "rnnoise":
        engine["proc"] = rnnoise.processor_soft_reset(engine["proc"])
    else:
        engine["proc"] = dfn3.processor_soft_reset(engine["proc"])
    engine["pt_delay"] = np.zeros(engine["latency_samples"], np.float32)
    engine["pt_buf"] = np.zeros(0, np.float32)
    return engine


def engine_set_strength(engine, value: float):
    engine = dict(engine)
    proc = dict(engine["proc"])
    proc["strength"] = float(np.clip(value, 0.0, 1.0))
    engine["proc"] = proc
    return engine


def engine_diagnostics(engine):
    """`noise_suppressor.rs:216-261`; ``weights_source`` additionally
    reports the weight provenance (converted / trained / seeded) so
    quality gates can tell real denoising from structural weights."""
    failed = bool(engine["proc"].get("backend_failed", False))
    source = (rnnoise.weights_source() if engine["model"] == "rnnoise"
              else dfn3.weights_source(engine["model"] == "deepfilter-ll"))
    return {
        "model": engine["model"],
        "backend_available": engine["backend_available"],
        "backend_failed": failed,
        "error": engine["error"],
        "latency_samples": engine["latency_samples"],
        "latency_ms": model_latency_ms(engine["model"]),
        "pending_samples": int(len(engine["proc"].get("in_buf", []))),
        "weights_source": source,
    }
