"""Adaptive input-cleanup discrimination oracles from the reference suite.

Each test reproduces a scenario from
`rust-core/src/audio/processor/tests.rs:574-778` numerically — same
stimulus, same pass bounds — pinning the hum tracker / rumble detector /
high-pass selector of `ops/routing.py` to the reference's measured
behaviour without the Rust binary.
"""

import numpy as np
import jax
import jax.numpy as jnp

from audioforge_tpu.ops import routing

FS = 48000.0
BLOCK = 480


def _run(x, mode):
    """Block-by-block adaptive cleanup. Returns (cleaned, summary) where
    summary mirrors the reference harness (`processor/tests.rs:499-545`):
    ever_hum / ever_rumble OR-ed and the high-pass MAX-ed across blocks,
    plus the final tracked hum line."""
    cfg = routing.RoutingConfig(sample_rate=FS, cleanup_mode=mode)
    state = routing.routing_init(cfg, ())
    step = jax.jit(lambda s, b: routing.routing_process(cfg, s, b))
    x = np.asarray(x, np.float32)
    n = len(x) // BLOCK * BLOCK
    outs = []
    ever_hum = ever_rumble = False
    max_hp = routing.PREFILTER_HZ
    for i in range(0, n, BLOCK):
        res = step(state, jnp.asarray(x[i:i + BLOCK]))
        state, y = res[0], res[1]
        ever_hum |= bool(state["hum_detected"])
        ever_rumble |= bool(state["rumble_detected"])
        max_hp = max(max_hp, float(state["selected_hp_hz"]))
        outs.append(np.asarray(y))
    summary = {
        "hum": ever_hum,
        "rumble": ever_rumble,
        "high_pass_hz": max_hp,
        "hum_line_hz": float(state["hum_line_hz"]),
    }
    return np.concatenate(outs), summary


def _fixed(x):
    cleaned, _ = _run(x, routing.CLEANUP_OFF)
    return cleaned


def _tone_amplitude(x, freq):
    t = np.arange(len(x)) / FS
    ph = np.exp(-2j * np.pi * freq * t)
    return 2.0 * abs(np.mean(np.asarray(x, np.float64) * ph))


def test_adaptive_cleanup_reduces_synthetic_line_hum():
    """`processor/tests.rs:574-599`."""
    t = np.arange(int(FS)) / FS
    x = (0.14 * np.sin(2 * np.pi * 60.0 * t)
         + 0.08 * np.sin(2 * np.pi * 120.0 * t)
         + 0.05 * np.sin(2 * np.pi * 1000.0 * t))
    fixed = _fixed(x)
    cleaned, st = _run(x, routing.CLEANUP_STRONG)
    tail = len(x) // 2
    assert st["hum"]
    assert (_tone_amplitude(cleaned[tail:], 60.0)
            < _tone_amplitude(fixed[tail:], 60.0) * 0.65)
    assert (_tone_amplitude(cleaned[tail:], 1000.0)
            > _tone_amplitude(fixed[tail:], 1000.0) * 0.94)
    assert st["high_pass_hz"] == routing.PREFILTER_HZ


def test_adaptive_cleanup_raises_highpass_for_plosive_not_voice():
    """`processor/tests.rs:602-630` — a plosive raises the rumble HP
    without touching the sustained voice."""
    t = np.arange(int(FS)) / FS
    voice = (0.08 * np.sin(2 * np.pi * 180.0 * t)
             + 0.05 * np.sin(2 * np.pi * 1200.0 * t))
    env = np.maximum(1.0 - t / 0.05, 0.0) * (t < 0.05)
    plosive = 0.65 * env * np.sin(2 * np.pi * 38.0 * t)
    x = voice + plosive
    fixed = _fixed(x)
    cleaned, st = _run(x, routing.CLEANUP_GENTLE)
    tail = len(x) * 3 // 4
    assert st["rumble"]
    assert st["high_pass_hz"] >= 100.0
    assert (_tone_amplitude(cleaned[tail:], 180.0)
            > _tone_amplitude(fixed[tail:], 180.0) * 0.94)


def test_adaptive_cleanup_tracks_drift_and_retunes_smoothly():
    """`processor/tests.rs:633-679` — 49 -> 61 Hz mains drift over 2 s:
    tracker follows, notch residual shrinks, retune never clicks."""
    n = int(FS) * 2
    idx = np.arange(n)
    time = idx / FS
    freq = 49.0 + 12.0 * idx / (n - 1)
    phase = np.cumsum(2 * np.pi * freq / FS)
    voice = 0.045 * np.sin(2 * np.pi * 1000.0 * time)
    x = voice + 0.13 * np.sin(phase) + 0.065 * np.sin(2 * phase)

    cleaned, st = _run(x, routing.CLEANUP_STRONG)
    clean_voice, _ = _run(voice, routing.CLEANUP_STRONG)
    tail = n // 2
    input_residual = float(np.sum((x[tail:] - voice[tail:]) ** 2))
    cleaned_residual = float(
        np.sum((cleaned[tail:] - clean_voice[tail:len(cleaned)]) ** 2))
    max_step = float(np.max(np.abs(np.diff(cleaned))))
    tracked = st["hum_line_hz"]

    assert st["hum"]
    assert 57.0 <= tracked <= 61.0, f"tracked_hz={tracked}"
    assert cleaned_residual < input_residual * 0.72, (
        f"cleaned={cleaned_residual} input={input_residual}")
    assert max_step < 0.20, f"retune max_step={max_step}"


def test_adaptive_cleanup_uses_harmonic_for_off_nominal_hum():
    """`processor/tests.rs:682-704` — weak 51.5 Hz fundamental, strong
    103 Hz harmonic: the tracker must still find the fundamental and the
    harmonic notch must bite."""
    n = int(FS) * 2
    time = np.arange(n) / FS
    f0 = 51.5
    x = (0.025 * np.sin(2 * np.pi * f0 * time)
         + 0.14 * np.sin(2 * np.pi * f0 * 2.0 * time)
         + 0.04 * np.sin(2 * np.pi * 1200.0 * time))
    fixed = _fixed(x)
    cleaned, st = _run(x, routing.CLEANUP_STRONG)
    tail = n // 2
    tracked = st["hum_line_hz"]
    assert st["hum"]
    assert abs(tracked - f0) < 1.5, f"tracked_hz={tracked}"
    assert (_tone_amplitude(cleaned[tail:], f0 * 2.0)
            < _tone_amplitude(fixed[tail:], f0 * 2.0) * 0.72)


def test_plosive_and_low_voice_are_not_classified_as_hum():
    """`processor/tests.rs:707-747`."""
    n = int(FS)
    time = np.arange(n) / FS
    env = (1.0 - time / 0.055) * (time < 0.055)
    plosive = 0.7 * env * np.sin(2 * np.pi * 52.0 * time)
    low_voice = (0.12 * np.sin(2 * np.pi * 90.0 * time)
                 + 0.06 * np.sin(2 * np.pi * 180.0 * time)
                 + 0.03 * np.sin(2 * np.pi * 270.0 * time))

    _, pst = _run(plosive, routing.CLEANUP_STRONG)
    assert not pst["hum"]
    assert pst["rumble"]

    _, vst = _run(low_voice, routing.CLEANUP_STRONG)
    assert not vst["hum"]
    assert vst["high_pass_hz"] == routing.PREFILTER_HZ


def test_clean_signal_matches_fixed_prefilter():
    """`processor/tests.rs:750-776` — with nothing to clean, the adaptive
    path must collapse to exactly one high-pass (the fixed prefilter),
    never a cascade."""
    n = 8192
    time = np.arange(n) / FS
    x = (0.05 * np.sin(2 * np.pi * 300.0 * time)
         + 0.03 * np.sin(2 * np.pi * 2000.0 * time))
    fixed = _fixed(x)
    adaptive, st = _run(x, routing.CLEANUP_GENTLE)
    assert not st["hum"]
    assert not st["rumble"]
    assert st["high_pass_hz"] == routing.PREFILTER_HZ
    max_difference = float(np.max(np.abs(fixed - adaptive)))
    assert max_difference < 1.0e-5, f"max_difference={max_difference}"
