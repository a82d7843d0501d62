"""Gate behavioural oracles ported from the reference test suite.

Each test reproduces a scenario from `rust-core/src/dsp/gate.rs:1054-1283`
numerically — same stimulus, same pass bound — so parity holds without the
Rust binary. The gate here is the branchless lax.scan state machine of
`ops/gate.py`; these contracts pin its *behaviour* to the reference's
sample loop.
"""

import numpy as np
import jax.numpy as jnp
import pytest

from audioforge_tpu.ops import gate as g


def _cfg(mode=g.THRESHOLD_ONLY, release_ms=10.0, threshold_db=-40.0):
    return g.GateConfig(threshold_db=threshold_db, attack_ms=1.0,
                        release_ms=release_ms, sample_rate=48000.0,
                        mode=mode)


def _run(cfg, state, samples, prob=None, avail=None, vthr=0.5):
    """Feed a 1-D sample array as one block (the reference's
    process_block_inplace)."""
    x = jnp.asarray(np.asarray(samples, np.float32))
    kwargs = {}
    if cfg.mode != g.THRESHOLD_ONLY:
        kwargs = dict(
            vad_probability=jnp.float32(0.0 if prob is None else prob),
            vad_available=jnp.bool_(bool(avail)),
            vad_gate_open=jnp.bool_(prob is not None and avail
                                    and prob >= vthr),
            vad_threshold=jnp.float32(vthr),
        )
    return g.gate_process(cfg, state, x, **kwargs)


def _chatter_stimulus(state, cfg):
    """`gate.rs:1054-1075`: five bursts of 2000 samples at 0.1 followed by
    4500 samples of silence — rapid open/close cycling."""
    for _ in range(5):
        state, _, _ = _run(cfg, state, np.full(2000, 0.1))
        state, _, _ = _run(cfg, state, np.zeros(4500))
    return state


def test_rapid_chatter_detected():
    """`gate.rs:1053-1075` — the alternation must register chatter events."""
    cfg = _cfg()
    state = _chatter_stimulus(g.gate_init(), cfg)
    assert int(state["chatter_event_count"]) > 0


def test_reset_clears_chatter_detection():
    """`gate.rs:1077-1100`."""
    cfg = _cfg()
    state = _chatter_stimulus(g.gate_init(), cfg)
    assert int(state["chatter_event_count"]) > 0
    state = g.gate_reset(state)
    assert int(state["chatter_event_count"]) == 0


def test_disabled_gate_is_identity():
    """`gate.rs:1102-1111` — a disabled gate must not touch the signal."""
    cfg = g.GateConfig(threshold_db=-40.0, attack_ms=10.0, release_ms=100.0,
                       sample_rate=48000.0, enabled=False)
    x = np.full(480, 1e-4, np.float32)
    _, y, _ = g.gate_process(cfg, g.gate_init(), jnp.asarray(x))
    np.testing.assert_array_equal(np.asarray(y), x)


def test_vad_assisted_falls_back_to_level_when_unavailable():
    """`gate.rs:1115-1127` — loud input opens on level alone."""
    cfg = _cfg(mode=g.VAD_ASSISTED, release_ms=20.0)
    state, _, _ = _run(cfg, g.gate_init(), np.full(3000, 0.1),
                       prob=0.0, avail=False)
    assert float(state["current_gain"]) > 0.5


def test_vad_only_closes_when_unavailable():
    """`gate.rs:1130-1141` — no posterior, no opening, however loud."""
    cfg = _cfg(mode=g.VAD_ONLY, release_ms=20.0)
    state, _, _ = _run(cfg, g.gate_init(), np.full(3000, 0.1),
                       prob=0.0, avail=False)
    assert float(state["current_gain"]) < 0.2


def test_fused_score_opens_for_strong_evidence():
    """`gate.rs:1144-1156` — prob 0.9 + loud level clears the 0.55 open
    score."""
    cfg = _cfg(mode=g.VAD_ASSISTED, release_ms=20.0)
    state, _, _ = _run(cfg, g.gate_init(), np.full(3000, 0.1),
                       prob=0.9, avail=True)
    assert float(state["fused_gate_score"]) >= g.FUSED_GATE_OPEN_SCORE
    assert float(state["current_gain"]) > 0.5


def test_vad_open_decision_below_level_threshold():
    """`gate.rs:1160-1172` — VAD above ITS threshold opens even at -42 dB
    (below the -40 dB level threshold)."""
    cfg = _cfg(mode=g.VAD_ASSISTED, release_ms=20.0)
    amp = 10.0 ** (-42.0 / 20.0)
    state, _, _ = _run(cfg, g.gate_init(), np.full(3000, amp),
                       prob=0.45, avail=True, vthr=0.4)
    assert float(state["current_gain"]) > 0.35


def test_vad_only_honors_configured_threshold():
    """`gate.rs:1176-1186` — prob 0.45 vs threshold 0.4 must open."""
    cfg = _cfg(mode=g.VAD_ONLY, release_ms=20.0)
    state, _, _ = _run(cfg, g.gate_init(), np.full(3000, 0.1),
                       prob=0.45, avail=True, vthr=0.4)
    assert float(state["current_gain"]) > 0.5


def test_fused_score_resists_weak_noise():
    """`gate.rs:1189-1201` — prob 0.1 + -66 dB level stays shut."""
    cfg = _cfg(mode=g.VAD_ASSISTED, release_ms=20.0)
    state, _, _ = _run(cfg, g.gate_init(), np.full(3000, 5e-4),
                       prob=0.1, avail=True)
    assert float(state["fused_gate_score"]) <= g.FUSED_GATE_CLOSE_SCORE
    assert float(state["current_gain"]) < 0.3


def test_state_machine_opens_on_rising_probability():
    """`gate.rs:1205-1218` — onset velocity: 0 -> 0.42 jump at -46 dB is
    speech onset evidence even below both thresholds."""
    cfg = _cfg(mode=g.VAD_ASSISTED, release_ms=20.0)
    amp = 10.0 ** (-46.0 / 20.0)
    state, _, _ = _run(cfg, g.gate_init(), np.full(2000, amp),
                       prob=0.42, avail=True)
    # the reference asserts the PROBABILISTIC state (gate_state == Open),
    # not the level detector
    assert int(state["gate_state"]) == g._OPEN
    assert float(state["current_gain"]) > 0.25


def test_ambiguous_trailing_speech_preserved():
    """`gate.rs:1222-1245` — after confident speech, an ambiguous quiet
    tail (prob 0.41 @ -45 dB) must not slam shut."""
    cfg = _cfg(mode=g.VAD_ASSISTED, release_ms=20.0)
    state, _, _ = _run(cfg, g.gate_init(), np.full(2000, 0.08),
                       prob=0.90, avail=True)
    open_gain = float(state["current_gain"])
    tail_amp = 10.0 ** (-45.0 / 20.0)
    state, _, _ = _run(cfg, state, np.full(2000, tail_amp),
                       prob=0.41, avail=True)
    assert int(state["gate_state"]) != g._CLOSED
    assert float(state["current_gain"]) > open_gain * 0.45


def test_short_click_with_low_probability_rejected():
    """`gate.rs:1249-1262` — a single-sample 0.8 click under prob 0.05
    stays closed."""
    cfg = _cfg(mode=g.VAD_ASSISTED, release_ms=20.0)
    click = np.zeros(512, np.float32)
    click[0] = 0.8
    state, _, _ = _run(cfg, g.gate_init(), click, prob=0.05, avail=True)
    # the probabilistic machine must never leave Closed (the level
    # detector's own open/hold is separate and overridden by it)
    assert int(state["gate_state"]) == g._CLOSED
    assert float(state["current_gain"]) < 0.2


def test_vad_chatter_triggers_auto_relax():
    """`gate.rs:1266-1283` — five 256-sample speech/silence alternations
    under VAD-only must raise chatter AND arm the 700 ms auto-relax."""
    cfg = _cfg(mode=g.VAD_ONLY, release_ms=5.0)
    state = g.gate_init()
    for _ in range(5):
        state, _, _ = _run(cfg, state, np.full(256, 0.1),
                           prob=0.95, avail=True)
        state, _, _ = _run(cfg, state, np.zeros(256),
                           prob=0.0, avail=True)
    assert int(state["chatter_event_count"]) > 0
    assert int(state["auto_relax_remaining"]) > 0


def test_auto_relax_narrows_expander_range():
    """`gate.rs:88-96,300-315` — during auto-relax the closed attenuation
    floor is 24 dB instead of 36 dB."""
    cfg = _cfg(mode=g.VAD_ONLY, release_ms=5.0)
    state = g.gate_init()
    for _ in range(5):
        state, _, _ = _run(cfg, state, np.full(256, 0.1),
                           prob=0.95, avail=True)
        state, _, _ = _run(cfg, state, np.zeros(256),
                           prob=0.0, avail=True)
    assert int(state["auto_relax_remaining"]) > 0
    # closed gain during relax must respect the narrowed range: the floor
    # is -24 dB (0.063) rather than the normal -36 dB (0.0158)
    state, _, _ = _run(cfg, state, np.zeros(2000), prob=0.0, avail=True)
    relax_floor = 10.0 ** (-g.AUTO_RELAX_RANGE_DB / 20.0)
    assert float(state["current_gain"]) >= relax_floor * 0.9
