"""Multi-stream serving harness: many live streams, one batched device step.

The reference engine serves exactly one microphone with five cooperating CPU
threads (SURVEY §2.9). On TPU the natural production-serving shape is the
transpose: a long-lived engine multiplexing N independent streams into ONE
jitted block step batched over a stream axis — the whole chain (routing →
VAD auto-gate → smart gate → neural suppressor → de-esser → EQ → compressor
→ limiter → true-peak) advances every stream by one 480-sample block per
device call. Because the engine block equals the suppressor frame
(10 ms at 48 kHz, `rnnoise.rs:9-11`, `deepfilter_ffi.rs:40-43`), the
suppressor runs frame-synchronously inside the same compiled step — no host
staging between the chain halves at all, unlike the single-stream
:class:`~audioforge_tpu.runtime.processor.AudioProcessor` whose suppressor
push/pop mirrors the reference's ring staging.

Design rules (the TPU translation of `dsp_loop.rs` + `control.rs`):

- **Static capacity, traced occupancy.** The slot count is compile-time
  static; attach/detach flip traced masks — no retrace, ever. Detached
  slots process silence and their outputs are dropped.
- **Per-stream control pytrees.** Every continuous knob is a leaf with a
  leading ``[capacity]`` axis, staged host-side and shipped whole each
  step — the batched version of replace-the-params-pytree control
  (`control.rs:5-39` seqlock equivalent).
- **Slot resets are in-graph.** Attaching a stream marks its slot in a
  reset mask; the step's first op blends fresh state in via ``jnp.where``
  (the batched equivalent of `dsp_loop.rs:1798-1883` stop/start reset).
- **Suppressor failure semantics are branchless state.** A slot whose
  model output goes non-finite latches a per-slot ``backend_failed`` flag
  and becomes a latency-preserving dry passthrough
  (`deepfilter_ffi.rs:841-864`); repeated non-finite events trigger an
  in-graph model-state soft reset with cooldown
  (`dsp_loop.rs:570-577,1601-1641`) — all per slot, all inside jit.
- **VAD is batched inference in the step.** One Silero LSTM call per block
  over ``[capacity, 576]`` rolling 16 kHz windows (context carried exactly
  like `vad.rs:43-71`), with the 0.5 smoothing EMA and Platt calibration;
  the worker-staleness contract collapses to "warm after the first full
  window" since inference is synchronous.

Sharding: pass ``mesh_axis`` (a :class:`jax.sharding.NamedSharding`-ready
mesh) to shard the stream axis over devices; every state/params leaf and
the block batch carry the same sharding so XLA keeps the step collective-
free (pure data parallelism over streams — SURVEY §2.9's fleet story).
"""

from __future__ import annotations

import collections
import threading
import time
from dataclasses import dataclass, field

import jax
import jax.numpy as jnp
import numpy as np

from ..models import dfn3, rnnoise, silero
from ..models import suppressor as supp
from ..ops.resample import decimate3, decimate3_init
from . import live_chain as lc

__all__ = [
    "ServingConfig",
    "ServingEngine",
]

BLOCK = lc.BLOCK_SAMPLES  # 480 == suppressor FRAME_SIZE
_PCM_SCALE = rnnoise.PCM_SCALE
_PCM_LIMIT = rnnoise.PCM_MODEL_LIMIT

# suppressor guard constants (`dsp_loop.rs:570-577`): 3 non-finite events
# within 2 s (200 blocks) trigger a model-state soft reset; 2 s cooldown.
_NONFINITE_EVENTS_FOR_RESET = 3
_NONFINITE_WINDOW_BLOCKS = 200
_RESET_COOLDOWN_BLOCKS = 200

# VAD cadence: 160 fresh 16 kHz samples per block into a 576-sample rolling
# model window; warm after ceil(576/160) = 4 blocks.
_STEP_TIME_HISTORY = 2048  # per-block step times kept for the histogram
# log-spaced latency buckets (ms) for engine_diagnostics; the last bucket
# is open-ended
_LATENCY_BUCKETS_MS = (0.5, 1.0, 2.0, 4.0, 8.0, 16.0, 32.0, 64.0, 128.0)

_VAD_IN_PER_BLOCK = BLOCK // 3
_VAD_WARMUP_BLOCKS = -(-silero.MODEL_INPUT_SIZE // _VAD_IN_PER_BLOCK)


@dataclass(frozen=True)
class ServingConfig:
    """Static serving topology. One compiled step per distinct value."""

    capacity: int = 16
    chain: lc.LiveChainConfig = field(default_factory=lc.LiveChainConfig)
    suppressor_model: str | None = "rnnoise"  # None disables the stage
    vad_enabled: bool = False

    def __post_init__(self):
        if self.capacity < 1:
            raise ValueError("capacity must be >= 1")
        if (self.suppressor_model is not None
                and self.suppressor_model not in supp.NOISE_MODELS):
            raise ValueError(
                f"unknown suppressor model {self.suppressor_model!r}"
            )


def _supp_state_init(config: ServingConfig) -> dict:
    n = config.capacity
    model = config.suppressor_model
    if model == "rnnoise":
        mstate = rnnoise.rnnoise_state_init((n,))
    else:
        mstate = dfn3.dfn_state_init((n,), lookahead=model == "deepfilter")
    # dry path delayed by the model's latency so wet/dry stay aligned:
    # one frame for rnnoise / deepfilter-ll, three for the standard
    # 2-frame-lookahead DeepFilter (`rnnoise.rs:122-164`,
    # `deepfilter_ffi.rs:40-43,786-806`)
    delay_blocks = 3 if model == "deepfilter" else 1
    return {
        "model": mstate,
        "smoothed_strength": jnp.ones(n, jnp.float32),
        "dry_delay": jnp.zeros((n, delay_blocks, BLOCK), jnp.float32),
        "backend_failed": jnp.zeros(n, jnp.bool_),
        "nonfinite_count": jnp.zeros(n, jnp.int32),
        "nonfinite_timer": jnp.zeros(n, jnp.int32),
        "reset_cooldown": jnp.zeros(n, jnp.int32),
        "soft_resets": jnp.zeros(n, jnp.int32),
    }


def _vad_state_init(config: ServingConfig) -> dict:
    n = config.capacity
    return {
        "window16": jnp.zeros((n, silero.MODEL_INPUT_SIZE), jnp.float32),
        "dec3": decimate3_init((n,)),
        # stream-major layout [N, layers, dim] so every batched leaf leads
        # with the stream axis; transposed to the model's [layers, N, dim]
        # around the inference call
        "lstm": jnp.zeros((n, silero._N_LAYERS, silero._STATE_DIM),
                          jnp.float32),
        "smoothed": jnp.zeros(n, jnp.float32),
        "blocks_seen": jnp.zeros(n, jnp.int32),
    }


def _serving_state_init(config: ServingConfig, eq_bands=None) -> dict:
    state = {
        "chain": lc.live_init(config.chain, eq_bands=eq_bands,
                              batch_shape=(config.capacity,)),
    }
    if config.suppressor_model is not None:
        state["supp"] = _supp_state_init(config)
    if config.vad_enabled:
        state["vad"] = _vad_state_init(config)
    return state


def _masked_reset(state, fresh, reset_mask, axes):
    """Blend fresh per-slot state in where ``reset_mask`` is set. ``axes``
    is the per-leaf batch-axis pytree (0 = leads with the ``[capacity]``
    stream axis, None = shared leaf, e.g. meter coefficients) — the same
    rank-vs-reference map the vmap axes use, so a shared leaf whose leading
    dim happens to equal the capacity is never mask-blended."""
    n = reset_mask.shape[0]

    def blend(cur, new, ax):
        if ax is None:
            return cur
        m = reset_mask.reshape((n,) + (1,) * (cur.ndim - 1))
        return jnp.where(m, new, cur)

    return jax.tree_util.tree_map(blend, state, fresh, axes)


def _supp_step(config: ServingConfig, sp, state, x):
    """Frame-synchronous batched suppressor (`rnnoise.rs:122-164` /
    `deepfilter_ffi.rs:786-864` semantics, branchless per slot).

    ``sp``: {weights, strength[N], enabled[N], smoothing_coeff,
    atten_lim_db, post_filter_beta}. Returns (new_state, y, metrics)."""
    st = dict(state)
    model = config.suppressor_model

    if model == "rnnoise":
        scaled = jnp.clip(
            rnnoise._soft_clip(x) * _PCM_SCALE, -_PCM_LIMIT, _PCM_LIMIT
        )
        mstate, wet, aux = rnnoise.rnnoise_frame(
            sp["weights"], state["model"], scaled
        )
        wet = wet / _PCM_SCALE
    else:
        mstate, wet, aux = dfn3.dfn_frame(
            sp["weights"], state["model"], x,
            atten_lim_db=sp["atten_lim_db"],
            post_filter_beta=sp["post_filter_beta"],
        )

    # non-finite scrub + latency-preserving passthrough latch per slot
    finite = jnp.all(jnp.isfinite(wet), axis=-1)
    wet = jnp.where(finite[:, None], jnp.nan_to_num(wet), 0.0)

    timer = jnp.where(state["nonfinite_timer"] > 0,
                      state["nonfinite_timer"] - 1, 0)
    count = jnp.where(timer > 0, state["nonfinite_count"], 0)
    count = jnp.where(~finite, count + 1, count)
    timer = jnp.where(~finite, _NONFINITE_WINDOW_BLOCKS, timer)

    cooldown = jnp.where(state["reset_cooldown"] > 0,
                         state["reset_cooldown"] - 1, 0)
    do_reset = (count >= _NONFINITE_EVENTS_FOR_RESET) & (cooldown == 0)
    # soft reset preserves learned weights, clears recurrent model state
    fresh_model = (rnnoise.rnnoise_state_init((config.capacity,))
                   if model == "rnnoise"
                   else dfn3.dfn_state_init((config.capacity,),
                                            lookahead=model == "deepfilter"))
    mstate = _masked_reset(
        mstate, fresh_model, do_reset,
        jax.tree_util.tree_map(lambda _: 0, mstate),
    )
    count = jnp.where(do_reset, 0, count)
    cooldown = jnp.where(do_reset, _RESET_COOLDOWN_BLOCKS, cooldown)

    # the standard (non-LL) DeepFilter contract latches a permanent
    # backend failure instead of resetting (`deepfilter_ffi.rs:841-864`)
    latch = model == "deepfilter"
    failed = state["backend_failed"] | (~finite if latch else jnp.zeros_like(finite))

    # 15 ms-EMA wet/dry strength, dry path one frame behind
    sm = (sp["strength"] * sp["smoothing_coeff"]
          + state["smoothed_strength"] * (1.0 - sp["smoothing_coeff"]))
    dry = state["dry_delay"][:, 0]
    dry_q = jnp.concatenate(
        [state["dry_delay"][:, 1:], x[:, None, :]], axis=1
    )
    mix = wet * sm[:, None] + dry * (1.0 - sm[:, None])
    bypass = failed | ~sp["enabled"] | ~finite
    y = jnp.where(bypass[:, None], dry, mix)

    st.update(
        model=mstate, smoothed_strength=sm, dry_delay=dry_q,
        backend_failed=failed, nonfinite_count=count,
        nonfinite_timer=timer, reset_cooldown=cooldown,
        soft_resets=state["soft_resets"] + do_reset.astype(jnp.int32),
    )
    model_vad = aux.get("vad")
    metrics = {
        "suppressor_nonfinite": (~finite).astype(jnp.int32),
        "suppressor_soft_resets": st["soft_resets"],
        "suppressor_backend_failed": failed,
        "suppressor_vad_probability": (
            jnp.zeros(x.shape[0], jnp.float32) if model_vad is None
            else jnp.reshape(model_vad, (x.shape[0],))
        ),
    }
    return st, y, metrics


def _vad_step(sp, state, x):
    """Batched in-step Silero: decimate the block to 16 kHz, roll it into
    the 576-sample model window (64 context + 512, `vad.rs:43-71`), run one
    batched inference, smooth (0.5 EMA) and Platt-calibrate
    (`vad.rs:52-55,468-477`). Returns (state, probability[N], available[N])."""
    st = dict(state)
    st["dec3"], x16 = decimate3(state["dec3"], x)
    window = jnp.concatenate([state["window16"][..., _VAD_IN_PER_BLOCK:], x16],
                             axis=-1)
    prob, lstm = silero.silero_infer(sp["weights"], window * sp["pre_gain"],
                                     jnp.moveaxis(state["lstm"], 0, 1))
    lstm = jnp.moveaxis(lstm, 0, 1)
    prob = jnp.clip(prob, 0.0, 1.0)
    warm = state["blocks_seen"] >= (_VAD_WARMUP_BLOCKS - 1)
    first = state["blocks_seen"] == (_VAD_WARMUP_BLOCKS - 1)
    smoothed = jnp.where(
        first, prob,
        sp["smoothing"] * prob + (1.0 - sp["smoothing"]) * state["smoothed"],
    )
    smoothed = jnp.where(warm, smoothed, 0.0)
    st.update(window16=window, lstm=lstm, smoothed=smoothed,
              blocks_seen=state["blocks_seen"] + 1)
    return st, silero.calibrate_probability(smoothed), warm


def _chain_state_axes(config: ServingConfig, batched_chain_state):
    """vmap axes for the chain-state pytree: a leaf is stream-batched iff
    its rank is one above the unbatched reference (shape heuristics break
    when a shared leaf's first dim happens to equal the capacity, e.g. the
    K-weighting coefficients ``[2, 5]`` at capacity 2)."""
    ref = lc.live_init(config.chain)
    return jax.tree_util.tree_map(
        lambda b, r: 0 if jnp.ndim(b) == jnp.ndim(r) + 1 else None,
        batched_chain_state, ref,
    )


def _serving_state_axes(config: ServingConfig, state):
    """Batch-axis pytree for the full serving state: chain leaves by the
    rank-vs-reference rule, suppressor/VAD leaves all stream-batched (their
    init fns take the batch shape explicitly)."""
    axes = {"chain": _chain_state_axes(config, state["chain"])}
    for group in ("supp", "vad"):
        if group in state:
            axes[group] = jax.tree_util.tree_map(lambda _: 0, state[group])
    return axes


def _serving_step(config: ServingConfig, params, state, fresh, x,
                  active, reset_mask, ext_vad_prob, ext_vad_avail):
    """The fused batched block step. All args traced except ``config``.

    The chain halves run under :func:`jax.vmap` over the stream axis so the
    per-stream control pytrees reach the ops as the scalar leaves they were
    written for; the suppressor frame and Silero inference are natively
    batched and run outside the vmap.
    """
    n = config.capacity
    state = _masked_reset(state, fresh, reset_mask,
                          _serving_state_axes(config, state))
    x = jnp.where(active[:, None], x, 0.0)

    if config.vad_enabled:
        vstate, vad_prob, vad_avail = _vad_step(params["vad"], state["vad"], x)
    else:
        vstate, vad_prob, vad_avail = None, ext_vad_prob, ext_vad_avail

    cstate_ax = _chain_state_axes(config, state["chain"])
    front = jax.vmap(
        lambda p, s, xb, vp, va: lc.front_block(config.chain, p, s, xb, vp, va),
        in_axes=(0, cstate_ax, 0, 0, 0),
        out_axes=(cstate_ax, 0, 0),
    )
    chain, y, fm = front(params["chain"], state["chain"], x,
                         vad_prob, vad_avail)

    sm = {}
    if config.suppressor_model is not None:
        sstate, y, sm = _supp_step(config, params["supp"], state["supp"], y)
    else:
        sstate = None

    evidence = {
        "vad_probability": vad_prob,
        "vad_reliability": vad_avail.astype(jnp.float32),
        "noise_floor_db": fm["noise_floor_db"],
        "live_noise_reliability": fm["noise_floor_reliability"],
    }
    back = jax.vmap(
        lambda p, s, xb, ev: lc.back_block(config.chain, p, s, xb, ev),
        in_axes=(0, cstate_ax, 0, 0),
        out_axes=(cstate_ax, 0, 0),
    )
    chain, y2, bm = back(params["chain"], chain, y, evidence)

    new_state = {"chain": chain}
    if sstate is not None:
        new_state["supp"] = sstate
    if vstate is not None:
        new_state["vad"] = vstate

    metrics = {**fm, **sm, **bm,
               "vad_probability": vad_prob,
               "vad_available": vad_avail}
    return new_state, y2, metrics


def _serving_scan(config: ServingConfig, params, state, fresh, xs,
                  active, reset_mask, ext_vad_prob, ext_vad_avail):
    """Fused multi-block step: ``xs: [n_blocks, N, 480]`` advanced in one
    compiled ``lax.scan`` — amortizes dispatch for throughput serving
    (transcode farms, offline multiplexing); the per-block :func:`_serving_step`
    stays the interactive-latency path. Slot resets apply once, before the
    first scanned block."""
    state = _masked_reset(state, fresh, reset_mask,
                          _serving_state_axes(config, state))
    no_reset = jnp.zeros_like(reset_mask)

    def body(st, xb):
        st, y, m = _serving_step(config, params, st, fresh, xb, active,
                                 no_reset, ext_vad_prob, ext_vad_avail)
        return st, (y, m)

    state, (ys, ms) = jax.lax.scan(body, state, xs)
    last_metrics = jax.tree_util.tree_map(lambda a: a[-1], ms)
    return state, ys, last_metrics


class _Slot:
    __slots__ = ("active", "generation", "sink", "pending", "underruns",
                 "blocks")

    def __init__(self):
        self.active = False
        self.generation = 0
        self.sink = None
        self.pending = np.zeros(0, np.float32)
        self.underruns = 0
        self.blocks = 0


class ServingEngine:
    """Long-lived N-stream serving engine around one compiled block step.

    Usage::

        eng = ServingEngine(ServingConfig(capacity=16))
        slot = eng.attach(sink=lambda block: ...)   # block: float32[480]
        eng.push(slot, samples)                     # 48 kHz mono
        eng.step()                                  # or eng.start() free-run
        eng.set_stream_params(slot, compressor_threshold_db=-24.0)
        eng.stream_diagnostics(slot)
        eng.detach(slot)
    """

    def __init__(self, config: ServingConfig | None = None, *,
                 eq_bands=None, sharding=None,
                 rnnoise_weights=None, dfn_weights=None, vad_weights=None):
        self.config = config or ServingConfig()
        n = self.config.capacity
        self._sharding = sharding
        self._lock = threading.RLock()
        self._slots = [_Slot() for _ in range(n)]
        self._reset_pending = np.zeros(n, bool)
        self._pending_eq = {}
        self._fresh = _serving_state_init(self.config, eq_bands)
        self._state = self._fresh
        self._last_metrics = None

        # --- stacked per-stream control params (host-staged numpy) ---
        base = lc.live_params(self.config.chain)
        self._chain_kw = {}  # per-slot kwarg overrides for rebuilds
        stacked = jax.tree_util.tree_map(
            lambda leaf: np.broadcast_to(
                np.asarray(leaf, np.float32), (n,) + np.shape(leaf)
            ).copy(),
            base,
        )
        # mutable control leaves stay host-staged numpy (tiny, shipped each
        # step); model weights are device-resident and merged in at call
        # time so they never round-trip through the host
        self._params = {"chain": stacked}
        self._weights = {}
        if self.config.suppressor_model is not None:
            if self.config.suppressor_model == "rnnoise":
                weights = rnnoise_weights or rnnoise.default_params()
            else:
                weights = dfn_weights or dfn3.default_params(
                    self.config.suppressor_model == "deepfilter-ll")
            self._weights["supp"] = jax.tree_util.tree_map(
                jnp.asarray, weights
            )
            self._params["supp"] = {
                "strength": np.ones(n, np.float32),
                "enabled": np.ones(n, bool),
                "smoothing_coeff": np.float32(
                    1.0 - np.exp(-(BLOCK / 48000.0) / 0.015)
                ),
                "atten_lim_db": np.float32(dfn3.DEFAULT_ATTEN_LIM_DB),
                "post_filter_beta": np.float32(dfn3.DEFAULT_POST_FILTER_BETA),
            }
        if self.config.vad_enabled:
            self._weights["vad"] = jax.tree_util.tree_map(
                jnp.asarray, vad_weights or silero.default_params()
            )
            self._params["vad"] = {
                "pre_gain": np.float32(1.0),
                "smoothing": np.float32(0.5),
            }

        self._step = jax.jit(_serving_step, static_argnums=(0,))
        self._scan = jax.jit(_serving_scan, static_argnums=(0,))
        self._inflight = None
        self._params_dirty = True
        self._params_device = None
        self._thread = None
        self._running = False
        self.realtime_pacing = False
        self.pipelined_loop = True
        self.steps = 0
        self.last_step_seconds = 0.0
        # per-block step-time history (seconds), bounded; feeds the
        # latency histogram in engine_diagnostics (round-1 review #8:
        # p99 swings were invisible without variance tracking)
        self._step_times = collections.deque(maxlen=_STEP_TIME_HISTORY)

        if sharding is not None:
            self._state = self._put_sharded(self._state)
            self._fresh = self._put_sharded(self._fresh)

    def _put_sharded(self, tree):
        """Shard the stream axis of every batched leaf over the mesh;
        replicate shared leaves (rank-matched against the unbatched chain
        state, like the vmap axes). Keeps the step collective-free (pure DP
        over streams, SURVEY §2.9)."""
        from jax.sharding import NamedSharding, PartitionSpec

        mesh = self._sharding.mesh
        axis = self._sharding.spec[0]
        sh_stream = NamedSharding(mesh, PartitionSpec(axis))
        sh_rep = NamedSharding(mesh, PartitionSpec())

        axes = {"chain": _chain_state_axes(self.config, tree["chain"])}
        for group in ("supp", "vad"):
            if group in tree:
                axes[group] = jax.tree_util.tree_map(
                    lambda _: 0, tree[group]
                )
        return jax.tree_util.tree_map(
            lambda leaf, ax: jax.device_put(
                leaf, sh_stream if ax == 0 else sh_rep
            ),
            tree, axes,
        )

    # ------------------------------------------------------------- streams
    @property
    def capacity(self) -> int:
        return self.config.capacity

    @property
    def occupancy(self) -> int:
        with self._lock:
            return sum(s.active for s in self._slots)

    def attach(self, sink=None) -> int:
        """Claim a free slot for a new stream; its state resets in-graph on
        the next step. Returns the slot id; raises when full."""
        with self._lock:
            for i, s in enumerate(self._slots):
                if not s.active:
                    s.active = True
                    s.generation += 1
                    s.sink = sink
                    s.pending = np.zeros(0, np.float32)
                    s.underruns = 0
                    s.blocks = 0
                    self._reset_pending[i] = True
                    self._pending_eq.pop(i, None)  # stale staged EQ
                    self._chain_kw[i] = {}
                    self._write_chain_params(i, lc.live_params(self.config.chain))
                    if self.config.suppressor_model is not None:
                        self._params["supp"]["strength"][i] = 1.0
                        self._params["supp"]["enabled"][i] = True
                    return i
        raise RuntimeError("serving engine full")

    def detach(self, slot: int) -> None:
        with self._lock:
            s = self._slots[slot]
            s.active = False
            s.sink = None
            s.pending = np.zeros(0, np.float32)
            self._pending_eq.pop(slot, None)

    def push(self, slot: int, samples) -> None:
        """Queue 48 kHz mono samples for a stream."""
        with self._lock:
            s = self._slots[slot]
            if not s.active:
                raise ValueError(f"slot {slot} is not attached")
            s.pending = np.concatenate(
                [s.pending, np.asarray(samples, np.float32).ravel()]
            )

    # ------------------------------------------------------------- control
    def _write_chain_params(self, slot: int, tree) -> None:
        def write(dst, leaf):
            dst[slot] = np.asarray(leaf, np.float32)
        jax.tree_util.tree_map(write, self._params["chain"], tree)
        self._params_dirty = True

    def set_stream_params(self, slot: int, **kwargs) -> None:
        """Update a stream's continuous controls (any
        :func:`live_chain.live_params` kwarg). Traced — never recompiles."""
        with self._lock:
            kw = self._chain_kw.setdefault(slot, {})
            kw.update(kwargs)
            self._write_chain_params(
                slot, lc.live_params(self.config.chain, **kw)
            )

    def set_stream_suppressor(self, slot: int, *, strength=None,
                              enabled=None) -> None:
        if self.config.suppressor_model is None:
            raise ValueError("serving config has no suppressor stage")
        with self._lock:
            if strength is not None:
                self._params["supp"]["strength"][slot] = float(
                    np.clip(strength, 0.0, 1.0)
                )
            if enabled is not None:
                self._params["supp"]["enabled"][slot] = bool(enabled)
            self._params_dirty = True

    def set_stream_eq(self, slot: int, eq_bands) -> None:
        """Replace one stream's EQ program. Staged like slot resets: the
        fresh EQ tree is recorded under the lock and applied in
        :meth:`_gather` at the next step boundary, so a concurrent
        ``step()``/``step_pipelined()``/free-run loop replacing
        ``self._state`` can neither discard the update nor resurrect
        pre-step EQ state."""
        from ..ops import eq as eq_ops

        fresh_eq = eq_ops.eq_init(eq_bands, self.config.chain.sample_rate)
        with self._lock:
            self._pending_eq[slot] = fresh_eq

    # ---------------------------------------------------------------- step
    def _device_params(self):
        """Device-resident params, refreshed only when a control write
        dirtied them — steady-state steps transfer no control data at all
        (the block-boundary analogue of `control.rs` dirty-flag rearming)."""
        if self._params_dirty or self._params_device is None:
            staged = jax.tree_util.tree_map(
                lambda leaf: jnp.asarray(np.copy(leaf)), self._params
            )
            for group, weights in self._weights.items():
                staged[group] = dict(staged[group], weights=weights)
            self._params_device = staged
            self._params_dirty = False
        return self._params_device

    def _gather(self, n_blocks: int = 1):
        n = self.config.capacity
        x = np.zeros((n_blocks, n, BLOCK), np.float32)
        active = np.zeros(n, bool)
        with self._lock:
            reset = self._reset_pending.copy()
            self._reset_pending[:] = False
            if self._pending_eq:
                # a slot being reset THIS step would have its surgery wiped
                # by the in-graph masked reset — hold its EQ until the step
                # after the reset lands
                for slot in [s for s in self._pending_eq if not reset[s]]:
                    fresh_eq = self._pending_eq.pop(slot)
                    self._state["chain"]["eq"] = jax.tree_util.tree_map(
                        lambda cur, new: cur.at[slot].set(new),
                        self._state["chain"]["eq"], fresh_eq,
                    )
            for i, s in enumerate(self._slots):
                if not s.active:
                    continue
                active[i] = True
                want = n_blocks * BLOCK
                take = min(want, s.pending.size)
                if take:
                    got = s.pending[:take]
                    s.pending = s.pending[take:]
                    full, rem = divmod(take, BLOCK)
                    for b in range(full):
                        x[b, i, :] = got[b * BLOCK:(b + 1) * BLOCK]
                    if rem:
                        x[full, i, :rem] = got[full * BLOCK:]
                if take < want:
                    s.underruns += -(-(want - take) // BLOCK)
            params = self._device_params()
        return x, active, reset, params

    def step(self, ext_vad_prob=None, ext_vad_avail=None):
        """Advance every stream by one block (the interactive-latency
        path). Returns per-slot metrics."""
        t0 = time.perf_counter()
        x, active, reset, params = self._gather()
        ext_vad_prob, ext_vad_avail = self._ext_vad(ext_vad_prob,
                                                    ext_vad_avail)
        xb = x[0]
        if self._sharding is not None:
            xb = jax.device_put(xb, self._sharding)

        self._state, y, metrics = self._step(
            self.config, params, self._state, self._fresh,
            jnp.asarray(xb), jnp.asarray(active), jnp.asarray(reset),
            ext_vad_prob, ext_vad_avail,
        )
        y_np = np.asarray(y)
        self._deliver(y_np[None, :, :], 1)
        self._last_metrics = metrics
        self.steps += 1
        self.last_step_seconds = time.perf_counter() - t0
        self._step_times.append(self.last_step_seconds)
        return metrics

    def step_pipelined(self, ext_vad_prob=None, ext_vad_avail=None):
        """Advance every stream by one block with ONE BLOCK of pipeline
        delay: the device call for block t is dispatched asynchronously
        and block t-1's results are fetched/delivered while it runs, so
        host dispatch and transfer latency overlap device compute. Sinks
        receive each block one call later than :meth:`step`; numerics are
        identical. Call :meth:`flush_pipeline` (or :meth:`stop`) to drain
        the final in-flight block. Returns the delivered (previous)
        block's metrics, or None on the first call."""
        t0 = time.perf_counter()
        x, active, reset, params = self._gather()
        ext_vad_prob, ext_vad_avail = self._ext_vad(ext_vad_prob,
                                                    ext_vad_avail)
        xb = x[0]
        if self._sharding is not None:
            xb = jax.device_put(xb, self._sharding)
        # async dispatch: returns device futures immediately
        self._state, y, metrics = self._step(
            self.config, params, self._state, self._fresh,
            jnp.asarray(xb), jnp.asarray(active), jnp.asarray(reset),
            ext_vad_prob, ext_vad_avail,
        )
        delivered = None
        if self._inflight is not None:
            prev_y, prev_metrics = self._inflight
            self._deliver(np.asarray(prev_y)[None, :, :], 1)
            self._last_metrics = prev_metrics
            delivered = prev_metrics
        self._inflight = (y, metrics)
        self.steps += 1
        self.last_step_seconds = time.perf_counter() - t0
        self._step_times.append(self.last_step_seconds)
        return delivered

    def flush_pipeline(self):
        """Deliver the final in-flight block from :meth:`step_pipelined`."""
        if self._inflight is None:
            return None
        y, metrics = self._inflight
        self._inflight = None
        self._deliver(np.asarray(y)[None, :, :], 1)
        self._last_metrics = metrics
        return metrics

    def step_many(self, n_blocks: int, ext_vad_prob=None,
                  ext_vad_avail=None):
        """Advance every stream by ``n_blocks`` blocks in ONE device call
        (fused ``lax.scan``) — the throughput-serving path: dispatch and
        host transfers amortize over the whole span at the cost of
        ``n_blocks`` blocks of delivery latency. Returns the final block's
        per-slot metrics."""
        if n_blocks < 1:
            raise ValueError("n_blocks must be >= 1")
        t0 = time.perf_counter()
        x, active, reset, params = self._gather(n_blocks)
        ext_vad_prob, ext_vad_avail = self._ext_vad(ext_vad_prob,
                                                    ext_vad_avail)
        self._state, ys, metrics = self._scan(
            self.config, params, self._state, self._fresh,
            jnp.asarray(x), jnp.asarray(active), jnp.asarray(reset),
            ext_vad_prob, ext_vad_avail,
        )
        self._deliver(np.asarray(ys), n_blocks)
        self._last_metrics = metrics
        self.steps += n_blocks
        self.last_step_seconds = time.perf_counter() - t0
        # fused spans amortize dispatch: record the per-block share so the
        # histogram stays comparable across step()/step_many() mixes
        per_block = self.last_step_seconds / n_blocks
        self._step_times.extend([per_block] * n_blocks)
        return metrics

    def _ext_vad(self, prob, avail):
        n = self.config.capacity
        if prob is None:
            prob = np.zeros(n, np.float32)
        if avail is None:
            avail = np.zeros(n, bool)
        return jnp.asarray(prob, jnp.float32), jnp.asarray(avail, jnp.bool_)

    def _deliver(self, ys, n_blocks: int) -> None:
        """``ys: [n_blocks, N, BLOCK]`` host array → per-slot sinks."""
        with self._lock:
            for i, s in enumerate(self._slots):
                if not s.active:
                    continue
                s.blocks += n_blocks
                if s.sink is not None:
                    for b in range(n_blocks):
                        s.sink(ys[b, i])

    def run_blocks(self, n_blocks: int) -> None:
        for _ in range(n_blocks):
            self.step()

    # ------------------------------------------------------------ free-run
    def start(self) -> None:
        if self._running:
            return
        self._running = True
        self._thread = threading.Thread(target=self._loop, daemon=True)
        self._thread.start()

    def stop(self) -> None:
        self._running = False
        if self._thread is not None:
            self._thread.join(timeout=10.0)
            self._thread = None
        self.flush_pipeline()

    def _loop(self):
        """Free-run driver. Defaults to the pipelined step (device compute
        for block t overlaps host delivery of block t-1) — one block of
        extra sink latency buys back the dispatch+transfer time on every
        block; set ``pipelined_loop = False`` before :meth:`start` for
        strict same-call delivery."""
        period = BLOCK / self.config.chain.sample_rate
        advance = self.step_pipelined if self.pipelined_loop else self.step
        next_t = time.perf_counter()
        while self._running:
            advance()
            if self.realtime_pacing:
                next_t += period
                delay = next_t - time.perf_counter()
                if delay > 0:
                    time.sleep(delay)
                else:
                    next_t = time.perf_counter()

    # --------------------------------------------------------- diagnostics
    def stream_diagnostics(self, slot: int) -> dict:
        """Last-step metrics for one stream as host floats."""
        with self._lock:
            s = self._slots[slot]
            out = {
                "active": s.active,
                "generation": s.generation,
                "blocks_processed": s.blocks,
                "underrun_count": s.underruns,
            }
        if self._last_metrics is not None:
            for key in (
                "input_peak_db", "input_rms_db", "gate_gain", "gate_is_open",
                "gate_threshold_db", "noise_floor_db",
                "noise_floor_reliability", "vad_probability", "vad_available",
                "compressor_gain_reduction_db", "compressor_makeup_gain_db",
                "limiter_gain_reduction_db", "tp_gain_reduction_db",
                "output_peak_db", "output_rms_db", "output_lufs",
                "output_true_peak",
            ):
                if key in self._last_metrics:
                    out[key] = float(np.asarray(self._last_metrics[key])[slot])
            for key in ("suppressor_backend_failed", "suppressor_soft_resets",
                        "suppressor_nonfinite"):
                if key in self._last_metrics:
                    out[key] = int(np.asarray(self._last_metrics[key])[slot])
        return out

    def latency_histogram(self) -> dict:
        """Per-block step-time distribution over the last
        ``_STEP_TIME_HISTORY`` blocks: log-spaced bucket counts plus
        p50/p95/p99/max (ms). Fused ``step_many`` spans contribute their
        per-block share so mixed workloads stay comparable."""
        times_ms = np.asarray(self._step_times, np.float64) * 1000.0
        edges = list(_LATENCY_BUCKETS_MS)
        counts = [0] * (len(edges) + 1)
        if times_ms.size:
            idx = np.searchsorted(edges, times_ms, side="left")
            for i in idx:
                counts[int(i)] += 1
        out = {
            "samples": int(times_ms.size),
            "bucket_upper_bounds_ms": edges + [float("inf")],
            "bucket_counts": counts,
        }
        if times_ms.size:
            out.update(
                p50_ms=float(np.percentile(times_ms, 50)),
                p95_ms=float(np.percentile(times_ms, 95)),
                p99_ms=float(np.percentile(times_ms, 99)),
                max_ms=float(times_ms.max()),
            )
        return out

    def engine_diagnostics(self) -> dict:
        return {
            "capacity": self.capacity,
            "occupancy": self.occupancy,
            "steps": self.steps,
            "last_step_seconds": self.last_step_seconds,
            "suppressor_model": self.config.suppressor_model,
            "vad_enabled": self.config.vad_enabled,
            "realtime_pacing": self.realtime_pacing,
            "pipelined_loop": self.pipelined_loop,
            "step_latency": self.latency_histogram(),
        }
