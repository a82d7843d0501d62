"""Train DeepFilterNet3-graph weights in-repo on a fully synthetic corpus.

This environment has no network egress, so the published DeepFilterNet3
release archive (`release-assets.json` pin; consumed through the C API in
`rust-core/src/dsp/deepfilter_ffi.rs`) cannot be fetched. Instead the EXACT
framework graph (`audioforge_tpu/models/dfn3.py` — ERB gain decoder +
order-5 deep filtering, the binding structure for converted archives) is
trained from scratch on a synthetic speech+noise corpus from the same
generator family as the fullband evaluation corpus (different seeds, wider
parameter ranges). The result is a real enhancer for the synthetic-speech
domain, saved to ``models/dfn3.npz`` with ``__provenance__ = "trained"`` —
converted official archives drop in through the identical ``load_weights``
/ ``resolve_weight_path`` path and simply replace it.

Training runs the production ``dfn_frames`` scan (vorbis-windowed 960-pt
STFT, ERB features, GRU, deep-filtering FIR, overlap-add synthesis) with
the attenuation limit opened to its 100 dB maximum so the network — not the
runtime safety mix — learns the suppression; the runtime default of 30 dB
(`deepfilter-hardening-report.json`) then bounds it exactly as the
reference bounds the official model. Loss is DeepFilterNet's recipe shape:
compressed spectral magnitude (γ=0.6) L2 on the enhanced-vs-clean spectra
plus a time-domain term, with the model's 1-frame latency aligned out.

Run: ``python tools/train_dfn3_weights.py [--steps N] [--seqs M]``.
Writes the archive plus ``evaluation/dfn3-training-report.json`` with
held-out SI-SDR evidence through the full staging processor.
"""

from __future__ import annotations

import argparse
import sys
import time
from pathlib import Path

import numpy as np

REPO_ROOT = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO_ROOT))
sys.path.insert(0, str(REPO_ROOT / "tools"))

from _evaluation_common import EVALUATION_DIR, utc_now, write_report  # noqa: E402
from _model_gates import compute_si_sdr_gates  # noqa: E402
from build_vad_evaluation_corpus import _noise, _speech  # noqa: E402

from audioforge_tpu.cache import enable_compile_cache  # noqa: E402

# the training step and staging-processor scans are compile-heavy; the
# persistent cache makes retrain iterations pay compile once
enable_compile_cache()

SAMPLE_RATE = 48000
FRAME = 480
SEED = 0xDF3A
NOISE_CATEGORIES = ("white", "pink", "hum", "keyboard", "engine", "babble")
F0_RANGE = (85.0, 265.0)
TILT_RANGE = (0.55, 1.5)
RATE_RANGE = (1.6, 4.2)
SNR_GRID_DB = (-5.0, 0.0, 5.0, 10.0, 15.0, 20.0)
SPEECH_RMS_RANGE_DBFS = (-32.0, -14.0)

# Curriculum emphasis (r3, same rationale as train_rnnoise_weights):
# babble — speech-shaped noise built from the speech generator itself —
# is the only category whose pairs land below the 0 dB per-pair floor;
# oversample it and the deployment SNR regime during training. Held-out
# evaluation stays on the UNWEIGHTED distribution.
CATEGORY_WEIGHTS = {
    "white": 0.13, "pink": 0.13, "hum": 0.13,
    "keyboard": 0.13, "engine": 0.13, "babble": 0.35,
}
SNR_WEIGHTS = (0.25, 0.25, 0.20, 0.15, 0.10, 0.05)  # aligned to SNR_GRID_DB
TRAIN_ATTEN_LIM_DB = 100.0  # graph maximum: the net learns the suppression
MAG_GAMMA = 0.6  # DeepFilterNet compressed-magnitude exponent
WAVE_WEIGHT = 0.5

# Phase-2 fine-tune (r4): the spectral recipe optimises compressed-
# magnitude regression at the 100 dB training attenuation, but the gate is
# waveform SI-SDR through the staging processor at the PRODUCTION 30 dB
# limit (`deepfilter-hardening-report.json`) — a different objective at a
# different operating point. The whole graph is differentiable, so phase 2
# backpropagates the held-out metric itself at atten 30, with a hinge that
# pushes every mixture above the min-pair >= 0 dB floor (on speech-shaped
# babble "pass through when unsure" beats chasing unlearnable targets).
FT_HINGE_MARGIN_DB = 2.0
FT_HINGE_WEIGHT = 3.0
FT_NOISE_WEIGHT = 1.0    # noise-only sequences: residual-energy ratio
FT_CLEAN_WEIGHT = 1.0    # clean sequences: passthrough relative MSE
KIND_CODES = {"mix": 0, "noise": 1, "clean": 2}
# checkpoint selection: every FT_VAL_EVERY steps, score the params on a
# fresh-seed validation set (deployment distribution, disjoint from both
# training and held-out seeds) and keep the best — SGD noise swings the
# worst-pair metric several dB between adjacent steps, so the final step
# is not the best step; selecting on validation is honest because the
# gate's held-out pairs come from yet another seed.
FT_VAL_EVERY = 100
FT_VAL_PAIRS = 24


def _sequence(rng, seconds: float, kind: str, *,
              snr_grid=SNR_GRID_DB, snr_weights=SNR_WEIGHTS,
              category_weights=None, info=None):
    """One 48 kHz sequence: (clean, noisy).

    The SNR/category distributions default to the training curriculum;
    held-out evaluation passes the unweighted deployment distribution
    explicitly (no module-global mutation)."""
    if category_weights is None:
        category_weights = CATEGORY_WEIGHTS
    n = int(seconds * SAMPLE_RATE)
    clean = np.zeros(n, np.float32)
    if kind != "noise":
        profile = (
            rng.uniform(*F0_RANGE),
            rng.uniform(*TILT_RANGE),
            rng.uniform(*RATE_RANGE),
        )
        speech, _ = _speech(profile, rng, seconds)
        speech = speech[:n]
        level = 10.0 ** (rng.uniform(*SPEECH_RMS_RANGE_DBFS) / 20.0)
        rms = float(np.sqrt(np.mean(np.square(speech)))) or 1.0
        clean[: speech.size] = speech * (level / rms)
    noisy = clean.copy()
    if kind != "clean":
        weights = [category_weights[c] for c in NOISE_CATEGORIES]
        category = str(rng.choice(NOISE_CATEGORIES, p=weights))
        noise = _noise(category, rng, n)
        if info is not None:
            info["categories"] = [category]
        if kind == "mix" and clean.any():
            snr_db = float(rng.choice(snr_grid, p=snr_weights))
            if info is not None:
                info["snr_db"] = snr_db
            speech_rms = float(np.sqrt(np.mean(np.square(clean)))) or 1e-4
            gain = speech_rms / (10.0 ** (snr_db / 20.0))
        else:
            gain = 10.0 ** (rng.uniform(-34.0, -18.0) / 20.0)
        noisy = noisy + gain * noise
    return clean, noisy


def build_corpus(n_seqs: int, seconds: float, seed: int):
    rng = np.random.default_rng(seed)
    kinds = ["mix", "mix", "mix", "mix", "noise", "clean"]
    n_frames = int(seconds * SAMPLE_RATE) // FRAME
    usable = n_frames * FRAME
    clean = np.zeros((n_seqs, n_frames, FRAME), np.float32)
    noisy = np.zeros((n_seqs, n_frames, FRAME), np.float32)
    codes = np.zeros(n_seqs, np.int32)
    for s in range(n_seqs):
        kind = kinds[s % len(kinds)]
        c, x = _sequence(rng, seconds, kind)
        clean[s] = c[:usable].reshape(n_frames, FRAME)
        noisy[s] = x[:usable].reshape(n_frames, FRAME)
        codes[s] = KIND_CODES[kind]
    return clean, noisy, codes


def _remat_frames(dfn3, params, st, frames, atten_lim_db, chunk=0):
    """``dfn3.dfn_frames`` with a rematerialized scan body, optionally
    with truncated BPTT.

    The training graphs differentiate through the whole frame scan;
    without remat the TPU backward pass of the LL variant blows up XLA
    compile time superlinearly in (batch x frames) — remat trades
    recompute for a backward graph the compiler can schedule. For the LL
    variant even the remat'ed monolithic backward does not compile at
    production shapes, so ``chunk > 0`` additionally truncates BPTT: the
    frame axis is scanned in chunks of ``chunk`` frames with the carried
    streaming state ``stop_gradient``-ed at chunk boundaries. The
    FORWARD values are identical to the monolithic scan (state still
    flows); only gradient flow across chunk borders is cut, and the
    backward program size becomes that of one chunk (measured on TPU v5
    lite: batch 8 x 200 frames compiles in ~35 s at chunk 25 where the
    monolithic LL backward previously never finished)."""
    import jax

    body = jax.checkpoint(
        lambda s, xf: dfn3.dfn_frame(params, s, xf, atten_lim_db)[:2])
    n_frames = frames.shape[0]
    if chunk <= 0 or n_frames <= chunk or n_frames % chunk:
        return jax.lax.scan(body, st, frames)

    def outer(carry, chunk_frames):
        st_in = jax.tree_util.tree_map(jax.lax.stop_gradient, carry)
        st_out, ys = jax.lax.scan(body, st_in, chunk_frames)
        return st_out, ys

    st_out, ys = jax.lax.scan(
        outer, st, frames.reshape((n_frames // chunk, chunk)
                                  + frames.shape[1:]))
    return st_out, ys.reshape((n_frames,) + ys.shape[2:])


def train(clean, noisy, steps, batch, lr, seed, low_latency=True,
          tbptt_frames=0, init_params=None):
    import jax
    import jax.numpy as jnp
    import optax

    from audioforge_tpu.models import dfn3

    params = (dict(init_params) if init_params is not None
              else dfn3.init_params(seed & 0xFFFF))
    opt = optax.chain(optax.clip_by_global_norm(1.0), optax.adam(lr))
    opt_state = opt.init(params)
    # LL: output frame t reconstructs input frame t-1 (1-frame OLA latency).
    # Standard: the 2-frame spec queue adds two more — frame t reconstructs
    # input t-3, and the gains it carries were predicted with 2 future
    # frames in view (genuine lookahead, `deepfilter_ffi.rs:40-43`).
    lat_frames = 1 if low_latency else 3

    def seq_loss(params, noisy_frames, clean_frames):
        st = dfn3.dfn_state_init(lookahead=not low_latency)
        _, ys = _remat_frames(dfn3, params, st, noisy_frames,
                              TRAIN_ATTEN_LIM_DB, chunk=tbptt_frames)
        est = ys[lat_frames:]
        ref = clean_frames[:-lat_frames]
        # compressed spectral magnitude L2 (DeepFilterNet loss shape) on the
        # same vorbis-windowed analysis the model itself uses
        from audioforge_tpu.ops.dft import rdft_auto

        def spec(frames):
            pairs = jnp.concatenate(
                [frames[:-1], frames[1:]], axis=-1) * dfn3._WINDOW
            X = rdft_auto(pairs, dfn3.WINDOW_SIZE)
            # eps inside the sqrt keeps |X| and |X|**gamma differentiable
            # at silence (grad of a bare magnitude explodes at 0)
            mag = jnp.sqrt(jnp.real(X) ** 2 + jnp.imag(X) ** 2 + 1e-9)
            # compressed complex spectrum |X|^gamma * e^{j phase}: the
            # phase-aware half of the DeepFilterNet loss — a magnitude-only
            # loss lets the deep-filtering FIR rotate phase freely, which
            # wrecks waveform SI-SDR while spectrograms still match
            comp = X * (mag ** (MAG_GAMMA - 1.0))
            return comp, mag ** MAG_GAMMA

        c_est, m_est = spec(est)
        c_ref, m_ref = spec(ref)
        mag_l = jnp.mean(jnp.square(m_est - m_ref))
        cplx_l = jnp.mean(jnp.square(jnp.abs(c_est - c_ref)))
        wave_l = jnp.mean(jnp.square(est - ref))
        return mag_l + cplx_l + WAVE_WEIGHT * wave_l

    def loss_fn(params, b_noisy, b_clean):
        return jnp.mean(
            jax.vmap(seq_loss, in_axes=(None, 0, 0))(params, b_noisy, b_clean)
        )

    @jax.jit
    def step(params, opt_state, b_noisy, b_clean):
        loss, grads = jax.value_and_grad(loss_fn)(params, b_noisy, b_clean)
        updates, opt_state = opt.update(grads, opt_state)
        return optax.apply_updates(params, updates), opt_state, loss

    import jax.numpy as jnp  # noqa: F811

    dev = jax.devices()[0]
    d_clean = jax.device_put(jnp.asarray(clean), dev)
    d_noisy = jax.device_put(jnp.asarray(noisy), dev)
    n = clean.shape[0]
    rng = np.random.default_rng(seed)
    history = []
    t0 = time.time()
    for i in range(steps):
        idx = jnp.asarray(rng.choice(n, size=min(batch, n), replace=False))
        params, opt_state, loss = step(
            params, opt_state, d_noisy[idx], d_clean[idx])
        if i % 25 == 0 or i == steps - 1:
            history.append({"step": i, "loss": float(loss)})
            print(f"step {i:5d} loss {float(loss):.6f} "
                  f"{time.time() - t0:.0f}s", flush=True)
    return params, history


def finetune(clean, noisy, kinds, params, steps, batch, lr, seed,
             low_latency=True, tbptt_frames=0):
    """Phase 2: optimise the held-out metric itself — waveform SI-SDR at
    the production 30 dB attenuation limit, backpropagated through the
    full ``dfn_frames`` graph. Per-kind objectives: mix -> SI-SDR
    improvement with a hinge at ``FT_HINGE_MARGIN_DB``; noise-only ->
    residual-energy ratio; clean -> passthrough relative MSE."""
    import jax
    import jax.numpy as jnp
    import optax

    from audioforge_tpu.models import dfn3

    lat = 1 if low_latency else 3
    n_seq, n_frames = clean.shape[:2]
    ref_np = clean[:, : n_frames - lat].reshape(n_seq, -1)
    noisy_np = noisy[:, : n_frames - lat].reshape(n_seq, -1)

    dot = np.sum(ref_np * noisy_np, -1)
    ref_e = np.sum(ref_np * ref_np, -1)
    alpha = dot / np.maximum(ref_e, 1e-12)
    err = noisy_np - alpha[:, None] * ref_np
    base_si = (10.0 * np.log10(
        np.maximum(alpha ** 2 * ref_e, 1e-12)
        / np.maximum(np.sum(err * err, -1), 1e-12))).astype(np.float32)
    noisy_energy = np.sum(noisy_np ** 2, -1).astype(np.float32)

    def seq_est(params, noisy_frames):
        st = dfn3.dfn_state_init(lookahead=not low_latency)
        _, ys = _remat_frames(dfn3, params, st, noisy_frames, 30.0,
                              chunk=tbptt_frames)
        return ys[lat:].reshape(-1)

    def loss_fn(params, b_noisy, b_ref, b_base, b_energy, b_kind):
        est = jax.vmap(seq_est, in_axes=(None, 0))(params, b_noisy)
        dot = jnp.sum(b_ref * est, -1)
        ref_e = jnp.sum(b_ref * b_ref, -1)
        alpha = dot / jnp.maximum(ref_e, 1e-12)
        err = est - alpha[:, None] * b_ref
        si = 10.0 * jnp.log10(
            jnp.maximum(alpha ** 2 * ref_e, 1e-12)
            / jnp.maximum(jnp.sum(err * err, -1), 1e-12))
        imp = si - b_base

        is_mix = b_kind == 0
        is_noise = b_kind == 1
        is_clean = b_kind == 2
        mix_term = (-imp / 10.0
                    + FT_HINGE_WEIGHT
                    * jax.nn.softplus(FT_HINGE_MARGIN_DB - imp))
        mix_loss = (jnp.sum(jnp.where(is_mix, mix_term, 0.0))
                    / jnp.maximum(jnp.sum(is_mix), 1))
        resid = jnp.sum(est * est, -1) / jnp.maximum(b_energy, 1e-12)
        noise_loss = (jnp.sum(jnp.where(is_noise, resid, 0.0))
                      / jnp.maximum(jnp.sum(is_noise), 1))
        rel_mse = (jnp.sum((est - b_ref) ** 2, -1)
                   / jnp.maximum(ref_e, 1e-12))
        clean_loss = (jnp.sum(jnp.where(is_clean, rel_mse, 0.0))
                      / jnp.maximum(jnp.sum(is_clean), 1))
        total = (mix_loss + FT_NOISE_WEIGHT * noise_loss
                 + FT_CLEAN_WEIGHT * clean_loss)
        mean_imp = (jnp.sum(jnp.where(is_mix, imp, 0.0))
                    / jnp.maximum(jnp.sum(is_mix), 1))
        min_imp = jnp.min(jnp.where(is_mix, imp, jnp.inf))
        return total, (mean_imp, min_imp)

    sched = optax.cosine_decay_schedule(lr, steps, alpha=0.05)
    # apply_if_finite: a single non-finite gradient batch must skip the
    # update, not poison the checkpoint (fails hard after 20 in a row)
    opt = optax.apply_if_finite(
        optax.chain(optax.clip_by_global_norm(1.0), optax.adam(sched)),
        max_consecutive_errors=20)
    opt_state = opt.init(params)

    @jax.jit
    def step(params, opt_state, b_noisy, b_ref, b_base, b_energy, b_kind):
        (loss, aux), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            params, b_noisy, b_ref, b_base, b_energy, b_kind)
        updates, opt_state = opt.update(grads, opt_state)
        return optax.apply_updates(params, updates), opt_state, loss, aux

    dev = jax.devices()[0]
    data = tuple(
        jax.device_put(jnp.asarray(a), dev)
        for a in (noisy, ref_np, base_si, noisy_energy, kinds)
    )

    # fresh-seed validation set on the deployment distribution (uniform
    # categories, deployment SNR regime) — disjoint from training (seed)
    # and held-out (seed + 1) streams
    v_rng = np.random.default_rng(seed + 1013)
    seconds = n_frames * FRAME / SAMPLE_RATE
    uniform_snr = tuple(1.0 / len(HELDOUT_SNR_GRID_DB)
                        for _ in HELDOUT_SNR_GRID_DB)
    uniform_cats = {c: 1.0 / len(NOISE_CATEGORIES) for c in NOISE_CATEGORIES}
    v_clean = np.zeros((FT_VAL_PAIRS, n_frames, FRAME), np.float32)
    v_noisy = np.zeros_like(v_clean)
    usable = n_frames * FRAME
    for s in range(FT_VAL_PAIRS):
        c, x = _sequence(
            v_rng, seconds, "mix", snr_grid=HELDOUT_SNR_GRID_DB,
            snr_weights=uniform_snr, category_weights=uniform_cats)
        v_clean[s] = c[:usable].reshape(n_frames, FRAME)
        v_noisy[s] = x[:usable].reshape(n_frames, FRAME)
    v_ref = v_clean[:, : n_frames - lat].reshape(FT_VAL_PAIRS, -1)
    v_na = v_noisy[:, : n_frames - lat].reshape(FT_VAL_PAIRS, -1)
    v_dot = np.sum(v_ref * v_na, -1)
    v_ref_e = np.sum(v_ref * v_ref, -1)
    v_alpha = v_dot / np.maximum(v_ref_e, 1e-12)
    v_err = v_na - v_alpha[:, None] * v_ref
    v_base = (10.0 * np.log10(
        np.maximum(v_alpha ** 2 * v_ref_e, 1e-12)
        / np.maximum(np.sum(v_err * v_err, -1), 1e-12))).astype(np.float32)
    v_data = tuple(jax.device_put(jnp.asarray(a), dev)
                   for a in (v_noisy, v_ref, v_base))

    @jax.jit
    def val_imp(params, b_noisy, b_ref, b_base):
        est = jax.vmap(seq_est, in_axes=(None, 0))(params, b_noisy)
        dot = jnp.sum(b_ref * est, -1)
        ref_e = jnp.sum(b_ref * b_ref, -1)
        alpha = dot / jnp.maximum(ref_e, 1e-12)
        err = est - alpha[:, None] * b_ref
        si = 10.0 * jnp.log10(
            jnp.maximum(alpha ** 2 * ref_e, 1e-12)
            / jnp.maximum(jnp.sum(err * err, -1), 1e-12))
        return si - b_base

    def val_score(params):
        imp = np.asarray(val_imp(params, *v_data))
        return (float(min(imp.min(), 1.0) * 100.0 + np.median(imp)),
                float(imp.min()), float(np.median(imp)))

    rng = np.random.default_rng(seed + 7)
    history = []
    best = None  # (score, params, step, min, median)
    t0 = time.time()
    for i in range(steps):
        idx = jnp.asarray(
            rng.choice(n_seq, size=min(batch, n_seq), replace=False))
        b = tuple(a[idx] for a in data)
        params, opt_state, loss, (mean_imp, min_imp) = step(
            params, opt_state, *b)
        if (i + 1) % FT_VAL_EVERY == 0 or i == steps - 1:
            score, v_min, v_med = val_score(params)
            if best is None or score > best[0]:
                best = (score, jax.tree_util.tree_map(
                    lambda a: np.asarray(a), params), i, v_min, v_med)
            history.append(
                {"step": i, "loss": float(loss),
                 "val_min_imp_db": round(v_min, 3),
                 "val_median_imp_db": round(v_med, 3)})
            print(f"ft   {i:5d} loss {float(loss):.4f} "
                  f"val(min {v_min:+.2f} med {v_med:+.2f} dB) "
                  f"best@{best[2]} {time.time() - t0:.0f}s", flush=True)
        elif i % 25 == 0:
            history.append(
                {"step": i, "loss": float(loss),
                 "batch_mean_imp_db": round(float(mean_imp), 3),
                 "batch_min_imp_db": round(float(min_imp), 3)})
            print(f"ft   {i:5d} loss {float(loss):.4f} "
                  f"(imp mean {float(mean_imp):+.2f} min "
                  f"{float(min_imp):+.2f} dB) {time.time() - t0:.0f}s",
                  flush=True)
    sel = {"selected_step": best[2], "val_pairs": FT_VAL_PAIRS,
           "val_min_imp_db": round(best[3], 3),
           "val_median_imp_db": round(best[4], 3)}
    print(f"ft   selected step {best[2]} "
          f"(val min {best[3]:+.2f}, median {best[4]:+.2f} dB)", flush=True)
    return jax.tree_util.tree_map(jnp.asarray, best[1]), history, sel


def _si_sdr(reference, estimate):
    alpha = float(np.dot(estimate, reference)
                  / max(np.dot(reference, reference), 1e-12))
    target = alpha * reference
    err = estimate - target
    return 10.0 * np.log10(max(np.dot(target, target), 1e-12)
                           / max(np.dot(err, err), 1e-12))


# held-out gate mixes live in the deployment SNR regime (same rationale as
# train_rnnoise_weights.HELDOUT_SNR_GRID_DB and the fullband corpus builder:
# the synthesis path caps output SI-SDR at ~15 dB even with oracle gains, so
# high-SNR pairs measure the cap, not suppression quality)
HELDOUT_SNR_GRID_DB = (5.0, 0.0, -5.0)


def heldout_si_sdr(params, n_pairs: int, seed: int, low_latency=True):
    """Held-out SI-SDR improvement through the FULL staging processor at
    the production runtime config (30 dB attenuation limit). Heldout
    measures the UNWEIGHTED deployment distribution.

    The gate requires both masker classes represented (>= 4 pure-babble /
    >= 12 non-babble, `_model_gates.py`); an unlucky uniform draw can
    under-fill a class, so after the base draw the SAME rng stream keeps
    drawing until the counts are met (pairs are only ever ADDED — every
    drawn pair scores, so the top-up cannot cherry-pick)."""
    from _model_gates import MIN_BABBLE_PAIRS, MIN_NONBABBLE_PAIRS

    from audioforge_tpu.models import dfn3

    rng = np.random.default_rng(seed)
    uniform_snr = tuple(1.0 / len(HELDOUT_SNR_GRID_DB)
                        for _ in HELDOUT_SNR_GRID_DB)
    uniform_cats = {c: 1.0 / len(NOISE_CATEGORIES) for c in NOISE_CATEGORIES}

    def counts(rows):
        babble = sum(1 for r in rows if set(r["categories"]) == {"babble"})
        return babble, len(rows) - babble

    rows = []
    while True:
        if len(rows) >= n_pairs:
            n_babble, n_non = counts(rows)
            if ((n_babble >= MIN_BABBLE_PAIRS
                 and n_non >= MIN_NONBABBLE_PAIRS)
                    or len(rows) >= n_pairs + 16):
                break
        info: dict = {}
        clean, noisy = _sequence(
            rng, 3.0, "mix", snr_grid=HELDOUT_SNR_GRID_DB,
            snr_weights=uniform_snr, category_weights=uniform_cats,
            info=info)
        n = min(clean.size, noisy.size)
        state = dfn3.processor_init(params, low_latency=low_latency)
        state, _ = dfn3.processor_push(state, noisy[:n])
        state, _ = dfn3.processor_process(state)
        state, out = dfn3.processor_pop(state, n)
        lat = dfn3.latency_samples(low_latency)
        aligned = np.asarray(out)[lat:]
        m = min(aligned.size, n - lat)
        rows.append({
            "improvement_db": float(_si_sdr(clean[:m], aligned[:m])
                                    - _si_sdr(clean[:m], noisy[:m])),
            "categories": info.get("categories", []),
            "snr_db": info.get("snr_db"),
        })
    return rows


def main() -> int:
    parser = argparse.ArgumentParser()
    parser.add_argument("--seqs", type=int, default=72)
    parser.add_argument("--seconds", type=float, default=2.0)
    parser.add_argument("--steps", type=int, default=900)
    parser.add_argument("--batch", type=int, default=8)
    parser.add_argument("--lr", type=float, default=1e-3)
    parser.add_argument("--ft-steps", type=int, default=500)
    parser.add_argument("--ft-lr", type=float, default=2e-4)
    parser.add_argument("--seed", type=int, default=SEED)
    parser.add_argument("--variant", choices=("standard", "ll"), default="ll",
                        help="latency variant: the two are different models "
                             "with their own archives (dfn3.npz / dfn3_ll.npz)")
    parser.add_argument("--output", type=Path, default=None)
    parser.add_argument("--heldout-pairs", type=int, default=24)
    parser.add_argument(
        "--init-from", type=Path, default=None,
        help="initialise training from an existing trained archive "
             "(e.g. models/dfn3.npz: the params pytree is shared between "
             "variants — only the streaming state differs — so the LL "
             "variant can start from the trained standard checkpoint "
             "instead of from scratch)")
    parser.add_argument(
        "--tbptt-frames", type=int, default=None,
        help="truncated-BPTT chunk (frames) for the training scans; "
             "default 25 for the LL variant (whose monolithic backward "
             "does not compile at production shapes) and 0 (off) for "
             "standard")
    parser.add_argument(
        "--eval-only", action="store_true",
        help="skip training: load the committed archive, re-run the "
             "seeded held-out evaluation (deterministic, so measurements "
             "match the original run, now with per-pair labels) and "
             "rewrite the report's heldout/gates blocks; the training "
             "block is kept from the run that produced the checkpoint")
    args = parser.parse_args()
    low_latency = args.variant == "ll"
    if args.output is None:
        name = "dfn3_ll.npz" if low_latency else "dfn3.npz"
        args.output = REPO_ROOT / "models" / name

    if args.eval_only:
        import json
        archive = np.load(args.output, allow_pickle=False)
        params = {k: np.asarray(archive[k]) for k in archive.files
                  if not k.startswith("__")}
        pairs = heldout_si_sdr(params, args.heldout_pairs, args.seed + 1,
                               low_latency=low_latency)
        improvements = [p["improvement_db"] for p in pairs]
        med = float(np.median(improvements))
        for p in pairs:
            print(f"  {p['improvement_db']:7.2f} dB  snr "
                  f"{p['snr_db']:5.1f}  {'+'.join(p['categories'])}",
                  flush=True)
        name = ("dfn3-training-report.json" if low_latency
                else "dfn3-standard-training-report.json")
        report = json.loads((EVALUATION_DIR / name).read_text())
        report["generated_at_utc"] = utc_now()
        report["heldout"] = {
            "pairs": len(pairs),
            "runtime_atten_lim_db": 30.0,
            "si_sdr_improvements_db": [round(v, 3) for v in improvements],
            "per_pair": [
                {"improvement_db": round(p["improvement_db"], 3),
                 "snr_db": p["snr_db"],
                 "categories": p["categories"]}
                for p in pairs
            ],
            "median_improvement_db": round(med, 3),
            "min_pair_improvement_db": round(float(min(improvements)), 3),
        }
        report["gates"] = compute_si_sdr_gates(pairs, min_pairs=24,
                                               min_median_db=5.0)
        write_report(name, report)
        print("eval-only gates:", report["gates"], flush=True)
        return 0 if report["gates"]["passed"] else 1

    t0 = time.time()
    print("building corpus...", flush=True)
    clean, noisy, kinds = build_corpus(args.seqs, args.seconds, args.seed)
    print(f"corpus {noisy.shape} in {time.time() - t0:.0f}s; training...",
          flush=True)

    tbptt = (args.tbptt_frames if args.tbptt_frames is not None
             else (25 if low_latency else 0))
    init_params = None
    if args.init_from is not None:
        import jax.numpy as jnp
        archive = np.load(args.init_from, allow_pickle=False)
        init_params = {k: jnp.asarray(archive[k]) for k in archive.files
                       if not k.startswith("__")}
        print(f"initialising from {args.init_from}", flush=True)
    params, history = train(
        clean, noisy, args.steps, args.batch, args.lr, args.seed,
        low_latency=low_latency, tbptt_frames=tbptt,
        init_params=init_params)
    ft_history, ft_selection = [], None
    if args.ft_steps > 0:
        print("phase 2: SI-SDR fine-tune at the production atten limit...",
              flush=True)
        params, ft_history, ft_selection = finetune(
            clean, noisy, kinds, params, args.ft_steps, args.batch,
            args.ft_lr, args.seed, low_latency=low_latency,
            tbptt_frames=tbptt)

    pairs = heldout_si_sdr(params, args.heldout_pairs, args.seed + 1,
                           low_latency=low_latency)
    improvements = [p["improvement_db"] for p in pairs]
    med = float(np.median(improvements))
    print(f"held-out SI-SDR improvement: median {med:.2f} dB "
          f"(min {min(improvements):.2f}, max {max(improvements):.2f})",
          flush=True)
    for p in pairs:
        print(f"  {p['improvement_db']:7.2f} dB  snr {p['snr_db']:5.1f}  "
              f"{'+'.join(p['categories'])}", flush=True)

    args.output.parent.mkdir(parents=True, exist_ok=True)
    np.savez(
        args.output,
        **{k: np.asarray(v, np.float32) for k, v in params.items()},
        __provenance__=np.asarray("trained"),
        __variant__=np.asarray(args.variant),
    )
    print(f"wrote {args.output}", flush=True)

    report = {
        "schema_version": 1,
        "generated_at_utc": utc_now(),
        "report": f"dfn3-training-{args.variant}",
        "variant": args.variant,
        "method": (
            "exact framework graph (ERB decoder + order-5 deep filtering) "
            "trained from scratch on a seeded synthetic speech+noise "
            "corpus; compressed-magnitude spectral loss (gamma 0.6) + "
            "waveform term; attenuation limit opened to 100 dB during "
            "training, then fine-tuned on waveform SI-SDR at the "
            "production 30 dB limit with a hinge at the per-pair floor; "
            "no third-party weights involved"
        ),
        "provenance": "trained",
        "corpus": {
            "sequences": args.seqs,
            "seconds_each": args.seconds,
            "snr_grid_db": list(SNR_GRID_DB),
            "noise_categories": list(NOISE_CATEGORIES),
            "seed": args.seed,
        },
        "training": {
            "steps": args.steps,
            "batch": args.batch,
            "lr": args.lr,
            "tbptt_frames": tbptt,
            "initialized_from": (str(args.init_from)
                                 if args.init_from else "scratch"),
            "train_atten_lim_db": TRAIN_ATTEN_LIM_DB,
            "loss_history": history[-8:],
            "finetune": {
                "steps": args.ft_steps,
                "lr": args.ft_lr,
                "atten_lim_db": 30.0,
                "hinge_margin_db": FT_HINGE_MARGIN_DB,
                "hinge_weight": FT_HINGE_WEIGHT,
                "checkpoint_selection": ft_selection,
                "loss_history": ft_history[-8:],
            },
            "wall_seconds": round(time.time() - t0, 1),
        },
        "domain_claim": (
            "all numbers hold in the synthetic formant-speech domain "
            "(analysis/speech_synth.py: glottal source + 3 formants + "
            "fricatives/plosives + speech-built babble); official-archive "
            "capability binds through the committed conversion contract "
            "(docs/dfn3_graph.md) once archives are supplied"
        ),
        "heldout": {
            "pairs": len(pairs),
            "runtime_atten_lim_db": 30.0,
            "si_sdr_improvements_db": [round(v, 3) for v in improvements],
            "per_pair": [
                {"improvement_db": round(p["improvement_db"], 3),
                 "snr_db": p["snr_db"],
                 "categories": p["categories"]}
                for p in pairs
            ],
            "median_improvement_db": round(med, 3),
            "min_pair_improvement_db": round(float(min(improvements)), 3),
        },
        "gates": compute_si_sdr_gates(pairs, min_pairs=24,
                                       min_median_db=5.0),
        "archive": (str(args.output.relative_to(REPO_ROOT))
                    if args.output.is_relative_to(REPO_ROOT)
                    else str(args.output)),
    }
    write_report("dfn3-training-report.json" if low_latency
                 else "dfn3-standard-training-report.json", report)
    if not report["gates"]["passed"]:
        print("TRAINING GATE FAILED:", report["gates"], flush=True)
        return 1
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
