"""Train Silero-graph VAD weights in-repo on a fully synthetic CC0 corpus.

This environment has no network egress, so the official Silero v6.2.1
checkpoint (`rust-core/Cargo.toml:63-66`, `release-assets.json` pin) cannot
be fetched. Instead the EXACT framework graph
(`audioforge_tpu/models/silero.py` — the committed 1:1 conversion contract
for official archives, `ONNX_NAME_MAP`) is trained from scratch on a
synthetic speech+noise corpus drawn from the same generator family as the
hash-pinned evaluation corpus (different seeds, randomized speaker profiles
over a wider range than the corpus' six pinned speakers). The result is a
real speech/noise discriminator for the synthetic-speech domain, saved to
``models/silero_vad.npz`` with ``__provenance__ = "trained"`` — converted
official archives drop in through the identical ``load_weights`` /
``discover_model_path`` path and simply replace it.

Training detail that matters for parity: windows are produced by the SAME
48 kHz -> 16 kHz ``decimate3`` path and the same 64-sample rolling-context
layout the runtime uses (`audioforge_tpu/models/silero.py:372-407`,
mirroring `rust-core/src/dsp/vad.rs:44-71,530-578`), and the LSTMCell state
chains across the whole take during training exactly as in streaming
inference, so the trained recurrence is the deployed recurrence.

Run: ``python tools/train_silero_weights.py [--steps N] [--seqs M]``.
Writes the archive plus ``evaluation/silero-training-report.json`` with the
held-out-speaker AUC on the pinned evaluation corpus.
"""

from __future__ import annotations

import argparse
import json
import sys
import time
import wave
from pathlib import Path

import numpy as np

REPO_ROOT = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO_ROOT))
sys.path.insert(0, str(REPO_ROOT / "tools"))

from _evaluation_common import utc_now, write_report  # noqa: E402
from build_vad_evaluation_corpus import _noise, _speech  # noqa: E402

from audioforge_tpu.cache import enable_compile_cache  # noqa: E402

# the BPTT scan and offline-analysis paths are compile-heavy; the
# persistent cache makes retrain iterations pay compile once
enable_compile_cache()

SAMPLE_RATE = 48000
SEED = 0x51E0A
NOISE_CATEGORIES = ("white", "pink", "hum", "keyboard", "engine", "babble")
# randomized speaker profiles spanning (and exceeding) the corpus' range
F0_RANGE = (95.0, 240.0)
TILT_RANGE = (0.7, 1.35)
RATE_RANGE = (1.6, 3.8)
SNR_GRID_DB = (0.0, 4.0, 8.0, 12.0, 20.0)

WINDOW_IN_48K = 1536  # one 512-sample 16 kHz model window
# per-window speech-fraction labeling: >= POS is speech, == 0 is noise,
# in-between (syllable boundaries) is masked out of the loss
POS_FRACTION = 0.25


# ---------------------------------------------------------------------------
# Corpus: sequences of model windows with chained context + labels
# ---------------------------------------------------------------------------


def _sequence(rng, seconds: float, kind: str):
    """One 48 kHz training sequence. Returns (audio, active) where
    ``active`` is the exact per-sample speech label."""
    n = int(seconds * SAMPLE_RATE)
    audio = np.zeros(n, np.float32)
    active = np.zeros(n, bool)
    if kind == "confounder":
        # tone confounders at speech-like level, labeled NON-speech: the
        # discriminator must not key on energy or harmonicity alone
        from audioforge_tpu.analysis.speech_synth import (
            TONE_CONFOUNDER_KINDS,
            tone_confounder,
        )

        tone = tone_confounder(
            rng, seconds,
            TONE_CONFOUNDER_KINDS[rng.integers(len(TONE_CONFOUNDER_KINDS))])
        level = 10.0 ** (rng.uniform(-30.0, -16.0) / 20.0)
        audio[: tone.size] = tone[:n] * level
        if rng.uniform() < 0.5:
            noise = _noise("pink", rng, n)
            audio += noise * 10.0 ** (rng.uniform(-40.0, -28.0) / 20.0)
        return audio, active
    if kind == "plain":
        # clean pulse-train/formant voices (the analysis layer's
        # voiced-capture family) as explicit positives: with tone
        # confounders as hard negatives but no static-spectrum speech
        # positives, the model learns "steady harmonic complex => not
        # speech" and silently breaks Auto-EQ voiced-window selection
        # (round-4 regression, tests/test_analysis.py)
        from audioforge_tpu.analysis.speech_synth import (
            synthesize_plain_voice,
            synthesize_test_voice,
        )

        if rng.uniform() < 0.5:
            voice, env = synthesize_plain_voice(rng, seconds)
        else:
            # the analysis suite's exact capture family (fixed formants,
            # 0.65-duty envelope at 1 Hz)
            voice = synthesize_test_voice(
                seconds, int(rng.integers(1 << 31)))
            t = np.arange(voice.size) / float(SAMPLE_RATE)
            env = np.mod(t, 1.0) < 0.65
        audio[: voice.size] = voice[:n]
        active[: env.size] = env[:n]
        if rng.uniform() < 0.5:
            noise = _noise("pink", rng, n)
            audio += noise * 10.0 ** (rng.uniform(-46.0, -34.0) / 20.0)
        return audio, active
    if kind != "noise":
        profile = (
            rng.uniform(*F0_RANGE),
            rng.uniform(*TILT_RANGE),
            rng.uniform(*RATE_RANGE),
        )
        speech, intervals = _speech(profile, rng, seconds)
        speech = speech[:n]
        level = 10.0 ** (rng.uniform(-30.0, -16.0) / 20.0)
        rms = float(np.sqrt(np.mean(np.square(speech)))) or 1.0
        audio[: speech.size] += speech * (level / rms)
        for lo, hi in intervals:
            active[lo : min(hi, n)] = True
    if kind != "clean":
        category = NOISE_CATEGORIES[rng.integers(len(NOISE_CATEGORIES))]
        noise = _noise(category, rng, n)
        if kind == "mix":
            snr_db = float(SNR_GRID_DB[rng.integers(len(SNR_GRID_DB))])
            speech_rms = float(
                np.sqrt(np.mean(np.square(audio[active])))
            ) if active.any() else 10.0 ** (-22.0 / 20.0)
            gain = speech_rms / (10.0 ** (snr_db / 20.0))
        else:
            gain = 10.0 ** (rng.uniform(-34.0, -18.0) / 20.0)
        audio += gain * noise
    return audio, active


def build_corpus(n_seqs: int, seconds: float, seed: int):
    """Window every sequence exactly like the offline analyzer: decimate the
    whole take 3:1, slice 512-sample windows, chain the 64-sample context
    from the previous window. Returns (model_ins [S, W, 576],
    labels [S, W], mask [S, W])."""
    from audioforge_tpu.models.silero import (
        CONTEXT_SIZE,
        WINDOW_SIZE,
    )
    from audioforge_tpu.ops.resample import decimate3, decimate3_init

    import jax.numpy as jnp

    rng = np.random.default_rng(seed)
    kinds = ["mix", "mix", "mix", "noise", "clean", "confounder", "plain"]
    n_windows = int(seconds * SAMPLE_RATE) // WINDOW_IN_48K
    model_ins = np.zeros((n_seqs, n_windows, 576), np.float32)
    labels = np.zeros((n_seqs, n_windows), np.float32)
    mask = np.zeros((n_seqs, n_windows), np.float32)
    for s in range(n_seqs):
        audio, active = _sequence(rng, seconds, kinds[s % len(kinds)])
        usable = n_windows * WINDOW_IN_48K
        _, x16 = decimate3(decimate3_init(), jnp.asarray(audio[:usable]))
        x16 = np.asarray(x16)[: n_windows * WINDOW_SIZE]
        windows = x16.reshape(n_windows, WINDOW_SIZE)
        ctx = np.concatenate(
            [np.zeros((1, CONTEXT_SIZE), np.float32),
             windows[:-1, WINDOW_SIZE - CONTEXT_SIZE:]], axis=0)
        model_ins[s] = np.concatenate([ctx, windows], axis=1)
        frac = active[:usable].reshape(n_windows, WINDOW_IN_48K).mean(axis=1)
        labels[s] = (frac >= POS_FRACTION).astype(np.float32)
        mask[s] = ((frac == 0.0) | (frac >= POS_FRACTION)).astype(np.float32)
    return model_ins, labels, mask


# ---------------------------------------------------------------------------
# Training: BPTT through the production scan
# ---------------------------------------------------------------------------


def train(model_ins, labels, mask, steps, batch, lr, seed):
    import jax
    import jax.numpy as jnp
    import optax

    from audioforge_tpu.models import silero

    params = silero.init_params(seed=seed & 0xFFFF)
    # the analytic STFT basis IS the official buffer — never trained
    frozen = {k: (k == "stft_basis") for k in params}
    opt = optax.chain(
        optax.clip_by_global_norm(1.0),
        optax.masked(optax.set_to_zero(), frozen),
        optax.adam(lr),
    )
    opt_state = opt.init(params)

    def seq_logits(params, seq_ins):
        """Raw posteriors for one sequence with the LSTM state chained,
        exactly the streaming recurrence."""
        state0 = jnp.zeros((2, 1, 128), jnp.float32)

        def body(state, window):
            p, state = silero.silero_infer(params, window[None, :], state)
            return state, p[0]

        _, probs = jax.lax.scan(body, state0, seq_ins)
        return probs

    def loss_fn(params, batch_ins, batch_labels, batch_mask):
        probs = jax.vmap(seq_logits, in_axes=(None, 0))(params, batch_ins)
        eps = 1e-6
        p = jnp.clip(probs, eps, 1.0 - eps)
        bce = -(batch_labels * jnp.log(p)
                + (1.0 - batch_labels) * jnp.log(1.0 - p))
        return (bce * batch_mask).sum() / jnp.maximum(batch_mask.sum(), 1.0)

    @jax.jit
    def step(params, opt_state, batch_ins, batch_labels, batch_mask):
        loss, grads = jax.value_and_grad(loss_fn)(
            params, batch_ins, batch_labels, batch_mask)
        updates, opt_state = opt.update(grads, opt_state)
        return optax.apply_updates(params, updates), opt_state, loss

    import jax.numpy as jnp  # noqa: F811

    dev = jax.devices()[0]
    data = tuple(jax.device_put(jnp.asarray(a), dev)
                 for a in (model_ins, labels, mask))
    n = model_ins.shape[0]
    rng = np.random.default_rng(seed)
    history = []
    t0 = time.time()
    for i in range(steps):
        idx = jnp.asarray(rng.choice(n, size=min(batch, n), replace=False))
        params, opt_state, loss = step(
            params, opt_state, *(a[idx] for a in data))
        if i % 50 == 0 or i == steps - 1:
            history.append({"step": i, "loss": float(loss)})
            print(f"step {i:5d} loss {float(loss):.5f} "
                  f"{time.time() - t0:.0f}s", flush=True)
    return params, history


# ---------------------------------------------------------------------------
# Held-out evaluation on the pinned corpus (unseen speakers + seeds)
# ---------------------------------------------------------------------------


def corpus_auc(params, split=None):
    """Window-level speech/noise AUC on ``models/vad_eval_corpus`` via the
    production offline path — the same computation
    ``tools/evaluate_converted_weight_parity.py`` gates on."""
    from audioforge_tpu.models.silero import analyze_vad_probabilities

    corpus = REPO_ROOT / "models" / "vad_eval_corpus"
    manifest = json.loads((corpus / "manifest.json").read_text())

    def read(path):
        with wave.open(str(corpus / path), "rb") as h:
            raw = h.readframes(h.getnframes())
        return np.frombuffer(raw, "<i2").astype(np.float32) / 32767.0

    speech_scores, noise_scores, confounder_scores = [], [], []
    for entry in manifest["captures"]:
        is_confounder = str(entry.get("condition", "")).startswith(
            "confounder")
        if (split is not None and entry.get("split") != split
                and not is_confounder):
            continue  # confounders always score (few captures, all splits)
        audio = read(entry["file"])
        probs = np.asarray(
            analyze_vad_probabilities(audio, 48_000, 0.48, params=params),
            float)
        if is_confounder:
            confounder_scores.extend(probs.tolist())
            continue
        intervals = entry.get("speech_intervals_samples") or []
        for w in range(len(probs)):
            lo, hi = w * WINDOW_IN_48K, (w + 1) * WINDOW_IN_48K
            in_speech = any(s < hi and e > lo for s, e in intervals)
            (speech_scores if in_speech else noise_scores).append(probs[w])

    def rank_auc(pos, neg):
        pos, neg = np.asarray(pos), np.asarray(neg)
        ranks = np.argsort(np.argsort(np.concatenate([pos, neg])))
        return float((ranks[: pos.size].sum()
                      - pos.size * (pos.size - 1) / 2)
                     / (pos.size * neg.size))

    auc = rank_auc(speech_scores, noise_scores)
    conf_auc = (rank_auc(speech_scores, confounder_scores)
                if confounder_scores else None)
    return auc, conf_auc, len(speech_scores), len(noise_scores)


# ---------------------------------------------------------------------------
# Downstream analysis-layer contract: a gate-passing checkpoint must not
# break Auto-EQ's voiced-capture validation (the round-4 cross-layer
# regression this gate exists to catch; reference keeps the analogous
# paired contracts in `python/tests/test_auto_eq.py:309-474`)
# ---------------------------------------------------------------------------

# the exact clean-voice family the analysis tests drive Auto-EQ with
# (tests/test_analysis.py::synth_voice delegates to synthesize_test_voice),
# plus the randomized plain pulse-train family for breadth
TEST_VOICE_SEEDS = (0, 3)
PLAIN_VOICE_SEEDS = (101, 202, 303)
MIN_DOWNSTREAM_VOICED_RATIO = 0.45


def downstream_voiced_capture(params):
    """Evaluate the candidate checkpoint against the analysis layer:
    offline-VAD-masked voiced window ratio on pinned clean voices from
    BOTH clean-voice families, plus full Auto-EQ validation on the exact
    signal the analysis tests use. Runs entirely from ``params``
    (nothing read from or written to ``models/``)."""
    from audioforge_tpu.analysis import auto_eq, spectrum
    from audioforge_tpu.analysis.speech_synth import (
        synthesize_plain_voice,
        synthesize_test_voice,
    )
    from audioforge_tpu.models.silero import analyze_vad_probabilities

    def posteriors(voice):
        return np.clip(np.asarray(
            analyze_vad_probabilities(voice, SAMPLE_RATE, 0.48,
                                      params=params), float), 0.0, 1.0)

    ratios = {}
    auto_eq_passed = None
    auto_eq_reason = None
    for seed in TEST_VOICE_SEEDS:
        voice = synthesize_test_voice(4.0, seed)
        probs = posteriors(voice)
        res = spectrum.analyze_voice_spectrum(
            voice, SAMPLE_RATE, vad_probabilities=probs)
        ratios[f"test_voice_{seed}"] = round(
            float(res.voiced_window_ratio), 4)
        if seed == TEST_VOICE_SEEDS[-1]:
            # the full Auto-EQ stack on the exact capture the analysis
            # tests assert on (test_auto_eq_gain_bounds_and_adjacency)
            try:
                _, validation = auto_eq.analyze_auto_eq(
                    voice, SAMPLE_RATE,
                    chain_settings={"compressor": {"enabled": False}},
                    vad_probabilities=probs)
                auto_eq_passed = bool(validation.passed)
                auto_eq_reason = None if validation.passed else str(
                    validation.reason)
            except ValueError as exc:
                auto_eq_passed = False
                auto_eq_reason = str(exc)
    for seed in PLAIN_VOICE_SEEDS:
        voice, _ = synthesize_plain_voice(np.random.default_rng(seed), 4.0)
        res = spectrum.analyze_voice_spectrum(
            voice, SAMPLE_RATE, vad_probabilities=posteriors(voice))
        ratios[f"plain_voice_{seed}"] = round(
            float(res.voiced_window_ratio), 4)
    worst = min(ratios.values())
    return {
        "pinned_captures": sorted(ratios),
        "voiced_window_ratio_by_capture": ratios,
        "worst_voiced_window_ratio": round(float(worst), 4),
        "auto_eq_validation_passed": auto_eq_passed,
        "auto_eq_validation_reason": auto_eq_reason,
        "min_voiced_window_ratio": MIN_DOWNSTREAM_VOICED_RATIO,
        "passed": bool(worst >= MIN_DOWNSTREAM_VOICED_RATIO
                       and auto_eq_passed),
    }


def main() -> int:
    parser = argparse.ArgumentParser()
    parser.add_argument("--seqs", type=int, default=160)
    parser.add_argument("--seconds", type=float, default=3.2)
    parser.add_argument("--steps", type=int, default=1200)
    parser.add_argument("--batch", type=int, default=16)
    parser.add_argument("--lr", type=float, default=1.5e-3)
    parser.add_argument("--seed", type=int, default=SEED)
    parser.add_argument("--output", type=Path,
                        default=REPO_ROOT / "models" / "silero_vad.npz")
    args = parser.parse_args()

    t0 = time.time()
    print("building corpus...", flush=True)
    model_ins, labels, mask = build_corpus(args.seqs, args.seconds, args.seed)
    pos = float((labels * mask).sum() / max(mask.sum(), 1.0))
    print(f"corpus {model_ins.shape} pos_rate {pos:.3f} in "
          f"{time.time() - t0:.0f}s; training...", flush=True)

    params, history = train(
        model_ins, labels, mask, args.steps, args.batch, args.lr, args.seed)

    auc_held, conf_held, sp_h, no_h = corpus_auc(params, split="held_out")
    auc_all, conf_all, sp_a, no_a = corpus_auc(params)
    print(f"pinned-corpus AUC: held_out {auc_held:.4f} "
          f"({sp_h}/{no_h} windows), all {auc_all:.4f}, "
          f"confounder {conf_held}", flush=True)

    print("downstream voiced-capture contract...", flush=True)
    downstream = downstream_voiced_capture(params)
    print(f"downstream: {downstream}", flush=True)

    gates_passed = bool(
        auc_held >= 0.90
        and (conf_held is None or conf_held >= 0.85)
        and downstream["passed"]
    )
    if gates_passed:
        # the archive is only ever replaced by a checkpoint that passes
        # BOTH the discrimination gates and the downstream analysis-layer
        # contract — a failing retrain can no longer overwrite working
        # weights
        args.output.parent.mkdir(parents=True, exist_ok=True)
        np.savez(
            args.output,
            **{k: np.asarray(v, np.float32) for k, v in params.items()},
            __provenance__=np.asarray("trained"),
        )
        print(f"wrote {args.output}", flush=True)
    else:
        print("gates failed — existing archive left untouched", flush=True)

    report = {
        "schema_version": 1,
        "generated_at_utc": utc_now(),
        "report": "silero-training",
        "method": (
            "exact framework graph (committed ONNX conversion contract) "
            "trained from scratch on a seeded synthetic speech+noise "
            "corpus with the production decimate3/context windowing and "
            "chained LSTM state; analytic STFT basis frozen; no "
            "third-party weights involved"
        ),
        "provenance": "trained",
        "corpus": {
            "sequences": args.seqs,
            "seconds_each": args.seconds,
            "snr_grid_db": list(SNR_GRID_DB),
            "noise_categories": list(NOISE_CATEGORIES),
            "positive_window_rate": round(pos, 4),
            "seed": args.seed,
        },
        "training": {
            "steps": args.steps,
            "batch": args.batch,
            "lr": args.lr,
            "loss_history": history[-8:],
            "wall_seconds": round(time.time() - t0, 1),
        },
        "domain_claim": (
            "all numbers hold in the synthetic formant-speech domain "
            "(analysis/speech_synth.py: glottal source + 3 formants + "
            "fricatives/plosives + speech-built babble + clean pulse-train "
            "plain voices) with tone confounders as hard negatives; no "
            "real-speech corpus exists in this egress-free environment, so "
            "real-speech capability binds only once converted official "
            "archives are supplied"
        ),
        "pinned_corpus_auc": {
            "held_out_speakers": round(auc_held, 4),
            "held_out_windows": [sp_h, no_h],
            "all_splits": round(auc_all, 4),
            "all_windows": [sp_a, no_a],
            "speech_confounder_auc_held_out": (
                None if conf_held is None else round(conf_held, 4)),
            "speech_confounder_auc_all": (
                None if conf_all is None else round(conf_all, 4)),
        },
        "downstream_analysis_contract": downstream,
        "gates": {
            "min_held_out_auc": 0.90,
            "min_speech_confounder_auc": 0.85,
            "downstream_voiced_capture_passed": downstream["passed"],
            "passed": gates_passed,
        },
        "archive_written": gates_passed,
        "archive": str(args.output.relative_to(REPO_ROOT))
        if args.output.is_relative_to(REPO_ROOT) else str(args.output),
    }
    write_report("silero-training-report.json", report)
    if not report["gates"]["passed"]:
        print("TRAINING GATE FAILED:", report["gates"], flush=True)
        return 1
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
