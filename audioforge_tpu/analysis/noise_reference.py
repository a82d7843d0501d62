"""Room-noise reference integrity and cross-capture consistency.

Behavioural contract mirrors `python/mic_eq/analysis/noise_reference.py`:

- 200 ms / 50 %-overlap frame analysis with per-frame RMS, octave-band
  levels (125 Hz - 8 kHz), RMS spread, octave stability, spectral flux
  (`noise_reference.py:118-186`).
- Integrity rules: duration >= 1.5 s, finite samples, not silent, not
  clipped, stationarity and transient thresholds, VAD speech-contamination
  gates, metadata (device/mode/rate) mismatch detection, capture-age limits
  120 s questionable / 600 s invalid (`noise_reference.py:12-30,300-410`).
- Conservative spectrum: elementwise max of the explicit capture and
  credible in-capture quiet frames; consistency gates on level delta and
  spectral shape distance (`noise_reference.py:418-470`).
- Quality score: weighted geometric mean of component scores, capped 0.20
  when invalid / 0.64 when questionable (`noise_reference.py:472-510`).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Any, Mapping

import numpy as np

from .vad import VAD_NOISE_CONTAMINATION_THRESHOLD

MIN_NOISE_DURATION_S = 1.5
QUESTIONABLE_CAPTURE_AGE_S = 120.0
INVALID_CAPTURE_AGE_S = 600.0
OCTAVE_CENTERS_HZ = np.asarray([125.0, 250.0, 500.0, 1000.0, 2000.0, 4000.0, 8000.0])

__all__ = ["CaptureMetadata", "NoiseReferenceAnalysis", "analyze_noise_reference"]


@dataclass(frozen=True)
class CaptureMetadata:
    captured_at_unix_s: float | None = None
    input_device: str | None = None
    sample_rate: int | None = None
    channel_mode: str | None = None
    channel_count: int | None = None

    @classmethod
    def coerce(cls, value):
        if value is None:
            return cls()
        if isinstance(value, cls):
            return value
        if not isinstance(value, Mapping):
            raise TypeError("capture metadata must be a mapping or CaptureMetadata")

        def text(v):
            if v is None:
                return None
            s = str(v).strip()
            return s or None

        ts = value.get("captured_at_unix_s")
        sr = value.get("sample_rate")
        cc = value.get("channel_count")
        return cls(
            captured_at_unix_s=(
                float(ts) if ts is not None and np.isfinite(float(ts)) else None
            ),
            input_device=text(value.get("input_device")),
            sample_rate=int(sr) if sr is not None else None,
            channel_mode=text(value.get("channel_mode")),
            channel_count=int(cc) if cc is not None else None,
        )


@dataclass
class NoiseReferenceAnalysis:
    status: str
    quality_score: float
    usable: bool
    conservative: bool
    reasons: list[str]
    guidance: list[str]
    metrics: dict[str, Any]
    frequencies: np.ndarray
    explicit_spectrum_db: np.ndarray
    conservative_spectrum_db: np.ndarray
    in_capture_spectrum_db: np.ndarray | None = None
    conservative_noise_rms_db: float = -120.0

    def diagnostics(self) -> dict[str, Any]:
        return {
            "status": self.status,
            "quality_score": self.quality_score,
            "usable": self.usable,
            "conservative": self.conservative,
            "reasons": list(self.reasons),
            "guidance": list(self.guidance),
            "metrics": dict(self.metrics),
        }


def _rms_db(x):
    p = float(np.mean(np.square(x, dtype=np.float64))) if x.size else 0.0
    return float(10.0 * np.log10(max(p, 1e-18)))


def _peak_db(x):
    p = float(np.max(np.abs(x))) if x.size else 0.0
    return float(20.0 * np.log10(max(p, 1e-9)))


def _frame_stats(audio, sample_rate):
    """Batched 200 ms frame spectra + stationarity metrics
    (`noise_reference.py:118-186`). Returns None when too short."""
    frame = max(512, int(round(sample_rate * 0.20)))
    if audio.size < frame:
        return None
    hop = max(1, frame // 2)
    frames = np.lib.stride_tricks.sliding_window_view(audio, frame)[::hop]
    if frames.shape[0] == 0:
        return None
    centered = frames - frames.mean(axis=1, keepdims=True)
    power = np.mean(np.square(centered, dtype=np.float64), axis=1)
    frame_rms_db = 10.0 * np.log10(np.maximum(power, 1e-18))

    win = np.hanning(frame)
    norm = max(float(np.sum(win * win)), 1e-18)
    sp = np.square(np.abs(np.fft.rfft(centered * win, axis=1))) / norm
    spectra_db = 10.0 * np.log10(np.maximum(sp, 1e-18))
    freqs = np.fft.rfftfreq(frame, 1.0 / sample_rate)

    bands = []
    for c in OCTAVE_CENTERS_HZ:
        mask = (freqs >= c / np.sqrt(2.0)) & (freqs < min(c * np.sqrt(2.0), sample_rate * 0.49))
        if np.any(mask):
            bands.append(10.0 * np.log10(np.maximum(sp[:, mask].sum(axis=1), 1e-18)))
    band_db = np.column_stack(bands) if bands else np.empty((frames.shape[0], 0))

    rms_spread = float(np.percentile(frame_rms_db, 90) - np.percentile(frame_rms_db, 10))
    if band_db.shape[1]:
        spread = np.percentile(band_db, 90, axis=0) - np.percentile(band_db, 10, axis=0)
        octave_stability = float(np.median(spread))
        normed = band_db - np.median(band_db, axis=1, keepdims=True)
        flux = (
            float(np.percentile(np.median(np.abs(np.diff(normed, axis=0)), axis=1), 95))
            if normed.shape[0] >= 2
            else 0.0
        )
    else:
        octave_stability = 0.0
        flux = 0.0
    return {
        "freqs": freqs,
        "spectra_db": spectra_db,
        "median_db": np.median(spectra_db, axis=0),
        "frame_rms_db": frame_rms_db,
        "rms_spread_db": rms_spread,
        "octave_stability_db": octave_stability,
        "spectral_flux_db": flux,
    }


def _vad_per_frame(probabilities, frame_count):
    if probabilities is None or frame_count <= 0:
        return None
    p = np.asarray(probabilities, float).reshape(-1)
    if p.size == 0:
        return None
    src = (np.arange(p.size) + 0.5) / p.size
    dst = (np.arange(frame_count) + 0.5) / frame_count
    pc = np.clip(p, 0.0, 1.0)
    return np.interp(dst, src, pc, left=pc[0], right=pc[-1])


def _geometric_quality(parts):
    vals = np.clip([v for v, _ in parts], 0.0, 1.0)
    wts = np.asarray([max(0.0, w) for _, w in parts])
    if not len(parts) or wts.sum() <= 0:
        return 0.0
    wts = wts / wts.sum()
    return float(np.exp(np.sum(wts * np.log(np.maximum(vals, 0.02)))))


def _quiet_frames(speech_stats, speech_vad):
    """Credible in-capture quiet-frame spectrum
    (`noise_reference.py:252-278`)."""
    if speech_stats is None or speech_stats["spectra_db"].shape[0] < 4:
        return None, None, 0
    rms = speech_stats["frame_rms_db"]
    vad = _vad_per_frame(speech_vad, rms.size)
    if vad is not None:
        mask = (vad <= 0.25) & (rms <= float(np.percentile(rms, 35)))
    else:
        if float(np.percentile(rms, 90) - np.percentile(rms, 10)) < 6.0:
            return None, None, 0
        mask = rms <= float(np.percentile(rms, 15))
    minimum = max(3, int(np.ceil(rms.size * 0.05)))
    count = int(np.count_nonzero(mask))
    if count < minimum:
        return None, None, count
    return (
        np.median(speech_stats["spectra_db"][mask], axis=0),
        float(np.median(rms[mask])),
        count,
    )


def analyze_noise_reference(
    noise_audio, speech_audio, sample_rate, *,
    noise_metadata=None, speech_metadata=None,
    noise_vad_probabilities=None, speech_vad_probabilities=None,
) -> NoiseReferenceAnalysis:
    """Assess a room-noise capture, deriving status/quality/conservative
    spectrum (`noise_reference.py:280-546`)."""
    if sample_rate <= 0:
        raise ValueError("sample_rate must be positive")

    raw = np.asarray(noise_audio, float).reshape(-1)
    finite_mask = np.isfinite(raw)
    finite_fraction = float(np.mean(finite_mask)) if raw.size else 0.0
    noise = np.where(finite_mask, raw, 0.0)
    duration_s = float(noise.size / sample_rate)
    noise_rms_db = _rms_db(noise)
    noise_peak_db = _peak_db(noise)
    crest_db = max(0.0, noise_peak_db - noise_rms_db)
    clipped = float(np.mean(np.abs(noise) >= 0.999)) if noise.size else 0.0
    zeros = float(np.mean(np.abs(noise) <= 1e-12)) if noise.size else 1.0
    stats = _frame_stats(noise, sample_rate)

    reasons: list[str] = []
    guidance: list[str] = []
    invalid = questionable = False

    def flag(is_invalid, reason, guide):
        nonlocal invalid, questionable
        if is_invalid:
            invalid = True
        else:
            questionable = True
        reasons.append(reason)
        guidance.append(guide)

    if duration_s < MIN_NOISE_DURATION_S:
        flag(True, "room-noise capture is too short",
             f"Record at least {MIN_NOISE_DURATION_S:.1f} seconds of room tone.")
    if finite_fraction < 1.0:
        flag(True, "room-noise capture contains non-finite samples",
             "Restart the audio stream and record the room tone again.")
    if noise_rms_db <= -95.0 or (zeros >= 0.995 and noise_peak_db <= -90.0):
        flag(True, "room-noise capture is suspiciously silent",
             "Check the selected microphone and record normal room tone again.")
    if clipped > 0.001:
        flag(True, "room-noise capture is clipped",
             "Lower input gain or remove the transient source, then recapture.")
    elif clipped > 0.0:
        flag(False, "room-noise capture contains isolated clipped samples",
             "Recapture without taps or handling noise for a cleaner reference.")

    if stats is None:
        invalid = True
        reasons.append("room-noise capture has too few analysis windows")
        freqs = np.fft.rfftfreq(max(2, noise.size), 1.0 / sample_rate)
        explicit = np.full(freqs.shape, -120.0)
        rms_spread = octave_stab = flux = 120.0
    else:
        freqs = stats["freqs"]
        explicit = stats["median_db"]
        rms_spread = stats["rms_spread_db"]
        octave_stab = stats["octave_stability_db"]
        flux = stats["spectral_flux_db"]
        if rms_spread > 12.0 or octave_stab > 14.0:
            flag(True, "room-noise capture is dominated by changing events",
                 "Wait for the room to settle and record a new reference.")
        elif rms_spread > 6.0 or octave_stab > 8.0:
            flag(False, "room-noise capture is not stationary",
                 "Avoid movement, speech, and intermittent sounds while recapturing.")
        if flux > 10.0:
            flag(True, "room-noise capture contains dominant transient events",
                 "Recapture without keyboard, handling, or impact sounds.")
        elif flux > 6.0 or crest_db > 24.0:
            flag(False, "room-noise capture contains strong transients",
                 "Recapture without keyboard, handling, or impact sounds.")

    nvad = _vad_per_frame(
        noise_vad_probabilities,
        stats["frame_rms_db"].size if stats is not None else 0,
    )
    contamination = (
        float(np.mean(nvad >= VAD_NOISE_CONTAMINATION_THRESHOLD)) if nvad is not None else 0.0
    )
    contamination_p90 = float(np.percentile(nvad, 90)) if nvad is not None else 0.0
    if contamination > 0.30:
        flag(True, "speech is present in the room-noise capture",
             "Remain silent and record the room noise again.")
    elif contamination > 0.08 or contamination_p90 > 0.55:
        flag(False, "possible speech contamination in room-noise capture",
             "Record another room-noise sample without voices.")

    nmeta = CaptureMetadata.coerce(noise_metadata)
    smeta = CaptureMetadata.coerce(speech_metadata)
    meta_reasons = []
    for label, a, b in (
        ("input device", nmeta.input_device, smeta.input_device),
        ("input channel mode", nmeta.channel_mode, smeta.channel_mode),
        ("channel count", nmeta.channel_count, smeta.channel_count),
    ):
        if a is not None and b is not None and a != b:
            meta_reasons.append(f"{label} changed between noise and voice captures")
    for label, m in (("noise", nmeta), ("voice", smeta)):
        if m.sample_rate is not None and m.sample_rate != sample_rate:
            meta_reasons.append(f"{label} capture sample rate does not match analysis")
    if (nmeta.sample_rate is not None and smeta.sample_rate is not None
            and nmeta.sample_rate != smeta.sample_rate):
        meta_reasons.append("sample rate changed between noise and voice captures")
    if meta_reasons:
        invalid = True
        reasons.extend(meta_reasons)
        guidance.append(
            "Use the same microphone, channel mode, and sample rate for both captures."
        )
    age_s = None
    if nmeta.captured_at_unix_s is not None and smeta.captured_at_unix_s is not None:
        age_s = max(0.0, smeta.captured_at_unix_s - nmeta.captured_at_unix_s)
        if age_s > INVALID_CAPTURE_AGE_S:
            flag(True, "room-noise reference is stale",
                 "Record room noise immediately before the voice sample.")
        elif age_s > QUESTIONABLE_CAPTURE_AGE_S:
            flag(False, "room-noise reference may be stale",
                 "Recapture room noise under the current conditions.")

    speech = (
        np.asarray(speech_audio, float).reshape(-1)
        if speech_audio is not None
        else np.empty(0)
    )
    speech = np.where(np.isfinite(speech), speech, 0.0)
    sstats = _frame_stats(speech, sample_rate) if speech.size else None
    in_cap, in_cap_rms, in_cap_count = _quiet_frames(sstats, speech_vad_probabilities)

    level_delta = shape_dist = None
    conservative = explicit.copy()
    conservative_rms = noise_rms_db
    if in_cap is not None and sstats is not None and in_cap_rms is not None:
        in_cap = np.interp(freqs, sstats["freqs"], in_cap,
                           left=float(in_cap[0]), right=float(in_cap[-1]))
        level_delta = float(in_cap_rms - noise_rms_db)
        vmask = (freqs >= 80.0) & (freqs <= 8000.0)
        if not np.any(vmask):
            vmask = np.ones(freqs.shape, bool)
        e_shape = explicit[vmask] - float(np.median(explicit[vmask]))
        c_shape = in_cap[vmask] - float(np.median(in_cap[vmask]))
        shape_dist = float(np.median(np.abs(e_shape - c_shape)))
        conservative = np.maximum(explicit, in_cap)
        conservative_rms = max(noise_rms_db, in_cap_rms)
        if level_delta > 12.0 or shape_dist > 10.0:
            flag(True, "room noise does not match conditions during the voice capture",
                 "Recapture room noise and voice without changing the environment.")
        elif level_delta > 6.0 or shape_dist > 5.5:
            flag(False, "room-noise reference only partly matches the voice capture",
                 "Recapture both samples for a more reliable correction.")
        elif level_delta < -20.0:
            flag(True, "room-noise level changed substantially before the voice capture",
                 "Record room noise and voice under the same conditions.")
        elif level_delta < -12.0:
            flag(False, "room-noise reference is much louder than in-capture quiet frames",
                 "Check whether the noise source changed between captures.")

    consistency = 1.0
    if level_delta is not None:
        consistency *= float(np.clip(1.0 - max(0.0, level_delta) / 12.0, 0, 1))
    if shape_dist is not None:
        consistency *= float(np.clip(1.0 - shape_dist / 10.0, 0, 1))
    quality = _geometric_quality([
        (float(np.clip(duration_s / 3.0, 0, 1)), 0.10),
        (float(np.clip((finite_fraction - 0.995) / 0.005, 0, 1)), 0.10),
        (float(np.clip(1.0 - rms_spread / 12.0, 0, 1)), 0.18),
        (float(np.clip(1.0 - octave_stab / 14.0, 0, 1)), 0.15),
        (float(np.clip(1.0 - max(0.0, crest_db - 12.0) / 18.0, 0, 1)), 0.10),
        (float(np.clip(1.0 - contamination / 0.30, 0, 1)), 0.15),
        (consistency, 0.17),
        (
            1.0 if age_s is None
            else float(np.clip(1.0 - age_s / INVALID_CAPTURE_AGE_S, 0, 1)),
            0.05,
        ),
    ])
    if invalid:
        quality = min(quality, 0.20)
        status = "invalid"
    elif questionable:
        quality = min(quality, 0.64)
        status = "questionable"
    else:
        status = "usable"

    metrics = {
        "duration_s": duration_s,
        "finite_fraction": finite_fraction,
        "noise_rms_db": noise_rms_db,
        "conservative_noise_rms_db": conservative_rms,
        "noise_peak_db": noise_peak_db,
        "crest_factor_db": crest_db,
        "clipped_fraction": clipped,
        "zero_fraction": zeros,
        "rms_spread_db": rms_spread,
        "octave_stability_db": octave_stab,
        "spectral_flux_db": flux,
        "vad_contamination_ratio": contamination,
        "vad_contamination_p90": contamination_p90,
        "capture_age_s": age_s,
        "identity_metadata_available": bool(
            nmeta.input_device is not None and smeta.input_device is not None
        ),
        "in_capture_noise_frame_count": in_cap_count,
        "in_capture_level_delta_db": level_delta,
        "spectral_shape_distance_db": shape_dist,
    }
    return NoiseReferenceAnalysis(
        status=status,
        quality_score=float(np.clip(quality, 0.0, 1.0)),
        usable=not invalid,
        conservative=bool(questionable or invalid or in_cap is not None),
        reasons=list(dict.fromkeys(reasons)),
        guidance=list(dict.fromkeys(guidance)),
        metrics=metrics,
        frequencies=freqs,
        explicit_spectrum_db=explicit,
        conservative_spectrum_db=conservative,
        in_capture_spectrum_db=in_cap,
        conservative_noise_rms_db=conservative_rms,
    )
