"""Health-chip decision logic for runtime metering (headless).

Behavioral contract mirrored from `python/mic_eq/ui/health.py`: diagnostics
map to a ``(text, state)`` chip where state is one of ``bad`` / ``warn`` /
``info`` / ``ok`` / ``idle``. The chip strings and thresholds are the compat
surface (UI snapshot tests and user-facing docs pin them); the evaluation is
expressed here as an ordered rule ladder — the first rule whose condition
holds wins, encoding the reference's precedence (clipping beats phase beats
cleanup beats level windows, etc.).
"""

from __future__ import annotations

__all__ = ["input_health_state", "output_health_state"]

# Level thresholds (dBFS unless noted) shared with the reference chips.
_IN_LOW_RMS = -65.0
_IN_HOT_RMS = -3.0
_IN_DENSE_RMS = -45.0          # density check only engages above this level
_IN_DENSE_CREST = 3.0          # ...when the crest factor collapses below this
_OUT_HOT_RMS = -1.0
_OUT_TP_HEADROOM_MIN = 0.75    # dB of true-peak headroom before warning
_OUT_LIMITER_HARD = 6.0        # dB of recent main-limiter GR
_OUT_TP_LIMITER_HARD = 3.0     # dB of recent true-peak-limiter GR
_LUFS_DISPLAY_FLOOR = -119.0   # below this the LUFS readout is meaningless


def _as_float(value):
    """Best-effort float coercion; diagnostics may carry None/str/NaN."""
    try:
        return float(value)
    except (TypeError, ValueError):
        return None


def input_health_state(
    *,
    rms_db,
    clip_delta: bool = False,
    phase_rescue_active: bool = False,
    cleanup_rumble_detected: bool = False,
    cleanup_hum_detected: bool = False,
    cleanup_mode: str = "off",
    crest_factor_db=None,
) -> tuple[str, str]:
    """Input chip ladder: clipping → phase rescue → cleanup events →
    level window → density → OK."""
    level = _as_float(rms_db)
    crest = _as_float(crest_factor_db)

    rules = (
        (clip_delta,
         lambda: ("Input: CLIPPING", "bad")),
        (phase_rescue_active,
         lambda: ("Input: PHASE", "warn")),
        (cleanup_rumble_detected,
         lambda: ("Input: CLEANUP RUMBLE",
                  "warn" if cleanup_mode == "strong" else "info")),
        (cleanup_hum_detected,
         lambda: ("Input: CLEANUP HUM", "info")),
        (level is None,
         lambda: ("Input: --", "idle")),
        (level is not None and level < _IN_LOW_RMS,
         lambda: (f"Input: LOW ({level:.0f}dB)", "warn")),
        (level is not None and level > _IN_HOT_RMS,
         lambda: (f"Input: HOT ({level:.0f}dB)", "warn")),
        (level is not None and crest is not None
         and level > _IN_DENSE_RMS and crest < _IN_DENSE_CREST,
         lambda: (f"Input: DENSE (CF:{crest:.1f}dB)", "warn")),
    )
    for hit, render in rules:
        if hit:
            return render()
    crest_part = "" if crest is None else f" CF:{crest:.0f}"
    return f"Input: OK ({level:.0f}dB{crest_part})", "ok"


def output_health_state(
    *,
    rms_db,
    clip_delta: bool = False,
    true_peak_delta: bool = False,
    output_clip_count: int = 0,
    true_peak_count: int = 0,
    true_peak_db=None,
    true_peak_headroom_db=None,
    short_term_lufs=None,
    limiter_history_db: float = 0.0,
    true_peak_limiter_history_db: float = 0.0,
) -> tuple[str, str]:
    """Output chip ladder: clip → hard limiting → true-peak events →
    low headroom → idle → hot → OK."""
    level = _as_float(rms_db)
    headroom = _as_float(true_peak_headroom_db)
    lim_gr = limiter_history_db
    tp_gr = true_peak_limiter_history_db

    rules = (
        (clip_delta,
         lambda: (f"Output: CLIP (OCL:{output_clip_count})", "bad")),
        (lim_gr >= _OUT_LIMITER_HARD or tp_gr >= _OUT_TP_LIMITER_HARD,
         lambda: (f"Output: LIMITING HARD (L:{lim_gr:.1f} TP:{tp_gr:.1f})",
                  "warn")),
        (true_peak_delta,
         lambda: (f"Output: TRUE PEAK (OTP:{true_peak_count})", "warn")),
        (headroom is not None and headroom < _OUT_TP_HEADROOM_MIN,
         lambda: (f"Output: LOW TP HEADROOM ({headroom:.1f}dB)", "warn")),
        (level is None,
         lambda: ("Output: --", "idle")),
        (level is not None and level > _OUT_HOT_RMS,
         lambda: (f"Output: HOT ({level:.0f}dB)", "warn")),
    )
    for hit, render in rules:
        if hit:
            return render()

    parts = [f"Output: OK ({level:.0f}dB"]
    true_peak = _as_float(true_peak_db)
    if true_peak is not None:
        parts.append(f" TP:{true_peak:.1f}")
    loudness = _as_float(short_term_lufs)
    if loudness is not None and loudness > _LUFS_DISPLAY_FLOOR:
        parts.append(f" LU:{loudness:.0f}")
    parts.append(")")
    return "".join(parts), "ok"
