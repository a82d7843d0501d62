"""Headless EQ graph-editor model.

The testable core of the reference's `EQCurveWidget`
(`python/mic_eq/ui/eq_curve.py:19-330`): log-frequency/dB coordinate
transforms, nearest-handle hit-testing, the drag lifecycle
(start → move → finish, Escape cancels back to the drag origin), keyboard
editing (band cycling with ``[``/``]``, 1/48- or 1/12-octave frequency
nudges, 0.1/1.0 dB gain nudges), overlay comparison curves, and band
markers — everything the Qt widget does except painting. The rendered
response always comes from the native ``eq_magnitude_response_v2`` so the
graph editor and the DSP agree exactly (`eq_curve.py:87-94`).

Bands are the typed 6-tuples of EQ schema v2:
``(filter_type, frequency_hz, gain_db, q, slope_db_per_octave, enabled)``.
Interaction events are returned as ``(event_name, band_index, freq, gain)``
tuples instead of Qt signals.
"""

from __future__ import annotations

import math
from dataclasses import dataclass, field

__all__ = ["EqCurveModel", "DragEvent"]

_GAIN_FILTER_TYPES = frozenset({"bell", "low_shelf", "high_shelf"})


@dataclass(frozen=True)
class DragEvent:
    """One interaction outcome (`eq_curve.py:22-25`)."""

    name: str  # started | dragged | finished | cancelled
    band_index: int
    frequency_hz: float
    gain_db: float


def _default_bands():
    from ..config.settings import EQSettings

    return [
        (b.filter_type, b.frequency_hz, b.gain_db, b.q,
         b.slope_db_per_octave, b.enabled)
        for b in EQSettings().bands
    ]


@dataclass
class EqCurveModel:
    # geometry contract (`eq_curve.py:27-38`)
    width: float = 600.0
    height: float = 300.0
    margin_left: float = 40.0
    margin_right: float = 10.0
    margin_top: float = 10.0
    margin_bottom: float = 20.0
    frequency_min_hz: float = 20.0
    frequency_max_hz: float = 20_000.0
    gain_min_db: float = -12.0
    gain_max_db: float = 12.0
    display_db_min: float = -15.0
    display_db_max: float = 15.0
    hit_radius: float = 11.0
    sample_rate: float = 48000.0
    response_points: int = 100

    bands: list = field(default_factory=_default_bands)
    overlay_bands: list = field(default_factory=list)
    band_markers: list = field(default_factory=list)
    interaction_warnings: list = field(default_factory=list)
    show_overlay: bool = False

    selected_band_index: int | None = None
    _drag_band_index: int | None = None
    _drag_origin: tuple | None = None

    def __post_init__(self):
        self.freq_points = self._log_frequencies(
            self.frequency_min_hz, self.frequency_max_hz, self.response_points
        )
        self.response_db = [0.0] * len(self.freq_points)
        self.overlay_response_db: list | None = None
        self._update_response()

    # ---- coordinate transforms (`eq_curve.py:96-150`) ----

    def _plot_size(self):
        return (
            max(1.0, self.width - self.margin_left - self.margin_right),
            max(1.0, self.height - self.margin_top - self.margin_bottom),
        )

    @staticmethod
    def _log_frequencies(f_min, f_max, num_points):
        log_min, log_max = math.log10(f_min), math.log10(f_max)
        step = (log_max - log_min) / (num_points - 1)
        return [10.0 ** (log_min + i * step) for i in range(num_points)]

    def frequency_to_x(self, frequency_hz: float) -> float:
        plot_width, _ = self._plot_size()
        frequency = min(self.frequency_max_hz,
                        max(self.frequency_min_hz, float(frequency_hz)))
        normalized = (math.log10(frequency) - math.log10(self.frequency_min_hz)) / (
            math.log10(self.frequency_max_hz) - math.log10(self.frequency_min_hz)
        )
        return self.margin_left + normalized * plot_width

    def x_to_frequency(self, x: float) -> float:
        """Map x back to a clamped 1 Hz-precision value (`eq_curve.py:128`) —
        drags land on whole hertz, matching the numeric spin boxes."""
        plot_width, _ = self._plot_size()
        normalized = min(1.0, max(0.0, (float(x) - self.margin_left) / plot_width))
        log_frequency = math.log10(self.frequency_min_hz) + normalized * (
            math.log10(self.frequency_max_hz) - math.log10(self.frequency_min_hz)
        )
        return float(round(10.0 ** log_frequency))

    def gain_to_y(self, gain_db: float) -> float:
        _, plot_height = self._plot_size()
        gain = min(self.gain_max_db, max(self.gain_min_db, float(gain_db)))
        normalized = (self.display_db_max - gain) / (
            self.display_db_max - self.display_db_min
        )
        return self.margin_top + normalized * plot_height

    def y_to_gain(self, y: float) -> float:
        """Map y back to clamped 0.1 dB precision (`eq_curve.py:139-150`) —
        the drag quantum equals the keyboard fine-nudge step."""
        _, plot_height = self._plot_size()
        normalized = min(1.0, max(0.0, (float(y) - self.margin_top) / plot_height))
        display_gain = self.display_db_max - normalized * (
            self.display_db_max - self.display_db_min
        )
        clamped = min(self.gain_max_db, max(self.gain_min_db, display_gain))
        return round(clamped * 10.0) / 10.0

    # ---- hit testing (`eq_curve.py:152-170`) ----

    def band_handle_position(self, band_index: int):
        filter_type, frequency, gain = self.bands[band_index][:3]
        handle_gain = gain if filter_type in _GAIN_FILTER_TYPES else 0.0
        return self.frequency_to_x(frequency), self.gain_to_y(handle_gain)

    def nearest_band_handle(self, x: float, y: float) -> int | None:
        nearest = None
        for index in range(len(self.bands)):
            handle_x, handle_y = self.band_handle_position(index)
            distance = math.hypot(float(x) - handle_x, float(y) - handle_y)
            if distance <= self.hit_radius and (
                nearest is None or distance < nearest[0]
            ):
                nearest = (distance, index)
        return None if nearest is None else nearest[1]

    # ---- drag lifecycle (`eq_curve.py:202-247`) ----

    def press(self, x: float, y: float) -> DragEvent | None:
        band_index = self.nearest_band_handle(x, y)
        if band_index is None:
            return None
        self.selected_band_index = band_index
        self._drag_band_index = band_index
        band = self.bands[band_index]
        self._drag_origin = (float(band[1]), float(band[2]))
        return DragEvent("started", band_index, float(band[1]), float(band[2]))

    def move(self, x: float, y: float) -> DragEvent | None:
        if self._drag_band_index is None:
            return None
        frequency, gain = self._apply_drag(x, y)
        return DragEvent("dragged", self._drag_band_index, frequency, gain)

    def release(self, x: float, y: float) -> DragEvent | None:
        if self._drag_band_index is None:
            return None
        band_index = self._drag_band_index
        frequency, gain = self._apply_drag(x, y)
        self._drag_band_index = None
        self._drag_origin = None
        return DragEvent("finished", band_index, frequency, gain)

    def cancel_drag(self) -> DragEvent | None:
        """Escape: restore the drag-origin frequency/gain (`eq_curve.py:263-285`)."""
        if self.selected_band_index is None or self._drag_origin is None:
            return None
        band_index = self.selected_band_index
        frequency, gain = self._drag_origin
        filter_type, _f, _g, q, slope, enabled = self.bands[band_index]
        self.bands[band_index] = (filter_type, frequency, gain, q, slope, enabled)
        self._drag_band_index = None
        self._drag_origin = None
        self._update_response()
        return DragEvent("cancelled", band_index, frequency, gain)

    def _apply_drag(self, x: float, y: float):
        filter_type, _frequency, gain, q, slope, enabled = self.bands[
            self._drag_band_index
        ]
        frequency = self.x_to_frequency(x)
        if filter_type in _GAIN_FILTER_TYPES:
            gain = self.y_to_gain(y)
        self.bands[self._drag_band_index] = (
            filter_type, frequency, float(gain), q, slope, enabled,
        )
        self._update_response()
        return frequency, float(gain)

    # ---- keyboard editing (`eq_curve.py:249-326`) ----

    def cycle_selection(self, direction: int) -> int:
        current = self.selected_band_index
        self.selected_band_index = (
            0 if current is None else (current + direction) % len(self.bands)
        )
        return self.selected_band_index

    def nudge(self, key: str, coarse: bool = False) -> list[DragEvent]:
        """Arrow-key nudge on the selected band; returns the synthetic
        started/dragged/finished burst the widget emits (`eq_curve.py:291-326`)."""
        if self.selected_band_index is None:
            return []
        band_index = self.selected_band_index
        filter_type, frequency, gain, q, slope, enabled = self.bands[band_index]
        if key in ("left", "right"):
            direction = -1.0 if key == "left" else 1.0
            octave_step = (1.0 / 12.0) if coarse else (1.0 / 48.0)
            frequency = min(
                self.frequency_max_hz,
                max(self.frequency_min_hz,
                    round(frequency * 2.0 ** (direction * octave_step))),
            )
        elif key in ("up", "down") and filter_type in _GAIN_FILTER_TYPES:
            direction = 1.0 if key == "up" else -1.0
            gain_step = 1.0 if coarse else 0.1
            gain = min(
                self.gain_max_db,
                max(self.gain_min_db,
                    round((gain + direction * gain_step) * 10.0) / 10.0),
            )
        elif key not in ("up", "down"):
            return []
        self.bands[band_index] = (
            filter_type, float(frequency), float(gain), q, slope, enabled,
        )
        self._update_response()
        return [
            DragEvent("started", band_index, float(frequency), float(gain)),
            DragEvent("dragged", band_index, float(frequency), float(gain)),
            DragEvent("finished", band_index, float(frequency), float(gain)),
        ]

    # ---- model sync (`eq_curve.py:361-489`) ----

    @staticmethod
    def _positional_filter_type(index: int) -> str:
        """Legacy 3-field bands carry no type; infer it from the slot the
        way the widget does (`eq_curve.py:407-414`): band 0 is the low
        shelf, band 9 the high shelf, everything else a bell."""
        return "low_shelf" if index == 0 else (
            "high_shelf" if index == 9 else "bell")

    def set_band_params(self, band_index, frequency, gain_db, q):
        """Legacy single-band update — frequency/gain/Q only, the typed
        fields survive (`eq_curve.py:354-371`)."""
        if 0 <= band_index < len(self.bands):
            filter_type, _f, _g, _q, slope, enabled = self.bands[band_index]
            self.bands[band_index] = (
                filter_type, float(frequency), float(gain_db), float(q),
                slope, enabled,
            )
            self._update_response()

    def set_band_config(self, band_index, filter_type, frequency, gain_db, q,
                        slope, enabled):
        if 0 <= band_index < len(self.bands):
            self.bands[band_index] = (
                str(filter_type), float(frequency), float(gain_db), float(q),
                int(slope), bool(enabled),
            )
            self._update_response()

    def set_all_params(self, bands):
        """Bulk update accepting native v2 6-tuples OR legacy
        ``(frequency, gain, Q)`` 3-tuples (`eq_curve.py:399-438`); extra
        entries beyond the model's band count are ignored, any other arity
        raises."""
        for i, band in enumerate(bands):
            if i >= len(self.bands):
                break
            if len(band) == 3:
                freq, gain_db, q = band
                self.bands[i] = (
                    self._positional_filter_type(i), float(freq),
                    float(gain_db), float(q), 12, True,
                )
            elif len(band) == 6:
                filter_type, freq, gain_db, q, slope, enabled = band
                self.bands[i] = (
                    str(filter_type), float(freq), float(gain_db), float(q),
                    int(slope), bool(enabled),
                )
            else:
                raise ValueError(
                    "EQ bands must contain either 3 legacy or 6 typed fields"
                )
        self._update_response()

    def set_overlay_params(self, bands):
        """Overlay comparison curve from legacy ``(frequency, gain, Q)``
        tuples, types inferred positionally (`eq_curve.py:441-469`)."""
        self.overlay_bands = [
            (self._positional_filter_type(i), float(freq), float(gain_db),
             float(q), 12, True)
            for i, (freq, gain_db, q) in enumerate(bands)
        ]
        self.show_overlay = True
        self.overlay_response_db = self._native_response(self.overlay_bands)

    def clear_overlay(self):
        self.overlay_bands = []
        self.show_overlay = False
        self.overlay_response_db = None

    def set_band_markers(self, frequencies_hz):
        self.band_markers = [float(f) for f in frequencies_hz]

    def clear_band_markers(self):
        self.band_markers = []

    # ---- response rendering (`eq_curve.py:87-94,327-359`) ----

    def _native_response(self, bands):
        from ..api import eq_magnitude_response_v2

        return [
            float(v)
            for v in eq_magnitude_response_v2(
                self.freq_points, bands, self.sample_rate
            )
        ]

    def _update_response(self):
        self.response_db = self._native_response(self.bands)
        from ..analysis.eq_quality import (EqInteractionWarning,
                                           evaluate_eq_quality)

        freqs = [b[1] for b in self.bands]
        # pass filters have no meaningful gain field — treat as 0 like the
        # widget does (`eq_curve.py:330-336`)
        gains = [b[2] if b[0] in _GAIN_FILTER_TYPES and b[5] else 0.0
                 for b in self.bands]
        qs = [b[3] for b in self.bands]
        metrics = evaluate_eq_quality(freqs, gains, qs, self.sample_rate)
        warnings = list(metrics.warnings)
        # the analytic grid can miss boost that only the exact rendered
        # cascade shows (pass-filter interactions): synthesize max_boost
        # from the native response when absent (`eq_curve.py:338-353`)
        max_index = max(range(len(self.response_db)),
                        key=self.response_db.__getitem__)
        max_boost_db = self.response_db[max_index]
        if (max_boost_db > 10.5
                and not any(w.kind == "max_boost" for w in warnings)):
            warnings.append(EqInteractionWarning(
                "max_boost",
                float(self.freq_points[max_index]),
                min(1.0, (max_boost_db - 10.5) / 6.0),
                "Combined boost is high",
            ))
        warnings.sort(key=lambda w: w.severity, reverse=True)
        self.interaction_warnings = warnings
