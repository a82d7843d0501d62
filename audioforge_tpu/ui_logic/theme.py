"""Semantic theme tokens and contrast math (headless).

The Qt-free core of the reference's `python/mic_eq/ui/theme.py`: the
semantic palette used by every panel, WCAG relative-luminance/contrast-ratio
helpers that its tests gate on (`theme.py:136-189`), and the reduced-motion
preference probe (`theme.py:191-218`). Rendering front-ends map these tokens
onto their own color roles; the framework itself only needs the contracts.
"""

from __future__ import annotations

import os
from dataclasses import dataclass

__all__ = [
    "SemanticPalette",
    "PALETTE",
    "relative_luminance",
    "contrast_ratio",
    "meets_contrast",
    "prefers_reduced_motion",
]


@dataclass(frozen=True)
class SemanticPalette:
    """Dark-theme semantic tokens (`theme.py:24-82`)."""

    app_surface: str = "#1b1e24"
    control_surface: str = "#242830"
    control_surface_alt: str = "#20242b"
    text_primary: str = "#e8eaed"
    text_muted: str = "#9aa0a6"
    text_on_emphasis: str = "#ffffff"
    action_primary: str = "#3d6fd9"
    action_secondary: str = "#2c313a"
    action_disabled_surface: str = "#262a31"
    action_disabled_text: str = "#6b7178"
    accent: str = "#8ab4f8"
    success: str = "#34a853"
    warning: str = "#fbbc04"
    error: str = "#ea4335"
    meter_low: str = "#34a853"
    meter_mid: str = "#fbbc04"
    meter_high: str = "#ea4335"


PALETTE = SemanticPalette()


def _rgb(value: str) -> tuple[int, int, int]:
    text = value.lstrip("#")
    if len(text) != 6:
        raise ValueError(f"expected #rrggbb color, got {value!r}")
    return tuple(int(text[i : i + 2], 16) for i in (0, 2, 4))


def _linear_channel(channel: int) -> float:
    """sRGB → linear transfer (`theme.py:136-139`)."""
    scaled = channel / 255.0
    if scaled <= 0.04045:
        return scaled / 12.92
    return ((scaled + 0.055) / 1.055) ** 2.4


def relative_luminance(value: str) -> float:
    """WCAG 2.x relative luminance of a ``#rrggbb`` color (`theme.py:141-152`)."""
    r, g, b = (_linear_channel(c) for c in _rgb(value))
    return 0.2126 * r + 0.7152 * g + 0.0722 * b


def contrast_ratio(foreground: str, background: str) -> float:
    """WCAG contrast ratio, always >= 1 (`theme.py:154-163`)."""
    lighter = max(relative_luminance(foreground), relative_luminance(background))
    darker = min(relative_luminance(foreground), relative_luminance(background))
    return (lighter + 0.05) / (darker + 0.05)


def meets_contrast(foreground: str, background: str, *, large_text: bool = False) -> bool:
    """WCAG AA: 4.5:1 for body text, 3:1 for large text."""
    return contrast_ratio(foreground, background) >= (3.0 if large_text else 4.5)


def prefers_reduced_motion() -> bool:
    """Respect an explicit reduced-motion preference (`theme.py:191-218`).

    Headless probe order: the framework env override, then common desktop
    conventions. Any value of ``AUDIOFORGE_REDUCED_MOTION`` other than
    ``0``/``false`` enables it.
    """
    override = os.environ.get("AUDIOFORGE_REDUCED_MOTION")
    if override is not None:
        return override.strip().lower() not in {"", "0", "false", "no"}
    return os.environ.get("GTK_ENABLE_ANIMATIONS", "").strip() == "0"
