"""Shared config primitives: versioning, persistence paths, device identity.

Mirrors `python/mic_eq/config_parts/shared.py`: `CURRENT_VERSION` 1.11.2,
APPDATA-style config dir with legacy-dir migration (`shared.py:38-75`),
rename-stable `DeviceIdentity` keyed on Core-Audio-style endpoint ids
(`shared.py:77-185`), and deterministic per-route latency-profile keys.
"""

from __future__ import annotations

import json
import math
import os
import shutil
from dataclasses import dataclass, field
from pathlib import Path

CURRENT_VERSION = "1.11.2"
APPDATA_DIR_NAME = "AudioForge"
LEGACY_APPDATA_DIR_NAME = "MicEq"

__all__ = [
    "APPDATA_DIR_NAME",
    "CURRENT_VERSION",
    "DeviceIdentity",
    "LEGACY_APPDATA_DIR_NAME",
    "PresetValidationError",
    "_reject_json_constant",
    "_version_tuple",
    "build_device_route_key",
    "build_latency_profile_key",
    "coerce_device_identity",
    "get_config_file",
    "get_preset_imports_dir",
    "get_presets_dir",
    "legacy_latency_profile_key",
    "parse_latency_profile_key",
]


class PresetValidationError(Exception):
    """Raised when preset or config validation fails with actionable detail."""


def _reject_json_constant(value: str) -> None:
    raise PresetValidationError(f"Invalid JSON constant in preset/config: {value}")


def _version_tuple(version: str) -> tuple[int, int, int]:
    parts = str(version).split(".")
    out = []
    for i in range(3):
        try:
            out.append(int(parts[i]))
        except (IndexError, ValueError):
            out.append(0)
    return tuple(out)  # type: ignore[return-value]


def _config_base_dir() -> Path:
    if os.name == "nt":
        return Path(os.environ.get("APPDATA", Path.home()))
    return Path.home() / ".config"


def _config_dir() -> Path:
    base = _config_base_dir()
    cfg = base / APPDATA_DIR_NAME
    legacy = base / LEGACY_APPDATA_DIR_NAME
    if not cfg.exists() and legacy.exists():
        try:
            shutil.copytree(legacy, cfg)
        except OSError:
            pass
    cfg.mkdir(parents=True, exist_ok=True)
    return cfg


def get_presets_dir() -> Path:
    d = _config_dir() / "presets"
    d.mkdir(parents=True, exist_ok=True)
    return d


def get_preset_imports_dir() -> Path:
    d = get_presets_dir().parent / "imports"
    d.mkdir(parents=True, exist_ok=True)
    return d


def get_config_file() -> Path:
    return _config_dir() / "config.json"


@dataclass
class DeviceIdentity:
    """Persisted audio device identity; endpoint ids keep bindings stable
    across renames (`shared.py:77-185`)."""

    name: str = ""
    is_default: bool = field(default=False, compare=False)
    endpoint_id: str = ""
    host_api: str = ""
    direction: str = ""
    # mutable format fields are diagnostics, not route-key material
    sample_rate: int | None = None
    channels: int | None = None
    name_ordinal: int | None = None

    def to_dict(self) -> dict:
        return {
            "name": self.name,
            "is_default": self.is_default,
            "endpoint_id": self.endpoint_id,
            "host_api": self.host_api,
            "direction": self.direction,
            "sample_rate": self.sample_rate,
            "channels": self.channels,
            "name_ordinal": self.name_ordinal,
        }

    def stable_dict(self) -> dict:
        """Rename-stable fields for route/profile keys."""
        if self.endpoint_id:
            return {
                "endpoint_id": self.endpoint_id,
                "host_api": self.host_api.casefold(),
                "direction": self.direction.casefold(),
            }
        out: dict = {"name": " ".join(self.name.casefold().split())}
        if self.host_api:
            out["host_api"] = self.host_api.casefold()
        if self.direction:
            out["direction"] = self.direction.casefold()
        if self.name_ordinal is not None:
            out["name_ordinal"] = self.name_ordinal
        return out

    @classmethod
    def from_dict(cls, data) -> "DeviceIdentity | None":
        if isinstance(data, cls):
            return data if data.name else None
        if isinstance(data, str):
            name = data.strip()
            return cls(name=name) if name else None
        if not isinstance(data, dict):
            return None
        raw_name = data.get("name", "")
        if not isinstance(raw_name, str):
            return None
        name = raw_name.strip()
        if not name:
            return None

        def opt_int(value, maximum):
            if isinstance(value, bool) or not isinstance(value, (int, float, str)):
                return None
            try:
                n = float(value)
            except (TypeError, ValueError, OverflowError):
                return None
            if not math.isfinite(n) or not n.is_integer():
                return None
            p = int(n)
            return p if 0 <= p <= maximum else None

        direction = data.get("direction", "")
        direction = direction.strip().casefold() if isinstance(direction, str) else ""
        if direction not in {"", "input", "output"}:
            direction = ""
        endpoint_id = data.get("endpoint_id", "")
        host_api = data.get("host_api", "")
        return cls(
            name=name,
            is_default=(
                data.get("is_default", False)
                if isinstance(data.get("is_default", False), bool)
                else False
            ),
            endpoint_id=endpoint_id.strip() if isinstance(endpoint_id, str) else "",
            host_api=host_api.strip() if isinstance(host_api, str) else "",
            direction=direction,
            sample_rate=opt_int(data.get("sample_rate"), 0xFFFFFFFF),
            channels=opt_int(data.get("channels"), 0xFFFF),
            name_ordinal=opt_int(data.get("name_ordinal"), 0xFFFFFFFF),
        )


def coerce_device_identity(data) -> DeviceIdentity | None:
    if isinstance(data, (DeviceIdentity, dict, str)) or data is None:
        return DeviceIdentity.from_dict(data)
    return None


def legacy_latency_profile_key(input_name: str, output_name: str) -> str:
    return f"{input_name}||{output_name}"


def build_device_route_key(input_device, output_device) -> str:
    payload = {
        "input": input_device.stable_dict() if input_device is not None else None,
        "output": output_device.stable_dict() if output_device is not None else None,
    }
    return json.dumps(payload, sort_keys=True, separators=(",", ":"))


def build_latency_profile_key(input_device, output_device) -> str:
    return build_device_route_key(input_device, output_device)


def parse_latency_profile_key(key: str):
    """Parse a latency profile key from legacy (``a||b``) or structured
    format (`shared.py:196-260`)."""
    text = str(key)
    if "||" in text:
        a, b = text.split("||", 1)
        di, do = coerce_device_identity(a), coerce_device_identity(b)
        if di is None or do is None:
            return None
        return di, do
    try:
        payload = json.loads(text)
    except json.JSONDecodeError:
        return None
    if not isinstance(payload, dict) or set(payload) != {"input", "output"}:
        return None

    def parse(value):
        if value is None:
            return None, True
        candidate = value
        if isinstance(value, dict) and value.get("endpoint_id") and not value.get("name"):
            # stable endpoint keys omit rename-prone names; synthesise one
            candidate = {**value, "name": f"endpoint:{value['endpoint_id']}"}
        parsed = coerce_device_identity(candidate)
        return parsed, parsed is not None

    di, iok = parse(payload.get("input"))
    do, ook = parse(payload.get("output"))
    if not iok or not ook or di is None or do is None:
        return None
    return di, do
