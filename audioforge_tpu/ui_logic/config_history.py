"""Bounded, transactional undo/redo history over validated preset snapshots.

Behavioral contract (mirrors `python/mic_eq/ui/config_history.py`;
`README.md:58-66`):

- a snapshot is canonical JSON of a validated preset, so corrupt state can
  never enter the history;
- the cursor advances only AFTER a successful restore — a restore callback
  that raises leaves the history where it was;
- recording while undone truncates the redo branch;
- the history is bounded: overflow evicts the oldest snapshots;
- provenance bookkeeping marks only genuinely-changed value paths
  ``explicit`` (`config_history.py:157-204`).

Implementation here is a two-stack machine: ``_done`` holds everything up
to and including the current snapshot, ``_undone`` holds the redo branch
(nearest entry last). The reference keeps a flat list plus cursor; the two
representations are equivalent and the public ``cursor``/``size``
properties expose the flat view the UI and tests expect.
"""

from __future__ import annotations

import json
from collections.abc import Callable, Mapping
from dataclasses import dataclass
from typing import Any

from ..config import Preset

__all__ = [
    "BoundedConfigurationHistory",
    "ConfigurationSnapshot",
    "DEFAULT_HISTORY_LIMIT",
    "changed_configuration_paths",
    "explicit_provenance_after_edit",
]

DEFAULT_HISTORY_LIMIT = 50

# only processing state participates in undo/redo diffing — never names,
# versions, or provenance metadata
_CONFIGURATION_ROOTS = frozenset(
    {"gate", "eq", "rnnoise", "deesser", "compressor", "limiter", "bypass"}
)


@dataclass(frozen=True, slots=True)
class ConfigurationSnapshot:
    """One canonical, immutable, validated preset payload
    (`config_history.py:27-60`)."""

    payload_json: str
    label: str
    source: str

    @classmethod
    def from_preset(cls, preset: Preset, *, label: str,
                    source: str) -> "ConfigurationSnapshot":
        canonical = json.dumps(
            preset.to_dict(), allow_nan=False, ensure_ascii=True,
            separators=(",", ":"), sort_keys=True,
        )
        made = cls(canonical, str(label), str(source))
        made.to_preset()  # round-trip validation before admission
        return made

    def payload(self) -> dict[str, Any]:
        decoded = json.loads(self.payload_json)
        if not isinstance(decoded, dict):
            raise ValueError("configuration snapshot root must be an object")
        return decoded

    def to_preset(self) -> Preset:
        return Preset.from_dict(self.payload())


class BoundedConfigurationHistory:
    """Two-stack bounded history; the cursor moves only after a successful
    restore (`config_history.py:63-154`)."""

    def __init__(self, limit: int = DEFAULT_HISTORY_LIMIT) -> None:
        if isinstance(limit, bool) or not isinstance(limit, int):
            raise ValueError("history limit must be an integer >= 2")
        if limit < 2:
            raise ValueError("history limit must be an integer >= 2")
        self._limit = limit
        self._done: list[ConfigurationSnapshot] = []
        self._undone: list[ConfigurationSnapshot] = []  # nearest redo LAST

    # ---- flat-view properties (what the UI binds to) ----

    @property
    def limit(self) -> int:
        return self._limit

    @property
    def size(self) -> int:
        return len(self._done) + len(self._undone)

    @property
    def cursor(self) -> int:
        return len(self._done) - 1

    @property
    def current(self) -> ConfigurationSnapshot | None:
        return self._done[-1] if self._done else None

    @property
    def can_undo(self) -> bool:
        return len(self._done) >= 2

    @property
    def can_redo(self) -> bool:
        return bool(self._undone)

    @property
    def undo_label(self) -> str | None:
        return self._done[-1].label if self.can_undo else None

    @property
    def redo_label(self) -> str | None:
        return self._undone[-1].label if self._undone else None

    # ---- mutation ----

    def initialize(self, snapshot: ConfigurationSnapshot) -> None:
        snapshot.to_preset()
        self._done = [snapshot]
        self._undone = []

    def record(self, snapshot: ConfigurationSnapshot) -> bool:
        """Append as the new present, dropping any redo branch; identical
        payloads dedupe. Returns True when actually recorded."""
        snapshot.to_preset()
        latest = self.current
        if latest is not None and latest.payload_json == snapshot.payload_json:
            return False
        self._undone.clear()
        self._done.append(snapshot)
        while len(self._done) > self._limit:
            self._done.pop(0)  # evict the oldest
        return True

    def undo(self, restore: Callable[[ConfigurationSnapshot], None]):
        """Restore the previous snapshot. The stacks move only after the
        callback returns — a raise propagates with the history intact."""
        if not self.can_undo:
            return None
        target = self._done[-2]
        target.to_preset()
        restore(target)
        self._undone.append(self._done.pop())
        return target

    def redo(self, restore: Callable[[ConfigurationSnapshot], None]):
        if not self.can_redo:
            return None
        target = self._undone[-1]
        target.to_preset()
        restore(target)
        self._done.append(self._undone.pop())
        return target


def changed_configuration_paths(previous: Mapping[str, Any],
                                current: Mapping[str, Any]) -> set[str]:
    """Dotted paths of changed preset VALUES, metadata excluded
    (`config_history.py:157-185`). Iterative worklist; dicts recurse by
    key union, lists by index union (missing side reads as None)."""
    changed: set[str] = set()
    pending: list[tuple[str, Any, Any]] = [
        (root, previous.get(root), current.get(root))
        for root in sorted(_CONFIGURATION_ROOTS)
    ]
    while pending:
        path, old, new = pending.pop()
        if isinstance(old, Mapping) and isinstance(new, Mapping):
            for key in set(old) | set(new):
                pending.append(
                    (f"{path}.{key}", old.get(key), new.get(key)))
        elif isinstance(old, list) and isinstance(new, list):
            for i in range(max(len(old), len(new))):
                pending.append((
                    f"{path}.{i}",
                    old[i] if i < len(old) else None,
                    new[i] if i < len(new) else None,
                ))
        elif old != new:
            changed.add(path)
    return changed


def explicit_provenance_after_edit(previous: ConfigurationSnapshot,
                                   current_preset: Preset) -> dict[str, str]:
    """Provenance map after a user edit: everything carries over unchanged,
    and exactly the changed value paths flip to ``explicit``
    (`config_history.py:188-204`)."""
    before = previous.payload()
    after = current_preset.to_dict()
    carried = before.get("value_provenance", {})
    if not isinstance(carried, dict):
        raise ValueError("snapshot value_provenance must be an object")
    merged = {str(path): str(source) for path, source in carried.items()}
    merged.update(
        (path, "explicit")
        for path in changed_configuration_paths(before, after)
    )
    return merged
