"""Accessibility metadata helpers and deterministic control-tree auditing.

Headless core of the reference's `python/mic_eq/ui/accessibility.py`:
normalised accessible names/descriptions attached to abstract controls, and
an audit that reports every user-operable control without an accessible
name. Controls here are plain objects/dicts (any front-end adapts its real
widgets onto this protocol); the normalisation and audit rules are identical
(`accessibility.py:38-100`).
"""

from __future__ import annotations

from dataclasses import dataclass, field

__all__ = [
    "AccessibilityIssue",
    "Control",
    "set_accessible",
    "bind_label",
    "set_accessible_group",
    "audit_control_tree",
    "NAMED_CONTROL_TYPES",
]

# control kinds that must carry an accessible name (`accessibility.py:21-28`)
NAMED_CONTROL_TYPES = frozenset(
    {"combo_box", "double_spin_box", "progress_bar", "slider", "spin_box",
     "text_edit"}
)
BUTTON_TYPES = frozenset({"button", "check_box", "radio_button", "tool_button"})


@dataclass(frozen=True)
class AccessibilityIssue:
    kind: str
    widget_type: str
    object_name: str


@dataclass
class Control:
    """A headless stand-in for one user-operable widget."""

    kind: str
    object_name: str = ""
    text: str = ""
    accessible_name: str = ""
    accessible_description: str = ""
    children: list = field(default_factory=list)


def set_accessible(control: Control, name: str, description: str | None = None) -> None:
    """Assign a concise name (+ optional description), mnemonic markers
    stripped and whitespace collapsed (`accessibility.py:38-51`)."""
    normalized = " ".join(name.replace("&", "").split())
    if not normalized:
        raise ValueError("Accessible names must not be empty")
    control.accessible_name = normalized
    if description:
        control.accessible_description = " ".join(description.split())


def bind_label(label: Control, control: Control, *, name: str | None = None,
               description: str | None = None) -> Control:
    """Bind a visible label to a control; both expose the same name
    (`accessibility.py:53-64`)."""
    set_accessible(control, name or label.text, description)
    return label


def set_accessible_group(controls) -> None:
    for control, name, description in controls:
        set_accessible(control, name, description)


def _button_has_name(control: Control) -> bool:
    return bool(
        control.accessible_name.strip()
        or control.text.replace("&", "").strip()
    )


def audit_control_tree(root: Control) -> tuple[AccessibilityIssue, ...]:
    """Missing-name issues for every user-operable control in the tree
    (`accessibility.py:78-100`)."""
    issues: list[AccessibilityIssue] = []
    stack = [root]
    while stack:
        control = stack.pop()
        stack.extend(reversed(control.children))
        if control.object_name.startswith("qt_"):
            continue
        if control.kind in BUTTON_TYPES:
            named = _button_has_name(control)
        elif control.kind in NAMED_CONTROL_TYPES:
            named = bool(control.accessible_name.strip())
        else:
            continue
        if not named:
            issues.append(
                AccessibilityIssue(
                    kind="missing-accessible-name",
                    widget_type=control.kind,
                    object_name=control.object_name,
                )
            )
    return tuple(issues)
