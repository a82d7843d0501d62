"""Capture sanitized, reproducible snapshots of the headless UI-logic layer.

Counterpart of the reference's
`python/tools/capture_repository_screenshots.py` (`ui-screenshot-report.json`):
the reference renders Qt widgets offscreen at pinned DPI/font and pins the
PNG hashes; this framework's UI layer is headless by design (SURVEY §2.7 —
"the API-level equivalents ... which are all testable headless"), so the
equivalent reproducibility contract pins deterministic JSON snapshots of
every user-facing surface rendered from sanitized in-memory state:

- the EQ graph-editor model's rendered curve + handle geometry
  (`ui_logic/eq_curve.py`) for each builtin preset, via the native
  response renderer;
- the semantic theme palette and its WCAG contrast audit
  (`ui_logic/theme.py`);
- health-chip states for canonical diagnostics fixtures
  (`ui_logic/health.py`);
- the first-run-setup state machine's transition trace
  (`ui_logic/first_run_setup.py`);
- the accessibility audit over a canonical control tree
  (`ui_logic/accessibility.py`).

Snapshots land in ``docs/snapshots/`` and their SHA-256 pins in
``evaluation/ui-snapshot-report.json``; any unintended rendering change
shows up as a hash diff in review, exactly like the reference's
screenshot determinism gate. No user config is read; no device names
appear.
"""

from __future__ import annotations

import hashlib
import json
import sys
from pathlib import Path

REPO_ROOT = Path(__file__).resolve().parents[1]
if str(REPO_ROOT) not in sys.path:
    sys.path.insert(0, str(REPO_ROOT))

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
from audioforge_tpu.cache import enable_compile_cache
enable_compile_cache()

from tools._evaluation_common import write_report  # noqa: E402

OUTPUT_DIR = REPO_ROOT / "docs" / "snapshots"


def _eq_curve_snapshots():
    from audioforge_tpu.config import BUILTIN_PRESETS
    from audioforge_tpu.ui_logic.eq_curve import EqCurveModel

    snapshots = {}
    for key, preset in sorted(BUILTIN_PRESETS.items()):
        bands = [
            (b.filter_type, b.frequency_hz, b.gain_db, b.q,
             b.slope_db_per_octave, b.enabled)
            for b in preset.eq.bands
        ]
        model = EqCurveModel()
        model.set_all_params(bands)
        snapshots[f"eq-curve-{key}"] = {
            "preset": preset.name,
            "frequencies_hz": [round(f, 3) for f in model.freq_points],
            "response_db": [round(v, 4) for v in model.response_db],
            "handles_xy": [
                [round(c, 3) for c in model.band_handle_position(i)]
                for i in range(len(bands))
            ],
            "interaction_warnings": [
                {"kind": w.kind, "frequency_hz": round(w.frequency_hz, 2),
                 "severity": round(w.severity, 4), "message": w.message}
                for w in model.interaction_warnings
            ],
        }
    return snapshots


def _theme_snapshot():
    from dataclasses import asdict

    from audioforge_tpu.ui_logic.theme import (
        PALETTE,
        contrast_ratio,
        meets_contrast,
    )

    tokens = asdict(PALETTE)
    checks = {}
    for fg_name, bg_name in (
        ("text_primary", "app_surface"),
        ("text_primary", "control_surface"),
        ("text_muted", "app_surface"),
        ("text_on_emphasis", "action_primary"),
        ("action_disabled_text", "action_disabled_surface"),
    ):
        fg, bg = tokens[fg_name], tokens[bg_name]
        checks[f"{fg_name}-on-{bg_name}"] = {
            "contrast_ratio": round(contrast_ratio(fg, bg), 3),
            "meets_aa": meets_contrast(fg, bg),
        }
    return {"theme-palette": {"tokens": tokens, "contrast": checks}}


def _health_snapshot():
    from audioforge_tpu.ui_logic.health import (
        input_health_state,
        output_health_state,
    )

    fixtures = {
        "nominal": (
            dict(rms_db=-24.0, crest_factor_db=12.0),
            dict(rms_db=-20.0, true_peak_db=-3.0),
        ),
        "clipping": (
            dict(rms_db=-6.0, clip_delta=True),
            dict(rms_db=-2.0, clip_delta=True),
        ),
        "quiet-cleanup": (
            dict(rms_db=-70.0, cleanup_hum_detected=True,
                 cleanup_mode="gentle"),
            dict(rms_db=-70.0),
        ),
        "dense": (
            dict(rms_db=-20.0, crest_factor_db=2.0),
            dict(rms_db=-18.0, true_peak_db=-0.5, true_peak_delta=True),
        ),
    }
    out = {}
    for name, (in_kwargs, out_kwargs) in fixtures.items():
        label_in, sev_in = input_health_state(**in_kwargs)
        label_out, sev_out = output_health_state(**out_kwargs)
        out[f"health-{name}"] = {
            "input": [label_in, sev_in],
            "output": [label_out, sev_out],
        }
    return out


def _first_run_snapshot():
    from audioforge_tpu.config.app_config import AppConfig
    from audioforge_tpu.ui_logic.first_run_setup import FirstRunSetupFlow

    config = AppConfig()
    flow = FirstRunSetupFlow(config)
    trace = [["start", flow.current_step, config.first_run_setup_state]]
    flow.complete_step()
    trace.append(["complete", flow.current_step,
                  config.first_run_setup_state])
    flow.skip_step()
    trace.append(["skip", flow.current_step, config.first_run_setup_state])
    flow.complete_step()
    trace.append(["complete", flow.current_step,
                  config.first_run_setup_state])
    flow.complete_step()
    trace.append(["complete", flow.current_step,
                  config.first_run_setup_state])
    return {"first-run-flow": {
        "trace": trace,
        "terminal_state": config.first_run_setup_state,
        "step_states": dict(config.first_run_setup_steps),
    }}


def _accessibility_snapshot():
    from audioforge_tpu.ui_logic.accessibility import (
        Control,
        audit_control_tree,
        bind_label,
        set_accessible,
    )

    # canonical main-surface control tree (stage panels + transport)
    root = Control("window", object_name="main")
    start = Control("button", object_name="start", text="&Start")
    set_accessible(start, "Start processing")
    gate_label = Control("label", object_name="gate_label",
                         text="Gate threshold")
    gate_slider = Control("slider", object_name="gate_threshold")
    bind_label(gate_label, gate_slider)
    unnamed = Control("button", object_name="mystery")  # deliberate issue
    root.children = [start, gate_label, gate_slider, unnamed]
    issues = audit_control_tree(root)
    return {"accessibility-audit": {
        "issues": [
            {"kind": issue.kind, "widget_type": issue.widget_type,
             "object_name": issue.object_name}
            for issue in issues
        ],
        "audited_controls": 4,
    }}


def main() -> int:
    OUTPUT_DIR.mkdir(parents=True, exist_ok=True)
    snapshots = {}
    snapshots.update(_eq_curve_snapshots())
    snapshots.update(_theme_snapshot())
    snapshots.update(_health_snapshot())
    snapshots.update(_first_run_snapshot())
    snapshots.update(_accessibility_snapshot())

    pins = {}
    for name, payload in sorted(snapshots.items()):
        path = OUTPUT_DIR / f"{name}.json"
        text = json.dumps(payload, indent=2, sort_keys=True,
                          allow_nan=False) + "\n"
        path.write_text(text)
        pins[name] = hashlib.sha256(text.encode()).hexdigest()

    report = {
        "schema_version": 1,
        "report": "ui-snapshot",
        "candidate": "headless-ui-logic-snapshots",
        "capture_contract": {
            "renderer": "headless ui_logic layer (no Qt)",
            "reads_user_config": False,
            "device_names_included": False,
        },
        "snapshot_count": len(pins),
        "snapshots_sha256": pins,
        "decision": {
            "retained": True,
            "reason": ("all user-facing UI-logic surfaces render "
                       "deterministically from sanitized in-memory state; "
                       "hash pins catch unintended rendering changes in "
                       "review"),
        },
    }
    write_report("ui-snapshot-report.json", report)
    print(f"pinned {len(pins)} UI snapshots")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
