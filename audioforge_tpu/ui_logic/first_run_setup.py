"""Headless first-run setup state machine.

Mirrors the dialog-side transition logic of
`python/mic_eq/ui/first_run_setup_dialog.py` without any widgets: a wizard
over the steps ``devices -> route -> latency -> voice`` operating directly
on :class:`..config.AppConfig`.

- Starting marks the config ``in_progress`` and resumes at the first
  non-completed step (restart-after-completion resets everything;
  ``completed_with_skips`` re-opens only the skipped steps,
  `first_run_setup_dialog.py:129-158,229-239`).
- ``complete_step`` / ``skip_step`` record the per-step state and advance;
  finishing with any step still pending keeps progress saved and the state
  ``in_progress``; otherwise the terminal state is ``completed`` or
  ``completed_with_skips`` (`first_run_setup_dialog.py:341-381`).
"""

from __future__ import annotations

from ..config.app_config import FIRST_RUN_SETUP_STEPS

__all__ = ["FirstRunSetupFlow"]


class FirstRunSetupFlow:
    def __init__(self, config, *, restart_completed: bool = False):
        self.config = config
        if restart_completed and config.first_run_setup_state == "completed":
            config.first_run_setup_steps = {
                step: "pending" for step in FIRST_RUN_SETUP_STEPS
            }
            config.first_run_setup_step = "devices"
        elif config.first_run_setup_state == "completed_with_skips":
            config.first_run_setup_steps = {
                step: ("pending" if state == "skipped" else state)
                for step, state in config.first_run_setup_steps.items()
            }
            config.first_run_setup_step = next(
                (step for step in FIRST_RUN_SETUP_STEPS
                 if config.first_run_setup_steps.get(step) == "pending"),
                "devices",
            )
        config.first_run_setup_state = "in_progress"
        self._step_index = self._initial_step_index()
        self._save_progress()

    # ---- position ------------------------------------------------------

    def _initial_step_index(self) -> int:
        current = self.config.first_run_setup_step
        steps = self.config.first_run_setup_steps
        if current in FIRST_RUN_SETUP_STEPS and steps.get(current) != "completed":
            return FIRST_RUN_SETUP_STEPS.index(current)
        for index, step in enumerate(FIRST_RUN_SETUP_STEPS):
            if steps.get(step) != "completed":
                return index
        return len(FIRST_RUN_SETUP_STEPS) - 1

    @property
    def current_step(self) -> str:
        return FIRST_RUN_SETUP_STEPS[self._step_index]

    @property
    def finished(self) -> bool:
        return self.config.first_run_setup_state in (
            "completed", "completed_with_skips"
        )

    def _save_progress(self) -> None:
        self.config.first_run_setup_step = self.current_step

    # ---- transitions ---------------------------------------------------

    def complete_step(self) -> None:
        self.config.first_run_setup_steps[self.current_step] = "completed"
        self._advance_or_finish()

    def skip_step(self) -> None:
        self.config.first_run_setup_steps[self.current_step] = "skipped"
        self._advance_or_finish()

    def go_back(self) -> None:
        if self._step_index > 0:
            self._step_index -= 1
            self._save_progress()

    def _advance_or_finish(self) -> None:
        if self._step_index < len(FIRST_RUN_SETUP_STEPS) - 1:
            self._step_index += 1
            self._save_progress()
            return
        self.finish()

    def finish(self) -> bool:
        """Terminalise if no step is pending; returns True when finished
        (pending steps keep the saved ``in_progress`` state)."""
        steps = self.config.first_run_setup_steps
        if any(state == "pending" for state in steps.values()):
            return False
        skipped = any(state == "skipped" for state in steps.values())
        self.config.first_run_setup_state = (
            "completed_with_skips" if skipped else "completed"
        )
        return True
