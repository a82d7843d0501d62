"""Application bootstrap: trusted asset registration and logging.

Headless equivalent of the reference's `python/mic_eq/ui/app_bootstrap.py`:
resolve the application root (source tree or extracted release bundle),
enumerate the trusted runtime roots, register canonical bundled model
assets (DeepFilter runtime + converted weight archives) without overriding
explicit user environment configuration, and initialise application
logging. Front-ends call :func:`bootstrap_application` once before building
any UI.
"""

from __future__ import annotations

import logging
import os
import sys
from pathlib import Path

__all__ = [
    "application_root",
    "trusted_runtime_roots",
    "configure_model_assets",
    "bootstrap_application",
]

logger = logging.getLogger(__name__)

# bundled-asset names, relative to <root>/models/ (`app_bootstrap.py:43-75`)
_DEEPFILTER_LIBRARY_NAMES = ("libdf.so", "df.dll", "libdf.dylib")
_DEEPFILTER_MODEL_NAME = "deepfilternet3.npz"


def application_root() -> Path:
    """Source checkout root, or the bundle root when running from a release
    bundle (`app_bootstrap.py:21-25`)."""
    if getattr(sys, "frozen", False):
        return Path(sys.executable).resolve().parent
    return Path(__file__).resolve().parents[2]


def trusted_runtime_roots() -> list[Path]:
    """Deduplicated roots from which runtime assets may be auto-registered
    (`app_bootstrap.py:28-41`). External paths need the explicit
    ``AUDIOFORGE_ALLOW_EXTERNAL_DF=1`` opt-in handled by the model layer."""
    roots = [application_root()]
    bundle_root = os.environ.get("AUDIOFORGE_BUNDLE_ROOT")
    if bundle_root:
        roots.append(Path(bundle_root))
    trusted: list[Path] = []
    for root in roots:
        resolved = root.resolve()
        if resolved not in trusted:
            trusted.append(resolved)
    return trusted


def configure_model_assets() -> dict:
    """Register canonical bundled assets without rewriting user env
    overrides (`app_bootstrap.py:43-75`). Returns what was registered."""
    from ..models.dfn3 import configure_deepfilter_runtime_paths

    registered = {"deepfilter_library": None, "deepfilter_model": None}
    if os.environ.get("DEEPFILTER_LIB_PATH") or os.environ.get(
        "DEEPFILTER_MODEL_PATH"
    ):
        # explicit user configuration wins; never silently replace it
        return registered

    for root in trusted_runtime_roots():
        models_dir = root / "models"
        library = next(
            (models_dir / n for n in _DEEPFILTER_LIBRARY_NAMES
             if (models_dir / n).is_file()),
            None,
        )
        model = models_dir / _DEEPFILTER_MODEL_NAME
        if library is not None and model.is_file():
            configure_deepfilter_runtime_paths(str(library), str(model))
            registered["deepfilter_library"] = str(library)
            registered["deepfilter_model"] = str(model)
            break
    return registered


def bootstrap_application(*, configure_logging: bool = True) -> dict:
    """One-shot startup: logging first so asset registration is logged,
    then trusted-asset registration. Returns a bootstrap record."""
    log_file = None
    if configure_logging:
        from ..app_logging import configure_app_logging

        log_file = configure_app_logging()
    assets = configure_model_assets()
    record = {
        "application_root": str(application_root()),
        "log_file": str(log_file) if log_file else None,
        "registered_assets": assets,
    }
    logger.info("application bootstrap complete: %s", record)
    return record
