"""Application logging setup for runtime/serving code.

Mirrors `python/mic_eq/app_logging.py`: a rotating file handler under the
app config dir (1 MB x 3 backups), idempotent across repeat configuration,
and never below INFO. Logging stays strictly off the RT path — only the
supervisor/control threads log.
"""

from __future__ import annotations

import logging
import os
from logging.handlers import RotatingFileHandler
from pathlib import Path

__all__ = ["configure_app_logging", "get_log_file"]

LOG_DIR_NAME = "AudioForge"
LOG_FILE_MAX_BYTES = 1_000_000
LOG_FILE_BACKUP_COUNT = 3


def _base_config_dir() -> Path:
    if os.name == "nt":
        return Path(os.environ.get("APPDATA", Path.home()))
    return Path(os.environ.get("XDG_CONFIG_HOME", Path.home() / ".config"))


def get_log_file() -> Path:
    """Runtime log file path."""
    return _base_config_dir() / LOG_DIR_NAME / "logs" / "app.log"


def configure_app_logging() -> Path:
    """Configure rotating file logging (idempotent)."""
    log_file = get_log_file()
    log_file.parent.mkdir(parents=True, exist_ok=True)

    root_logger = logging.getLogger()
    for handler in root_logger.handlers:
        if (isinstance(handler, RotatingFileHandler)
                and Path(handler.baseFilename) == log_file):
            return log_file

    handler = RotatingFileHandler(
        log_file,
        maxBytes=LOG_FILE_MAX_BYTES,
        backupCount=LOG_FILE_BACKUP_COUNT,
        encoding="utf-8",
    )
    handler.setFormatter(
        logging.Formatter("%(asctime)s %(levelname)s %(name)s: %(message)s")
    )
    root_logger.addHandler(handler)
    if root_logger.level == logging.NOTSET or root_logger.level > logging.INFO:
        root_logger.setLevel(logging.INFO)
    return log_file
