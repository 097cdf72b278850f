"""Logging (SURVEY.md V5) — console + file handler, per-module loggers,
``clear_log_file``, ``propagate=False``; file path from $LOG_FILE with a
tmpdir default (reference ``src/logger.py:10-93``)."""

from __future__ import annotations

import logging
import os
import tempfile

_FMT = "%(asctime)s — %(name)s — %(levelname)s — %(message)s"


def log_file_path() -> str:
    return os.environ.get(
        "LOG_FILE", os.path.join(tempfile.gettempdir(), "logfile.log")
    )


def get_logger(name: str, level: int = logging.INFO) -> logging.Logger:
    logger = logging.getLogger(name)
    if logger.handlers:
        return logger
    logger.setLevel(level)
    logger.propagate = False

    console = logging.StreamHandler()
    console.setFormatter(logging.Formatter(_FMT))
    logger.addHandler(console)

    try:
        fh = logging.FileHandler(log_file_path(), encoding="utf-8")
        fh.setFormatter(logging.Formatter(_FMT))
        logger.addHandler(fh)
    except OSError:
        pass  # console-only if the file isn't writable
    return logger


def clear_log_file() -> None:
    """Truncate the log file (reference ``Logger.clear_log_file``)."""
    try:
        with open(log_file_path(), "w", encoding="utf-8"):
            pass
    except OSError:
        pass
