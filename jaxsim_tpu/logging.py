"""Framework logger.

Role of the reference's ``src/jaxsim/logging.py:10-107`` (single named logger,
pretty warnings) implemented on the stdlib only — no ``coloredlogs`` in this
environment.
"""

from __future__ import annotations

import enum
import logging as _logging
import os

LOGGER_NAME = "jaxsim_tpu"


class LoggingLevel(enum.IntEnum):
    NOTSET = _logging.NOTSET
    DEBUG = _logging.DEBUG
    INFO = _logging.INFO
    WARNING = _logging.WARNING
    ERROR = _logging.ERROR
    CRITICAL = _logging.CRITICAL


def _getLogger() -> _logging.Logger:
    return _logging.getLogger(LOGGER_NAME)


def set_logging_level(level: int | LoggingLevel = LoggingLevel.WARNING) -> None:
    if isinstance(level, int) and not isinstance(level, LoggingLevel):
        level = LoggingLevel(level)
    _getLogger().setLevel(level.value)


def get_logging_level() -> LoggingLevel:
    return LoggingLevel(_getLogger().getEffectiveLevel())


def configure(level: int | LoggingLevel = LoggingLevel.WARNING) -> None:
    logger = _getLogger()
    logger.propagate = False
    if not logger.handlers:
        handler = _logging.StreamHandler()
        fmt = "%(asctime)s %(name)s[%(process)d] %(levelname)s %(message)s"
        handler.setFormatter(_logging.Formatter(fmt, datefmt="%H:%M:%S"))
        logger.addHandler(handler)
    set_logging_level(level=level)


def default_level() -> LoggingLevel:
    """Resolve the default logging level (env override first)."""
    env = os.environ.get("JAXSIM_LOGGING_LEVEL")
    if env is not None:
        try:
            return LoggingLevel(int(env))
        except ValueError:
            return LoggingLevel[env.upper()]
    return LoggingLevel.WARNING


def debug(msg: str = "") -> None:
    _getLogger().debug(msg=msg)


def info(msg: str = "") -> None:
    _getLogger().info(msg=msg)


def warning(msg: str = "") -> None:
    _getLogger().warning(msg=msg)


def error(msg: str = "") -> None:
    _getLogger().error(msg=msg)


def critical(msg: str = "") -> None:
    _getLogger().critical(msg=msg)


def exception(msg: str = "") -> None:
    _getLogger().exception(msg=msg)
