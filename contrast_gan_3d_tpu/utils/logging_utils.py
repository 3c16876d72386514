"""Uniform per-module stdout loggers (reference: ``utils/logging_utils.py:6-27``)."""

import logging
import sys

_FORMAT = "%(asctime)s | %(name)s | %(levelname)s | %(message)s"
_PROJECT_PREFIX = "contrast_gan_3d_tpu"

# where create_logger points new handlers; project_logs_to_stderr() flips it
_DEFAULT_STREAM = sys.stdout


def create_logger(name: str = _PROJECT_PREFIX, level: int = logging.INFO) -> logging.Logger:
    logger = logging.getLogger(name)
    if not logger.handlers:
        handler = logging.StreamHandler(_DEFAULT_STREAM)
        handler.setFormatter(logging.Formatter(_FORMAT))
        logger.addHandler(handler)
        logger.propagate = False
    logger.setLevel(level)
    return logger


def project_logs_to_stderr():
    """Route every project logger — existing AND created later — to stderr.

    For programs whose stdout is a machine-parsed stream (bench.py emits
    JSON metric lines the round driver parses): an INFO line like
    ``correct_patients``' "Correcting ..." on stdout corrupts the record."""
    global _DEFAULT_STREAM
    _DEFAULT_STREAM = sys.stderr
    for name, lg in logging.root.manager.loggerDict.items():
        if name.startswith(_PROJECT_PREFIX) and isinstance(lg, logging.Logger):
            for h in lg.handlers:
                # only console handlers aimed at stdout: FileHandler IS a
                # StreamHandler subclass and must keep its file stream
                if isinstance(h, logging.StreamHandler) and getattr(
                    h, "stream", None
                ) is sys.stdout:
                    h.setStream(sys.stderr)


def set_project_loggers_level(level: int):
    """Set the level of every logger created under the project namespace."""
    for name, logger in logging.root.manager.loggerDict.items():
        if name.startswith(_PROJECT_PREFIX) and isinstance(logger, logging.Logger):
            logger.setLevel(level)
