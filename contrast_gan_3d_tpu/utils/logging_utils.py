"""Uniform per-module stdout loggers (reference: ``utils/logging_utils.py:6-27``)."""

import logging
import sys

_FORMAT = "%(asctime)s | %(name)s | %(levelname)s | %(message)s"
_PROJECT_PREFIX = "contrast_gan_3d_tpu"


def create_logger(name: str = _PROJECT_PREFIX, level: int = logging.INFO) -> logging.Logger:
    logger = logging.getLogger(name)
    if not logger.handlers:
        handler = logging.StreamHandler(sys.stdout)
        handler.setFormatter(logging.Formatter(_FORMAT))
        logger.addHandler(handler)
        logger.propagate = False
    logger.setLevel(level)
    return logger


def set_project_loggers_level(level: int):
    """Set the level of every logger created under the project namespace."""
    for name, logger in logging.root.manager.loggerDict.items():
        if name.startswith(_PROJECT_PREFIX) and isinstance(logger, logging.Logger):
            logger.setLevel(level)
