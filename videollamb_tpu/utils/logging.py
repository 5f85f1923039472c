"""Logging utilities (reference llava/utils.py:16-90 build_logger +
train.py:47-49 rank0_print)."""

from __future__ import annotations

import logging
import logging.handlers
import os
import sys
from typing import Optional

import jax

_handler: Optional[logging.Handler] = None

LOGDIR = os.environ.get("VIDEOLLAMB_LOGDIR", ".")


def rank0_print(*args, **kwargs) -> None:
    if jax.process_index() == 0:
        print(*args, **kwargs)


def build_logger(logger_name: str, logger_filename: str) -> logging.Logger:
    """Rotating-file logger; root logger mirrored to the file."""
    global _handler

    formatter = logging.Formatter(
        fmt="%(asctime)s | %(levelname)s | %(name)s | %(message)s",
        datefmt="%Y-%m-%d %H:%M:%S",
    )

    if not logging.getLogger().handlers:
        logging.basicConfig(level=logging.INFO)
    logging.getLogger().handlers[0].setFormatter(formatter)

    if _handler is None:
        os.makedirs(LOGDIR, exist_ok=True)
        filename = os.path.join(LOGDIR, logger_filename)
        _handler = logging.handlers.TimedRotatingFileHandler(
            filename, when="D", utc=True
        )
        _handler.setFormatter(formatter)
        for name, item in logging.root.manager.loggerDict.items():
            if isinstance(item, logging.Logger):
                item.addHandler(_handler)

    logger = logging.getLogger(logger_name)
    logger.setLevel(logging.INFO)
    logger.addHandler(_handler)
    return logger


def pretty_print_semaphore(semaphore) -> str:
    if semaphore is None:
        return "None"
    return (f"Semaphore(value={semaphore._value}, "
            f"locked={semaphore.locked()})")
