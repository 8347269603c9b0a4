"""Colored singleton logger.

Reference equivalent: ``setup_logger`` (utils/logging_utils.py:9-87):
colored stdout formatter, lru_cache'd singleton, optional file handler,
and a ``distributed_rank`` gate (only rank 0 logs to stdout) — which here
actually means something, gated on ``jax.process_index()`` by default.
"""

from __future__ import annotations

import functools
import logging
import os
import sys
from typing import Optional


class _ColorFormatter(logging.Formatter):
    COLORS = {
        logging.DEBUG: "\x1b[36m",
        logging.INFO: "\x1b[32m",
        logging.WARNING: "\x1b[33m",
        logging.ERROR: "\x1b[31m",
        logging.CRITICAL: "\x1b[41m",
    }
    RESET = "\x1b[0m"

    def format(self, record: logging.LogRecord) -> str:
        color = self.COLORS.get(record.levelno, "")
        prefix = f"{color}[{record.levelname}]{self.RESET}"
        base = super().format(record)
        return f"{prefix} {base}"


@functools.lru_cache()
def setup_logger(
    name: str = "OpenViIC-TPU",
    output: Optional[str] = None,
    distributed_rank: Optional[int] = None,
) -> logging.Logger:
    logger = logging.getLogger(name)
    logger.setLevel(logging.DEBUG)
    logger.propagate = False

    if distributed_rank is None:
        try:
            import jax

            distributed_rank = jax.process_index()
        except Exception:
            distributed_rank = 0

    if distributed_rank == 0 and not logger.handlers:
        handler = logging.StreamHandler(stream=sys.stdout)
        handler.setLevel(logging.DEBUG)
        handler.setFormatter(
            _ColorFormatter("%(asctime)s %(name)s: %(message)s", datefmt="%H:%M:%S")
        )
        logger.addHandler(handler)

    if output is not None:
        filename = output if output.endswith((".txt", ".log")) else os.path.join(output, "log.txt")
        os.makedirs(os.path.dirname(os.path.abspath(filename)), exist_ok=True)
        fh = logging.FileHandler(filename)
        fh.setLevel(logging.DEBUG)
        fh.setFormatter(logging.Formatter("%(asctime)s %(name)s %(levelname)s: %(message)s"))
        logger.addHandler(fh)

    return logger
