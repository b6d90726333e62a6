"""Logging + windowed meters (reference utils.py:438-491)."""

from __future__ import annotations

import logging
import os

import numpy as np

_logs = set()


def init_log(name: str = "global", level=logging.INFO) -> logging.Logger:
    logger = logging.getLogger(name)
    if (name, level) in _logs:
        return logger
    _logs.add((name, level))
    logger.setLevel(level)
    ch = logging.StreamHandler()
    ch.setLevel(level)
    try:
        import jax

        rank = jax.process_index()
    except Exception:  # pragma: no cover
        rank = int(os.environ.get("SLURM_PROCID", 0))
    if rank != 0:
        logger.addFilter(lambda record: False)
    ch.setFormatter(
        logging.Formatter("[%(asctime)s][%(levelname)8s] %(message)s")
    )
    logger.addHandler(ch)
    logger.propagate = 0
    return logger


class AverageMeter:
    """Windowed (length>0) or cumulative average (reference utils.py:438-468)."""

    def __init__(self, length: int = 0):
        self.length = length
        self.reset()

    def reset(self):
        self.history = []
        self.count = 0
        self.sum = 0.0
        self.val = 0.0
        self.avg = 0.0

    def update(self, val, num: int = 1):
        if self.length > 0:
            self.history.append(val)
            if len(self.history) > self.length:
                del self.history[0]
            self.val = self.history[-1]
            self.avg = float(np.mean(self.history))
        else:
            self.val = val
            self.sum += val * num
            self.count += num
            self.avg = self.sum / max(self.count, 1)
