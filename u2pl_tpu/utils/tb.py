"""Scalar logging: tensorboardX if available, else torch.utils.tensorboard,
else a JSONL fallback (same add_scalar surface as the reference's rank-0
SummaryWriter, train_semi.py:64-69, 589-592)."""

from __future__ import annotations

import json
import os
import time


class ScalarWriter:
    def __init__(self, logdir: str):
        os.makedirs(logdir, exist_ok=True)
        self._impl = None
        for mod in ("tensorboardX", "torch.utils.tensorboard"):
            try:
                import importlib

                m = importlib.import_module(mod)
                self._impl = m.SummaryWriter(logdir)
                break
            except Exception:
                continue
        if self._impl is None:
            self._f = open(os.path.join(logdir, "scalars.jsonl"), "a")

    def add_scalar(self, tag: str, value, step: int):
        if self._impl is not None:
            self._impl.add_scalar(tag, float(value), step)
        else:
            self._f.write(
                json.dumps(
                    {"t": time.time(), "tag": tag, "value": float(value), "step": step}
                )
                + "\n"
            )
            self._f.flush()

    def close(self):
        if self._impl is not None:
            self._impl.close()
        else:
            self._f.close()
