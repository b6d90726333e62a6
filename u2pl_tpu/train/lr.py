"""Per-iteration LR schedules, parity with reference LRScheduler
(lr_helper.py:42-113): poly (power 0.9), cosine, multistep.

The schedule is a pure function of the iteration counter so it lives
INSIDE the compiled train step (reference steps it on host every iteration,
train_semi.py:277-279).

Note: the reference's "multistep" mode is broken — get_scheduler asserts
mode in ["multistep", ...] but _step dispatches on "step" and raises
NotImplementedError for "multistep" (lr_helper.py:47,84,106).  Here
multistep actually works (0.1 decay at each milestone epoch).
"""

from __future__ import annotations

import jax.numpy as jnp

from u2pl_tpu.config import LRSchedulerCfg


def lr_at(
    cfg: LRSchedulerCfg,
    base_lr: float,
    it: jnp.ndarray,
    max_iter: int,
    steps_per_epoch: int = 1,
):
    itf = jnp.asarray(it, jnp.float32)
    if cfg.mode == "poly":
        return base_lr * (1.0 - itf / max_iter) ** cfg.power
    if cfg.mode == "cosine":
        return cfg.targetlr + (base_lr - cfg.targetlr) * (
            1.0 + jnp.cos(jnp.pi * itf / max_iter)
        ) / 2.0
    if cfg.mode in ("multistep", "step"):
        epoch = itf // steps_per_epoch
        milestones = cfg.milestones or tuple(
            range(0, max_iter // steps_per_epoch, max(max_iter // steps_per_epoch // 3, 1))
        )[1:]
        power = sum(
            [(epoch >= m).astype(jnp.float32) for m in milestones],
            jnp.asarray(0.0),
        )
        return base_lr * 0.1**power
    raise ValueError(f"unknown lr mode {cfg.mode!r}")
