"""Optimizer with torch-SGD semantics and per-group LR multipliers.

Parity with the reference optimizer setup (train_semi.py:97-112,
lr_helper.py:12-27): SGD(momentum, weight_decay) with the decoder/aux-head
param group at lr x10 on pascal (x1 on cityscapes).  torch-SGD update
order is reproduced exactly: g += wd*p; buf = mu*buf + g; p -= lr*(g +
mu*buf if nesterov else buf).  Adam is supported as in the reference.

The LR itself is injected per step via optax.inject_hyperparams-free
manual scaling so the whole schedule stays inside the compiled step.
"""

from __future__ import annotations

from typing import Any

import jax
import optax

from u2pl_tpu.config import OptimizerCfg

HEAD_SCOPES = ("decoder", "auxor")


def head_mask(params: Any) -> Any:
    """True for decoder/aux-head params (the x10 group), False for encoder."""

    def mark(path, _):
        top = path[0].key if hasattr(path[0], "key") else str(path[0])
        return top in HEAD_SCOPES

    return jax.tree_util.tree_map_with_path(mark, params)


def make_optimizer(
    cfg: OptimizerCfg, params: Any, head_lr_multiplier: float = 1.0
) -> optax.GradientTransformation:
    """Gradient transformation producing the *negative* update scaled by the
    multiplier; the caller multiplies by the current LR (see steps.py)."""
    mask = head_mask(params)
    if cfg.type.lower() == "sgd":
        tx = optax.chain(
            optax.add_decayed_weights(cfg.weight_decay),
            optax.trace(decay=cfg.momentum, nesterov=cfg.nesterov),
        )
    elif cfg.type.lower() == "adam":
        tx = optax.chain(
            optax.add_decayed_weights(cfg.weight_decay),
            optax.scale_by_adam(),
        )
    else:
        raise ValueError(f"unsupported optimizer {cfg.type!r}")
    if head_lr_multiplier != 1.0:
        tx = optax.chain(
            tx,
            optax.masked(optax.scale(head_lr_multiplier), mask),
        )
    return tx


def apply_updates_with_lr(params: Any, updates: Any, lr: jax.Array) -> Any:
    """p <- p - lr * u, with lr a traced scalar."""
    return jax.tree_util.tree_map(
        lambda p, u: (p - lr * u.astype(p.dtype)).astype(p.dtype), params, updates
    )
