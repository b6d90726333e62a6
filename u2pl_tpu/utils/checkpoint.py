"""Checkpoint save/restore.

Single-file msgpack checkpoints with the reference's key surface
{epoch, model_state, optimizer_state, teacher_state, best_miou}
(reference train_semi.py:211-224) plus — an improvement over the
reference, which restarts them cold (SURVEY.md §5) — the memory bank, EMA
prototype and step counter.  auto_resume > pretrain precedence matches
train_semi.py:138-154.  Reference torch `.pth` checkpoints load
transparently through the torch->flax converter; eval prefers
teacher_state exactly like the reference (eval.py:123).
"""

from __future__ import annotations

import logging
import os
from typing import Any, Dict, Optional, Tuple

import jax
import numpy as np
from flax import serialization

from u2pl_tpu.train.state import TrainState

log = logging.getLogger("global")

CKPT_NAME = "ckpt.ckpt"
CKPT_BEST_NAME = "ckpt_best.ckpt"


def _np(tree):
    return jax.tree_util.tree_map(np.asarray, tree)


def save_checkpoint(path: str, state: TrainState, epoch: int, best_miou: float,
                    save_memobank: bool = True):
    payload: Dict[str, Any] = {
        "epoch": epoch,
        "best_miou": float(best_miou),
        "step": int(state.step),
        "model_state": serialization.to_state_dict(
            {"params": _np(state.params), "batch_stats": _np(state.batch_stats)}
        ),
        "optimizer_state": serialization.to_state_dict(_np(state.opt_state)),
    }
    if state.teacher_params is not None:
        payload["teacher_state"] = serialization.to_state_dict(
            {
                "params": _np(state.teacher_params),
                "batch_stats": _np(state.teacher_batch_stats),
            }
        )
    if state.bank is not None and save_memobank:
        payload["memobank"] = serialization.to_state_dict(_np(state.bank))
    if state.prototype is not None:
        payload["prototype"] = np.asarray(state.prototype)
    blob = serialization.msgpack_serialize(payload)
    tmp = path + ".tmp"
    with open(tmp, "wb") as f:
        f.write(blob)
    os.replace(tmp, path)


def restore_payload(path: str) -> Dict[str, Any]:
    if not os.path.isfile(path):
        raise FileNotFoundError(
            f"no checkpoint at '{path}' — expected a .ckpt written by this "
            f"framework or a reference torch .pth"
        )
    with open(path, "rb") as f:
        return serialization.msgpack_restore(f.read())


def load_model_variables(path: str, prefer_teacher: bool = True) -> Any:
    """Template-free {params, batch_stats} for eval/infer. Accepts this
    repo's .ckpt files and reference torch .pth files."""
    if path.endswith(".pth"):
        if not os.path.isfile(path):
            raise FileNotFoundError(f"no torch checkpoint at '{path}'")
        import torch

        ckpt = torch.load(path, map_location="cpu", weights_only=False)
        key = (
            "teacher_state"
            if prefer_teacher and "teacher_state" in ckpt
            else "model_state"
        )
        log.info(f"=> load torch checkpoint[{key}] from {path}")
        return {"torch_state_dict": ckpt[key]}
    payload = restore_payload(path)
    key = (
        "teacher_state"
        if prefer_teacher and "teacher_state" in payload
        else "model_state"
    )
    log.info(f"=> load checkpoint[{key}] from {path}")
    return payload[key]


def load_checkpoint(
    path: str, state_template: TrainState
) -> Tuple[TrainState, int, float]:
    payload = restore_payload(path)
    ms = payload["model_state"]
    state = state_template.replace(
        step=jax.numpy.asarray(payload.get("step", 0), jax.numpy.int32),
        params=serialization.from_state_dict(state_template.params, ms["params"]),
        batch_stats=serialization.from_state_dict(
            state_template.batch_stats, ms["batch_stats"]
        ),
        opt_state=serialization.from_state_dict(
            state_template.opt_state, payload["optimizer_state"]
        ),
    )
    if "teacher_state" in payload and state_template.teacher_params is not None:
        ts = payload["teacher_state"]
        state = state.replace(
            teacher_params=serialization.from_state_dict(
                state_template.teacher_params, ts["params"]
            ),
            teacher_batch_stats=serialization.from_state_dict(
                state_template.teacher_batch_stats, ts["batch_stats"]
            ),
        )
    if "memobank" in payload and state_template.bank is not None:
        state = state.replace(
            bank=serialization.from_state_dict(
                state_template.bank, payload["memobank"]
            )
        )
    if "prototype" in payload and state_template.prototype is not None:
        state = state.replace(prototype=jax.numpy.asarray(payload["prototype"]))
    return state, int(payload["epoch"]), float(payload["best_miou"])


def maybe_resume(
    cfg_saver,
    save_path: str,
    state_template: TrainState,
) -> Tuple[Optional[TrainState], int, float]:
    """auto_resume > pretrain (reference train_semi.py:138-154). Returns
    (state or None, last_epoch, best_miou)."""
    if cfg_saver.auto_resume:
        latest = os.path.join(save_path, CKPT_NAME)
        if os.path.exists(latest):
            log.info(f"Resume model from: '{latest}'")
            return load_checkpoint(latest, state_template)
        log.info(f"No checkpoint found in '{latest}'")
    elif cfg_saver.pretrain:
        if os.path.exists(cfg_saver.pretrain):
            state, _, _ = load_checkpoint(cfg_saver.pretrain, state_template)
            return state, 0, 0.0
        log.info(f"No pretrain checkpoint at '{cfg_saver.pretrain}'")
    return None, 0, 0.0
