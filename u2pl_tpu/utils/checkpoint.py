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
    from u2pl_tpu.dist import local_view

    # local_view: multi-host states hold replicated global arrays whose
    # device set spans other processes; np.asarray needs the local copy
    return jax.tree_util.tree_map(np.asarray, local_view(tree))


def save_checkpoint(path: str, state: TrainState, epoch: int, best_miou: float,
                    save_memobank: bool = True):
    payload: Dict[str, Any] = {
        "epoch": epoch,
        "best_miou": float(best_miou),
        "step": int(_np(state.step)),
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
        payload["prototype"] = _np(state.prototype)
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


def load_eval_variables(model, model_path: str, crop_size) -> Any:
    """{params, batch_stats} ready for eval/infer forwards: teacher-preferred
    (reference eval.py:122-127), with reference torch .pth checkpoints
    converted through the model's own init template. Shared by the eval and
    infer CLIs."""
    import jax.numpy as jnp

    raw = load_model_variables(model_path, prefer_teacher=True)
    if "torch_state_dict" in raw:
        from u2pl_tpu.utils.convert_torch import torch_to_flax

        template = model.init(
            jax.random.PRNGKey(0),
            jnp.zeros((1, crop_size[0], crop_size[1], 3)),
            train=False,
        )
        raw = torch_to_flax(raw["torch_state_dict"], template)
    return jax.tree_util.tree_map(jnp.asarray, raw)


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


def load_pretrain_weights(path: str, state_template: TrainState) -> TrainState:
    """Weights-only warm start (reference pretrain semantics,
    train_semi.py:153-154 + utils.py:583-636): load student model_state and
    teacher_state but NOT the optimizer state or step counter — the
    epoch-derived annealing (drop_percent, alpha_t, poly LR) must restart
    from 0.  Accepts this repo's msgpack `.ckpt` and reference torch `.pth`
    checkpoints (converted tolerantly: size-mismatched keys dropped)."""
    if path.endswith(".pth"):
        import torch

        from u2pl_tpu.utils.convert_torch import torch_to_flax

        ckpt = torch.load(path, map_location="cpu", weights_only=False)
        tmpl = {
            "params": _np(state_template.params),
            "batch_stats": _np(state_template.batch_stats),
        }
        sv = torch_to_flax(ckpt["model_state"], tmpl, tolerant=True)
        state = state_template.replace(
            params=sv["params"], batch_stats=sv["batch_stats"]
        )
        if "teacher_state" in ckpt and state_template.teacher_params is not None:
            tmpl_t = {
                "params": _np(state_template.teacher_params),
                "batch_stats": _np(state_template.teacher_batch_stats),
            }
            tv = torch_to_flax(ckpt["teacher_state"], tmpl_t, tolerant=True)
            state = state.replace(
                teacher_params=tv["params"], teacher_batch_stats=tv["batch_stats"]
            )
        return state

    payload = restore_payload(path)
    ms = payload["model_state"]
    state = state_template.replace(
        params=serialization.from_state_dict(state_template.params, ms["params"]),
        batch_stats=serialization.from_state_dict(
            state_template.batch_stats, ms["batch_stats"]
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
    return state


def resolve_pretrained_path(enc_cfg) -> Optional[str]:
    """encoder.pretrained -> .pth path or None.  True looks the arch up in
    models.resnet.model_urls (the reference's user-edited dict,
    resnet.py:16-22); a string is an explicit path."""
    p = getattr(enc_cfg, "pretrained", False)
    if not p:
        return None
    if isinstance(p, str):
        return p
    from u2pl_tpu.models.resnet import model_urls

    arch = enc_cfg.type.rsplit(".", 1)[-1]
    return model_urls.get(arch)


def load_encoder_pretrained(enc_cfg, state: TrainState) -> TrainState:
    """ImageNet warm start of the ResNet encoder (reference
    resnet.py:380-402 strict=False load inside the model builders), applied
    to BOTH student and teacher — the reference constructs each via
    ModelBuilder with pretrained=True (train_semi.py:81, :123).  Missing
    file logs a warning and returns the state unchanged (this environment
    ships no weights); missing/unexpected keys are reported like the
    reference printout."""
    path = resolve_pretrained_path(enc_cfg)
    required = getattr(enc_cfg, "pretrained_required", False) and not os.environ.get(
        "U2PL_ALLOW_RANDOM_INIT"
    )
    if path is None or not os.path.isfile(path):
        where = (
            "configured for this arch (no model_urls entry)"
            if path is None
            else f"at '{path}'"
        )
        msg = (
            f"encoder.pretrained: no ImageNet checkpoint {where} — "
            "published mIoU baselines are unreachable from random init; "
            "edit u2pl_tpu/models/resnet.py model_urls or set "
            "encoder.pretrained to a path"
        )
        if required:
            raise FileNotFoundError(
                msg + " (this config sets encoder.kwargs.pretrained_required; "
                "set U2PL_ALLOW_RANDOM_INIT=1 to proceed from random init)"
            )
        if path is not None:
            log.warning(msg + " — training from random init")
        return state
    import torch

    from u2pl_tpu.utils.convert_torch import torch_encoder_to_flax

    sd = torch.load(path, map_location="cpu", weights_only=False)
    if isinstance(sd, dict) and "state_dict" in sd:
        sd = sd["state_dict"]
    variables = {"params": _np(state.params), "batch_stats": _np(state.batch_stats)}
    new_vars, missing, unexpected = torch_encoder_to_flax(sd, variables)
    log.info(
        f"[Info] Load ImageNet pretrain from '{path}' "
        f"\nmissing_keys: {missing} \nunexpected_keys: {unexpected}"
    )
    state = state.replace(
        params=new_vars["params"], batch_stats=new_vars["batch_stats"]
    )
    if state.teacher_params is not None:
        tvars = {
            "params": _np(state.teacher_params),
            "batch_stats": _np(state.teacher_batch_stats),
        }
        tv, _, _ = torch_encoder_to_flax(sd, tvars)
        state = state.replace(
            teacher_params=tv["params"], teacher_batch_stats=tv["batch_stats"]
        )
    return state


def maybe_resume(
    cfg_saver,
    save_path: str,
    state_template: TrainState,
) -> Tuple[Optional[TrainState], int, float]:
    """auto_resume > pretrain (reference train_semi.py:138-154). Returns
    (state or None, last_epoch, best_miou).  pretrain loads weights only
    (student + teacher), never the optimizer state or step counter."""
    if cfg_saver.auto_resume:
        latest = os.path.join(save_path, CKPT_NAME)
        if os.path.exists(latest):
            log.info(f"Resume model from: '{latest}'")
            return load_checkpoint(latest, state_template)
        log.info(f"No checkpoint found in '{latest}'")
    elif cfg_saver.pretrain:
        if os.path.exists(cfg_saver.pretrain):
            log.info(f"Load pretrain weights from: '{cfg_saver.pretrain}'")
            return load_pretrain_weights(cfg_saver.pretrain, state_template), 0, 0.0
        log.info(f"No pretrain checkpoint at '{cfg_saver.pretrain}'")
    return None, 0, 0.0
