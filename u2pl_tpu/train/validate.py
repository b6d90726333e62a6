"""In-training distributed validation (reference train_semi.py:595-654).

Center-cropped fixed-shape val batches -> one jitted forward + argmax +
on-device per-class intersection/union; only two (C,) vectors return to
host per batch.  mIoU = mean(inter/union) accumulated over the val set.
"""

from __future__ import annotations

import logging
from typing import Callable, Optional

import jax
import jax.numpy as jnp
import numpy as np

from u2pl_tpu.config import Config
from u2pl_tpu.dist import all_sum_across_processes, local_view
from u2pl_tpu.evallib.metrics import intersection_and_union_device
from u2pl_tpu.ops.resize import resize_bilinear


def make_val_step(model, num_classes: int, ignore_label: int,
                  mean=None, std=None) -> Callable:
    import numpy as _np

    mean = None if mean is None else _np.asarray(mean, _np.float32)
    std = None if std is None else _np.asarray(std, _np.float32)

    @jax.jit
    def val_step(variables, images, labels):
        if images.dtype == jnp.uint8 and mean is not None:
            images = (images.astype(jnp.float32) - mean) / std
        out = model.apply(variables, images, train=False)["pred"]
        out = resize_bilinear(out, labels.shape[1:3], align_corners=True)
        pred = out.argmax(-1).astype(jnp.int32)
        return intersection_and_union_device(
            pred, labels, num_classes, ignore_label
        )

    return val_step


def accumulate_val_sums(val_step, variables, val_loader, epoch, num_classes):
    """Per-process intersection/union accumulation over the loader's slice
    of the val set (pre cross-process reduction)."""
    inter_sum = np.zeros(num_classes, np.int64)
    union_sum = np.zeros(num_classes, np.int64)
    for images, labels in val_loader.epoch(epoch):
        inter, union, _ = val_step(
            variables, jnp.asarray(images), jnp.asarray(labels)
        )
        inter_sum += np.asarray(inter, np.int64)
        union_sum += np.asarray(union, np.int64)
    return inter_sum, union_sum


def validate(
    model,
    params,
    batch_stats,
    val_loader,
    cfg: Config,
    epoch: int = 0,
    logger: Optional[logging.Logger] = None,
) -> float:
    val_step = make_val_step(
        model, cfg.net.num_classes, cfg.dataset.ignore_label,
        cfg.dataset.mean, cfg.dataset.std,
    )
    # multi-host train states hold replicated global arrays; validation is
    # a per-process computation (each process scores its slice of the val
    # set, then inter/union sums reduce across processes), so take the
    # process-local copy.  Single-process no-op.
    variables = local_view({"params": params, "batch_stats": batch_stats})
    inter_sum, union_sum = accumulate_val_sums(
        val_step, variables, val_loader, epoch, cfg.net.num_classes
    )
    # reference all_reduces inter/union across ranks (train_semi.py:639-641):
    # each process only saw its slice of every val batch
    inter_sum = all_sum_across_processes(inter_sum)
    union_sum = all_sum_across_processes(union_sum)
    iou_class = inter_sum / (union_sum + 1e-10)
    miou = float(np.mean(iou_class))
    if logger is not None:
        for i, iou in enumerate(iou_class):
            logger.info(" * class [{}] IoU {:.2f}".format(i, iou * 100))
        logger.info(" * epoch {} mIoU {:.2f}".format(epoch, miou * 100))
    return miou
