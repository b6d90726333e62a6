"""In-training distributed validation (reference train_semi.py:595-654).

Center-cropped fixed-shape val batches -> one jitted forward + argmax +
on-device per-class intersection/union; only two (C,) vectors return to
host per batch.  mIoU = mean(inter/union) accumulated over the val set.

The forward is shard_map'ed over ALL local devices (the reference shards
val across GPUs with a DistributedSampler, :639-641): each batch is split
along the batch axis, every device scores its slice, and the per-class
inter/union counts psum on-device.  Ragged final batches (drop_last=False)
are padded with ignore-labeled rows, which contribute exactly zero to
every count (intersection_and_union_device maps ignored targets out of
range), so the padded result is bit-identical to the unpadded one.
"""

from __future__ import annotations

import logging
from typing import Callable, Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P

from u2pl_tpu.config import Config
from u2pl_tpu.dist import all_sum_across_processes, local_view
from u2pl_tpu.evallib.metrics import intersection_and_union_device
from u2pl_tpu.ops.resize import resize_bilinear

VAL_AXIS = "valdev"


def make_val_step(model, num_classes: int, ignore_label: int,
                  mean=None, std=None, mesh: Optional[Mesh] = None) -> Callable:
    """One jitted val step: forward + argmax + per-class inter/union.

    Without a mesh this is the single-device path (tools/burnin.py,
    tools/ab_bf16.py).  With a mesh of local devices, the batch axis is
    shard_map'ed across them and the counts psum on-device, so in-loop
    validation uses every chip instead of leaving all but one idle.
    """
    import numpy as _np

    mean = None if mean is None else _np.asarray(mean, _np.float32)
    std = None if std is None else _np.asarray(std, _np.float32)

    def val_step(variables, images, labels):
        if images.dtype == jnp.uint8 and mean is not None:
            images = (images.astype(jnp.float32) - mean) / std
        out = model.apply(variables, images, train=False)["pred"]
        out = resize_bilinear(out, labels.shape[1:3], align_corners=True)
        pred = out.argmax(-1).astype(jnp.int32)
        counts = intersection_and_union_device(
            pred, labels, num_classes, ignore_label
        )
        if mesh is not None:
            counts = jax.lax.psum(counts, VAL_AXIS)
        return counts

    if mesh is None:
        return jax.jit(val_step)
    sharded = jax.shard_map(
        val_step,
        mesh=mesh,
        in_specs=(P(), P(VAL_AXIS), P(VAL_AXIS)),
        out_specs=(P(), P(), P()),
        check_vma=False,
    )
    return jax.jit(sharded)


def _pad_batch(images, labels, target: int, ignore_label: int):
    """Pad a ragged batch to `target` rows with ignore-labeled images; the
    pad rows contribute zero to every inter/union count (see module doc)."""
    b = images.shape[0]
    if b == target:
        return images, labels
    pad = target - b
    images = np.concatenate(
        [images, np.zeros((pad,) + images.shape[1:], images.dtype)]
    )
    labels = np.concatenate(
        [labels, np.full((pad,) + labels.shape[1:], ignore_label, labels.dtype)]
    )
    return images, labels


def accumulate_val_sums(val_step, variables, val_loader, epoch, num_classes,
                        n_devices: int = 1, ignore_label: int = 255):
    """Per-process intersection/union accumulation over the loader's slice
    of the val set (pre cross-process reduction)."""
    inter_sum = np.zeros(num_classes, np.int64)
    union_sum = np.zeros(num_classes, np.int64)
    # fixed pad target: the loader's full per-process batch rounded up to
    # the device count -> ONE compiled shape for full and ragged batches
    per = getattr(val_loader, "batch_size", 0) * getattr(
        val_loader, "replicas_per_process", 1
    )
    for images, labels in val_loader.epoch(epoch):
        if n_devices > 1:
            target = -(-max(images.shape[0], per) // n_devices) * n_devices
            images, labels = _pad_batch(images, labels, target, ignore_label)
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
    local = jax.local_devices()
    mesh = Mesh(np.asarray(local), (VAL_AXIS,)) if len(local) > 1 else None
    val_step = make_val_step(
        model, cfg.net.num_classes, cfg.dataset.ignore_label,
        cfg.dataset.mean, cfg.dataset.std, mesh=mesh,
    )
    # multi-host train states hold replicated global arrays; validation is
    # a per-process computation (each process scores its slice of the val
    # set, then inter/union sums reduce across processes), so take the
    # process-local copy.  Single-process no-op.
    variables = local_view({"params": params, "batch_stats": batch_stats})
    inter_sum, union_sum = accumulate_val_sums(
        val_step, variables, val_loader, epoch, cfg.net.num_classes,
        n_devices=len(local) if mesh is not None else 1,
        ignore_label=cfg.dataset.ignore_label,
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
