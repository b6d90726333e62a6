"""Segmentation metrics: per-class intersection / union.

`intersection_and_union` is numerically identical to the reference numpy
histogram version (utils.py:568-580); `intersection_and_union_device` is
the on-device equivalent used inside jitted validation so only two (K,)
vectors come back to host per batch.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


def intersection_and_union(output, target, num_classes, ignore_index=255):
    output = np.asarray(output).reshape(-1).copy()
    target = np.asarray(target).reshape(-1)
    output[target == ignore_index] = ignore_index
    intersection = output[output == target]
    area_intersection, _ = np.histogram(intersection, bins=np.arange(num_classes + 1))
    area_output, _ = np.histogram(output, bins=np.arange(num_classes + 1))
    area_target, _ = np.histogram(target, bins=np.arange(num_classes + 1))
    area_union = area_output + area_target - area_intersection
    return area_intersection, area_union, area_target


def intersection_and_union_device(
    pred: jax.Array, target: jax.Array, num_classes: int, ignore_index: int = 255
):
    """pred/target: (..., H, W) int. Returns (inter, union, target_area)
    each (num_classes,) int32."""
    pred = pred.reshape(-1)
    target = target.reshape(-1)
    ignored = target == ignore_index
    pred = jnp.where(ignored, ignore_index, pred)

    def hist(x, mask):
        return jnp.bincount(
            jnp.where(mask, x, num_classes), length=num_classes + 1
        )[:num_classes]

    in_range = lambda x: (x >= 0) & (x < num_classes)
    inter = hist(pred, (pred == target) & in_range(pred))
    area_o = hist(pred, in_range(pred))
    area_t = hist(target, in_range(target))
    return inter, area_o + area_t - inter, area_t
