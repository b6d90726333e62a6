"""Sliding-window / multi-scale offline evaluation (reference eval.py).

Parity targets:
  * net_process: forward + align-corners bilinear upsample to the input
    size (eval.py:158-181)
  * scale_crop_process: pad to crop size, overlapping crop grid with
    stride ceil(crop*2/3), sum logits into a canvas, divide by visit
    counts, unpad, resize to original (eval.py:184-223)
  * scale_whole_process: whole-image forward (eval.py:226-232)
  * multi-scale outer loop: long-side scaling for cityscapes
    (eval.py:269-282), plain h*scale/w*scale for VOC (eval.py:330-336)

TPU-native difference: all crops of one (image, scale) are stacked into a
single batched forward (one XLA launch instead of grid_h*grid_w), and the
per-crop model function is jitted once per unique crop shape.
"""

from __future__ import annotations

import functools
from typing import Callable, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from u2pl_tpu.models.resnet import valid_feature_sizes
from u2pl_tpu.ops.resize import (
    resize_bilinear,
    resize_bilinear_numpy,
    resize_bilinear_valid,
)


def bucket_dim(n: int, quantum: int = 128) -> int:
    """Round a spatial dim up to the bucket grid (multiples of `quantum`)."""
    return max(quantum, ((n + quantum - 1) // quantum) * quantum)


def pred_os_index(decoder_type: str) -> int:
    """Index into valid_feature_sizes() for the decoder's pred resolution:
    dec_deeplabv3_plus emits logits at os4 (reference decoder.py:113-119),
    dec_deeplabv3 at os8 (no low-level skip, reference decoder.py:8-42)."""
    key = decoder_type.rsplit(".", 1)[-1]
    if key == "dec_deeplabv3_plus":
        return 1  # os4
    if key == "dec_deeplabv3":
        return 2  # os8
    raise ValueError(f"unknown decoder type {decoder_type!r}")


def make_net_process_bucketed(
    model, variables, quantum: int = 128, pred_os: int = 1
) -> Callable:
    """Shape-bucketed whole-image forward: f(images (1,H,W,3)) -> logits
    (1,H,W,C) upsampled to input size.  `pred_os` is the
    valid_feature_sizes() index of the decoder's pred resolution (see
    pred_os_index) — using the wrong stride would resize with wrong valid
    sizes and silently corrupt predictions.

    The reference's whole-image VOC eval forwards each val image at its own
    size (reference eval.py:226-232, 313-361); under jit that is one
    recompile per unique image size — a compile storm over VOC's hundreds
    of val shapes.  Here the image is zero-padded to a bucket shape
    (dims rounded up to `quantum`), the true size rides along as two traced
    scalars, and the model's masked forward (SegModel valid_hw) makes the
    valid region bit-match an unpadded forward.  One compiled program per
    bucket serves every image size inside it.

    `net_process.compiles()` reports the number of distinct compiled
    programs (for tests / telemetry).
    """

    @functools.lru_cache(maxsize=32)
    def compiled(bh: int, bw: int):
        @jax.jit
        def fwd(image, vh, vw):
            out = model.apply(
                variables, image, train=False, valid_hw=(vh, vw)
            )["pred"]
            v_pred = (
                valid_feature_sizes(vh)[pred_os],
                valid_feature_sizes(vw)[pred_os],
            )
            return resize_bilinear_valid(out, (bh, bw), v_pred, (vh, vw))

        return fwd

    def net_process(images: np.ndarray) -> np.ndarray:
        b, h, w, c = images.shape
        assert b == 1, "bucketed whole-image path is per-image"
        bh, bw = bucket_dim(h, quantum), bucket_dim(w, quantum)
        padded = np.zeros((1, bh, bw, c), np.float32)
        padded[0, :h, :w] = images[0]
        out = compiled(bh, bw)(
            jnp.asarray(padded), jnp.int32(h), jnp.int32(w)
        )
        return np.asarray(out)[:, :h, :w]

    net_process.compiles = lambda: compiled.cache_info().misses
    return net_process


def make_net_process(model, variables, block: bool = True) -> Callable:
    """Returns f(images NHWC) -> logits NHWC upsampled to input size,
    jit-cached per input shape.

    ``block=False`` returns the device array straight from JAX's async
    dispatch instead of syncing to numpy — the caller syncs later with
    ``np.asarray``.  This lets a serving loop overlap the device forward
    of batch i+1 with the host post-processing of batch i (infer.py's
    double-buffered loop)."""

    @functools.lru_cache(maxsize=32)
    def compiled(shape: Tuple[int, ...]):
        @jax.jit
        def fwd(images):
            out = model.apply(variables, images, train=False)["pred"]
            return resize_bilinear(out, images.shape[1:3], align_corners=True)

        return fwd

    def net_process(images: np.ndarray):
        fwd = compiled(tuple(images.shape))
        out = fwd(jnp.asarray(images))
        return np.asarray(out) if block else out

    return net_process


def scale_crop_process(
    net_process: Callable,
    image: np.ndarray,  # (H, W, 3) normalized
    classes: int,
    crop_h: int,
    crop_w: int,
    h: int,
    w: int,
    stride_rate: float = 2.0 / 3.0,
) -> np.ndarray:
    ori_h, ori_w = image.shape[:2]
    pad_h = max(crop_h - ori_h, 0)
    pad_w = max(crop_w - ori_w, 0)
    ph0, pw0 = pad_h // 2, pad_w // 2
    if pad_h > 0 or pad_w > 0:
        image = np.pad(
            image, ((ph0, pad_h - ph0), (pw0, pad_w - pw0), (0, 0)),
            constant_values=0.0,
        )
    new_h, new_w = image.shape[:2]
    stride_h = int(np.ceil(crop_h * stride_rate))
    stride_w = int(np.ceil(crop_w * stride_rate))
    grid_h = int(np.ceil(float(new_h - crop_h) / stride_h) + 1)
    grid_w = int(np.ceil(float(new_w - crop_w) / stride_w) + 1)

    crops, coords = [], []
    for ih in range(grid_h):
        for iw in range(grid_w):
            e_h = min(ih * stride_h + crop_h, new_h)
            s_h = e_h - crop_h
            e_w = min(iw * stride_w + crop_w, new_w)
            s_w = e_w - crop_w
            crops.append(image[s_h:e_h, s_w:e_w])
            coords.append((s_h, s_w))

    logits = net_process(np.stack(crops))  # (G, crop_h, crop_w, C)

    pred = np.zeros((new_h, new_w, classes), np.float32)
    count = np.zeros((new_h, new_w), np.float32)
    for (s_h, s_w), lg in zip(coords, logits):
        pred[s_h : s_h + crop_h, s_w : s_w + crop_w] += lg
        count[s_h : s_h + crop_h, s_w : s_w + crop_w] += 1
    pred /= count[:, :, None]
    pred = pred[ph0 : ph0 + ori_h, pw0 : pw0 + ori_w]
    return resize_bilinear_numpy(pred, (h, w), align_corners=True)


def scale_whole_process(
    net_process: Callable, image: np.ndarray, h: int, w: int
) -> np.ndarray:
    pred = net_process(image[None])[0]
    return resize_bilinear_numpy(pred, (h, w), align_corners=True)


def predict_city(
    net_process: Callable,
    image: np.ndarray,
    classes: int,
    base_size: int,
    crop_h: int,
    crop_w: int,
    scales: Sequence[float],
) -> np.ndarray:
    """Multi-scale crop-grid prediction -> argmax mask (eval.py:268-283)."""
    h, w = image.shape[:2]
    total = np.zeros((h, w, classes), np.float32)
    for scale in scales:
        long_size = round(scale * base_size)
        new_h = new_w = long_size
        if h > w:
            new_w = round(long_size / float(h) * w)
        else:
            new_h = round(long_size / float(w) * h)
        scaled = resize_bilinear_numpy(image, (new_h, new_w), align_corners=True)
        total += scale_crop_process(
            net_process, scaled, classes, crop_h, crop_w, h, w
        )
    return total.argmax(-1).astype(np.uint8)


def predict_whole(
    net_process: Callable,
    image: np.ndarray,
    classes: int,
    scales: Sequence[float],
) -> np.ndarray:
    """Whole-image multi-scale prediction -> argmax mask (eval.py:328-339)."""
    h, w = image.shape[:2]
    total = np.zeros((h, w, classes), np.float32)
    for scale in scales:
        scaled = resize_bilinear_numpy(
            image, (round(h * scale), round(w * scale)), align_corners=True
        )
        total += scale_whole_process(net_process, scaled, h, w)
    return total.argmax(-1).astype(np.uint8)
