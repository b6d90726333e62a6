"""ctypes bindings for the native host data plane (augment.cc).

Build with `python -m u2pl_tpu.native.build` (or tools/build_native.sh);
the library is optional — transforms fall back to the numpy path when it
is absent.  Loading is lazy and cached.
"""

from __future__ import annotations

import ctypes
import os
from typing import Optional

import numpy as np

_LIB: Optional[ctypes.CDLL] = None
_TRIED = False

_DIR = os.path.dirname(os.path.abspath(__file__))
LIB_PATH = os.path.join(_DIR, "libu2pl_data.so")


def load() -> Optional[ctypes.CDLL]:
    global _LIB, _TRIED
    if _TRIED:
        return _LIB
    _TRIED = True
    if not os.path.exists(LIB_PATH):
        return None
    lib = ctypes.CDLL(LIB_PATH)
    u8p = np.ctypeslib.ndpointer(np.uint8, flags="C_CONTIGUOUS")
    f32p = np.ctypeslib.ndpointer(np.float32, flags="C_CONTIGUOUS")
    i32p = np.ctypeslib.ndpointer(np.int32, flags="C_CONTIGUOUS")
    c = ctypes.c_int
    lib.u2pl_augment_sample.argtypes = [
        u8p, c, c, u8p, f32p, f32p, f32p, c, c, c, c, c, c, c, c, f32p, i32p,
    ]
    lib.u2pl_augment_sample.restype = None
    lib.u2pl_gaussian_blur.argtypes = [f32p, c, c, f32p, c, f32p]
    lib.u2pl_gaussian_blur.restype = None
    _LIB = lib
    return _LIB


def available() -> bool:
    return load() is not None


def augment_sample(
    img: np.ndarray,  # (h, w, 3) uint8
    label: np.ndarray,  # (h, w) uint8
    mean: np.ndarray,
    std: np.ndarray,
    new_h: int,
    new_w: int,
    flip: bool,
    crop_h: int,
    crop_w: int,
    off_y: int,
    off_x: int,
    pad_label: int,
    pad_rgb: np.ndarray = None,
):
    lib = load()
    assert lib is not None
    if pad_rgb is None:
        pad_rgb = np.zeros(3, np.float32)
    out_img = np.empty((crop_h, crop_w, 3), np.float32)
    out_lab = np.empty((crop_h, crop_w), np.int32)
    lib.u2pl_augment_sample(
        np.ascontiguousarray(img),
        img.shape[0],
        img.shape[1],
        np.ascontiguousarray(label),
        np.ascontiguousarray(mean, dtype=np.float32),
        np.ascontiguousarray(std, dtype=np.float32),
        np.ascontiguousarray(pad_rgb, dtype=np.float32),
        int(new_h),
        int(new_w),
        int(bool(flip)),
        int(crop_h),
        int(crop_w),
        int(off_y),
        int(off_x),
        int(pad_label),
        out_img,
        out_lab,
    )
    return out_img, out_lab


def gaussian_blur(img: np.ndarray, kernel: np.ndarray) -> np.ndarray:
    lib = load()
    assert lib is not None
    h, w, _ = img.shape
    out = np.empty_like(img, dtype=np.float32)
    radius = (kernel.shape[0] - 1) // 2
    lib.u2pl_gaussian_blur(
        np.ascontiguousarray(img, np.float32),
        h,
        w,
        np.ascontiguousarray(kernel, np.float32),
        radius,
        out,
    )
    return out
