"""Native C++ data-plane parity: the fused augment kernel must produce the
same samples as the numpy/cv2 pipeline for the same python RNG seed."""

import random

import numpy as np
import pytest

from u2pl_tpu import native
from u2pl_tpu.config import CropCfg, SplitCfg
from u2pl_tpu.data.transforms import FusedNativeTransform, build_transform

MEAN = [123.675, 116.28, 103.53]
STD = [58.395, 57.12, 57.375]


@pytest.fixture(scope="module", autouse=True)
def built():
    if not native.available():
        from u2pl_tpu.native.build import build

        build(verbose=False)
        native._TRIED = False  # re-probe
    assert native.available()


def _split_cfg(rand=True):
    return SplitCfg(
        flip=True,
        rand_resize=(0.5, 2.0) if rand else None,
        crop=CropCfg(type="rand" if rand else "center", size=(65, 65)),
    )


def _numpy_transform(split_cfg):
    import os

    os.environ["U2PL_TPU_NO_NATIVE"] = "1"
    try:
        return build_transform(split_cfg, MEAN, STD, 255)
    finally:
        del os.environ["U2PL_TPU_NO_NATIVE"]


@pytest.mark.parametrize("seed", [0, 1, 2, 3])
def test_fused_matches_numpy_pipeline(seed):
    rng = np.random.RandomState(seed)
    img = rng.randint(0, 256, (90, 120, 3)).astype(np.uint8)
    lab = rng.randint(0, 21, (90, 120)).astype(np.uint8)
    split = _split_cfg(rand=True)

    fused = FusedNativeTransform(split, MEAN, STD, 255)
    plain = _numpy_transform(split)
    assert not isinstance(plain, FusedNativeTransform)

    random.seed(seed)
    fi, fl = fused(img, lab)
    random.seed(seed)
    pi, pl = plain(img.astype(np.float32), lab.astype(np.int32))

    assert fi.shape == pi.shape == (65, 65, 3)
    np.testing.assert_array_equal(fl, pl)
    np.testing.assert_allclose(fi, pi, atol=2e-3)


def test_fused_center_crop_no_resize():
    rng = np.random.RandomState(7)
    img = rng.randint(0, 256, (50, 40, 3)).astype(np.uint8)
    lab = rng.randint(0, 21, (50, 40)).astype(np.uint8)
    split = SplitCfg(crop=CropCfg(type="center", size=(64, 64)))

    fused = FusedNativeTransform(split, MEAN, STD, 255)
    plain = _numpy_transform(split)
    random.seed(0)
    fi, fl = fused(img, lab)
    random.seed(0)
    pi, pl = plain(img.astype(np.float32), lab.astype(np.int32))
    np.testing.assert_array_equal(fl, pl)
    np.testing.assert_allclose(fi, pi, atol=2e-3)
    # pad regions: label 0 (reference quirk), image exactly 0
    assert fl[0, 0] == 0 and np.all(fi[0, 0] == 0)


def test_build_transform_uses_native_when_available():
    t = build_transform(_split_cfg(), MEAN, STD, 255)
    assert isinstance(t, FusedNativeTransform)
