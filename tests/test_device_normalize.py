"""uint8 H2D path: raw-byte crops + on-device normalization must match the
host-normalized float pipeline within uint8 quantization of resampled
pixels (<= 0.5/std per channel)."""

import random

import numpy as np
import pytest

import jax.numpy as jnp

from u2pl_tpu.config import CropCfg, SplitCfg
from u2pl_tpu.data.transforms import build_transform

MEAN = [123.675, 116.28, 103.53]
STD = [58.395, 57.12, 57.375]


@pytest.mark.parametrize("seed", [0, 1])
def test_u8_mode_matches_float_pipeline(seed):
    split = SplitCfg(
        flip=True,
        rand_resize=(0.5, 2.0),
        crop=CropCfg(type="rand", size=(65, 65)),
    )
    rng = np.random.RandomState(seed)
    img = rng.randint(0, 256, (90, 100, 3)).astype(np.uint8)
    lab = rng.randint(0, 21, (90, 100)).astype(np.uint8)

    t_f32 = build_transform(split, MEAN, STD, 255, output_u8=False)
    t_u8 = build_transform(split, MEAN, STD, 255, output_u8=True)

    random.seed(seed)
    fi, fl = t_f32(img, lab)
    random.seed(seed)
    ui, ul = t_u8(img, lab)

    assert ui.dtype == np.uint8
    np.testing.assert_array_equal(fl, ul)

    # on-device normalization (what the train step does)
    mean = np.asarray(MEAN, np.float32)
    std = np.asarray(STD, np.float32)
    ni = (np.asarray(ui, np.float32) - mean) / std
    # quantization bound: 0.5/std per channel everywhere (pads included,
    # since u8 mode pads with round(mean) -> normalized ~0)
    err = np.abs(ni - fi).max()
    assert err <= 0.5 / min(STD) + 1e-4, err


def test_u8_pad_region_semantics():
    """u8 mode pads images with round(mean) bytes so the device-normalized
    pad value is ~0, matching the reference's normalized-zero padding
    within quantization; the label pad keeps the reference's 0 quirk."""
    split = SplitCfg(crop=CropCfg(type="center", size=(64, 64)))
    img = np.full((10, 10, 3), 128, np.uint8)
    lab = np.ones((10, 10), np.uint8)
    t_u8 = build_transform(split, MEAN, STD, 255, output_u8=True)
    ui, ul = t_u8(img, lab)
    np.testing.assert_array_equal(
        ui[0, 0], np.rint(np.asarray(MEAN)).astype(np.uint8)
    )
    assert ul[0, 0] == 0  # reference label-pad-0 quirk preserved
    assert ui[32, 32].tolist() == [128, 128, 128]
