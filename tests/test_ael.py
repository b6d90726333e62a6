import numpy as np
import pytest

import jax.numpy as jnp

from u2pl_tpu.ael import (
    cal_category_confidence,
    dynamic_copy_paste,
    generate_cutmix_mask,
    init_cutmix,
    sample_from_bank,
    update_cutmix_bank,
)


def test_init_cutmix_covers_half_area():
    np.random.seed(0)
    for _ in range(20):
        y0, x0, y1, x1 = init_cutmix(100)
        area = (y1 - y0) * (x1 - x0)
        assert 0.35 * 100**2 < area < 0.7 * 100**2
        assert 0 <= y0 <= y1 <= 100 and 0 <= x0 <= x1 <= 100


def test_generate_cutmix_mask_targets_class_region():
    np.random.seed(1)
    import random

    random.seed(1)
    pred = np.zeros((64, 64), np.int64)
    pred[10:40, 20:50] = 3  # a 30x30 component of class 3
    mask = generate_cutmix_mask(pred, 3, area_thresh=0.0001)
    assert mask.shape == (64, 64)
    assert mask.sum() > 0
    # box must overlap the class-3 component substantially
    overlap = mask[10:40, 20:50].sum()
    assert overlap > 0.5 * 30 * 30


def test_sample_from_bank_prefers_low_confidence():
    np.random.seed(2)
    bank = np.zeros((4, 10))
    bank[2, [1, 5]] = 1
    conf = np.array([0.99, 0.99, 0.01, 0.99])  # class 2 has low confidence
    picks = [sample_from_bank(bank, conf)[1] for _ in range(50)]
    assert np.bincount(picks, minlength=4)[2] > 10


def test_update_cutmix_bank():
    preds = np.zeros((2, 8, 8, 3), np.float32)
    preds[0, :, :, 1] = 5.0  # image 0 all class 1
    preds[1, :, :, 2] = 5.0  # image 1 all class 2
    bank = np.ones((3, 4))
    bank = update_cutmix_bank(bank, preds, img_id=0, sample_id=3)
    assert bank[1, 0] == 1 and bank[0, 0] == 0 and bank[2, 0] == 0
    assert bank[2, 3] == 1 and bank[0, 3] == 0 and bank[1, 3] == 0


def test_cal_category_confidence():
    logits = np.zeros((1, 4, 4, 3), np.float32)
    logits[..., 1] = 2.0
    gt = np.ones((1, 4, 4), np.int64)
    conf = np.asarray(cal_category_confidence(jnp.asarray(logits), jnp.asarray(gt), 3))
    assert conf[1] > 0.5
    assert conf[0] == 0 and conf[2] == 0  # absent classes -> 0


def test_dynamic_copy_paste():
    img = np.zeros((1, 4, 4, 3), np.float32)
    paste = np.ones((1, 4, 4, 3), np.float32)
    images = np.concatenate([img, paste], axis=-1)
    lab = np.zeros((1, 4, 4), np.int64)
    paste_lab = np.full((1, 4, 4), 2, np.int64)
    labels = np.stack([lab, paste_lab], axis=1)
    out_img, out_lab = dynamic_copy_paste(
        jnp.asarray(images), jnp.asarray(labels), query_cat=[2]
    )
    assert np.all(np.asarray(out_lab) == 2)
    assert np.all(np.asarray(out_img) == 1.0)


def test_cal_pixel_num_counts_and_ignores_255():
    from u2pl_tpu.ael import cal_pixel_num

    pred = np.full((10, 10), 255, np.int64)
    pred[:3, :] = 2
    pred[3:5, :] = 7
    res = cal_pixel_num(pred)
    assert res.shape == (19,)
    assert res[2] == 30 and res[7] == 20 and res.sum() == 50


def test_padding_bbox_old_grows_towards_full_area():
    from u2pl_tpu.ael import padding_bbox_old

    # tall box: long axis y gets the fixed 40px pad (clamped to the crop),
    # then x widens symmetrically toward area/(y1-y0) = 100
    y0, x0, y1, x1 = padding_bbox_old([30.0, 40.0, 80.0, 60.0], 100)
    assert (y0, y1) == (0, 100)
    assert (x0, x1) == (0, 100)


def test_padding_bbox_old_wide_branch_quirk():
    from u2pl_tpu.ael import padding_bbox_old

    # wide box takes the else branch whose reference code clamps with
    # max(x1 + 40, size): x1 legitimately exceeds the crop (parity quirk)
    y0, x0, y1, x1 = padding_bbox_old([40.0, 10.0, 55.0, 90.0], 100)
    assert x1 == 130 and x0 == 0
    assert 0 < y0 < 40 and 55 < y1 <= 100
