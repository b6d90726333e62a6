"""Cityscapes cutout/cutmix transform-config wiring (VERDICT r1 gap #4).

The reference cityscapes transform builder accepts `cutout`/`cutmix`
config entries (reference cityscapes.py:70-78) which switch the Compose
output to the idx>=5 protocol (augmentation.py:31-47): cutout yields the
5-tuple (img_origin, label_origin, img, label, valid) and cutmix the
(img, label, masks) triple.  These must round-trip from YAML config
through build_loaders; the pascal builder must keep ignoring the keys
(pascal_voc.py:48-71 has no such branches).
"""

import os

import numpy as np
import pytest

from PIL import Image

from u2pl_tpu.config import parse_config
from u2pl_tpu.data import build_loaders

HW = 24
C = 5


@pytest.fixture(scope="module")
def city_ws(tmp_path_factory):
    root = tmp_path_factory.mktemp("city_cutout_ws")
    data_root = root / "cityscapes"
    # split parsing dispatches on "cityscapes" in the list path
    splits = root / "splits" / "cityscapes"
    splits.mkdir(parents=True)
    rng = np.random.RandomState(0)
    ids = []
    for i in range(8):
        stem = f"aachen_{i:06d}_000019"
        img_rel = f"leftImg8bit/train/aachen/{stem}_leftImg8bit.png"
        lab_rel = f"gtFine/train/aachen/{stem}_gtFine_labelTrainIds.png"
        (data_root / os.path.dirname(img_rel)).mkdir(parents=True, exist_ok=True)
        (data_root / os.path.dirname(lab_rel)).mkdir(parents=True, exist_ok=True)
        Image.fromarray((rng.rand(32, 48, 3) * 255).astype(np.uint8)).save(
            data_root / img_rel
        )
        Image.fromarray(rng.randint(0, C, (32, 48)).astype(np.uint8)).save(
            data_root / lab_rel
        )
        ids.append(img_rel)
    (splits / "labeled.txt").write_text("\n".join(ids[:4]) + "\n")
    (splits / "unlabeled.txt").write_text("\n".join(ids[4:]) + "\n")
    (splits / "val.txt").write_text("\n".join(ids[4:]) + "\n")
    return root, data_root, splits


def _raw_cfg(data_root, splits, **train_extra):
    train = {
        "data_root": str(data_root),
        "data_list": str(splits / "labeled.txt"),
        "flip": True,
        "crop": {"type": "rand", "size": [HW, HW]},
    }
    train.update(train_extra)
    return {
        "dataset": {
            "type": "cityscapes_semi",
            "pool_size": 8,
            "n_sup": 4,
            "batch_size": 2,
            "workers": 1,
            "ignore_label": 255,
            "train": train,
            "val": {
                "data_root": str(data_root),
                "data_list": str(splits / "val.txt"),
                "crop": {"type": "center", "size": [HW, HW]},
            },
        },
        "net": {"num_classes": C},
    }


def test_cutout_config_roundtrip(city_ws):
    root, data_root, splits = city_ws
    cfg = parse_config(
        _raw_cfg(data_root, splits, cutout={"n_holes": 2, "length": 8})
    )
    assert cfg.dataset.train.cutout is not None
    sup, unsup, val = build_loaders(cfg, seed=1)
    batch = next(iter(sup.epoch(0)))
    assert len(batch) == 5, "cutout must yield the reference 5-tuple protocol"
    img_origin, label_origin, img, label, valid = batch
    assert img_origin.shape == (2, HW, HW, 3)
    assert img.shape == (2, HW, HW, 3)
    assert valid.shape == (2, HW, HW)
    # the cut region: image zeroed, valid marked 255
    cut = valid[0] == 255
    assert cut.any() and not cut.all()
    np.testing.assert_allclose(img[0][cut], 0.0)
    np.testing.assert_allclose(img[0][~cut], img_origin[0][~cut])
    # val split untouched -> plain pairs
    vb = next(iter(val.epoch(0)))
    assert len(vb) == 2


def test_cutmix_config_roundtrip(city_ws):
    root, data_root, splits = city_ws
    cfg = parse_config(
        _raw_cfg(data_root, splits, cutmix={"n_holes": 1, "prop_range": [0.25, 0.5]})
    )
    assert cfg.dataset.train.cutmix is not None
    assert cfg.dataset.train.cutmix.prop_range == (0.25, 0.5)
    sup, unsup, val = build_loaders(cfg, seed=1)
    batch = next(iter(sup.epoch(0)))
    assert len(batch) == 3, "cutmix must yield the reference mask triple"
    img, label, masks = batch
    assert img.shape == (2, HW, HW, 3)
    assert masks.shape == (2, 1, 1, HW, HW)  # (B, n_masks, 1, H, W)
    area = masks.mean(axis=(1, 2, 3, 4))
    assert ((area > 0.2) & (area < 0.55)).all(), area


def test_pascal_ignores_cutout_key(city_ws):
    """The reference pascal builder has no cutout branch — the key must be
    silently ignored for pascal dataset types."""
    root, data_root, splits = city_ws
    raw = _raw_cfg(data_root, splits, cutout={"n_holes": 2, "length": 8})
    raw["dataset"]["type"] = "pascal_semi"
    cfg = parse_config(raw)
    assert cfg.dataset.train.cutout is None
