"""End-to-end cityscapes-family coverage: OHEM criterion + aux head +
sup_only_epoch=0 semi training on a synthetic cityscapes-layout dataset,
then the crop-grid sliding-window evaluator."""

import os
import sys

import numpy as np
import pytest
import yaml

from PIL import Image

pytestmark = pytest.mark.slow

HW = 33  # label/crop size
IMG_H, IMG_W = 40, 72  # non-square, larger than crop -> real crop grid
C = 6


@pytest.fixture(scope="module")
def ws(tmp_path_factory):
    root = tmp_path_factory.mktemp("cityscapes_ws")
    data_root = root / "cityscapes"
    splits = root / "splits" / "cityscapes" / "tiny"
    splits.mkdir(parents=True)

    rng = np.random.RandomState(0)
    ids = []
    for i in range(18):
        city = "aachen"
        stem = f"{city}_{i:06d}_000019"
        img_rel = f"leftImg8bit/train/{city}/{stem}_leftImg8bit.png"
        lab_rel = f"gtFine/train/{city}/{stem}_gtFine_labelTrainIds.png"
        (data_root / os.path.dirname(img_rel)).mkdir(parents=True, exist_ok=True)
        (data_root / os.path.dirname(lab_rel)).mkdir(parents=True, exist_ok=True)
        img = (rng.rand(IMG_H, IMG_W, 3) * 255).astype(np.uint8)
        lab = rng.randint(0, C, (IMG_H, IMG_W)).astype(np.uint8)
        Image.fromarray(img).save(data_root / img_rel)
        Image.fromarray(lab).save(data_root / lab_rel)
        ids.append(img_rel)

    (splits / "labeled.txt").write_text("\n".join(ids[:8]) + "\n")
    (splits / "unlabeled.txt").write_text("\n".join(ids[8:16]) + "\n")
    (root / "splits" / "cityscapes" / "val.txt").write_text(
        "\n".join(ids[16:]) + "\n"
    )

    exp = root / "exp"
    exp.mkdir()
    cfg = {
        "dataset": {
            "type": "cityscapes_semi",
            "pool_size": 16,
            "device_normalize": True,  # exercise the uint8 H2D path too
            "train": {
                "data_root": str(data_root),
                "data_list": str(splits / "labeled.txt"),
                "flip": True,
                "rand_resize": [0.75, 1.25],
                "crop": {"type": "rand", "size": [HW, HW]},
            },
            "val": {
                "data_root": str(data_root),
                "data_list": str(root / "splits" / "cityscapes" / "val.txt"),
                "crop": {"type": "center", "size": [HW, HW]},
            },
            "batch_size": 1,  # per-replica x 8 CPU devices -> global batch 8
            "n_sup": 8,
            "workers": 2,
            "mean": [123.675, 116.28, 103.53],
            "std": [58.395, 57.12, 57.375],
            "ignore_label": 255,
        },
        "trainer": {
            "epochs": 1,
            "eval_on": True,
            "sup_only_epoch": 0,  # straight into semi, like the city configs
            "optimizer": {
                "type": "SGD",
                "kwargs": {"lr": 0.01, "momentum": 0.9, "weight_decay": 0.0005},
            },
            "lr_scheduler": {"mode": "poly", "kwargs": {"power": 0.9}},
            "unsupervised": {"drop_percent": 80, "apply_aug": "classmix"},
            "contrastive": {
                "negative_high_entropy": True,
                "low_rank": 1,
                "high_rank": 3,
                "current_class_threshold": 0.3,
                "current_class_negative_threshold": 1,
                "low_entropy_threshold": 20,
                "num_negatives": 4,
                "num_queries": 8,
                "temperature": 0.5,
                "max_keys_per_class_per_step": 16,
            },
        },
        "saver": {"snapshot_dir": "checkpoints", "auto_resume": True},
        "criterion": {"type": "ohem", "kwargs": {"thresh": 0.7, "min_kept": 200}},
        "net": {
            "num_classes": C,
            "sync_bn": True,
            "ema_decay": 0.99,
            "aux_loss": {"aux_plane": 1024, "loss_weight": 0.4},
            "encoder": {
                "type": "u2pl.models.resnet.resnet10",
                "kwargs": {
                    "multi_grid": True,
                    "fpn": True,
                    "replace_stride_with_dilation": [False, True, True],
                },
            },
            "decoder": {
                "type": "u2pl.models.decoder.dec_deeplabv3_plus",
                "kwargs": {"inner_planes": 32, "dilations": [2, 4, 6]},
            },
        },
    }
    cfg_path = exp / "config.yaml"
    cfg_path.write_text(yaml.safe_dump(cfg))
    return root, exp, cfg_path


def _run_main(module, argv):
    old = sys.argv
    sys.argv = argv
    try:
        module.main()
    finally:
        sys.argv = old


def test_train_semi_cityscapes(ws):
    root, exp, cfg_path = ws
    sys.path.insert(0, "/root/repo")
    import train_semi

    _run_main(train_semi, ["train_semi.py", "--config", str(cfg_path), "--seed", "2"])
    assert (exp / "checkpoints" / "ckpt.ckpt").exists()


def test_eval_cityscapes_crop_grid(ws):
    root, exp, cfg_path = ws
    ckpt = exp / "checkpoints" / "ckpt.ckpt"
    assert ckpt.exists()
    import eval as eval_cli

    out = exp / "results"
    _run_main(
        eval_cli,
        [
            "eval.py", "--config", str(cfg_path), "--model_path", str(ckpt),
            "--save_folder", str(out), "--scales", "1.0",
            "--base_size", str(IMG_W),
        ],
    )
    grays = list((out / "gray").glob("*.png"))
    assert len(grays) == 2
    mask = np.asarray(Image.open(grays[0]))
    assert mask.shape == (IMG_H, IMG_W)
    assert mask.max() < C
