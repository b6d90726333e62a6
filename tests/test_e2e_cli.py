"""End-to-end CLI test: train_semi.py on a synthetic pascal-like dataset
for 2 epochs (1 warmup + 1 semi) on the 8-device CPU mesh, then
auto-resume, then eval.py + infer.py on the saved checkpoint.  Exercises
loaders, drivers, validation, checkpoint save/restore, and the offline
evaluator in one pass."""

import os
import sys

import numpy as np
import pytest
import yaml

from PIL import Image

pytestmark = pytest.mark.slow

HW = 33
C = 5


@pytest.fixture(scope="module")
def ws(tmp_path_factory):
    root = tmp_path_factory.mktemp("pascal_ws")
    data_root = root / "VOC2012"
    (data_root / "JPEGImages").mkdir(parents=True)
    (data_root / "SegmentationClassAug").mkdir()
    splits = root / "splits" / "pascal" / "tiny"
    splits.mkdir(parents=True)

    rng = np.random.RandomState(0)
    ids = [f"img{i:03d}" for i in range(18)]
    for s in ids:
        img = (rng.rand(HW, HW, 3) * 255).astype(np.uint8)
        lab = rng.randint(0, C, (HW, HW)).astype(np.uint8)
        Image.fromarray(img).save(data_root / "JPEGImages" / f"{s}.jpg")
        Image.fromarray(lab).save(data_root / "SegmentationClassAug" / f"{s}.png")

    (splits / "labeled.txt").write_text("\n".join(ids[:8]) + "\n")
    (splits / "unlabeled.txt").write_text("\n".join(ids[8:16]) + "\n")
    (root / "splits" / "pascal" / "val.txt").write_text("\n".join(ids[16:]) + "\n")

    exp = root / "exp"
    exp.mkdir()
    cfg = {
        "dataset": {
            "type": "pascal_semi",
            "pool_size": 16,
            "train": {
                "data_root": str(data_root),
                "data_list": str(splits / "labeled.txt"),
                "flip": True,
                "rand_resize": [0.75, 1.25],
                "crop": {"type": "rand", "size": [HW, HW]},
            },
            "val": {
                "data_root": str(data_root),
                "data_list": str(root / "splits" / "pascal" / "val.txt"),
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
            "epochs": 2,
            "eval_on": True,
            "sup_only_epoch": 1,
            "optimizer": {
                "type": "SGD",
                "kwargs": {"lr": 0.01, "momentum": 0.9, "weight_decay": 0.0001},
            },
            "lr_scheduler": {"mode": "poly", "kwargs": {"power": 0.9}},
            "unsupervised": {"drop_percent": 80, "apply_aug": "cutmix"},
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
        "criterion": {"type": "CELoss", "kwargs": {}},
        "net": {
            "num_classes": C,
            "sync_bn": True,
            "ema_decay": 0.99,
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


def test_train_semi_cli_end_to_end(ws):
    root, exp, cfg_path = ws
    sys.path.insert(0, "/root/repo")
    import train_semi

    _run_main(train_semi, ["train_semi.py", "--config", str(cfg_path), "--seed", "2"])

    ckpt = exp / "checkpoints" / "ckpt.ckpt"
    assert ckpt.exists(), "checkpoint must be written after each epoch"

    # resume: payload epoch == 2 so the loop exits immediately
    from u2pl_tpu.utils.checkpoint import restore_payload

    payload = restore_payload(str(ckpt))
    assert payload["epoch"] == 2
    assert "teacher_state" in payload and "memobank" in payload
    _run_main(train_semi, ["train_semi.py", "--config", str(cfg_path), "--seed", "2"])


def test_eval_and_infer_cli(ws):
    root, exp, cfg_path = ws
    ckpt = exp / "checkpoints" / "ckpt.ckpt"
    assert ckpt.exists()
    import eval as eval_cli
    import infer as infer_cli

    out = exp / "results"
    _run_main(
        eval_cli,
        [
            "eval.py", "--config", str(cfg_path), "--model_path", str(ckpt),
            "--save_folder", str(out), "--scales", "1.0",
        ],
    )
    grays = list((out / "gray").glob("*.png"))
    colors = list((out / "color").glob("*.png"))
    assert len(grays) == 2 and len(colors) == 2
    mask = np.asarray(Image.open(grays[0]))
    assert mask.shape == (HW, HW) and mask.max() < C

    vout = exp / "viewer"
    _run_main(
        infer_cli,
        [
            "infer.py", "--config", str(cfg_path), "--model_path", str(ckpt),
            "--save_folder", str(vout),
        ],
    )
    assert len(list((vout / "gray").glob("*"))) == 2
