"""End-to-end supervised-baseline CLI (train_sup.py): non-semi dataset
type, sup step, validation, checkpointing."""

import sys

import numpy as np
import pytest
import yaml

from PIL import Image

pytestmark = pytest.mark.slow

HW, C = 33, 5


@pytest.fixture(scope="module")
def ws(tmp_path_factory):
    root = tmp_path_factory.mktemp("sup_ws")
    data_root = root / "VOC2012"
    (data_root / "JPEGImages").mkdir(parents=True)
    (data_root / "SegmentationClassAug").mkdir()
    splits = root / "splits" / "pascal" / "tiny"
    splits.mkdir(parents=True)
    rng = np.random.RandomState(0)
    ids = [f"s{i:02d}" for i in range(10)]
    for s in ids:
        Image.fromarray((rng.rand(HW, HW, 3) * 255).astype(np.uint8)).save(
            data_root / "JPEGImages" / f"{s}.jpg"
        )
        Image.fromarray(rng.randint(0, C, (HW, HW)).astype(np.uint8)).save(
            data_root / "SegmentationClassAug" / f"{s}.png"
        )
    (splits / "labeled.txt").write_text("\n".join(ids[:8]) + "\n")
    (root / "splits" / "pascal" / "val.txt").write_text("\n".join(ids[8:]) + "\n")
    exp = root / "exp"
    exp.mkdir()
    cfg = {
        "dataset": {
            "type": "pascal",  # non-semi: build_loaders returns (sup, val)
            "train": {
                "data_root": str(data_root),
                "data_list": str(splits / "labeled.txt"),
                "flip": True,
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
            "epochs": 1,
            "eval_on": True,
            "optimizer": {
                "type": "SGD",
                "kwargs": {"lr": 0.001, "momentum": 0.9, "weight_decay": 0.0001},
            },
            "lr_scheduler": {"mode": "poly", "kwargs": {"power": 0.9}},
        },
        "saver": {"snapshot_dir": "checkpoints"},
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
    return exp, cfg_path


def test_train_sup_cli(ws):
    exp, cfg_path = ws
    sys.path.insert(0, "/root/repo")
    import train_sup

    old = sys.argv
    sys.argv = ["train_sup.py", "--config", str(cfg_path), "--seed", "2"]
    try:
        train_sup.main()
    finally:
        sys.argv = old

    ckpt = exp / "checkpoints" / "ckpt.ckpt"
    assert ckpt.exists()
    from u2pl_tpu.utils.checkpoint import restore_payload

    payload = restore_payload(str(ckpt))
    assert payload["epoch"] == 1
    assert "teacher_state" not in payload  # sup baseline has no teacher
