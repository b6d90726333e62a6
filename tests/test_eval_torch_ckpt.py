"""eval.py must consume a reference-format torch checkpoint (.pth with
teacher_state/model_state, DDP 'module.' prefixes) directly through the
torch->flax converter — the workflow a reference user follows to compare
checkpoints."""

import os
import sys

import numpy as np
import pytest
import yaml

from PIL import Image

from ref_oracle import reference_available, setup_reference

pytestmark = pytest.mark.skipif(
    not reference_available(), reason="reference not mounted"
)
torch = pytest.importorskip("torch")

HW = 33
C = 21  # converter needs a real reference architecture (resnet50 head)


@pytest.fixture(scope="module")
def ws(tmp_path_factory):
    setup_reference()
    root = tmp_path_factory.mktemp("torch_ckpt_ws")
    data_root = root / "VOC2012"
    (data_root / "JPEGImages").mkdir(parents=True)
    (data_root / "SegmentationClassAug").mkdir()
    rng = np.random.RandomState(0)
    ids = ["a", "b"]
    for s in ids:
        Image.fromarray((rng.rand(HW, HW, 3) * 255).astype(np.uint8)).save(
            data_root / "JPEGImages" / f"{s}.jpg"
        )
        Image.fromarray(rng.randint(0, C, (HW, HW)).astype(np.uint8)).save(
            data_root / "SegmentationClassAug" / f"{s}.png"
        )
    val_list = root / "pascal_val.txt"
    val_list.write_text("\n".join(ids) + "\n")

    # reference-format checkpoint: random-weight torch model, DDP prefixes
    from test_model_parity import _ref_model

    tm, _ = _ref_model(num_classes=C, aux=False)
    sd = {f"module.{k}": v for k, v in tm.state_dict().items()}
    ckpt_path = root / "ckpt_best.pth"
    torch.save(
        {"epoch": 1, "teacher_state": sd, "model_state": sd, "best_miou": 0.0},
        ckpt_path,
    )

    cfg = {
        "dataset": {
            "type": "pascal",
            "val": {
                "data_root": str(data_root),
                "data_list": str(val_list),
                "crop": {"type": "center", "size": [HW, HW]},
            },
            "mean": [123.675, 116.28, 103.53],
            "std": [58.395, 57.12, 57.375],
            "ignore_label": 255,
        },
        "criterion": {"type": "CELoss", "kwargs": {}},
        "net": {
            "num_classes": C,
            "sync_bn": False,
            "ema_decay": 0.99,
            "encoder": {
                "type": "u2pl.models.resnet.resnet50",
                "kwargs": {
                    "multi_grid": True,
                    "zero_init_residual": True,
                    "fpn": True,
                    "replace_stride_with_dilation": [False, True, True],
                },
            },
            "decoder": {
                "type": "u2pl.models.decoder.dec_deeplabv3_plus",
                "kwargs": {"inner_planes": 256, "dilations": [12, 24, 36]},
            },
        },
    }
    cfg_path = root / "config.yaml"
    cfg_path.write_text(yaml.safe_dump(cfg))
    return root, cfg_path, ckpt_path, tm


def test_eval_cli_loads_reference_pth(ws):
    root, cfg_path, ckpt_path, tm = ws
    sys.path.insert(0, "/root/repo")
    import eval as eval_cli

    out = root / "results"
    old = sys.argv
    sys.argv = [
        "eval.py", "--config", str(cfg_path), "--model_path", str(ckpt_path),
        "--save_folder", str(out), "--scales", "1.0",
    ]
    try:
        eval_cli.main()
    finally:
        sys.argv = old

    grays = sorted((out / "gray").glob("*.png"))
    assert len(grays) == 2

    # bit-match: the saved mask must equal the torch model's own argmax
    mean = np.asarray([123.675, 116.28, 103.53], np.float32)
    std = np.asarray([58.395, 57.12, 57.375], np.float32)
    img = np.asarray(
        Image.open(root / "VOC2012" / "JPEGImages" / "a.jpg").convert("RGB"),
        np.float32,
    )
    x = torch.from_numpy((img - mean) / std).permute(2, 0, 1)[None]
    with torch.no_grad():
        tout = tm(x)["pred"]
        tout = torch.nn.functional.interpolate(
            tout, (HW, HW), mode="bilinear", align_corners=True
        )
        tmask = tout.argmax(1)[0].numpy()
    got = np.asarray(Image.open(grays[0]))
    agree = (got == tmask).mean()
    assert agree > 0.99, f"mask agreement {agree}"
