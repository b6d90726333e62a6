"""infer.py --batch_size N must produce bit-identical masks to the
reference-shaped per-image loop (N=1), including the zero-padded tail
batch (reference per-image loop: /root/reference/infer.py:84-118)."""

import os
import sys

import numpy as np
import pytest
import yaml

from PIL import Image

HW = 65
C = 5


@pytest.fixture(scope="module")
def ws(tmp_path_factory):
    root = tmp_path_factory.mktemp("infer_ws")
    data_root = root / "VOC2012"
    (data_root / "JPEGImages").mkdir(parents=True)
    rng = np.random.RandomState(0)
    ids = [f"img{i:03d}" for i in range(3)]  # 3 images, batch 2 -> padded tail
    for s in ids:
        img = (rng.rand(HW, HW, 3) * 255).astype(np.uint8)
        # infer.py's pascal branch builds JPEGImages/<id>.jpg (reference
        # quirk); the list file holds bare ids
        Image.fromarray(img).save(data_root / "JPEGImages" / f"{s}.jpg")
    lst = root / "val.txt"
    lst.write_text("".join(f"{s}\n" for s in ids))

    exp = root / "exp"
    exp.mkdir()
    (exp / "checkpoints").mkdir()
    cfg = {
        "dataset": {
            "type": "pascal",
            "val": {
                "data_root": str(data_root),
                "data_list": str(lst),
                "crop": {"type": "center", "size": [HW, HW]},
            },
            "batch_size": 1,
            "n_sup": 1,
            "mean": [123.675, 116.28, 103.53],
            "std": [58.395, 57.12, 57.375],
            "ignore_label": 255,
        },
        "criterion": {"type": "CELoss", "kwargs": {}},
        "trainer": {
            "epochs": 1,
            "optimizer": {"type": "SGD", "kwargs": {"lr": 0.01}},
            "lr_scheduler": {"mode": "poly", "kwargs": {"power": 0.9}},
        },
        "saver": {"snapshot_dir": str(exp / "checkpoints")},
        "net": {
            "num_classes": C,
            "sync_bn": False,
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
                "kwargs": {"inner_planes": 16, "dilations": [2, 4, 6]},
            },
        },
    }
    cfg_path = exp / "config.yaml"
    cfg_path.write_text(yaml.safe_dump(cfg))

    # random-init checkpoint through the real saver
    import jax

    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    from u2pl_tpu.config import parse_config
    from u2pl_tpu.models import build_model
    from u2pl_tpu.train.optim import make_optimizer
    from u2pl_tpu.train.state import create_train_state
    from u2pl_tpu.utils.checkpoint import save_checkpoint

    import jax.numpy as jnp

    pcfg = parse_config(yaml.safe_load(cfg_path.read_text()))
    model = build_model(pcfg.net, axis_name=None)
    shapes = jax.eval_shape(
        lambda: model.init(
            jax.random.PRNGKey(0), jnp.zeros((1, HW, HW, 3)), train=False
        )
    )
    tx = make_optimizer(pcfg.trainer.optimizer, shapes["params"], 10.0)
    state = create_train_state(
        model, tx, jax.random.PRNGKey(0), (1, HW, HW, 3), with_teacher=False
    )
    save_checkpoint(
        str(exp / "checkpoints" / "ckpt.ckpt"), state, epoch=0, best_miou=0.0
    )
    return root, exp, cfg_path


def _run_infer(exp, cfg_path, out, batch_size):
    import infer

    old_argv, old_cwd = sys.argv, os.getcwd()
    os.chdir(exp)
    sys.argv = [
        "infer.py",
        "--config",
        str(cfg_path),
        "--model_path",
        "checkpoints/ckpt.ckpt",
        "--save_folder",
        str(out),
        "--batch_size",
        str(batch_size),
    ]
    try:
        infer.main()
    finally:
        sys.argv = old_argv
        os.chdir(old_cwd)


def test_batched_infer_matches_per_image(ws):
    root, exp, cfg_path = ws
    _run_infer(exp, cfg_path, root / "out1", 1)
    _run_infer(exp, cfg_path, root / "out2", 2)
    names = sorted(os.listdir(root / "out1" / "gray"))
    assert len(names) == 3
    assert names == sorted(os.listdir(root / "out2" / "gray"))
    for n in names:
        a = np.asarray(Image.open(root / "out1" / "gray" / n))
        b = np.asarray(Image.open(root / "out2" / "gray" / n))
        np.testing.assert_array_equal(a, b, err_msg=n)
