"""Long-lived inference server (serve.py / u2pl_tpu/serving.py).

The reference has no serving story (its infer.py reloads the model per
invocation, reference infer.py:64-83); the server is a TPU-native
addition, so the oracle here is the repo's own batch CLI: server masks
must bit-match infer.py output (same preprocessing, same padded-batch
forward, same always-pascal colormap quirk), and the JSONL protocol
must survive malformed lines, missing images, micro-batched bursts,
ping/shutdown, and EOF.
"""

import io
import json
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
    root = tmp_path_factory.mktemp("serve_ws")
    data_root = root / "VOC2012"
    (data_root / "JPEGImages").mkdir(parents=True)
    rng = np.random.RandomState(0)
    ids = [f"img{i:03d}" for i in range(3)]  # 3 images, batch 2 -> padded tail
    for s in ids:
        img = (rng.rand(HW, HW, 3) * 255).astype(np.uint8)
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

    import jax
    import jax.numpy as jnp

    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    from u2pl_tpu.config import parse_config
    from u2pl_tpu.models import build_model
    from u2pl_tpu.train.optim import make_optimizer
    from u2pl_tpu.train.state import create_train_state
    from u2pl_tpu.utils.checkpoint import save_checkpoint

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

    from u2pl_tpu.serving import InferEngine

    engine = InferEngine(pcfg, str(exp / "checkpoints" / "ckpt.ckpt"), batch_size=2)
    image_paths = [str(data_root / "JPEGImages" / f"{s}.jpg") for s in ids]
    return root, exp, cfg_path, engine, image_paths


def _serve(engine, request_lines, **kw):
    from u2pl_tpu.serving import run_server

    reader = io.StringIO("".join(line + "\n" for line in request_lines))
    writer = io.StringIO()
    run_server(reader, writer, engine, **kw)
    return [json.loads(l) for l in writer.getvalue().splitlines()]


def test_roundtrip_protocol(ws, tmp_path):
    root, exp, cfg_path, engine, image_paths = ws
    out = tmp_path / "viewer"
    reqs = [
        json.dumps({"op": "ping", "id": "p0"}),
        *(
            json.dumps({"op": "infer", "id": f"r{i}", "image": p})
            for i, p in enumerate(image_paths)
        ),
        json.dumps({"op": "shutdown", "id": "bye"}),
    ]
    batch_sizes = []
    orig_forward = engine.forward
    engine.forward = lambda imgs: (batch_sizes.append(len(imgs)), orig_forward(imgs))[1]
    try:
        # a 50 ms straggler window makes the queued burst drain as batches
        resp = _serve(
            engine, reqs, default_save_folder=str(out), batch_window_s=0.05
        )
    finally:
        engine.forward = orig_forward
    by_id = {r["id"]: r for r in resp}
    assert by_id["p0"]["ok"] and "served" in by_id["p0"]
    assert by_id["bye"]["ok"]
    for i, p in enumerate(image_paths):
        r = by_id[f"r{i}"]
        assert r["ok"], r
        assert os.path.exists(r["gray"]) and os.path.exists(r["color"])
        assert r["batch_ms"] > 0
        g = np.asarray(Image.open(r["gray"]))
        assert g.shape == (HW, HW) and g.max() < C
    # micro-batching: 3 requests at batch_size=2 -> one full + one tail
    assert batch_sizes == [2, 1]


def test_masks_bitmatch_infer_cli(ws, tmp_path):
    """Server output must equal infer.py --batch_size 2 output exactly."""
    root, exp, cfg_path, engine, image_paths = ws
    import infer

    cli_out = tmp_path / "cli"
    old_argv, old_cwd = sys.argv, os.getcwd()
    os.chdir(exp)
    sys.argv = [
        "infer.py",
        "--config",
        str(cfg_path),
        "--model_path",
        "checkpoints/ckpt.ckpt",
        "--save_folder",
        str(cli_out),
        "--batch_size",
        "2",
    ]
    try:
        infer.main()
    finally:
        sys.argv = old_argv
        os.chdir(old_cwd)

    srv_out = tmp_path / "srv"
    reqs = [
        json.dumps({"op": "infer", "id": i, "image": p, "save_folder": str(srv_out)})
        for i, p in enumerate(image_paths)
    ]
    _serve(engine, reqs)  # EOF shutdown path
    names = sorted(os.listdir(cli_out / "gray"))
    assert names == sorted(os.listdir(srv_out / "gray")) and len(names) == 3
    for n in names:
        a = np.asarray(Image.open(cli_out / "gray" / n))
        b = np.asarray(Image.open(srv_out / "gray" / n))
        np.testing.assert_array_equal(a, b, err_msg=n)
        ca = np.asarray(Image.open(cli_out / "color" / n))
        cb = np.asarray(Image.open(srv_out / "color" / n))
        np.testing.assert_array_equal(ca, cb, err_msg=n)


def test_errors_keep_serving(ws, tmp_path):
    root, exp, cfg_path, engine, image_paths = ws
    reqs = [
        "this is not json",
        json.dumps(["also", "not", "an", "object"]),
        json.dumps({"op": "infer", "id": "gone", "image": "/no/such.jpg"}),
        json.dumps({"op": "warp", "id": "w"}),
        json.dumps(
            {
                "op": "infer",
                "id": "ok",
                "image": image_paths[0],
                "save_folder": str(tmp_path / "v"),
            }
        ),
        json.dumps({"op": "shutdown", "id": "bye"}),
    ]
    resp = _serve(engine, reqs)
    assert len(resp) == 6
    assert not resp[0]["ok"] and "bad request" in resp[0]["error"]
    assert not resp[1]["ok"] and "bad request" in resp[1]["error"]
    assert not resp[2]["ok"] and resp[2]["id"] == "gone"
    assert not resp[3]["ok"] and "unknown op" in resp[3]["error"]
    by_id = {r.get("id"): r for r in resp}
    assert by_id["ok"]["ok"] and os.path.exists(by_id["ok"]["gray"])
    assert by_id["bye"]["ok"]


def test_serve_cli_parser():
    import serve

    args = serve.get_parser().parse_args(
        [
            "--config",
            "c.yaml",
            "--batch_size",
            "8",
            "--dtype",
            "bfloat16",
            "--batch_window_ms",
            "2.5",
            "--compilation_cache_dir",
            "/tmp/x",
            "--no_warmup",
        ]
    )
    assert args.batch_size == 8
    assert args.dtype == "bfloat16"
    assert args.batch_window_ms == 2.5
    assert args.compilation_cache_dir == "/tmp/x"
    assert args.no_warmup
