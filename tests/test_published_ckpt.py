"""Published-checkpoint chain, dry-run end to end.

The reference ships a model zoo (README.md:30-60: VOC ResNet101-DeepLabv3+
and Cityscapes-AEL ResNet101 + aux head, single .pth with
{epoch, model_state, teacher_state, best_miou} and DDP 'module.' prefixes;
eval.py:122-127 prefers teacher_state).  This box has no network, so the
published files themselves can't be fetched — instead these tests
synthesize a .pth with the EXACT published key layout for both
architectures and drive the full chain a user of docs/CHECKPOINTS.md
follows: eval.py -> load_eval_variables -> torch_to_flax -> sliding-window
forward -> saved masks.  When the reference repo is mounted, the
synthesized key set is additionally pinned against the live reference
torch model's state_dict, so the layout can never drift silently.
"""

import os
import sys

import numpy as np
import pytest
import yaml

from PIL import Image

pytestmark = pytest.mark.slow
torch = pytest.importorskip("torch")

sys.path.insert(0, "/root/repo")

HW = 33


def _flax_template(net_cfg):
    import jax
    import jax.numpy as jnp

    from u2pl_tpu.models import build_model

    model = build_model(net_cfg)
    return model, model.init(
        jax.random.PRNGKey(0), jnp.zeros((1, HW, HW, 3)), train=False
    )


def _synth_state_dict(variables, seed=0):
    """Torch state dict with the reference key layout, synthesized from the
    flax init template through the converter's deterministic name map
    (convert_torch._translate) with the OIHW->HWIO transpose inverted."""
    import jax

    from u2pl_tpu.utils.convert_torch import _translate

    rng = np.random.RandomState(seed)
    sd = {}
    for keypath, val in jax.tree_util.tree_flatten_with_path(variables)[0]:
        path = tuple(k.key if hasattr(k, "key") else str(k) for k in keypath)
        tkey = _translate(path[1:])
        arr = rng.randn(*np.shape(val)).astype(np.float32) * 0.05
        if path[-1] == "kernel" and arr.ndim == 4:
            arr = arr.transpose(3, 2, 0, 1)  # HWIO -> OIHW
        if path[-1] == "var":
            arr = np.abs(arr) + 1.0
        if path[-1] == "scale":
            arr = np.abs(arr) + 0.5
        sd[tkey] = torch.from_numpy(arr)
        if tkey.endswith("running_mean"):
            sd[tkey[: -len("running_mean")] + "num_batches_tracked"] = (
                torch.tensor(100)
            )
    return sd


def _save_published_layout(sd, path):
    ddp = {f"module.{k}": v for k, v in sd.items()}
    torch.save(
        {"epoch": 80, "model_state": ddp, "teacher_state": ddp, "best_miou": 0.7721},
        path,
    )


def _net_cfg_raw(variant):
    raw = {
        "num_classes": 21,
        "sync_bn": False,
        "ema_decay": 0.99,
        "encoder": {
            "type": "u2pl.models.resnet.resnet101",
            "kwargs": {
                # the published files carry trained weights; neither model
                # needs (or can reach) the ImageNet warm start here
                "pretrained": False,
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
    }
    if variant == "cityscapes":
        raw["num_classes"] = 19
        raw["aux_loss"] = {"aux_plane": 1024, "loss_weight": 0.4}
    return raw


@pytest.mark.parametrize("variant", ["pascal", "cityscapes"])
def test_published_layout_matches_reference_model(variant):
    """Pin the synthesized key set to the live reference torch model."""
    from ref_oracle import reference_available, setup_reference

    if not reference_available():
        pytest.skip("reference not mounted")
    setup_reference()
    from u2pl_tpu.config import parse_config

    cfg = parse_config({"net": _net_cfg_raw(variant)})
    _, variables = _flax_template(cfg.net)
    sd = _synth_state_dict(variables)

    from u2pl.models.model_helper import ModelBuilder

    tm = ModelBuilder(_net_cfg_raw(variant))
    want = set(tm.state_dict().keys())
    got = set(sd.keys())
    assert got == want, (
        f"[{variant}] synthesized layout drifted from the reference: "
        f"missing={sorted(want - got)[:5]} extra={sorted(got - want)[:5]}"
    )


@pytest.mark.parametrize("variant", ["pascal", "cityscapes"])
def test_eval_cli_consumes_published_layout(variant, tmp_path):
    """The docs/CHECKPOINTS.md chain: a .pth in the exact published layout
    (incl. the cityscapes aux head) runs through eval.py unmodified and the
    saved masks bit-match a direct flax forward of the converted weights."""
    from u2pl_tpu.config import parse_config

    C = 19 if variant == "cityscapes" else 21
    cfg = parse_config({"net": _net_cfg_raw(variant)})
    model, variables = _flax_template(cfg.net)
    sd = _synth_state_dict(variables, seed=3)
    ckpt_path = tmp_path / "ckpt_best.pth"
    _save_published_layout(sd, str(ckpt_path))

    data_root = tmp_path / "VOC2012"
    (data_root / "JPEGImages").mkdir(parents=True)
    (data_root / "SegmentationClassAug").mkdir()
    rng = np.random.RandomState(0)
    for s in ("a", "b"):
        Image.fromarray((rng.rand(HW, HW, 3) * 255).astype(np.uint8)).save(
            data_root / "JPEGImages" / f"{s}.jpg"
        )
        Image.fromarray(rng.randint(0, C, (HW, HW)).astype(np.uint8)).save(
            data_root / "SegmentationClassAug" / f"{s}.png"
        )
    val_list = tmp_path / "val.txt"
    val_list.write_text("a\nb\n")

    cfg_yaml = {
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
        "net": _net_cfg_raw(variant),
    }
    cfg_path = tmp_path / "config.yaml"
    cfg_path.write_text(yaml.safe_dump(cfg_yaml))

    import eval as eval_cli

    out = tmp_path / "results"
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

    # direct forward with the converted weights must reproduce the mask
    import jax.numpy as jnp

    from u2pl_tpu.ops.resize import resize_bilinear
    from u2pl_tpu.utils.checkpoint import load_eval_variables

    var2 = load_eval_variables(model, str(ckpt_path), (HW, HW))
    mean = np.asarray([123.675, 116.28, 103.53], np.float32)
    std = np.asarray([58.395, 57.12, 57.375], np.float32)
    img = np.asarray(
        Image.open(data_root / "JPEGImages" / "a.jpg").convert("RGB"), np.float32
    )
    x = jnp.asarray((img - mean) / std)[None]
    pred = model.apply(var2, x, train=False)["pred"]
    pred = resize_bilinear(pred, (HW, HW))
    want = np.asarray(jnp.argmax(pred, -1))[0]
    got = np.asarray(Image.open(grays[0]))
    assert (got == want).mean() > 0.99
