"""ImageNet-pretrained encoder loading (VERDICT r1 gap #1).

A randomized torch deep-stem ResNet state dict in the reference
`model_urls` checkpoint layout (reference resnet.py:16-22, strict=False
load at :380-402) is saved to .pth, routed through
`torch_encoder_to_flax`, and the Flax encoder forward must bit-match the
torch encoder.  Also covers: pretrain (saver.pretrain) loading weights
only — never optimizer state or step (reference train_semi.py:153-154) —
and the tolerant size-mismatch-dropping converter mode (utils.py:595-613).
"""

import os
import sys

import numpy as np
import pytest

REF = "/root/reference"
pytestmark = pytest.mark.skipif(
    not os.path.isdir(os.path.join(REF, "u2pl")), reason="reference not mounted"
)

torch = pytest.importorskip("torch")

import flax.linen as nn  # noqa: E402
import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from u2pl_tpu.config import EncoderCfg, parse_config  # noqa: E402
from u2pl_tpu.models import build_model  # noqa: E402
from u2pl_tpu.models.resnet import ResNet, resnet_spec  # noqa: E402
from u2pl_tpu.utils.checkpoint import (  # noqa: E402
    load_encoder_pretrained,
    resolve_pretrained_path,
)
from u2pl_tpu.utils.convert_torch import (  # noqa: E402
    torch_encoder_to_flax,
    torch_to_flax,
)

ENC_KW = dict(
    multi_grid=True,
    zero_init_residual=False,
    fpn=True,
    replace_stride_with_dilation=[False, True, True],
)

# BasicBlock (resnet18/34) rejects dilation/multi_grid in the reference
BASIC_KW = dict(
    multi_grid=False,
    zero_init_residual=False,
    fpn=True,
    replace_stride_with_dilation=[False, False, False],
)


def _torch_encoder():
    if REF not in sys.path:
        sys.path.insert(0, REF)
    from u2pl.models.resnet import resnet50

    enc = resnet50(pretrained=False, **ENC_KW)
    g = torch.Generator().manual_seed(1)
    sd = enc.state_dict()
    for k, v in sd.items():
        if v.dtype.is_floating_point:
            if "running_var" in k:
                sd[k] = torch.rand(v.shape, generator=g) + 0.5
            else:
                sd[k] = torch.randn(v.shape, generator=g) * 0.05
    enc.load_state_dict(sd)
    enc.eval()
    return enc


class EncOnly(nn.Module):
    """ResNet wrapped under the module name 'encoder' so the variables tree
    has the same encoder subtree layout as the full SegModel."""

    arch: str = "u2pl.models.resnet.resnet50"

    @nn.compact
    def __call__(self, x, train: bool = False):
        spec = resnet_spec(self.arch)
        enc = ResNet(
            layers=spec["layers"],
            block=spec["block"],
            replace_stride_with_dilation=(False, True, True),
            multi_grid=True,
            fpn=True,
            name="encoder",
        )
        return enc(x, train=train)


def test_imagenet_pth_roundtrip_bitmatch(tmp_path):
    enc_t = _torch_encoder()
    # ImageNet checkpoints additionally carry fc.* — must land in
    # unexpected_keys, not crash (reference prints them, resnet.py:380-402)
    sd = dict(enc_t.state_dict())
    sd["fc.weight"] = torch.randn(1000, 2048)
    sd["fc.bias"] = torch.randn(1000)
    pth = tmp_path / "resnet50.pth"
    torch.save(sd, pth)

    model = EncOnly()
    x = np.random.RandomState(0).randn(1, 65, 65, 3).astype(np.float32)
    variables = model.init(jax.random.PRNGKey(0), jnp.asarray(x), train=False)

    loaded = torch.load(pth, map_location="cpu", weights_only=False)
    new_vars, missing, unexpected = torch_encoder_to_flax(loaded, variables)
    assert missing == [], missing
    assert sorted(unexpected) == ["fc.bias", "fc.weight"], unexpected

    new_vars = jax.tree_util.tree_map(jnp.asarray, new_vars)
    feats = model.apply(new_vars, jnp.asarray(x), train=False)

    with torch.no_grad():
        tfeats = enc_t(torch.from_numpy(x).permute(0, 3, 1, 2))
    assert len(feats) == len(tfeats) == 4
    for i, (got, want) in enumerate(zip(feats, tfeats)):
        want = want.permute(0, 2, 3, 1).numpy()
        got = np.asarray(got)
        assert got.shape == want.shape, (i, got.shape, want.shape)
        np.testing.assert_allclose(got, want, rtol=5e-3, atol=5e-4)


def test_resolve_pretrained_path():
    assert resolve_pretrained_path(EncoderCfg(pretrained=False)) is None
    assert (
        resolve_pretrained_path(EncoderCfg(pretrained="/x/y.pth")) == "/x/y.pth"
    )
    # True -> model_urls lookup by arch suffix
    p = resolve_pretrained_path(
        EncoderCfg(type="u2pl.models.resnet.resnet101", pretrained=True)
    )
    assert p.endswith("resnet101.pth")


def test_load_encoder_pretrained_into_train_state(tmp_path):
    from u2pl_tpu.train.optim import make_optimizer
    from u2pl_tpu.train.state import create_train_state
    from u2pl_tpu.config import OptimizerCfg

    enc_t = _torch_encoder()
    pth = tmp_path / "resnet50.pth"
    torch.save(enc_t.state_dict(), pth)

    raw = {
        "net": {
            "num_classes": 5,
            "encoder": {
                "type": "u2pl.models.resnet.resnet50",
                "kwargs": dict(ENC_KW, pretrained=str(pth)),
            },
            "decoder": {
                "type": "u2pl.models.decoder.dec_deeplabv3_plus",
                "kwargs": {"inner_planes": 32, "dilations": [2, 4, 6]},
            },
        }
    }
    cfg = parse_config(raw)
    assert cfg.net.encoder.pretrained == str(pth)

    model = build_model(cfg.net)
    tx = make_optimizer(OptimizerCfg(), {}, 1.0)
    state = create_train_state(
        model, tx, jax.random.PRNGKey(0), (1, 33, 33, 3), with_teacher=True
    )
    before = np.asarray(state.params["encoder"]["stem_conv1"]["Conv_0"]["kernel"])
    state = load_encoder_pretrained(cfg.net.encoder, state)
    got = np.asarray(state.params["encoder"]["stem_conv1"]["Conv_0"]["kernel"])
    want = enc_t.state_dict()["conv1.0.weight"].numpy().transpose(2, 3, 1, 0)
    assert not np.allclose(got, before)
    np.testing.assert_allclose(got, want, atol=0)
    # teacher warm-started too (reference builds both with pretrained=True)
    np.testing.assert_allclose(
        np.asarray(state.teacher_params["encoder"]["stem_conv1"]["Conv_0"]["kernel"]),
        want,
        atol=0,
    )
    # missing file: warn + no-op, never crash
    state2 = load_encoder_pretrained(
        EncoderCfg(pretrained="/nonexistent/weights.pth"), state
    )
    assert state2 is state


def test_tolerant_torch_to_flax_drops_mismatched_keys():
    """Reference load_state drops size-mismatched keys non-strict
    (utils.py:595-613) — class-count transfer must keep init values for
    the classifier head and fill everything else."""
    if REF not in sys.path:
        sys.path.insert(0, REF)
    from u2pl.models.model_helper import ModelBuilder

    net_cfg = {
        "num_classes": 3,  # torch side: 3 classes
        "sync_bn": False,
        "ema_decay": 0.99,
        "encoder": {
            "type": "u2pl.models.resnet.resnet18",
            "kwargs": dict(BASIC_KW, pretrained=False),
        },
        "decoder": {
            "type": "u2pl.models.decoder.dec_deeplabv3_plus",
            "kwargs": {"inner_planes": 32, "dilations": [2, 4, 6]},
        },
    }
    tm = ModelBuilder(net_cfg)

    raw = {
        "net": {
            "num_classes": 4,  # flax side: 4 classes -> head mismatch
            "encoder": {
                "type": "u2pl.models.resnet.resnet18",
                "kwargs": BASIC_KW,
            },
            "decoder": {
                "type": "u2pl.models.decoder.dec_deeplabv3_plus",
                "kwargs": {"inner_planes": 32, "dilations": [2, 4, 6]},
            },
        }
    }
    cfg = parse_config(raw)
    model = build_model(cfg.net)
    variables = model.init(
        jax.random.PRNGKey(0), jnp.zeros((1, 33, 33, 3)), train=False
    )

    with pytest.raises((KeyError, ValueError)):
        torch_to_flax(tm.state_dict(), variables)  # strict still raises

    out = torch_to_flax(tm.state_dict(), variables, tolerant=True)
    # classifier out head kept its init (shape mismatch dropped)
    init_head = np.asarray(variables["params"]["decoder"]["cls_out"]["Conv_0"]["kernel"])
    np.testing.assert_allclose(
        np.asarray(out["params"]["decoder"]["cls_out"]["Conv_0"]["kernel"]), init_head
    )
    # a matching layer was filled from torch
    want = tm.state_dict()["encoder.conv1.0.weight"].numpy().transpose(2, 3, 1, 0)
    np.testing.assert_allclose(
        np.asarray(out["params"]["encoder"]["stem_conv1"]["Conv_0"]["kernel"]), want
    )


def test_pretrain_loads_weights_only(tmp_path):
    """saver.pretrain must load student+teacher weights but keep step=0 and
    a fresh optimizer (reference train_semi.py:153-154 loads key=model_state
    without optimizer) — restoring step would desync the in-step epoch
    derivation used for drop_percent/alpha_t/poly-LR annealing."""
    import jax.numpy as jnp

    from u2pl_tpu.config import OptimizerCfg, SaverCfg
    from u2pl_tpu.train.optim import make_optimizer
    from u2pl_tpu.train.state import create_train_state
    from u2pl_tpu.utils.checkpoint import maybe_resume, save_checkpoint

    raw = {
        "net": {
            "num_classes": 3,
            "encoder": {
                "type": "u2pl.models.resnet.resnet10",
                "kwargs": BASIC_KW,
            },
            "decoder": {
                "type": "u2pl.models.decoder.dec_deeplabv3_plus",
                "kwargs": {"inner_planes": 16, "dilations": [2, 4, 6]},
            },
        }
    }
    cfg = parse_config(raw)
    model = build_model(cfg.net)
    tx = make_optimizer(OptimizerCfg(), {}, 1.0)

    donor = create_train_state(
        model, tx, jax.random.PRNGKey(7), (1, 33, 33, 3), with_teacher=True
    )
    donor = donor.replace(step=donor.step + 42)
    ckpt = tmp_path / "pretrain.ckpt"
    save_checkpoint(str(ckpt), donor, epoch=6, best_miou=0.5)

    template = create_train_state(
        model, tx, jax.random.PRNGKey(8), (1, 33, 33, 3), with_teacher=True
    )
    saver = SaverCfg(auto_resume=False, pretrain=str(ckpt))
    state, last_epoch, best = maybe_resume(saver, str(tmp_path), template)
    assert state is not None
    assert last_epoch == 0 and best == 0.0
    assert int(state.step) == 0, "pretrain must not restore the step counter"
    w = lambda p: np.asarray(p["encoder"]["stem_conv1"]["Conv_0"]["kernel"])
    np.testing.assert_allclose(w(state.params), w(donor.params))
    np.testing.assert_allclose(w(state.teacher_params), w(donor.teacher_params))


def test_pretrained_required_fails_loudly(monkeypatch):
    """Configs that target published numbers must error, not warn, when the
    ImageNet warm start is unavailable (a silent random-init start would
    burn a week of accelerator time) — unless U2PL_ALLOW_RANDOM_INIT=1."""
    import pytest

    from u2pl_tpu.train.optim import make_optimizer
    from u2pl_tpu.train.state import create_train_state
    from u2pl_tpu.config import OptimizerCfg

    raw = {
        "net": {
            "num_classes": 5,
            "encoder": {
                "type": "u2pl.models.resnet.resnet50",
                "kwargs": dict(
                    ENC_KW,
                    pretrained="/nonexistent/weights.pth",
                    pretrained_required=True,
                ),
            },
            "decoder": {
                "type": "u2pl.models.decoder.dec_deeplabv3_plus",
                "kwargs": {"inner_planes": 32, "dilations": [2, 4, 6]},
            },
        }
    }
    cfg = parse_config(raw)
    enc_cfg = cfg.net.encoder
    assert enc_cfg.pretrained_required
    model = build_model(cfg.net)
    tx = make_optimizer(OptimizerCfg(), {}, 1.0)
    state = create_train_state(
        model, tx, jax.random.PRNGKey(0), (1, 33, 33, 3), with_teacher=False
    )
    monkeypatch.delenv("U2PL_ALLOW_RANDOM_INIT", raising=False)
    with pytest.raises(FileNotFoundError, match="pretrained_required"):
        load_encoder_pretrained(enc_cfg, state)
    # explicit override: back to the warn-and-continue behavior
    monkeypatch.setenv("U2PL_ALLOW_RANDOM_INIT", "1")
    assert load_encoder_pretrained(enc_cfg, state) is state


def test_all_shipped_yamls_set_pretrained_required():
    import glob

    from u2pl_tpu.config import load_config

    paths = sorted(
        glob.glob(
            os.path.join(
                os.path.dirname(__file__), "..", "experiments", "**", "config.yaml"
            ),
            recursive=True,
        )
    )
    assert paths
    for p in paths:
        assert load_config(p).net.encoder.pretrained_required, p
