"""Layer-exact parity of the Flax model vs the reference PyTorch model.

The reference implementation (read-only at /root/reference) is used as a
TEST ORACLE only: we instantiate its model, randomize every tensor
(including BN running stats), convert the weights with torch_to_flax, and
require the eval-mode forward outputs to match.  This validates conv
padding/dilation bookkeeping, the deep stem, ceil-mode pooling, ASPP,
decoder wiring, and the checkpoint-key mapping in one shot.
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

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from u2pl_tpu.config import parse_config  # noqa: E402
from u2pl_tpu.models import build_model  # noqa: E402
from u2pl_tpu.utils.convert_torch import torch_to_flax  # noqa: E402


def _ref_model(num_classes=21, aux=False):
    if REF not in sys.path:
        sys.path.insert(0, REF)
    from u2pl.models.model_helper import ModelBuilder

    net_cfg = {
        "num_classes": num_classes,
        "sync_bn": False,
        "ema_decay": 0.99,
        "encoder": {
            "type": "u2pl.models.resnet.resnet50",
            "kwargs": {
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
    if aux:
        net_cfg["aux_loss"] = {"aux_plane": 1024, "loss_weight": 0.4}
    model = ModelBuilder(net_cfg)
    # randomize every tensor so any mapping/layout bug shows up
    g = torch.Generator().manual_seed(0)
    sd = model.state_dict()
    for k, v in sd.items():
        if v.dtype.is_floating_point:
            if "running_var" in k:
                sd[k] = torch.rand(v.shape, generator=g) + 0.5
            else:
                sd[k] = torch.randn(v.shape, generator=g) * 0.05
        elif "num_batches_tracked" in k:
            pass
    model.load_state_dict(sd)
    model.eval()
    return model, net_cfg


def _our_cfg(aux=False):
    raw = {
        "net": {
            "num_classes": 21,
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
        }
    }
    if aux:
        raw["net"]["aux_loss"] = {"aux_plane": 1024, "loss_weight": 0.4}
    return parse_config(raw)


@pytest.mark.parametrize("aux", [False, True])
def test_forward_parity_resnet50_dlv3plus(aux):
    tm, _ = _ref_model(aux=aux)
    cfg = _our_cfg(aux=aux)
    model = build_model(cfg.net)

    x = np.random.RandomState(0).randn(1, 65, 65, 3).astype(np.float32)
    variables = model.init(jax.random.PRNGKey(0), jnp.asarray(x), train=False)
    variables = torch_to_flax(tm.state_dict(), variables)
    variables = jax.tree_util.tree_map(jnp.asarray, variables)

    outs = model.apply(variables, jnp.asarray(x), train=False)

    with torch.no_grad():
        touts = tm(torch.from_numpy(x).permute(0, 3, 1, 2))

    for key in ["pred", "rep"] + (["aux"] if aux else []):
        ref = touts[key].permute(0, 2, 3, 1).numpy()
        got = np.asarray(outs[key])
        assert got.shape == ref.shape, (key, got.shape, ref.shape)
        np.testing.assert_allclose(got, ref, rtol=5e-3, atol=5e-4, err_msg=key)
