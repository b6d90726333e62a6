"""Model assembly from the reference net config (model_helper.py parity).

The reference builds encoder/decoder by reflective importlib lookup of
dotted class paths (reference model_helper.py:43-47) and wires an aux head
on the layer3 feature when `aux_loss` is configured (:50-62).  Here the
same YAML `type` strings dispatch onto the Flax modules; forward returns
the same {"pred", "rep"?, "aux"?} dict.
"""

from __future__ import annotations

from typing import Any, Optional

import flax.linen as nn
import jax.numpy as jnp

from u2pl_tpu.config import NetCfg
from u2pl_tpu.models.decoder import AuxHead, DeepLabV3, DeepLabV3Plus
from u2pl_tpu.models.resnet import ResNet, resnet_spec


class SegModel(nn.Module):
    """Encoder + decoder (+ aux head) returning {"pred", "rep"?, "aux"?}.

    All outputs are at output-stride 4 (v3+) / 8 (v3); upsampling to label
    resolution happens in the loss/eval code exactly as in the reference
    (train_semi.py:293,345-350).
    """

    net: NetCfg
    axis_name: Optional[str] = None
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False, valid_hw=None):
        """valid_hw: optional (vh, vw) true image extent for shape-bucketed
        eval — `x` is zero-padded to a bucket shape beyond the valid
        top-left region and the forward is masked so the valid region of
        every output bit-matches an unpadded forward (one compiled program
        per bucket instead of per image size; see resnet.ResNet)."""
        spec = resnet_spec(self.net.encoder.type)
        encoder = ResNet(
            layers=spec["layers"],
            block=spec["block"],
            replace_stride_with_dilation=self.net.encoder.replace_stride_with_dilation,
            multi_grid=self.net.encoder.multi_grid,
            zero_init_residual=self.net.encoder.zero_init_residual,
            fpn=self.net.encoder.fpn,
            remat=self.net.encoder.remat,
            axis_name=self.axis_name,
            dtype=self.dtype,
            name="encoder",
        )
        feats = encoder(x, train=train, valid_hw=valid_hw)

        dec_key = self.net.decoder.type.rsplit(".", 1)[-1]
        if dec_key == "dec_deeplabv3_plus":
            decoder = DeepLabV3Plus(
                num_classes=self.net.num_classes,
                inner_planes=self.net.decoder.inner_planes,
                dilations=self.net.decoder.dilations,
                rep_head=self.net.decoder.rep_head,
                axis_name=self.axis_name,
                dtype=self.dtype,
                name="decoder",
            )
            outs = decoder(feats, train=train, valid_hw=valid_hw)
        elif dec_key == "dec_deeplabv3":
            decoder = DeepLabV3(
                num_classes=self.net.num_classes,
                inner_planes=self.net.decoder.inner_planes,
                dilations=self.net.decoder.dilations,
                axis_name=self.axis_name,
                dtype=self.dtype,
                name="decoder",
            )
            outs = decoder(feats, train=train, valid_hw=valid_hw)
        else:
            raise ValueError(f"unknown decoder type {self.net.decoder.type!r}")

        if self.net.aux_loss is not None:
            # aux head on the layer3 feature (model_helper.py:53-61: feat1 is
            # x3 in the fpn path, the second-to-last encoder output)
            aux_in = feats[-2]
            outs["aux"] = AuxHead(
                num_classes=self.net.num_classes,
                axis_name=self.axis_name,
                dtype=self.dtype,
                name="auxor",
            )(aux_in, train=train)
        return outs


def build_model(
    net: NetCfg, axis_name: Optional[str] = None, dtype: Any = None
) -> SegModel:
    if not net.sync_bn:
        axis_name = None
    if dtype is None:
        dtype = jnp.dtype(net.dtype)
    return SegModel(net=net, axis_name=axis_name, dtype=dtype)
