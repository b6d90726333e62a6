"""Deep-stem dilated ResNet encoder (Flax / NHWC / TPU-native).

Behavioral parity with the reference encoder (reference u2pl/models/resnet.py):
  * deep stem: three 3x3 convs 3->64->64->128, stride 2 on the first
    (reference resnet.py:178-186), inplanes=128 (:161)
  * ceil-mode 3x3/2 max pool (:189-191)
  * output-stride 8 via replace_stride_with_dilation=[False, True, True]
    and multi_grid grids [2, 2, 4] in layer4 (:247-249)
  * fpn=True returns [x1, x2, x3, x4], else [x3, x4] (:289-292)
  * kaiming-normal(fan_out) conv init, BN gamma=1/beta=0, optional
    zero-init of the last BN in each residual branch (:209-224)

SyncBatchNorm (reference base.py:6-8) is realised by passing
`axis_name="data"` to flax BatchNorm inside the shard_map'ped train step —
cross-replica batch statistics ride ICI via pmean, compiled by XLA.
All convs run in NHWC, the TPU-preferred layout.
"""

from __future__ import annotations

import functools
from typing import Any, Callable, Optional, Tuple

import flax.linen as nn
import jax.numpy as jnp

from u2pl_tpu.ops.pooling import max_pool_ceil

conv_kaiming = nn.initializers.variance_scaling(2.0, "fan_out", "normal")


def make_norm(
    axis_name: Optional[str],
    momentum: float = 0.9,
    epsilon: float = 1e-5,
    dtype: Any = jnp.float32,
) -> Callable[..., nn.Module]:
    """BatchNorm factory. Batch statistics are always computed/stored in
    float32 (flax upcasts stat reduction internally); `dtype` controls the
    normalization arithmetic/output so bf16 activations stay bf16 between
    layers instead of bouncing through f32 in HBM. `axis_name` turns it
    into SyncBN inside SPMD."""
    return functools.partial(
        nn.BatchNorm,
        momentum=momentum,
        epsilon=epsilon,
        axis_name=axis_name,
        dtype=dtype,
        param_dtype=jnp.float32,
    )


class Conv(nn.Module):
    """3x3/1x1 conv with torch-style explicit padding."""

    features: int
    kernel: int = 3
    stride: int = 1
    dilation: int = 1
    use_bias: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        pad = self.dilation if self.kernel == 3 else 0
        return nn.Conv(
            self.features,
            (self.kernel, self.kernel),
            strides=(self.stride, self.stride),
            padding=((pad, pad), (pad, pad)),
            kernel_dilation=(self.dilation, self.dilation),
            use_bias=self.use_bias,
            kernel_init=conv_kaiming,
            dtype=self.dtype,
            param_dtype=jnp.float32,
        )(x)


class BasicBlock(nn.Module):
    planes: int
    stride: int = 1
    dilation: int = 1
    has_downsample: bool = False
    zero_init_residual: bool = False
    norm: Callable[..., nn.Module] = nn.BatchNorm
    dtype: Any = jnp.float32

    expansion = 1

    @nn.compact
    def __call__(self, x, train: bool):
        ra = not train
        identity = x
        out = Conv(self.planes, 3, self.stride, dtype=self.dtype, name="conv1")(x)
        out = self.norm(use_running_average=ra, name="bn1")(out)
        out = nn.relu(out)
        out = Conv(self.planes, 3, 1, dtype=self.dtype, name="conv2")(out)
        bn2 = self.norm(
            use_running_average=ra,
            scale_init=nn.initializers.zeros
            if self.zero_init_residual
            else nn.initializers.ones,
            name="bn2",
        )
        out = bn2(out)
        if self.has_downsample:
            identity = Conv(
                self.planes, 1, self.stride, dtype=self.dtype, name="ds_conv"
            )(x)
            identity = self.norm(use_running_average=ra, name="ds_bn")(identity)
        return nn.relu(out + identity)


class Bottleneck(nn.Module):
    planes: int
    stride: int = 1
    dilation: int = 1
    has_downsample: bool = False
    zero_init_residual: bool = False
    norm: Callable[..., nn.Module] = nn.BatchNorm
    dtype: Any = jnp.float32

    expansion = 4

    @nn.compact
    def __call__(self, x, train: bool):
        ra = not train
        identity = x
        out = Conv(self.planes, 1, dtype=self.dtype, name="conv1")(x)
        out = self.norm(use_running_average=ra, name="bn1")(out)
        out = nn.relu(out)
        out = Conv(
            self.planes, 3, self.stride, self.dilation, dtype=self.dtype, name="conv2"
        )(out)
        out = self.norm(use_running_average=ra, name="bn2")(out)
        out = nn.relu(out)
        out = Conv(self.planes * 4, 1, dtype=self.dtype, name="conv3")(out)
        bn3 = self.norm(
            use_running_average=ra,
            scale_init=nn.initializers.zeros
            if self.zero_init_residual
            else nn.initializers.ones,
            name="bn3",
        )
        out = bn3(out)
        if self.has_downsample:
            identity = Conv(
                self.planes * 4, 1, self.stride, dtype=self.dtype, name="ds_conv"
            )(x)
            identity = self.norm(use_running_average=ra, name="ds_bn")(identity)
        return nn.relu(out + identity)


class ResNet(nn.Module):
    """Deep-stem ResNet. layers e.g. (3, 4, 23, 3) for ResNet-101."""

    layers: Tuple[int, int, int, int] = (3, 4, 23, 3)
    block: str = "bottleneck"  # "bottleneck" | "basic"
    replace_stride_with_dilation: Tuple[bool, bool, bool] = (False, True, True)
    multi_grid: bool = False
    zero_init_residual: bool = False
    fpn: bool = True
    axis_name: Optional[str] = None
    dtype: Any = jnp.float32
    remat: bool = False  # jax.checkpoint residual blocks (HBM for FLOPs)

    @property
    def raw_block_cls(self):
        return Bottleneck if self.block == "bottleneck" else BasicBlock

    @property
    def block_cls(self):
        cls = self.raw_block_cls
        if self.remat:
            # static_argnums: 0=self(module), 1=x, 2=train flag
            cls = nn.remat(cls, static_argnums=(2,))
        return cls

    @property
    def out_planes(self) -> int:
        return 512 * self.raw_block_cls.expansion

    @property
    def aux_planes(self) -> int:
        return 256 * self.raw_block_cls.expansion

    @nn.compact
    def __call__(self, x, train: bool = False):
        norm = make_norm(self.axis_name, dtype=self.dtype)
        ra = not train
        block_cls = self.block_cls
        expansion = self.raw_block_cls.expansion

        # deep stem (reference resnet.py:178-191)
        x = Conv(64, 3, 2, dtype=self.dtype, name="stem_conv1")(x)
        x = norm(use_running_average=ra, name="stem_bn1")(x)
        x = nn.relu(x)
        x = Conv(64, 3, 1, dtype=self.dtype, name="stem_conv2")(x)
        x = norm(use_running_average=ra, name="stem_bn2")(x)
        x = nn.relu(x)
        x = Conv(128, 3, 1, dtype=self.dtype, name="stem_conv3")(x)
        x = norm(use_running_average=ra, name="bn1")(x)
        x = nn.relu(x)
        x = max_pool_ceil(x, kernel=3, stride=2, pad=1)

        # stage plan replicating reference _make_layer dilation bookkeeping
        # (resnet.py:232-277)
        inplanes = 128
        dilation = 1
        feats = []
        stage_planes = (64, 128, 256, 512)
        stage_strides = (1, 2, 2, 2)
        for si in range(4):
            planes, blocks = stage_planes[si], self.layers[si]
            stride = stage_strides[si]
            dilate = si > 0 and self.replace_stride_with_dilation[si - 1]
            previous_dilation = dilation
            if dilate:
                dilation *= stride
                stride = 1
            grids = [1] * blocks
            if si == 3 and self.multi_grid:
                grids = [2, 2, 4]
            for bi in range(blocks):
                first = bi == 0
                x = block_cls(
                    planes=planes,
                    stride=stride if first else 1,
                    dilation=(previous_dilation if first else dilation) * grids[bi],
                    has_downsample=first
                    and (stride != 1 or inplanes != planes * expansion),
                    zero_init_residual=self.zero_init_residual,
                    norm=norm,
                    dtype=self.dtype,
                    name=f"layer{si + 1}_{bi}",
                )(x, train)
            inplanes = planes * expansion
            feats.append(x)

        x1, x2, x3, x4 = feats
        if self.fpn:
            return [x1, x2, x3, x4]
        return [x3, x4]


def resnet_spec(name: str) -> dict:
    """Layer/block spec by reference factory name (resnet.py:295-402)."""
    specs = {
        # tiny variant (not in the reference) for tests/benchmark dry-runs
        "resnet10": dict(layers=(1, 1, 1, 1), block="bottleneck"),
        "resnet18": dict(layers=(2, 2, 2, 2), block="basic"),
        "resnet34": dict(layers=(3, 4, 6, 3), block="basic"),
        "resnet50": dict(layers=(3, 4, 6, 3), block="bottleneck"),
        "resnet101": dict(layers=(3, 4, 23, 3), block="bottleneck"),
        "resnet152": dict(layers=(3, 8, 36, 3), block="bottleneck"),
    }
    key = name.rsplit(".", 1)[-1]
    if key not in specs:
        raise ValueError(f"unknown encoder type {name!r}")
    return specs[key]
