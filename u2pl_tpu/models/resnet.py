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
import jax
import jax.numpy as jnp

from u2pl_tpu.ops.pooling import max_pool_ceil

conv_kaiming = nn.initializers.variance_scaling(2.0, "fan_out", "normal")

# Local paths to ImageNet-pretrained deep-stem torch checkpoints, exactly
# like the reference's user-edited model_urls dict (reference
# resnet.py:16-22).  Used when `encoder.pretrained: true`; a string value
# of `encoder.pretrained` overrides the lookup with an explicit path.
model_urls = {
    "resnet18": "/path/to/resnet18.pth",
    "resnet34": "/path/to/resnet34.pth",
    "resnet50": "/path/to/resnet50.pth",
    "resnet101": "/path/to/resnet101.pth",
    "resnet152": "/path/to/resnet152.pth",
}


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


def _s2d_pack(x: jnp.ndarray) -> jnp.ndarray:
    """(B, H, W, C) -> (B, ceil(H/2), ceil(W/2), 4C) 2x2 block rearrange,
    zero-padding odd H/W (the pad region coincides with the 3x3/s2 conv's
    own SAME zero padding, so the rewrite below stays exact)."""
    b, h, w, c = x.shape
    ph, pw = -h % 2, -w % 2
    if ph or pw:
        x = jnp.pad(x, ((0, 0), (0, ph), (0, pw), (0, 0)))
        h, w = h + ph, w + pw
    x = x.reshape(b, h // 2, 2, w // 2, 2, c)
    x = x.transpose(0, 1, 3, 2, 4, 5)
    return x.reshape(b, h // 2, w // 2, 4 * c)


def _s2d_kernel(w: jnp.ndarray) -> jnp.ndarray:
    """(3, 3, C, O) weights of a 3x3/s2/p1 conv -> the (2, 2, 4C, O) kernel
    of the EXACT equivalent 2x2/s1 conv on the _s2d_pack'ed input.

    Output row i of the stride-2 conv reads input rows {2i-1, 2i, 2i+1},
    which in packed space are rows {i-1 (block offset u=1), i (u=0),
    i (u=1)}; as a 2x2 kernel over packed rows {i-1+e : e in 0..1} with
    padding (1, 0) the tap map is (e=0,u=1)->di=0, (e=1,u=0)->di=1,
    (e=1,u=1)->di=2, and (e=0,u=0) is never read (weight 0).  Columns are
    identical."""
    c, o = w.shape[2], w.shape[3]
    w2 = jnp.zeros((2, 2, 4 * c, o), w.dtype)
    taps = {(0, 1): 0, (1, 0): 1, (1, 1): 2}
    for (e, u), di in taps.items():
        for (f, v), dj in taps.items():
            w2 = w2.at[e, f, (u * 2 + v) * c : (u * 2 + v + 1) * c, :].set(
                w[di, dj]
            )
    return w2


class _ConvKernel(nn.Module):
    """Bare conv-kernel parameter holder.  Named "Conv_0" inside Conv it
    puts the param at exactly the path nn.Conv would (`.../Conv_0/kernel`),
    so checkpoints/converters/parity tests see no difference when Conv
    lowers the convolution itself."""

    shape: Tuple[int, ...]

    @nn.compact
    def __call__(self):
        return self.param("kernel", conv_kaiming, self.shape, jnp.float32)


class Conv(nn.Module):
    """3x3/1x1 conv with torch-style explicit padding.

    `mask` (shape-bucketed eval): multiplying a 3x3 conv's input by the
    valid-region mask makes explicit zero padding beyond the valid extent
    indistinguishable from the conv's own SAME zero padding, which is what
    makes padded-bucket forwards bit-match unpadded ones.  1x1 convs mix
    nothing spatially, so they never need it.

    `s2d`: lower a 3x3/s2 conv as a 2x2/s1 conv on the space-to-depth
    packed input — exactly the same linear map (see _s2d_kernel), but with
    kh*kw*cin = 48 contraction lanes instead of 27 and an MXU-friendly
    input layout.  Measured 1.5x faster for the deep stem's 3-channel
    first conv on v5e (tools/bench_s2d_stem.py).  The sum order inside the
    MXU differs, so results can differ by 1 bf16 ulp — callers gate it on
    bfloat16 compute, keeping float32 configs bit-exact vs the reference."""

    features: int
    kernel: int = 3
    stride: int = 1
    dilation: int = 1
    use_bias: bool = False
    dtype: Any = jnp.float32
    s2d: bool = False

    @nn.compact
    def __call__(self, x, mask=None):
        if mask is not None and self.kernel == 3:
            x = x * mask
        if self.s2d:
            assert (
                self.kernel == 3 and self.stride == 2 and self.dilation == 1
                and not self.use_bias
            ), "s2d lowering is specific to a bias-free 3x3/s2 conv"
            w = _ConvKernel((3, 3, x.shape[-1], self.features), name="Conv_0")()
            return jax.lax.conv_general_dilated(
                _s2d_pack(x.astype(self.dtype)),
                _s2d_kernel(w).astype(self.dtype),
                (1, 1),
                ((1, 0), (1, 0)),
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
            )
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


def valid_feature_sizes(v0):
    """Valid spatial extent per output stride for a bucket-padded input with
    true size v0 (int or traced scalar): os2 after the stride-2 stem conv
    (k3 s2 p1), os4 after the ceil-mode 3x3/2 maxpool, os8 after layer2's
    stride-2.  Matches torch's size arithmetic for the deep-stem ResNet
    (reference resnet.py:178-191, 232-277)."""
    v1 = (v0 + 1) // 2  # stem conv1
    v2 = v1 // 2 + 1  # ceil-mode maxpool: ceil((v1-1)/2)+1
    v3 = (v2 + 1) // 2  # layer2 stride 2 (os8)
    return v1, v2, v3


def valid_mask(h: int, w: int, vh, vw, dtype) -> jnp.ndarray:
    """(1, h, w, 1) mask: 1 inside the top-left (vh, vw) valid region."""
    mh = jnp.arange(h) < vh
    mw = jnp.arange(w) < vw
    return (mh[:, None] & mw[None, :]).astype(dtype)[None, :, :, None]


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
    def __call__(self, x, train: bool, mask_in=None, mask_out=None):
        ra = not train
        identity = x
        out = Conv(self.planes, 3, self.stride, dtype=self.dtype, name="conv1")(
            x, mask_in
        )
        out = self.norm(use_running_average=ra, name="bn1")(out)
        out = nn.relu(out)
        out = Conv(self.planes, 3, 1, dtype=self.dtype, name="conv2")(out, mask_out)
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
    def __call__(self, x, train: bool, mask_in=None, mask_out=None):
        ra = not train
        identity = x
        out = Conv(self.planes, 1, dtype=self.dtype, name="conv1")(x)
        out = self.norm(use_running_average=ra, name="bn1")(out)
        out = nn.relu(out)
        out = Conv(
            self.planes, 3, self.stride, self.dilation, dtype=self.dtype, name="conv2"
        )(out, mask_in)
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
    def __call__(self, x, train: bool = False, valid_hw=None):
        """valid_hw: optional (vh, vw) traced scalars for shape-bucketed
        eval — `x` is zero-padded beyond the valid top-left region and every
        3x3 conv input is re-masked so the forward bit-matches the unpadded
        one (see Conv).  Returned features are masked to their valid
        extents."""
        norm = make_norm(self.axis_name, dtype=self.dtype)
        ra = not train
        block_cls = self.block_cls
        expansion = self.raw_block_cls.expansion

        masks = {}  # output-stride -> (1, h, w, 1) valid mask
        if valid_hw is not None:
            v0h, v0w = valid_hw
            v1h, v2h, v3h = valid_feature_sizes(v0h)
            v1w, v2w, v3w = valid_feature_sizes(v0w)
            h0, w0 = x.shape[1], x.shape[2]
            dims = lambda s: ((h0 + s - 1) // s, (w0 + s - 1) // s)
            # bucket grid sizes follow the same arithmetic as the valid ones
            h1, w1 = valid_feature_sizes(h0)[0], valid_feature_sizes(w0)[0]
            h2, w2 = valid_feature_sizes(h0)[1], valid_feature_sizes(w0)[1]
            h3, w3 = valid_feature_sizes(h0)[2], valid_feature_sizes(w0)[2]
            masks[2] = valid_mask(h1, w1, v1h, v1w, self.dtype)
            masks[4] = valid_mask(h2, w2, v2h, v2w, self.dtype)
            masks[8] = valid_mask(h3, w3, v3h, v3w, self.dtype)

        m = masks.get

        # deep stem (reference resnet.py:178-191); the input itself is
        # already zero beyond valid (padded), so stem_conv1 needs no mask.
        # Under bf16 compute the 3-channel first conv takes the exact
        # space-to-depth lowering (see Conv.s2d); f32 stays bit-identical
        # to the reference-ordered conv.
        x = Conv(
            64, 3, 2, dtype=self.dtype,
            s2d=self.dtype == jnp.bfloat16,
            name="stem_conv1",
        )(x)
        x = norm(use_running_average=ra, name="stem_bn1")(x)
        x = nn.relu(x)
        x = Conv(64, 3, 1, dtype=self.dtype, name="stem_conv2")(x, m(2))
        x = norm(use_running_average=ra, name="stem_bn2")(x)
        x = nn.relu(x)
        x = Conv(128, 3, 1, dtype=self.dtype, name="stem_conv3")(x, m(2))
        x = norm(use_running_average=ra, name="bn1")(x)
        x = nn.relu(x)
        if m(2) is not None:
            # maxpool windows straddling the valid edge must see zeros (the
            # unpadded net's ceil-mode padding; inputs are post-ReLU >= 0)
            x = x * m(2)
        x = max_pool_ceil(x, kernel=3, stride=2, pad=1)

        # stage plan replicating reference _make_layer dilation bookkeeping
        # (resnet.py:232-277)
        inplanes = 128
        dilation = 1
        feats = []
        stage_planes = (64, 128, 256, 512)
        stage_strides = (1, 2, 2, 2)
        os_now = 4
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
                blk_stride = stride if first else 1
                mask_in = m(os_now)
                if blk_stride != 1:
                    os_now *= blk_stride
                x = block_cls(
                    planes=planes,
                    stride=blk_stride,
                    dilation=(previous_dilation if first else dilation) * grids[bi],
                    has_downsample=first
                    and (stride != 1 or inplanes != planes * expansion),
                    zero_init_residual=self.zero_init_residual,
                    norm=norm,
                    dtype=self.dtype,
                    name=f"layer{si + 1}_{bi}",
                )(x, train, mask_in, m(os_now))
            inplanes = planes * expansion
            feats.append(x)

        x1, x2, x3, x4 = feats
        if masks:
            # consumers (ASPP pooling, decoder 1x1s) need clean zeros in the
            # invalid region, not the junk accumulated through BN shifts
            x1 = x1 * masks[4]
            x2 = x2 * masks[min(8, max(masks))]
            x3 = x3 * masks[8]
            x4 = x4 * masks[8]
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
