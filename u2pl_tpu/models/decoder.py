"""ASPP + DeepLabv3(+) decoders and aux head (Flax / NHWC).

Parity targets (reference u2pl/models/base.py and decoder.py):
  * ASPP: 5 branches — image pooling + 1x1 + three dilated 3x3 (12/24/36),
    concat -> 5*inner_planes channels (base.py:11-100).  The pooled branch
    is upsampled with align_corners=True bilinear (base.py:92-94); for a 1x1
    source that is an exact broadcast, which is how it's implemented here.
  * dec_deeplabv3_plus: low_conv 1x1 on x1 (decoder.py:60-62), head 3x3 on
    ASPP output, align-corners upsample to x1 resolution, concat -> 512ch
    (:113-117), `classifier` -> logits and optional `representation` head
    -> 256-d embeddings (:82-106), outputs {"pred", "rep"} (:119-123).
  * Aux_Module: 3x3 conv -> BN -> ReLU -> Dropout2d(0.1) -> 1x1 logits on
    the layer3 feature (decoder.py:127-142).

Dropout2d is flax Dropout with spatial broadcast (drops whole channels),
active in train mode exactly where the reference has it — note the teacher
forward in the reference runs in train() mode, i.e. with dropout ON, during
the loss forward (train_semi.py:361-363); the train step reproduces that.
"""

from __future__ import annotations

from typing import Any, Callable, Optional, Sequence, Tuple

import flax.linen as nn
import jax.numpy as jnp

from u2pl_tpu.models.resnet import Conv, make_norm, valid_feature_sizes, valid_mask
from u2pl_tpu.ops.resize import resize_bilinear, resize_bilinear_valid


class ASPP(nn.Module):
    inner_planes: int = 256
    dilations: Tuple[int, ...] = (12, 24, 36)
    axis_name: Optional[str] = None
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False, valid_hw=None):
        """valid_hw: (vh, vw) valid extent of `x` for shape-bucketed eval —
        x is zero beyond the valid top-left region (the encoder masks its
        outputs) and the image-pool branch must average over the valid
        pixels only, not the bucket grid."""
        norm = make_norm(self.axis_name, dtype=self.dtype)
        ra = not train

        # branch 1: global average pooling -> 1x1 conv -> broadcast back.
        # Accumulate in f32: under bf16 compute the valid count (up to ~16k
        # at os8) is not exactly representable and a bf16 sum over thousands
        # of elements drifts from the jnp.mean path the parity tests pin.
        if valid_hw is not None:
            count = jnp.asarray(valid_hw[0] * valid_hw[1], jnp.float32)
            pooled = (
                jnp.sum(x.astype(jnp.float32), axis=(1, 2), keepdims=True) / count
            ).astype(x.dtype)
        else:
            pooled = jnp.mean(
                x.astype(jnp.float32), axis=(1, 2), keepdims=True
            ).astype(x.dtype)
        f1 = Conv(self.inner_planes, 1, dtype=self.dtype, name="img_conv")(pooled)
        f1 = norm(use_running_average=ra, name="img_bn")(f1)
        f1 = nn.relu(f1)
        f1 = jnp.broadcast_to(
            f1, (x.shape[0], x.shape[1], x.shape[2], self.inner_planes)
        )

        f2 = Conv(self.inner_planes, 1, dtype=self.dtype, name="conv1x1")(x)
        f2 = nn.relu(norm(use_running_average=ra, name="bn1x1")(f2))

        feats = [f1, f2]
        for i, d in enumerate(self.dilations):
            f = Conv(
                self.inner_planes, 3, 1, d, dtype=self.dtype, name=f"conv_d{i}"
            )(x)
            f = nn.relu(norm(use_running_average=ra, name=f"bn_d{i}")(f))
            feats.append(f)
        return jnp.concatenate(feats, axis=-1)


def _head_stack(
    norm, ra, train, dtype, out_features: int, name: str, mask=None
) -> Callable:
    """classifier / representation tower: two 3x3 conv+BN+ReLU+Dropout2d then
    a 1x1 projection (decoder.py:82-106).  `mask` re-zeroes the 3x3 conv
    inputs for shape-bucketed eval (see resnet.Conv)."""

    def apply(mdl, x):
        h = Conv(256, 3, use_bias=True, dtype=dtype, name=f"{name}_conv1")(x, mask)
        h = norm(use_running_average=ra, name=f"{name}_bn1")(h)
        h = nn.relu(h)
        h = nn.Dropout(0.1, broadcast_dims=(1, 2), deterministic=not train)(h)
        h = Conv(256, 3, use_bias=True, dtype=dtype, name=f"{name}_conv2")(h, mask)
        h = norm(use_running_average=ra, name=f"{name}_bn2")(h)
        h = nn.relu(h)
        h = nn.Dropout(0.1, broadcast_dims=(1, 2), deterministic=not train)(h)
        h = Conv(out_features, 1, use_bias=True, dtype=dtype, name=f"{name}_out")(h)
        return h

    return apply


class DeepLabV3Plus(nn.Module):
    num_classes: int = 21
    inner_planes: int = 256
    dilations: Tuple[int, ...] = (12, 24, 36)
    rep_head: bool = True
    axis_name: Optional[str] = None
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, feats: Sequence, train: bool = False, valid_hw=None):
        """valid_hw: (vh, vw) valid extent of the NETWORK INPUT for
        shape-bucketed eval; the os4/os8 valid extents are derived with the
        same size arithmetic the encoder uses.  With it, the valid region of
        the output bit-matches an unpadded forward (see resnet.ResNet)."""
        x1, x2, x3, x4 = feats
        norm = make_norm(self.axis_name, dtype=self.dtype)
        ra = not train

        m4 = m8 = v2 = v3 = None
        if valid_hw is not None:
            _, v2h, v3h = valid_feature_sizes(valid_hw[0])
            _, v2w, v3w = valid_feature_sizes(valid_hw[1])
            v2, v3 = (v2h, v2w), (v3h, v3w)
            m4 = valid_mask(x1.shape[1], x1.shape[2], v2h, v2w, self.dtype)
            m8 = valid_mask(x4.shape[1], x4.shape[2], v3h, v3w, self.dtype)

        aspp_out = ASPP(
            self.inner_planes,
            self.dilations,
            axis_name=self.axis_name,
            dtype=self.dtype,
            name="aspp",
        )(x4, train=train, valid_hw=v3)

        low = Conv(256, 1, use_bias=True, dtype=self.dtype, name="low_conv")(x1)
        low = nn.relu(norm(use_running_average=ra, name="low_bn")(low))

        h = Conv(256, 3, dtype=self.dtype, name="head_conv")(aspp_out, m8)
        h = nn.relu(norm(use_running_average=ra, name="head_bn")(h))
        h = nn.Dropout(0.1, broadcast_dims=(1, 2), deterministic=not train)(h)

        if valid_hw is not None:
            # dynamic-valid align-corners resize: one compiled program per
            # bucket instead of one per image size (invalid rows/cols of h
            # are zeroed by the interpolation matrices themselves)
            h = resize_bilinear_valid(
                h, (low.shape[1], low.shape[2]), v3, v2
            )
        else:
            h = resize_bilinear(
                h, (low.shape[1], low.shape[2]), align_corners=True
            )
        h = jnp.concatenate([low, h], axis=-1)  # (B, H/4, W/4, 512)

        pred = _head_stack(
            norm, ra, train, self.dtype, self.num_classes, "cls", m4
        )(self, h)
        out = {"pred": pred}
        if self.rep_head:
            out["rep"] = _head_stack(norm, ra, train, self.dtype, 256, "rep", m4)(
                self, h
            )
        return out


class DeepLabV3(nn.Module):
    """Plain DeepLabv3 decoder (reference decoder.py:8-42): ASPP -> 3x3 head
    -> 1x1 logits; no low-level skip, no rep head."""

    num_classes: int = 19
    inner_planes: int = 256
    dilations: Tuple[int, ...] = (12, 24, 36)
    axis_name: Optional[str] = None
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, feats: Sequence, train: bool = False, valid_hw=None):
        x4 = feats[-1]
        norm = make_norm(self.axis_name, dtype=self.dtype)
        ra = not train
        m8 = v3 = None
        if valid_hw is not None:
            v3 = (
                valid_feature_sizes(valid_hw[0])[2],
                valid_feature_sizes(valid_hw[1])[2],
            )
            m8 = valid_mask(x4.shape[1], x4.shape[2], v3[0], v3[1], self.dtype)
        h = ASPP(
            self.inner_planes,
            self.dilations,
            axis_name=self.axis_name,
            dtype=self.dtype,
            name="aspp",
        )(x4, train=train, valid_hw=v3)
        h = Conv(256, 3, dtype=self.dtype, name="head_conv")(h, m8)
        h = nn.relu(norm(use_running_average=ra, name="head_bn")(h))
        h = nn.Dropout(0.1, broadcast_dims=(1, 2), deterministic=not train)(h)
        h = Conv(self.num_classes, 1, use_bias=True, dtype=self.dtype, name="head_out")(h)
        return {"pred": h}


class AuxHead(nn.Module):
    num_classes: int = 19
    axis_name: Optional[str] = None
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        norm = make_norm(self.axis_name, dtype=self.dtype)
        h = Conv(256, 3, use_bias=True, dtype=self.dtype, name="conv1")(x)
        h = nn.relu(norm(use_running_average=not train, name="bn1")(h))
        h = nn.Dropout(0.1, broadcast_dims=(1, 2), deterministic=not train)(h)
        h = Conv(self.num_classes, 1, use_bias=True, dtype=self.dtype, name="out")(h)
        return h
