"""Per-stage conv timing of the ResNet-101 DeepLabv3+ forward+backward.

docs/PERF.md's ablations bound the conv stack at ~220 ms of the 247 ms
flagship step and note it runs at ~80% of the chip's bare-conv canary
rate.  This tool locates WHERE inside the conv stack that time goes by
timing each encoder stage (stem, layer1..layer4) and the decoder in
ISOLATION at its in-step shape — fwd+bwd via value_and_grad of a scalar
reduction, train-mode BN, bf16 — so narrow-channel / large-spatial
stages (stem at 513^2x3, layer1 at 129^2x64) can be compared against the
MXU-friendly wide stages (layer3/4 at 65^2).

Isolated timings carry ~1-3 ms of dispatch each and lose cross-stage
fusion, so they rank targets rather than sum to the step time (same
caveat as tools/step_breakdown.py).

Usage: python tools/stage_breakdown.py [--batch 8] [--crop 513] [--iters 10]
"""

from __future__ import annotations

import argparse
import functools
import json
import os
import sys
import time

import numpy as np

import jax
import jax.numpy as jnp
import flax.linen as nn

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from u2pl_tpu.models import resnet as R
from u2pl_tpu.models.decoder import DeepLabV3Plus
from u2pl_tpu.ops.pooling import max_pool_ceil


class Stem(nn.Module):
    dtype: object = jnp.bfloat16

    @nn.compact
    def __call__(self, x, train=True):
        norm = R.make_norm(None, dtype=self.dtype)
        ra = not train
        x = R.Conv(64, 3, 2, dtype=self.dtype, name="stem_conv1")(x)
        x = norm(use_running_average=ra, name="stem_bn1")(x)
        x = nn.relu(x)
        x = R.Conv(64, 3, 1, dtype=self.dtype, name="stem_conv2")(x)
        x = norm(use_running_average=ra, name="stem_bn2")(x)
        x = nn.relu(x)
        x = R.Conv(128, 3, 1, dtype=self.dtype, name="stem_conv3")(x)
        x = norm(use_running_average=ra, name="bn1")(x)
        x = nn.relu(x)
        return max_pool_ceil(x, kernel=3, stride=2, pad=1)


class Stage(nn.Module):
    """One ResNet stage (sequence of Bottlenecks) at a given config."""

    planes: int
    blocks: int
    stride: int
    dilation_in: int  # previous_dilation for block 0
    dilation: int  # dilation for blocks 1..n
    grids: tuple = ()
    in_planes: int = 0
    dtype: object = jnp.bfloat16

    @nn.compact
    def __call__(self, x, train=True):
        norm = R.make_norm(None, dtype=self.dtype)
        grids = list(self.grids) or [1] * self.blocks
        for bi in range(self.blocks):
            first = bi == 0
            x = R.Bottleneck(
                planes=self.planes,
                stride=self.stride if first else 1,
                dilation=(self.dilation_in if first else self.dilation)
                * grids[bi],
                has_downsample=first
                and (self.stride != 1 or self.in_planes != self.planes * 4),
                norm=norm,
                dtype=self.dtype,
                name=f"b{bi}",
            )(x, train)
        return x


def time_fwd_bwd(model, x, iters, extra_kwargs=None):
    variables = model.init(jax.random.PRNGKey(0), x, train=True)
    params, rest = variables["params"], {
        k: v for k, v in variables.items() if k != "params"
    }

    def loss(p):
        out = model.apply(
            {"params": p, **rest},
            x,
            train=True,
            mutable=["batch_stats"],
            rngs={"dropout": jax.random.PRNGKey(3)},
        )[0]
        if isinstance(out, dict):
            out = out["pred"]
        return jnp.sum(out.astype(jnp.float32))

    g = jax.jit(jax.grad(loss))
    r = g(params)
    jax.device_get(jax.tree_util.tree_leaves(r)[0][(0,) * 0].ravel()[0])
    for _ in range(2):
        r = g(params)
    jax.device_get(jax.tree_util.tree_leaves(r)[0].ravel()[0])
    t0 = time.perf_counter()
    for _ in range(iters):
        r = g(params)
    jax.device_get(jax.tree_util.tree_leaves(r)[0].ravel()[0])
    return (time.perf_counter() - t0) / iters * 1e3


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--crop", type=int, default=513)
    ap.add_argument("--iters", type=int, default=10)
    ap.add_argument(
        "--only", type=str, default="",
        help="comma-separated substring filter over piece names",
    )
    args = ap.parse_args()
    only = [s for s in args.only.split(",") if s]

    b, c = args.batch, args.crop
    key = jax.random.PRNGKey(1)
    dt = jnp.bfloat16
    # in-step feature sizes for crop 513: os2 257, os4 129, os8 65
    s2 = (c + 1) // 2
    s4 = s2 // 2 + 1
    s8 = (s4 + 1) // 2

    class StemConv(nn.Module):
        """One stem conv + BN + ReLU in isolation."""

        feat: int
        stride: int = 1
        dtype: object = jnp.bfloat16

        @nn.compact
        def __call__(self, x, train=True):
            norm = R.make_norm(None, dtype=self.dtype)
            x = R.Conv(self.feat, 3, self.stride, dtype=self.dtype, name="c")(x)
            x = norm(use_running_average=not train, name="bn")(x)
            return nn.relu(x)

    res = {}

    def record(name, model, x):
        if only and not any(s in name for s in only):
            return
        res[name] = time_fwd_bwd(model, x, args.iters)
        print(f"{name}: {res[name]:.1f} ms", flush=True)

    x0 = jax.random.normal(key, (b, c, c, 3), dt)
    record("stem_513", Stem(dtype=dt), x0)
    record("stem_conv1_3to64", StemConv(feat=64, stride=2, dtype=dt), x0)
    xs2 = jax.random.normal(key, (b, s2, s2, 64), dt)
    record("stem_conv2_64to64", StemConv(feat=64, dtype=dt), xs2)
    record("stem_conv3_64to128", StemConv(feat=128, dtype=dt), xs2)

    x1 = jax.random.normal(key, (b, s4, s4, 128), dt)
    record("layer1_129", Stage(planes=64, blocks=3, stride=1, dilation_in=1,
                               dilation=1, in_planes=128, dtype=dt), x1)

    x2 = jax.random.normal(key, (b, s4, s4, 256), dt)
    record("layer2_129to65", Stage(planes=128, blocks=4, stride=2,
                                   dilation_in=1, dilation=1, in_planes=256,
                                   dtype=dt), x2)

    x3 = jax.random.normal(key, (b, s8, s8, 512), dt)
    record("layer3_65_d2_x23", Stage(planes=256, blocks=23, stride=1,
                                     dilation_in=1, dilation=2, in_planes=512,
                                     dtype=dt), x3)
    # dilation=1 control at the same shape: isolates the cost XLA pays for
    # the d2 atrous lowering vs a dense 3x3 (not a semantically valid model)
    record("layer3_65_d1_x23_ctl", Stage(planes=256, blocks=23, stride=1,
                                         dilation_in=1, dilation=1,
                                         in_planes=512, dtype=dt), x3)

    x4 = jax.random.normal(key, (b, s8, s8, 1024), dt)
    record("layer4_65_d4_mg", Stage(planes=512, blocks=3, stride=1,
                                    dilation_in=2, dilation=4, grids=(2, 2, 4),
                                    in_planes=1024, dtype=dt), x4)

    class Dec(nn.Module):
        @nn.compact
        def __call__(self, x, train=True):
            x1 = x
            x4 = jax.random.normal(jax.random.PRNGKey(2), (b, s8, s8, 2048), dt)
            return DeepLabV3Plus(
                num_classes=21, inner_planes=256,
                dilations=(12, 24, 36), rep_head=True, dtype=dt, name="dec"
            )([x1, None, None, x4], train=train)

    xl = jax.random.normal(key, (b, s4, s4, 256), dt)
    try:
        res["decoder_os8"] = time_fwd_bwd(Dec(), xl, args.iters)
    except Exception as e:  # decoder signature drift — report, don't die
        res["decoder_os8"] = f"error: {e}"

    res["sum_ms"] = round(
        sum(v for v in res.values() if isinstance(v, float)), 1
    )
    print(json.dumps({k: (round(v, 1) if isinstance(v, float) else v)
                      for k, v in res.items()}))


if __name__ == "__main__":
    main()
