"""A/B: stem conv1 (3x3/s2 on 513x513x3) vs its space-to-depth rewrite.

The deep stem's first conv has 3 input channels — the MXU contracts over
K = kh*kw*cin = 27 lanes of a >=128-wide systolic pass, so the op runs at
a tiny fraction of peak.  The classic TPU fix (used by MLPerf ResNet
submissions) is to space-to-depth the input: a 3x3/s2/p1 conv on
(H, W, 3) is EXACTLY a 2x2/s1 conv on the (H/2, W/2, 12) block-rearranged
input with the 3x3x3 weights scattered into a 2x2x12 kernel (one tap of
the 2x2 kernel is all-zero).  K goes 27 -> 48 and, more importantly, the
input layout becomes MXU/VMEM friendly.

This tool measures fwd + weight-grad (the network input takes no grad) of
both lowerings at the in-step shape and asserts bit-equivalence of the
forward (same weights, deterministic scatter).

Usage: python tools/bench_s2d_stem.py [--batch 8] [--crop 513] [--iters 20]
"""

from __future__ import annotations

import argparse
import time

import numpy as np

import jax
import jax.numpy as jnp


def s2d_pack(x):
    """(B, H, W, C) -> (B, ceil(H/2), ceil(W/2), 4C), zero-padding odd H/W.

    Channel order: (u, v, c) -> (u*2 + v)*C + c for the 2x2 block offset
    (u, v)."""
    b, h, w, c = x.shape
    ph, pw = -h % 2, -w % 2
    if ph or pw:
        x = jnp.pad(x, ((0, 0), (0, ph), (0, pw), (0, 0)))
        h, w = h + ph, w + pw
    x = x.reshape(b, h // 2, 2, w // 2, 2, c)
    x = x.transpose(0, 1, 3, 2, 4, 5)
    return x.reshape(b, h // 2, w // 2, 4 * c)


def s2d_kernel(w):
    """(3, 3, C, O) conv weights -> the equivalent (2, 2, 4C, O) kernel.

    Output row i of the stride-2 conv reads input rows {2i-1, 2i, 2i+1} =
    s2d rows {i-1 (block offset u=1), i (u=0), i (u=1)}; as a 2x2 kernel
    over s2d rows {i-1+e : e in 0..1} (padding (1, 0)) the tap map is
    (e=0,u=1)->di=0, (e=1,u=0)->di=1, (e=1,u=1)->di=2 and (e=0,u=0) is
    never read (weight 0).  Same for columns."""
    c, o = w.shape[2], w.shape[3]
    w2 = jnp.zeros((2, 2, 4 * c, o), w.dtype)
    # (e, u) -> di ; (f, v) -> dj
    taps = {(0, 1): 0, (1, 0): 1, (1, 1): 2}
    for (e, u), di in taps.items():
        for (f, v), dj in taps.items():
            w2 = w2.at[e, f, (u * 2 + v) * c : (u * 2 + v + 1) * c, :].set(
                w[di, dj]
            )
    return w2


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--crop", type=int, default=513)
    ap.add_argument("--iters", type=int, default=20)
    args = ap.parse_args()
    b, c = args.batch, args.crop

    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(b, c, c, 3), jnp.bfloat16)
    w = jnp.asarray(rng.randn(3, 3, 3, 64) * 0.1, jnp.bfloat16)

    def conv_ref(w, x):
        return jax.lax.conv_general_dilated(
            x, w, (2, 2), ((1, 1), (1, 1)),
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )

    def conv_s2d(w, x):
        z = s2d_pack(x)
        return jax.lax.conv_general_dilated(
            z, s2d_kernel(w), (1, 1), ((1, 0), (1, 0)),
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )

    # forward bit-equivalence (same weights, both paths pure bf16 MXU)
    ya = jax.jit(conv_ref)(w, x)
    yb = jax.jit(conv_s2d)(w, x)
    assert ya.shape == yb.shape, (ya.shape, yb.shape)
    eq = bool(jnp.all(ya == yb))
    print(f"shapes {ya.shape} bit_equal={eq} "
          f"maxdiff={float(jnp.max(jnp.abs(ya.astype(jnp.float32) - yb.astype(jnp.float32))))}",
          flush=True)

    def timeit(f):
        # fwd + weight-grad, like the in-step cost (input takes no grad)
        g = jax.jit(jax.grad(lambda w: jnp.sum(f(w, x).astype(jnp.float32))))
        r = g(w)
        jax.device_get(r.ravel()[0])
        t0 = time.perf_counter()
        for _ in range(args.iters):
            r = g(w)
        jax.device_get(r.ravel()[0])
        return (time.perf_counter() - t0) / args.iters * 1e3

    ta = timeit(conv_ref)
    tb = timeit(conv_s2d)
    print(f"ref 3x3/s2: {ta:.2f} ms   s2d 2x2/s1: {tb:.2f} ms   "
          f"speedup {ta / tb:.2f}x", flush=True)


if __name__ == "__main__":
    main()
