"""A/B: masked_sort + 3 percentiles vs sort-free radix masked_percentiles.

The semi step takes three numpy-linear percentiles of one masked entropy
map ((B_u, H, W) ~= 1M pixels at the flagship shape).  This times both
lowerings at that shape on the current backend and checks bit-equality.

Usage: python tools/bench_percentile.py [--batch 4] [--crop 513] [--iters 50]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

import numpy as np

import jax
import jax.numpy as jnp

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from u2pl_tpu.ops.quantile import (
    masked_percentiles,
    masked_sort,
    percentile_from_sorted,
)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=4)
    ap.add_argument("--crop", type=int, default=513)
    ap.add_argument("--iters", type=int, default=50)
    args = ap.parse_args()

    rng = np.random.RandomState(0)
    vals = jnp.asarray(
        rng.rand(args.batch, args.crop, args.crop).astype(np.float32) * 3.0
    )
    mask = jnp.asarray(rng.rand(args.batch, args.crop, args.crop) > 0.05)
    pcts = jnp.asarray([80.0, 20.0, 98.0], jnp.float32)

    @jax.jit
    def via_sort(v, m, p):
        sv, n = masked_sort(v, m)
        return jnp.stack([percentile_from_sorted(sv, n, p[i]) for i in range(3)])

    @jax.jit
    def via_radix(v, m, p):
        return masked_percentiles(v, m, p)

    a = jax.device_get(via_sort(vals, mask, pcts))
    b = jax.device_get(via_radix(vals, mask, pcts))
    print(f"sort: {a}  radix: {b}  bit_equal={bool(np.all(a == b))}", flush=True)

    def timeit(f):
        r = f(vals, mask, pcts)
        jax.device_get(r)
        t0 = time.perf_counter()
        for _ in range(args.iters):
            r = f(vals, mask, pcts)
        jax.device_get(r)
        return (time.perf_counter() - t0) / args.iters * 1e3

    ts = timeit(via_sort)
    tr = timeit(via_radix)
    print(f"sort+3pct: {ts:.2f} ms   radix 3pct: {tr:.2f} ms   "
          f"speedup {ts / tr:.2f}x", flush=True)


if __name__ == "__main__":
    main()
