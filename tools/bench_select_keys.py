"""A/B the two _select_keys lowerings at the in-step shape.

The contrastive enqueue picks <= cap negative-key indices per class from
a (num_classes, B*h*w) candidate mask each step (vmapped).  Round 3
measured the argsort lowering at ~12.3 ms isolated / ~5-8 ms net at the
flagship shape (21 x 133k, cap 8192); the radix lowering replaces the
O(N log N) sort with 8 fused compare-and-reduce passes + a cumsum/
searchsorted compaction, O(N).

Checksum-synced like tools/micro_piece_bench.py: each timed call reduces
to one scalar on device so no slab crosses the tunnel.

Usage: python tools/bench_select_keys.py [--n 133128] [--classes 21]
       [--cap 8192] [--iters 30]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from u2pl_tpu.losses.contrastive import (
    _select_keys_argsort,
    _select_keys_radix,
)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=129 * 129 * 8)
    ap.add_argument("--classes", type=int, default=21)
    ap.add_argument("--cap", type=int, default=8192)
    ap.add_argument("--iters", type=int, default=30)
    args = ap.parse_args()

    rng = np.random.RandomState(0)
    # candidate density like a real step: a few % of pixels per class
    masks = jnp.asarray(rng.rand(args.classes, args.n) < 0.04)
    keys0 = jax.random.split(jax.random.PRNGKey(0), args.classes)

    for name, fn in (("argsort", _select_keys_argsort), ("radix", _select_keys_radix)):
        @jax.jit
        def run(keys, fn=fn):
            idx, valid = jax.vmap(lambda m, k: fn(m, k, args.cap))(masks, keys)
            return (idx * valid).sum()  # one scalar crosses the tunnel

        jax.device_get(run(keys0))
        t0 = time.perf_counter()
        out = 0
        for i in range(args.iters):
            keys = jax.random.split(jax.random.PRNGKey(i + 1), args.classes)
            out = run(keys)
        jax.device_get(out)
        ms = (time.perf_counter() - t0) / args.iters * 1e3
        print(f"{name:<8} {ms:7.2f} ms  ({args.classes}x{args.n}, cap {args.cap})")


if __name__ == "__main__":
    main()
