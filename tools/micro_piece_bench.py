"""Isolated micro-benchmarks of the three round-3 perf-candidate pieces at
flagship shapes, to attribute a whole-step delta to a specific piece.

Pieces (old vs new):
  * memobank enqueue: `.at[idx].set` scatter (enqueue) vs scatter-free
    streaming rewrite (enqueue_segments)
  * bilinear upsample 129->513 of (4, 129, 129, C): f32 path vs bf16-exact
    MXU path
  * contrastive cosine logits (21, 256, 1+50, 256): normalize-then-dot f32
    vs dot-first bf16/f32-accum

Timing discipline (two tunnel traps this tool encodes):
  * `block_until_ready` does NOT serialize on the axon tunnel -> sync via
    device_get;
  * device_get of a large result is a multi-second tunnel transfer that
    swamps the kernel time -> every timed fn REDUCES its full result to one
    f32 scalar ON DEVICE (a full-array sum, so XLA cannot partially compute
    the candidate op through a slice), and only that scalar crosses the
    tunnel.
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

import jax
import jax.numpy as jnp

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from u2pl_tpu.memobank import enqueue, enqueue_segments, init_memobank
from u2pl_tpu.ops.resize import resize_bilinear


def timeit(fn, args, iters=20, warm=3):
    sync = lambda r: jax.device_get(r)
    r = fn(*args)
    sync(r)
    for _ in range(warm):
        r = fn(*args)
    sync(r)
    t0 = time.perf_counter()
    for _ in range(iters):
        r = fn(*args)
    sync(r)
    return (time.perf_counter() - t0) / iters * 1e3


def main():
    out = {}
    C, F, K = 21, 256, 8192
    rng = np.random.RandomState(0)

    def rec(name, val):
        out[name] = val
        print(f"{name}: {val}", flush=True)

    # --- enqueue: scatter vs segments (single-device slab, W=1) ---
    bank = init_memobank(C, F)
    keys_slab = jnp.asarray(rng.randn(C, 1, K, F), jnp.bfloat16)
    n = jnp.asarray(rng.randint(0, K, (C, 1)), jnp.int32)
    valid = jnp.arange(K)[None, :] < n[:, :1]
    keys_flat = keys_slab.reshape(C, K, F)

    @jax.jit
    def enq_new(b, s, nn):
        b2 = enqueue_segments(b, s, nn)
        return b2.keys.astype(jnp.float32).sum() + b2.ptr.sum()

    @jax.jit
    def enq_old(b, kf, v):
        b2 = enqueue(b, kf, v)
        return b2.keys.astype(jnp.float32).sum() + b2.ptr.sum()

    rec("enqueue_segments_ms", round(timeit(enq_new, (bank, keys_slab, n)), 2))
    rec("enqueue_scatter_ms", round(timeit(enq_old, (bank, keys_flat, valid)), 2))

    # baseline: the unavoidable full-bank read the checksum itself adds
    @jax.jit
    def bank_sum(b):
        return b.keys.astype(jnp.float32).sum() + b.ptr.sum()

    rec("bank_checksum_ms", round(timeit(bank_sum, (bank,)), 2))

    # --- resize 129 -> 513 ---
    for ch in (21, 256):
        x16 = jnp.asarray(rng.randn(4, 129, 129, ch), jnp.bfloat16)
        x32 = x16.astype(jnp.float32)

        @jax.jit
        def up(t):
            return resize_bilinear(t, (513, 513), True).astype(jnp.float32).sum()

        rec(f"resize_bf16_c{ch}_ms", round(timeit(up, (x16,)), 2))
        rec(f"resize_f32_c{ch}_ms", round(timeit(up, (x32,)), 2))

    # --- cosine logits at (C, Q=256, 1+50, F) (flagship num_negatives=50) ---
    q, neg = 256, 50
    anchor = jnp.asarray(rng.randn(C, q, F), jnp.float32)
    pos = jnp.asarray(rng.randn(C, q, 1, F), jnp.float32)
    negs16 = jnp.asarray(rng.randn(C, q, neg, F), jnp.bfloat16)

    @jax.jit
    def logits_old(anchor_feat, pos_feat, negs):
        all_feat = jnp.concatenate([pos_feat, negs.astype(jnp.float32)], axis=2)
        a_n = anchor_feat / jnp.maximum(
            jnp.linalg.norm(anchor_feat, axis=-1, keepdims=True), 1e-8
        )
        f_n = all_feat / jnp.maximum(
            jnp.linalg.norm(all_feat, axis=-1, keepdims=True), 1e-8
        )
        return (jnp.einsum("cqf,cqkf->cqk", a_n, f_n) / 0.5).sum()

    @jax.jit
    def logits_new(anchor_feat, pos_feat, negs):
        a_norm = jnp.maximum(
            jnp.linalg.norm(anchor_feat, axis=-1, keepdims=True), 1e-8
        )
        dot_neg = jnp.einsum(
            "cqf,cqkf->cqk",
            anchor_feat.astype(jnp.bfloat16),
            negs,
            preferred_element_type=jnp.float32,
        )
        neg_norm = jnp.maximum(
            jnp.sqrt(
                jnp.einsum(
                    "cqkf,cqkf->cqk", negs, negs,
                    preferred_element_type=jnp.float32,
                )
            ),
            1e-8,
        )
        dot_pos = jnp.einsum("cqf,cqkf->cqk", anchor_feat, pos_feat)
        pos_norm = jnp.maximum(jnp.linalg.norm(pos_feat, axis=-1), 1e-8)
        return (
            jnp.concatenate([dot_pos / pos_norm, dot_neg / neg_norm], axis=-1)
            / a_norm
            / 0.5
        ).sum()

    rec("logits_old_ms", round(timeit(logits_old, (anchor, pos, negs16)), 2))
    rec("logits_new_ms", round(timeit(logits_new, (anchor, pos, negs16)), 2))

    print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
