"""Serving-path throughput: forward + align-corners upsample + argmax.

Measures the inference pipeline `infer.py` / `eval.py` run per image —
one eval-mode forward of ResNet-101/DeepLabv3+ at the fixed headline
resolution (VOC 513², reference infer.py:111; cityscapes 769²), the
align_corners=True bilinear upsample of the logits to input size, and
the argmax to a label map — across batch sizes, for both the f32 parity
default and the TPU-native bf16 serving option.

Protocol mirrors bench.py's hardened one: bare-conv canary first, sync
on the final output, warmup incl. min-of-3 re-estimate (the tunneled
backend's first post-compile step can hiccup 95-200 s, docs/PERF.md),
then 3 independent timed blocks; each row reports the median block and
its max-min spread.

Usage:  python tools/bench_infer.py [--variant pascal|cityscapes]
            [--batches 1,4,8,16] [--dtypes float32,bfloat16] [--iters 20]

One JSON line per (dtype, batch) combination.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def bench_one(model, variables, crop, batch, iters):
    from u2pl_tpu.ops.resize import resize_bilinear

    @jax.jit
    def serve(images):
        out = model.apply(variables, images, train=False)["pred"]
        out = resize_bilinear(out, (crop, crop), align_corners=True)
        return jnp.argmax(out, axis=-1).astype(jnp.int32)

    x = jnp.asarray(
        np.random.RandomState(0).rand(batch, crop, crop, 3), jnp.float32
    )
    jax.device_get(serve(x))  # compile + first run (may hiccup)

    # Re-estimate step time as the min of 3 individually synced runs.
    est = min(
        _timed(lambda: jax.device_get(serve(x))) for _ in range(3)
    )
    iters = max(2, min(iters, int(10.0 / max(est, 1e-4))))

    block_dts = []
    for _ in range(3):
        t0 = time.perf_counter()
        for _ in range(iters):
            r = serve(x)
        jax.device_get(r)
        block_dts.append((time.perf_counter() - t0) / iters)
    dt = sorted(block_dts)[len(block_dts) // 2]
    spread = (max(block_dts) - min(block_dts)) / dt * 100.0
    return dt, spread, iters


def _timed(fn):
    t0 = time.perf_counter()
    fn()
    return time.perf_counter() - t0


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--variant", default="pascal",
                    choices=["pascal", "cityscapes"])
    ap.add_argument("--batches", default="1,4,8,16")
    ap.add_argument("--dtypes", default="float32,bfloat16")
    ap.add_argument("--iters", type=int, default=20)
    args = ap.parse_args()

    from __graft_entry__ import _flagship_cfg
    from bench import _run_canary
    from u2pl_tpu.models import build_model

    crop = 769 if args.variant == "cityscapes" else 513
    cfg = _flagship_cfg(crop=crop, variant=args.variant)

    canary = _run_canary()
    for dtype in args.dtypes.split(","):
        model = build_model(cfg.net, axis_name=None, dtype=jnp.dtype(dtype))
        variables = model.init(
            jax.random.PRNGKey(0), jnp.zeros((1, crop, crop, 3)), train=False
        )
        for batch in (int(b) for b in args.batches.split(",")):
            dt, spread, iters = bench_one(
                model, variables, crop, batch, args.iters
            )
            print(json.dumps({
                "metric": "u2pl_infer_throughput",
                "variant": args.variant,
                "crop": crop,
                "dtype": dtype,
                "batch": batch,
                "img_per_s": round(batch / dt, 2),
                "ms_per_batch": round(dt * 1e3, 1),
                "spread_pct": round(spread, 1),
                "iters_per_block": iters,
                "canary_tflops": canary,
            }), flush=True)


if __name__ == "__main__":
    main()
