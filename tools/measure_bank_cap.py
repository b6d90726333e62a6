"""Measure per-class negative-key candidate volume vs the enqueue cap.

The reference enqueues EVERY negative-mask pixel into the class memobank,
unbounded (reference u2pl/utils/utils.py:27-47 via loss_helper.py:142-150).
The TPU build uses a fixed-shape slab of `contrastive.
max_keys_per_class_per_step` keys per class per device per step
(losses/contrastive.py:_select_keys) — a random subsample whenever the true
candidate count exceeds the cap.  This tool runs the real fused semi step
on synthetic data and records the pre-cap per-class candidate counts the
step now exports as the `neg_cand` metric, so the cap default can be set
at/above the observed tail instead of asserted.

Usage:
  python tools/measure_bank_cap.py --crop 513 --classes 21 --batch 4
  python tools/measure_bank_cap.py --crop 769 --classes 19 --batch 2

Prints one JSON line with per-class max and overall p50/p90/p99/max across
(steps x classes), plus the share of (class, step) slots that would be
truncated at the configured cap.
"""

from __future__ import annotations

import argparse
import dataclasses
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--crop", type=int, default=513)
    ap.add_argument("--classes", type=int, default=21)
    ap.add_argument("--batch", type=int, default=4, help="per-chip labeled batch")
    ap.add_argument("--steps", type=int, default=20)
    ap.add_argument("--dtype", default="bfloat16")
    args = ap.parse_args()

    from __graft_entry__ import _flagship_cfg
    from u2pl_tpu.dist import make_mesh
    from u2pl_tpu.memobank import init_memobank
    from u2pl_tpu.models import build_model
    from u2pl_tpu.train.optim import make_optimizer
    from u2pl_tpu.train.state import copy_student_to_teacher, create_train_state
    from u2pl_tpu.train.steps import make_semi_step

    crop = args.crop
    cfg = _flagship_cfg(crop=crop, num_classes=args.classes)
    cfg = dataclasses.replace(
        cfg, net=dataclasses.replace(cfg.net, dtype=args.dtype)
    )
    cap = cfg.trainer.contrastive.max_keys_per_class_per_step
    mesh = make_mesh()
    n_dev = mesh.devices.size

    model = build_model(cfg.net, axis_name="data")
    dummy = build_model(cfg.net, axis_name=None)
    variables = jax.eval_shape(
        lambda: dummy.init(
            jax.random.PRNGKey(0), jnp.zeros((1, crop, crop, 3)), train=False
        )
    )
    tx = make_optimizer(cfg.trainer.optimizer, variables["params"], 10.0)
    state = create_train_state(
        model,
        tx,
        jax.random.PRNGKey(0),
        (1, crop, crop, 3),
        with_teacher=True,
        bank=init_memobank(cfg.net.num_classes, 256),
        prototype=jnp.zeros((cfg.net.num_classes, 256, 1, 256)),
    )
    state = copy_student_to_teacher(state)
    state = state.replace(step=state.step + 100)  # past warmup annealing edge

    step = make_semi_step(cfg, model, tx, steps_per_epoch=100, mesh=mesh)

    b = args.batch * n_dev
    rng = np.random.RandomState(0)
    img_l = jnp.asarray(rng.randn(b, crop, crop, 3), jnp.float32)
    lab_l = jnp.asarray(rng.randint(0, cfg.net.num_classes, (b, crop, crop)))
    img_u = jnp.asarray(rng.randn(b, crop, crop, 3), jnp.float32)

    counts = []  # (steps, C) worst-per-device candidate counts
    for i in range(args.steps):
        key = jax.random.PRNGKey(i)
        # fresh unlabeled noise each step so teacher probs/ranks vary
        img_u = jnp.asarray(rng.randn(b, crop, crop, 3), jnp.float32)
        state, m = step(state, img_l, lab_l, img_u, key)
        counts.append(np.asarray(jax.device_get(m["neg_cand"])))
    counts = np.stack(counts)  # (S, C)

    flat = counts.reshape(-1)
    out = {
        "crop": crop,
        "classes": args.classes,
        "per_chip_batch": args.batch,
        "rep_hw": int((crop + 3) // 4),
        "steps": args.steps,
        "cap": cap,
        "per_class_max": counts.max(axis=0).tolist(),
        "p50": int(np.percentile(flat, 50)),
        "p90": int(np.percentile(flat, 90)),
        "p99": int(np.percentile(flat, 99)),
        "max": int(flat.max()),
        "truncated_slot_share": round(float((flat > cap).mean()), 4),
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
