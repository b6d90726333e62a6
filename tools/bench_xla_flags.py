"""Sweep XLA:TPU compiler options over the fused semi step.

The step is conv-bound and, per docs/PERF.md, at a plateau where the
remaining time is narrow-channel MXU geometry + scheduling.  Before
accepting that, this tool measures whether any XLA compiler knob moves
the needle: the step is lowered ONCE and re-compiled per option set via
`Lowered.compile(compiler_options=...)` (no subprocess churn, flags apply
per-executable).  Unknown/rejected options are reported, not fatal.

Usage:  python tools/bench_xla_flags.py [--iters 15] [--variant pascal]

Prints one line per option set: name, step_ms, delta vs baseline.
Canary discipline: runs the bare-conv canary first and refuses to
measure on a degraded backend (docs/PERF.md "Tunneled-backend
degradation mode").
"""

from __future__ import annotations

import argparse
import dataclasses
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

# Candidate option sets. Each entry: (name, {option: value}).
# Values are strings/bools/ints as the PjRt compile-options API accepts.
CANDIDATES = [
    ("baseline", {}),
    # More scoped VMEM per fusion: v5e has 128 MiB VMEM; the default
    # scoped limit is far smaller. Bigger scopes let XLA fuse wider
    # producer chains into the conv epilogues.
    ("vmem_32m", {"xla_tpu_scoped_vmem_limit_kib": "32768"}),
    ("vmem_64m", {"xla_tpu_scoped_vmem_limit_kib": "65536"}),
    # Latency-hiding scheduler: overlaps independent program segments
    # (the teacher forwards are data-independent of the student fwd).
    ("lhs", {"xla_tpu_enable_latency_hiding_scheduler": "true"}),
    (
        "lhs+vmem_64m",
        {
            "xla_tpu_enable_latency_hiding_scheduler": "true",
            "xla_tpu_scoped_vmem_limit_kib": "65536",
        },
    ),
]


def _canary() -> float:
    ck = jnp.asarray(np.random.RandomState(1).randn(3, 3, 256, 256), jnp.bfloat16)
    cx = jnp.asarray(np.random.RandomState(0).randn(8, 129, 129, 256), jnp.bfloat16)

    @jax.jit
    def chain(a):
        for _ in range(10):
            a = jax.lax.conv_general_dilated(
                a, ck, (1, 1), "SAME", dimension_numbers=("NHWC", "HWIO", "NHWC")
            )
        return a

    r = chain(cx)
    jax.device_get(r[0, 0, 0, 0])
    t0 = time.perf_counter()
    r = cx
    for _ in range(5):
        r = chain(r)
    jax.device_get(r[0, 0, 0, 0])
    dt = (time.perf_counter() - t0) / 50
    return 8 * 129 * 129 * 256 * 256 * 9 * 2 / dt / 1e12


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=15)
    ap.add_argument("--variant", default="pascal")
    ap.add_argument("--batch", type=int, default=None)
    args = ap.parse_args()

    can = _canary()
    print(f"canary_tflops={can:.1f}", flush=True)
    if can < 60:
        raise SystemExit(
            "backend degraded (canary < 60 TFLOP/s) — measurements would be "
            "garbage; retry later (docs/PERF.md)"
        )

    from __graft_entry__ import _flagship_cfg
    from u2pl_tpu.dist import make_mesh
    from u2pl_tpu.memobank import init_memobank
    from u2pl_tpu.models import build_model
    from u2pl_tpu.train.optim import make_optimizer
    from u2pl_tpu.train.state import copy_student_to_teacher, create_train_state
    from u2pl_tpu.train.steps import make_semi_step

    crop = 769 if args.variant == "cityscapes" else 513
    b_chip = args.batch or (2 if args.variant == "cityscapes" else 4)
    cfg = _flagship_cfg(crop=crop, variant=args.variant)
    cfg = dataclasses.replace(cfg, net=dataclasses.replace(cfg.net, dtype="bfloat16"))
    mesh = make_mesh()
    n_dev = mesh.devices.size

    model = build_model(cfg.net, axis_name="data")
    dummy = build_model(cfg.net, axis_name=None)
    variables = jax.eval_shape(
        lambda: dummy.init(jax.random.PRNGKey(0), jnp.zeros((1, crop, crop, 3)), train=False)
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
    state = state.replace(step=state.step + 100)

    step = make_semi_step(cfg, model, tx, 100, mesh)
    b = b_chip * n_dev
    rng = np.random.RandomState(0)
    img_l = jnp.asarray(rng.randn(b, crop, crop, 3), jnp.float32)
    lab_l = jnp.asarray(rng.randint(0, cfg.net.num_classes, (b, crop, crop)))
    img_u = jnp.asarray(rng.randn(b, crop, crop, 3), jnp.float32)
    key = jax.random.PRNGKey(1)

    lowered = step.lower(state, img_l, lab_l, img_u, key)

    def measure(compiled) -> float:
        # the step donates its state argument — give each candidate its
        # own copy so the shared pristine `state` is never invalidated
        s = jax.tree_util.tree_map(jnp.copy, state)
        jax.device_get(jax.tree_util.tree_leaves(s.params)[0])
        s, m = compiled(s, img_l, lab_l, img_u, key)
        jax.device_get(jax.tree_util.tree_leaves(s.params)[0])
        for _ in range(3):
            s, m = compiled(s, img_l, lab_l, img_u, key)
        jax.device_get(jax.tree_util.tree_leaves(s.params)[0])
        t0 = time.perf_counter()
        for _ in range(args.iters):
            s, m = compiled(s, img_l, lab_l, img_u, key)
        jax.device_get(jax.tree_util.tree_leaves(s.params)[0])
        return (time.perf_counter() - t0) / args.iters * 1e3

    # Baseline FIRST, unconditionally: every candidate's delta is computed
    # against it, so a failed baseline aborts the sweep instead of silently
    # producing a comparison-free (or, for candidates ordered before it,
    # None-anchored) run.
    candidates = [c for c in CANDIDATES if c[0] == "baseline"] + [
        c for c in CANDIDATES if c[0] != "baseline"
    ]
    try:
        base_compiled = lowered.compile(compiler_options=None)
        base_ms = measure(base_compiled)
    except Exception as e:
        raise SystemExit(
            f"baseline compile/measure failed ({type(e).__name__}: {e}) — "
            "no comparison anchor, aborting the sweep"
        )
    print(f"{'baseline':<16} {base_ms:8.1f} ms   vs baseline +0.0%", flush=True)
    for name, opts in candidates:
        if name == "baseline":
            continue
        try:
            compiled = lowered.compile(compiler_options=opts or None)
            ms = measure(compiled)
        except Exception as e:
            print(f"{name:<16} REJECTED: {type(e).__name__}: {e}"[:200], flush=True)
            continue
        delta = f"{(ms / base_ms - 1) * 100:+.1f}%"
        print(f"{name:<16} {ms:8.1f} ms   vs baseline {delta}", flush=True)

    print(f"post-sweep canary_tflops={_canary():.1f}", flush=True)


if __name__ == "__main__":
    main()
