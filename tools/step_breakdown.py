"""Ablation timing of the fused semi step's subsystems on real hardware.

The axon TPU tunnel rejects jax.profiler xplane capture (FailedPrecondition
inside the trace context), so per-op times are not directly observable.
This tool bounds each subsystem's cost by timing step VARIANTS that omit
one piece at a time and differencing against the full step:

  full              the shipped make_semi_step
  no_contra         contrastive block disabled (cfg.trainer.contrastive=None)
  no_aug            CutMix/strong-augmentation disabled (apply_aug='')
  warmup            make_semi_warmup_step (student fwd/bwd on labeled CE +
                    dummy teacher BN forward; no pseudo-labels, no unsup,
                    no contra)
  student_fwd_bwd   value_and_grad of the student CE forward alone (bs
                    labeled+unlabeled, incl. upsample), + SGD update
  teacher_fwd       one eval-mode teacher forward on the unlabeled half +
                    the pseudo-label argmax/max-prob reductions

Prints one JSON line with ms per variant and the derived diffs.
Differences are approximate (XLA fuses across subsystem boundaries), but
they rank the optimization targets reliably.
"""

from __future__ import annotations

import argparse
import dataclasses
import json
import os
import sys
import time

import numpy as np

import jax
import jax.numpy as jnp

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def time_fn(fn, sync, iters=10, warm=3, carry=None):
    """Time `fn(carry) -> carry`, syncing on the final carry only.  The
    carry MUST be threaded (not reused): the train steps donate their
    state buffers, so calling twice with the same state is an
    INVALID_ARGUMENT on real TPU (donation is a no-op on CPU, which is why
    a naive re-call loop passes there)."""
    r = fn(carry)
    sync(r)
    for _ in range(warm - 1):
        r = fn(r)
    sync(r)
    t0 = time.perf_counter()
    for _ in range(iters):
        r = fn(r)
    sync(r)
    return (time.perf_counter() - t0) / iters * 1e3


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--crop", type=int, default=0,
                    help="0 = the variant's flagship crop (513 / 769)")
    ap.add_argument("--batch", type=int, default=0,
                    help="0 = the variant's flagship per-chip batch (4 / 2)")
    ap.add_argument("--dtype", default="bfloat16")
    ap.add_argument("--iters", type=int, default=10)
    ap.add_argument("--variant", default="pascal",
                    choices=["pascal", "cityscapes"],
                    help="config family: pascal (CE) or cityscapes (OHEM+aux)")
    args = ap.parse_args()
    if not args.crop:
        args.crop = 769 if args.variant == "cityscapes" else 513
    if not args.batch:
        args.batch = 2 if args.variant == "cityscapes" else 4

    from __graft_entry__ import _flagship_cfg
    from u2pl_tpu.dist import make_mesh
    from u2pl_tpu.memobank import init_memobank
    from u2pl_tpu.models import build_model
    from u2pl_tpu.ops.resize import resize_bilinear
    from u2pl_tpu.train.optim import make_optimizer
    from u2pl_tpu.train.state import copy_student_to_teacher, create_train_state
    from u2pl_tpu.train.steps import make_semi_step, make_semi_warmup_step

    crop = args.crop
    cfg = _flagship_cfg(crop=crop, variant=args.variant)
    cfg = dataclasses.replace(cfg, net=dataclasses.replace(cfg.net, dtype=args.dtype))
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

    def new_state():
        st = create_train_state(
            model,
            tx,
            jax.random.PRNGKey(0),
            (1, crop, crop, 3),
            with_teacher=True,
            bank=init_memobank(cfg.net.num_classes, 256),
            prototype=jnp.zeros((cfg.net.num_classes, 256, 1, 256)),
        )
        st = copy_student_to_teacher(st)
        return st.replace(step=st.step + 100)

    b = args.batch * n_dev
    rng = np.random.RandomState(0)
    img_l = jnp.asarray(rng.randn(b, crop, crop, 3), jnp.float32)
    lab_l = jnp.asarray(rng.randint(0, cfg.net.num_classes, (b, crop, crop)))
    img_u = jnp.asarray(rng.randn(b, crop, crop, 3), jnp.float32)
    key = jax.random.PRNGKey(1)

    def sync_state(sm):
        jax.device_get(jax.tree_util.tree_leaves(sm[0].params)[0])

    out = {"variant": args.variant, "crop": crop,
           "per_chip_batch": args.batch, "dtype": args.dtype}

    variants = {
        "full": cfg,
        "no_contra": dataclasses.replace(
            cfg, trainer=dataclasses.replace(cfg.trainer, contrastive=None)
        ),
        "no_aug": dataclasses.replace(
            cfg,
            trainer=dataclasses.replace(
                cfg.trainer,
                unsupervised=dataclasses.replace(
                    cfg.trainer.unsupervised, apply_aug=""
                ),
            ),
        ),
    }
    # the tunneled backend sporadically kills large programs with
    # INVALID_ARGUMENT (docs/PERF.md degradation mode) — keep going and
    # report what survived, with partial results printed incrementally
    for name, vcfg in variants.items():
        try:
            step = make_semi_step(vcfg, model, tx, 100, mesh)

            def run(carry, step=step):
                st = carry[0] if carry is not None else new_state()
                return step(st, img_l, lab_l, img_u, key)

            out[name + "_ms"] = round(time_fn(run, sync_state, args.iters), 1)
        except Exception as e:
            out[name + "_ms"] = None
            out[name + "_error"] = type(e).__name__
        print(json.dumps({k: v for k, v in out.items()}), flush=True)

    try:
        warm_step = make_semi_warmup_step(cfg, model, tx, 100, mesh)

        def run_warm(carry):
            st = carry[0] if carry is not None else new_state()
            return warm_step(st, img_l, lab_l, img_u, key)

        out["warmup_ms"] = round(
            time_fn(run_warm, sync_state, args.iters), 1
        )
    except Exception as e:
        out["warmup_ms"] = None
        out["warmup_error"] = type(e).__name__

    # isolated pieces (single shard_map-free jit on this chip's shapes)
    st = new_state()
    t_vars = {
        "params": st.teacher_params,
        "batch_stats": st.teacher_batch_stats,
    }
    model1 = build_model(cfg.net, axis_name=None)
    hw = (crop, crop)

    @jax.jit
    def teacher_fwd(img):
        p = model1.apply(t_vars, img, train=False)["pred"]
        p = resize_bilinear(p, hw, align_corners=True).astype(jnp.float32)
        conf = jnp.exp(p.max(-1) - jax.nn.logsumexp(p, -1))
        return conf, p.argmax(-1)

    try:
        out["teacher_fwd_ms"] = round(
            time_fn(
                lambda _: teacher_fwd(img_u),
                lambda r: jax.device_get(r[0]),
                args.iters,
            ),
            1,
        )
    except Exception as e:
        out["teacher_fwd_ms"] = None
        out["teacher_fwd_error"] = type(e).__name__

    from u2pl_tpu.losses.ce import supervised_loss

    @jax.jit
    def student_fwd_bwd(params, img, lab):
        def loss_fn(p):
            outs, _ = model1.apply(
                {"params": p, "batch_stats": st.batch_stats},
                img,
                train=True,
                mutable=["batch_stats"],
                rngs={"dropout": jax.random.PRNGKey(0)},
            )
            pred = resize_bilinear(outs["pred"], hw, align_corners=True)
            return supervised_loss(
                pred, jnp.concatenate([lab, lab], 0), None, 0.0, 255, False
            )

        return jax.grad(loss_fn)(params)

    img_all = jnp.concatenate([img_l, img_u], 0)
    try:
        out["student_fwd_bwd_ms"] = round(
            time_fn(
                lambda _: student_fwd_bwd(st.params, img_all, lab_l),
                lambda r: jax.device_get(jax.tree_util.tree_leaves(r)[0]),
                args.iters,
            ),
            1,
        )
    except Exception as e:
        out["student_fwd_bwd_ms"] = None
        out["student_fwd_bwd_error"] = type(e).__name__

    # isolated entropy machinery: the ONE masked sort that serves all three
    # per-step percentiles (steps.py), at the unlabeled-batch entropy shape
    from u2pl_tpu.ops.quantile import masked_sort, percentile_from_sorted

    @jax.jit
    def entropy_sort(ent, lab):
        s, nv = masked_sort(ent, lab != 255)
        return (
            percentile_from_sorted(s, nv, 80.0),
            percentile_from_sorted(s, nv, 20.0),
            percentile_from_sorted(s, nv, 98.0),
        )

    ent = jnp.asarray(rng.rand(args.batch, crop, crop), jnp.float32)
    try:
        out["entropy_sort_ms"] = round(
            time_fn(
                lambda _: entropy_sort(ent, lab_l[: args.batch]),
                lambda r: jax.device_get(r[0]),
                args.iters,
            ),
            1,
        )
    except Exception as e:
        out["entropy_sort_ms"] = None
        out["entropy_sort_error"] = type(e).__name__

    if out.get("full_ms") and out.get("no_contra_ms"):
        out["contra_cost_ms"] = round(out["full_ms"] - out["no_contra_ms"], 1)
    if out.get("full_ms") and out.get("no_aug_ms"):
        out["aug_cost_ms"] = round(out["full_ms"] - out["no_aug_ms"], 1)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
