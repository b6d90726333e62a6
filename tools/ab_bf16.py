"""f32-vs-bf16 quality A/B on the burn-in training dynamics.

Decides whether bfloat16 compute can be the shipped default (the perf win
is ~3-4x on MXU-bound steps): runs the same learnable synthetic burn-in
(tools/burnin.py) under both `net.dtype` settings with identical data/RNG
and compares loss trajectories, entropy-percentile sensitivity (via the
unsupervised/contrastive losses, which gate on the on-device percentiles),
train mIoU, and memobank occupancy.

Pass criteria (printed as one JSON line):
  * both runs train: final sup_loss < 0.6 * initial
  * bf16 final sup/uns losses within 15% of f32's
  * bf16 train mIoU >= f32 mIoU - 0.03
"""

from __future__ import annotations

import dataclasses
import json
import time

import numpy as np

import jax
import jax.numpy as jnp


def run(dtype: str, crop: int = 257, C: int = 8, steps: int = 200):
    from __graft_entry__ import _flagship_cfg
    from u2pl_tpu.dist import make_mesh
    from u2pl_tpu.memobank import init_memobank
    from u2pl_tpu.models import build_model
    from u2pl_tpu.train.optim import make_optimizer
    from u2pl_tpu.train.state import (
        copy_student_to_teacher,
        create_train_state,
    )
    from u2pl_tpu.train.steps import make_semi_step, make_semi_warmup_step
    from u2pl_tpu.train.validate import make_val_step

    cfg = _flagship_cfg(crop=crop, num_classes=C)
    cfg = dataclasses.replace(
        cfg,
        net=dataclasses.replace(
            cfg.net,
            dtype=dtype,
            encoder=dataclasses.replace(
                cfg.net.encoder, type="u2pl.models.resnet.resnet50"
            ),
        ),
        trainer=dataclasses.replace(cfg.trainer, epochs=10),
    )
    mesh = make_mesh()
    model = build_model(cfg.net, axis_name="data")
    model_eval = build_model(cfg.net, axis_name=None)
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
        bank=init_memobank(C, 256, queue_size=4096, class0_size=6144),
        prototype=jnp.zeros((C, 256, 1, 256)),
    )

    # identical learnable task + data across the two runs
    rng = np.random.RandomState(0)

    def make_batch(b):
        from scipy.ndimage import uniform_filter

        img = rng.rand(b, crop, crop, 3).astype(np.float32)
        mix = uniform_filter(
            img @ np.array([0.5, 0.3, 0.2], np.float32), size=(1, 9, 9)
        )
        edges = np.quantile(mix, np.linspace(0, 1, C + 1)[1:-1])
        lab = np.digitize(mix, edges).astype(np.int32)
        return jnp.asarray((img - 0.5) / 0.25), jnp.asarray(lab)

    spe = 20
    warm = make_semi_warmup_step(cfg, model, tx, spe, mesh)
    semi = make_semi_step(cfg, model, tx, spe, mesh)
    key = jax.random.PRNGKey(1)
    img_l, lab_l = make_batch(4)
    img_u, _ = make_batch(4)

    first = last_sup = last_uns = last_con = None
    t0 = time.time()
    for it in range(steps):
        if it == spe:
            state = copy_student_to_teacher(state)
        fn = warm if it < spe else semi
        state, m = fn(state, img_l, lab_l, img_u, key)
        if it == 0 or it == steps - 1:
            mm = jax.device_get(m)
            if it == 0:
                first = float(mm["sup_loss"])
            last_sup = float(mm["sup_loss"])
            last_uns = float(mm["uns_loss"])
            last_con = float(mm["con_loss"])

    val = make_val_step(model_eval, C, 255)
    inter, union, _ = val(
        {"params": state.params, "batch_stats": state.batch_stats}, img_l, lab_l
    )
    iou = np.asarray(inter) / (np.asarray(union) + 1e-10)
    return {
        "dtype": dtype,
        "sup_first": round(first, 4),
        "sup_last": round(last_sup, 4),
        "uns_last": round(last_uns, 4),
        "con_last": round(last_con, 4),
        "train_miou": round(float(iou.mean()), 4),
        "bank_occupancy": int(np.asarray(state.bank.occupancy).sum()),
        "seconds": round(time.time() - t0, 1),
    }


def main():
    r32 = run("float32")
    print(json.dumps(r32), flush=True)
    r16 = run("bfloat16")
    print(json.dumps(r16), flush=True)

    ok = (
        r32["sup_last"] < 0.6 * r32["sup_first"]
        and r16["sup_last"] < 0.6 * r16["sup_first"]
        and abs(r16["sup_last"] - r32["sup_last"]) <= 0.15 * max(r32["sup_last"], 0.1)
        and abs(r16["uns_last"] - r32["uns_last"]) <= 0.15 * max(r32["uns_last"], 0.1)
        and r16["train_miou"] >= r32["train_miou"] - 0.03
    )
    print(json.dumps({"bf16_default_ok": ok, "f32": r32, "bf16": r16}))


if __name__ == "__main__":
    main()
