"""Semi-supervised U2PL trainer CLI (reference train_semi.py parity).

Same flags (--config --seed --port --local_rank; the last two are accepted
for launcher compatibility and unused — the TPU runtime needs no rendezvous
port or per-process rank wiring).  The hot loop is a single fused SPMD
step; see u2pl_tpu/train/steps.py.
"""

from __future__ import annotations

import argparse
import logging
import os
import os.path as osp
import pprint
import time
from datetime import datetime

import jax
import jax.numpy as jnp
import numpy as np

from u2pl_tpu.config import head_lr_multiplier, load_config
from u2pl_tpu.data import build_loaders
from u2pl_tpu.dist import (
    initialize_distributed,
    local_view,
    make_mesh,
    process_is_primary,
    replicate_to_mesh,
    shard_host_batch,
)
from u2pl_tpu.memobank import init_memobank
from u2pl_tpu.models import build_model
from u2pl_tpu.train.optim import make_optimizer
from u2pl_tpu.train.state import copy_student_to_teacher, create_train_state
from u2pl_tpu.train.steps import make_semi_step, make_semi_warmup_step
from u2pl_tpu.train.validate import validate
from u2pl_tpu.utils.checkpoint import (
    CKPT_BEST_NAME,
    CKPT_NAME,
    load_encoder_pretrained,
    maybe_resume,
    save_checkpoint,
)
from u2pl_tpu.utils.compile_cache import maybe_enable_compilation_cache
from u2pl_tpu.utils.logging_utils import AverageMeter, init_log
from u2pl_tpu.utils.tb import ScalarWriter

parser = argparse.ArgumentParser(
    description="Semi-Supervised Semantic Segmentation (TPU)"
)
parser.add_argument("--config", type=str, default="config.yaml")
parser.add_argument("--local_rank", type=int, default=0)  # launcher parity
parser.add_argument("--seed", type=int, default=0)
parser.add_argument("--port", default=None, type=int)  # launcher parity
parser.add_argument(
    "--profile_dir",
    type=str,
    default="",
    help="capture a jax.profiler xplane trace of train steps 10-13 "
    "(TPU-native replacement for the reference's absent profiler hooks)",
)
parser.add_argument(
    "--compilation_cache_dir",
    type=str,
    default="",
    help="enable JAX's persistent compilation cache in this directory "
    "(or set U2PL_COMPILE_CACHE); restarts/resumes skip the minutes-long "
    "XLA compile of the fused train step",
)


def main():
    args = parser.parse_args()
    cfg = load_config(args.config)

    logger = init_log("global", logging.INFO)
    maybe_enable_compilation_cache(args.compilation_cache_dir, logger)
    initialize_distributed()
    mesh = make_mesh()

    rank0 = process_is_primary()
    if rank0:
        logger.info(pprint.pformat(cfg))
        tb = ScalarWriter(
            osp.join(
                cfg.exp_path,
                "log/events_seg/" + datetime.now().strftime("%Y%m%d_%H%M%S"),
            )
        )
        os.makedirs(cfg.save_path, exist_ok=True)
    else:
        tb = None

    model = build_model(cfg.net, axis_name="data")
    # in-loop validation runs in f32 like the reference regardless of
    # the training compute dtype (bf16 can flip argmax at near-ties)
    model_eval = build_model(cfg.net, axis_name=None, dtype=jnp.float32)

    loader_sup, loader_unsup, loader_val = build_loaders(
        cfg,
        seed=args.seed,
        process_index=jax.process_index(),
        process_count=jax.process_count(),
        replicas_per_process=jax.local_device_count(),
    )
    assert len(loader_sup) == len(loader_unsup), (
        f"labeled data {len(loader_sup)} unlabeled data {len(loader_unsup)}, "
        "imbalance!"
    )
    steps_per_epoch = len(loader_sup)

    crop = cfg.dataset.train.crop.size if cfg.dataset.train.crop else (513, 513)
    init_rng = jax.random.PRNGKey(args.seed)

    # build optimizer with the head x10 group (pascal) via a dummy init
    dummy_vars = jax.eval_shape(
        lambda: model_eval.init(
            jax.random.PRNGKey(0), jnp.zeros((1, crop[0], crop[1], 3)), train=False
        )
    )
    tx = make_optimizer(
        cfg.trainer.optimizer, dummy_vars["params"], head_lr_multiplier(cfg)
    )

    contra = cfg.trainer.contrastive
    bank = (
        init_memobank(
            cfg.net.num_classes, 256, dtype=jnp.dtype(contra.queue_dtype)
        )
        if contra
        else None
    )
    prototype = (
        jnp.zeros((cfg.net.num_classes, contra.num_queries, 1, 256))
        if contra
        else None
    )
    state = create_train_state(
        model,
        tx,
        init_rng,
        (1, crop[0], crop[1], 3),
        with_teacher=True,
        bank=bank,
        prototype=prototype,
    )

    # ImageNet encoder warm start (reference resnet.py:380-402), before the
    # auto_resume/pretrain precedence chain can overwrite it
    state = load_encoder_pretrained(cfg.net.encoder, state)

    resumed, last_epoch, best_prec = maybe_resume(cfg.saver, cfg.save_path, state)
    if resumed is not None:
        state = resumed

    # multi-host: the state (bitwise identical on every process — same seed,
    # same checkpoint) and the step RNG must enter the global-mesh jit as
    # fully-replicated global arrays; single-process this is a no-op
    # (reference relies on DDP broadcasting rank-0 params instead,
    # dist_helper.py:13-46)
    state = replicate_to_mesh(mesh, state)
    step_rng = replicate_to_mesh(mesh, jax.random.PRNGKey(args.seed + 1))

    warmup_step = make_semi_warmup_step(cfg, model, tx, steps_per_epoch, mesh)
    semi_step = make_semi_step(cfg, model, tx, steps_per_epoch, mesh)

    sup_only_epoch = cfg.trainer.sup_only_epoch
    for epoch in range(last_epoch, cfg.trainer.epochs):
        sup_losses, uns_losses, con_losses = (
            AverageMeter(10),
            AverageMeter(10),
            AverageMeter(10),
        )
        data_times, batch_times = AverageMeter(10), AverageMeter(10)
        warmup = epoch < sup_only_epoch
        step_fn = warmup_step if warmup else semi_step

        batch_end = time.time()
        pending = None  # (i_iter, metrics) fetched one step late

        def flush_pending(pending):
            """Fetch + log the one-step-late metrics (async dispatch keeps
            the device busy while the host reads the previous step)."""
            if pending is None or not rank0:
                return
            pi, pm = pending
            pm = jax.device_get(local_view(pm))
            sup_losses.update(float(pm["sup_loss"]))
            uns_losses.update(float(pm["uns_loss"]))
            con_losses.update(float(pm["con_loss"]))
            if pi % 10 == 0:
                logger.info(
                    "[{}][{}] Iter [{}/{}]\t"
                    "Data {:.2f} ({:.2f})\tTime {:.2f} ({:.2f})\t"
                    "Sup {:.3f} ({:.3f})\tUns {:.3f} ({:.3f})\t"
                    "Con {:.3f} ({:.3f})\tLR {:.5f}".format(
                        cfg.dataset.n_sup,
                        "none" if warmup else f"{contra.low_rank}:{contra.high_rank} high"
                        if contra
                        else "none",
                        pi,
                        cfg.trainer.epochs * steps_per_epoch,
                        data_times.val,
                        data_times.avg,
                        batch_times.val,
                        batch_times.avg,
                        sup_losses.val,
                        sup_losses.avg,
                        uns_losses.val,
                        uns_losses.avg,
                        con_losses.val,
                        con_losses.avg,
                        float(pm["lr"]),
                    )
                )
                tb.add_scalar("lr", float(pm["lr"]), pi)
                tb.add_scalar("Sup Loss", sup_losses.val, pi)
                tb.add_scalar("Uns Loss", uns_losses.val, pi)
                tb.add_scalar("Con Loss", con_losses.val, pi)

        for step, ((img_l, lab_l), (img_u, _)) in enumerate(
            zip(loader_sup.epoch(epoch), loader_unsup.epoch(epoch))
        ):
            batch_start = time.time()
            data_times.update(batch_start - batch_end)
            i_iter = epoch * steps_per_epoch + step

            if args.profile_dir and i_iter == 10:
                jax.profiler.start_trace(args.profile_dir)

            if epoch == sup_only_epoch:
                # per-step student->teacher copy during the first semi
                # epoch (reference train_semi.py:309-315 runs inside the
                # step loop); aliasing device buffers, no data movement
                state = copy_student_to_teacher(state)

            state, metrics = step_fn(
                state,
                shard_host_batch(mesh, img_l),
                shard_host_batch(mesh, lab_l),
                shard_host_batch(mesh, img_u),
                step_rng,
            )

            flush_pending(pending)
            pending = (i_iter, metrics)

            if args.profile_dir and i_iter == 13:
                # sync on a late output so the traced steps are complete
                jax.device_get(local_view(jax.tree_util.tree_leaves(state.params)[0]))
                jax.profiler.stop_trace()
                if rank0:
                    logger.info(f"profiler trace written to {args.profile_dir}")

            batch_end = time.time()
            batch_times.update(batch_end - batch_start)

        # the final step's metrics would otherwise be dropped at epoch end
        flush_pending(pending)

        if cfg.trainer.eval_on:
            if rank0:
                logger.info("start evaluation")
            if epoch < sup_only_epoch:
                prec = validate(
                    model_eval, state.params, state.batch_stats, loader_val,
                    cfg, epoch, logger,
                )
            else:
                prec = validate(
                    model_eval,
                    state.teacher_params,
                    state.teacher_batch_stats,
                    loader_val,
                    cfg,
                    epoch,
                    logger,
                )
            if rank0:
                if prec > best_prec:
                    best_prec = prec
                    save_checkpoint(
                        osp.join(cfg.save_path, CKPT_BEST_NAME),
                        state,
                        epoch + 1,
                        best_prec,
                        save_memobank=cfg.saver.save_memobank,
                    )
                save_checkpoint(
                    osp.join(cfg.save_path, CKPT_NAME), state, epoch + 1,
                    best_prec, save_memobank=cfg.saver.save_memobank,
                )
                logger.info(
                    "\033[31m * Currently, the best val result is: {:.2f}\033[0m".format(
                        best_prec * 100
                    )
                )
                tb.add_scalar("mIoU val", prec, epoch)

    if rank0:
        tb.close()


if __name__ == "__main__":
    main()
