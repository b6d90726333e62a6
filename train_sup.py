"""Supervised baseline trainer CLI (reference train_sup.py parity).

Same flags; DDP/SyncBN/poly-LR/head-x10 semantics live inside the fused
SPMD step (u2pl_tpu/train/steps.py:make_sup_step)."""

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
from u2pl_tpu.models import build_model
from u2pl_tpu.train.optim import make_optimizer
from u2pl_tpu.train.state import create_train_state
from u2pl_tpu.train.steps import make_sup_step
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

parser = argparse.ArgumentParser(description="Supervised Semantic Segmentation (TPU)")
parser.add_argument("--config", type=str, default="config.yaml")
parser.add_argument("--local_rank", type=int, default=0)
parser.add_argument("--seed", type=int, default=0)
parser.add_argument("--port", default=None, type=int)
parser.add_argument(
    "--compilation_cache_dir",
    type=str,
    default="",
    help="enable JAX's persistent compilation cache in this directory "
    "(or set U2PL_COMPILE_CACHE); restarts/resumes skip the XLA compile",
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

    loader_sup, loader_val = build_loaders(
        cfg,
        seed=args.seed,
        process_index=jax.process_index(),
        process_count=jax.process_count(),
        replicas_per_process=jax.local_device_count(),
    )
    steps_per_epoch = len(loader_sup)
    crop = cfg.dataset.train.crop.size if cfg.dataset.train.crop else (513, 513)

    dummy_vars = jax.eval_shape(
        lambda: model_eval.init(
            jax.random.PRNGKey(0), jnp.zeros((1, crop[0], crop[1], 3)), train=False
        )
    )
    tx = make_optimizer(
        cfg.trainer.optimizer, dummy_vars["params"], head_lr_multiplier(cfg)
    )
    state = create_train_state(
        model, tx, jax.random.PRNGKey(args.seed), (1, crop[0], crop[1], 3),
        with_teacher=False,
    )
    # ImageNet encoder warm start (reference resnet.py:380-402)
    state = load_encoder_pretrained(cfg.net.encoder, state)

    resumed, last_epoch, best_prec = maybe_resume(cfg.saver, cfg.save_path, state)
    if resumed is not None:
        state = resumed

    # multi-host: replicate the (process-identical) state and RNG onto the
    # global mesh before the first jit call; single-process no-op
    state = replicate_to_mesh(mesh, state)
    step_rng = replicate_to_mesh(mesh, jax.random.PRNGKey(args.seed + 1))

    sup_step = make_sup_step(cfg, model, tx, steps_per_epoch, mesh)

    for epoch in range(last_epoch, cfg.trainer.epochs):
        sup_losses = AverageMeter(10)
        data_times, batch_times = AverageMeter(10), AverageMeter(10)
        batch_end = time.time()
        for step, (img, lab) in enumerate(loader_sup.epoch(epoch)):
            t0 = time.time()
            data_times.update(t0 - batch_end)
            i_iter = epoch * steps_per_epoch + step
            state, metrics = sup_step(
                state,
                shard_host_batch(mesh, img),
                shard_host_batch(mesh, lab),
                step_rng,
            )
            if i_iter % 10 == 0 and rank0:
                m = jax.device_get(local_view(metrics))
                sup_losses.update(float(m["sup_loss"]))
                logger.info(
                    "[{}] Iter [{}/{}]\tData {:.2f} ({:.2f})\t"
                    "Time {:.2f} ({:.2f})\tSup {:.3f} ({:.3f})\tLR {:.5f}".format(
                        cfg.dataset.n_sup,
                        i_iter,
                        cfg.trainer.epochs * steps_per_epoch,
                        data_times.val, data_times.avg,
                        batch_times.val, batch_times.avg,
                        sup_losses.val, sup_losses.avg,
                        float(m["lr"]),
                    )
                )
                tb.add_scalar("lr", float(m["lr"]), i_iter)
                tb.add_scalar("Sup Loss", sup_losses.val, i_iter)
            batch_end = time.time()
            batch_times.update(batch_end - t0)

        if cfg.trainer.eval_on:
            prec = validate(
                model_eval, state.params, state.batch_stats, loader_val, cfg,
                epoch, logger,
            )
            if rank0:
                if prec > best_prec:
                    best_prec = prec
                    save_checkpoint(
                        osp.join(cfg.save_path, CKPT_BEST_NAME), state,
                        epoch + 1, best_prec,
                    )
                save_checkpoint(
                    osp.join(cfg.save_path, CKPT_NAME), state, epoch + 1, best_prec
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
