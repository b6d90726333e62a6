"""Fused SPMD train steps (supervised / semi-supervised U2PL).

Each step is ONE jitted shard_map program over the ("data",) mesh axis:
student forward+backward, EMA-teacher forwards (eval-mode pseudo-labeling
AND train-mode loss forward with SyncBN stat updates), on-device entropy
percentiles, strong augmentation, contrastive loss with ring-buffer queue
updates via a single fixed-shape all_gather, gradient pmean, torch-SGD
update, and the EMA parameter update.  The reference pays per step: batch
H2D, three np.percentile D2H syncs, ~num_classes pickled all_gathers, and
loss-item D2H (reference train_semi.py:272-592, SURVEY.md §3.1); here the
host only feeds batches and reads back logging scalars asynchronously.

Step anatomy mirrors reference train():234-592 line by line; quirks that
are reproduced on purpose:
  * teacher runs in train() mode (dropout ON, BN batch stats + running-stat
    updates) for the loss forward (train_semi.py:361-363) but eval() mode
    for pseudo-labels (:318);
  * during warmup a dummy train-mode teacher forward on the labeled batch
    keeps teacher BN running stats tracking labeled data (:303-304);
  * logged losses are psum'ed across replicas (reference all_reduce SUM
    without division, :550-561) while gradients are pmean'ed (DDP).
"""

from __future__ import annotations

import functools
import os
from typing import Callable, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P

from u2pl_tpu.config import Config
from u2pl_tpu.losses.ce import supervised_loss
from u2pl_tpu.losses.contrastive import compute_contra_memobank_loss
from u2pl_tpu.losses.ohem import ohem_supervised_loss
from u2pl_tpu.losses.unsup import compute_unsupervised_loss, teacher_entropy
from u2pl_tpu.ops.mixing import generate_unsup_data
from u2pl_tpu.ops.one_hot import label_onehot
from u2pl_tpu.ops.quantile import masked_percentiles
from u2pl_tpu.ops.resize import resize_bilinear, resize_nearest
from u2pl_tpu.train.lr import lr_at
from u2pl_tpu.train.optim import apply_updates_with_lr
from u2pl_tpu.train.state import TrainState

AXIS = "data"


def make_sup_loss_fn(cfg: Config) -> Callable:
    crit = cfg.criterion
    aux_w = cfg.net.aux_loss.loss_weight if cfg.net.aux_loss else 0.0
    ign = cfg.dataset.ignore_label
    if crit.type == "ohem":
        return functools.partial(
            ohem_supervised_loss,
            aux_weight=aux_w,
            thresh=crit.thresh,
            min_kept=crit.min_kept,
            ignore_label=ign,
            use_weight=crit.use_weight,
        )
    return functools.partial(
        supervised_loss, aux_weight=aux_w, ignore_label=ign, use_weight=crit.use_weight
    )


def _upsample(pred: jax.Array, hw: Tuple[int, int]) -> jax.Array:
    return resize_bilinear(pred, hw, align_corners=True)


def make_normalizer(cfg: Config) -> Callable:
    """On-device normalization for the uint8 H2D path
    (dataset.device_normalize): float batches pass through untouched."""
    mean = np.asarray(cfg.dataset.mean, np.float32)
    std = np.asarray(cfg.dataset.std, np.float32)

    def norm(img: jax.Array) -> jax.Array:
        if img.dtype == jnp.uint8:
            return (img.astype(jnp.float32) - mean) / std
        return img

    return norm


def _grad_metrics_and_update(
    cfg, tx, max_iter, steps_per_epoch, state, grads, axis_name
):
    grads = jax.lax.pmean(grads, axis_name)
    lr = lr_at(
        cfg.trainer.lr_scheduler,
        cfg.trainer.optimizer.lr,
        state.step,
        max_iter,
        steps_per_epoch,
    )
    updates, new_opt_state = tx.update(grads, state.opt_state, state.params)
    new_params = apply_updates_with_lr(state.params, updates, lr)
    return new_params, new_opt_state, lr


def make_sup_step(
    cfg: Config,
    model,
    tx,
    steps_per_epoch: int,
    mesh: Mesh,
) -> Callable:
    """Supervised baseline step (reference train_sup.py:177-251)."""
    max_iter = cfg.trainer.epochs * steps_per_epoch
    sup_loss_fn = make_sup_loss_fn(cfg)
    has_aux = cfg.net.aux_loss is not None

    normalize = make_normalizer(cfg)

    def step_fn(state: TrainState, image: jax.Array, label: jax.Array, rng):
        image = normalize(image)
        hw = label.shape[1:3]
        drop_rng = jax.random.fold_in(
            jax.random.fold_in(rng, jax.lax.axis_index(AXIS)), state.step
        )

        def loss_fn(params):
            outs, mut = model.apply(
                {"params": params, "batch_stats": state.batch_stats},
                image,
                train=True,
                mutable=["batch_stats"],
                rngs={"dropout": drop_rng},
            )
            pred = _upsample(outs["pred"], hw)
            aux = _upsample(outs["aux"], hw) if has_aux else None
            loss = sup_loss_fn(pred, label, aux)
            return loss, mut["batch_stats"]

        (loss, new_bs), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.params
        )
        new_params, new_opt_state, lr = _grad_metrics_and_update(
            cfg, tx, max_iter, steps_per_epoch, state, grads, AXIS
        )
        metrics = {
            "sup_loss": jax.lax.psum(loss, AXIS),
            "lr": lr,
        }
        new_state = state.replace(
            step=state.step + 1,
            params=new_params,
            batch_stats=new_bs,
            opt_state=new_opt_state,
        )
        return new_state, metrics

    sharded = jax.shard_map(
        step_fn,
        mesh=mesh,
        in_specs=(P(), P(AXIS), P(AXIS), P()),
        out_specs=(P(), P()),
        check_vma=False,
    )
    return jax.jit(sharded, donate_argnums=(0,))


def make_semi_warmup_step(
    cfg: Config,
    model,
    tx,
    steps_per_epoch: int,
    mesh: Mesh,
) -> Callable:
    """Warmup (epoch < sup_only_epoch) branch of the semi trainer
    (reference train_semi.py:288-307): supervised loss on the labeled
    batch + a dummy train-mode teacher forward that updates teacher BN
    running stats."""
    max_iter = cfg.trainer.epochs * steps_per_epoch
    sup_loss_fn = make_sup_loss_fn(cfg)
    has_aux = cfg.net.aux_loss is not None

    normalize = make_normalizer(cfg)

    def step_fn(state: TrainState, image_l, label_l, image_u, rng):
        image_l, image_u = normalize(image_l), normalize(image_u)
        hw = label_l.shape[1:3]
        dev_rng = jax.random.fold_in(
            jax.random.fold_in(rng, jax.lax.axis_index(AXIS)), state.step
        )
        k_drop, k_tdrop = jax.random.split(dev_rng)

        def loss_fn(params):
            outs, mut = model.apply(
                {"params": params, "batch_stats": state.batch_stats},
                image_l,
                train=True,
                mutable=["batch_stats"],
                rngs={"dropout": k_drop},
            )
            pred = _upsample(outs["pred"], hw)
            aux = _upsample(outs["aux"], hw) if has_aux else None
            loss = sup_loss_fn(pred, label_l, aux)
            return loss, mut["batch_stats"]

        (loss, new_bs), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.params
        )

        # dummy teacher forward, train mode: updates teacher BN stats only
        _, t_mut = model.apply(
            {
                "params": state.teacher_params,
                "batch_stats": state.teacher_batch_stats,
            },
            image_l,
            train=True,
            mutable=["batch_stats"],
            rngs={"dropout": k_tdrop},
        )

        new_params, new_opt_state, lr = _grad_metrics_and_update(
            cfg, tx, max_iter, steps_per_epoch, state, grads, AXIS
        )
        metrics = {
            "sup_loss": jax.lax.psum(loss, AXIS),
            "uns_loss": jnp.zeros(()),
            "con_loss": jnp.zeros(()),
            "lr": lr,
        }
        new_state = state.replace(
            step=state.step + 1,
            params=new_params,
            batch_stats=new_bs,
            opt_state=new_opt_state,
            teacher_batch_stats=t_mut["batch_stats"],
        )
        return new_state, metrics

    sharded = jax.shard_map(
        step_fn,
        mesh=mesh,
        in_specs=(P(), P(AXIS), P(AXIS), P(AXIS), P()),
        out_specs=(P(), P()),
        check_vma=False,
    )
    return jax.jit(sharded, donate_argnums=(0,))


def make_semi_step(
    cfg: Config,
    model,
    tx,
    steps_per_epoch: int,
    mesh: Mesh,
) -> Callable:
    """The full fused U2PL semi-supervised step
    (reference train_semi.py:308-548 + loss_helper.py)."""
    max_iter = cfg.trainer.epochs * steps_per_epoch
    epochs = cfg.trainer.epochs
    sup_only_epoch = cfg.trainer.sup_only_epoch
    sup_loss_fn = make_sup_loss_fn(cfg)
    has_aux = cfg.net.aux_loss is not None
    num_classes = cfg.net.num_classes
    ignore_label = cfg.dataset.ignore_label
    unsup_cfg = cfg.trainer.unsupervised
    contra_cfg = cfg.trainer.contrastive
    ema_decay_origin = cfg.net.ema_decay

    normalize = make_normalizer(cfg)

    def step_fn(state: TrainState, image_l, label_l, image_u, rng):
        image_l, image_u = normalize(image_l), normalize(image_u)
        b_l, h, w = label_l.shape
        hw = (h, w)
        i_iter = state.step
        epoch = (i_iter // steps_per_epoch).astype(jnp.float32)
        step_rng = jax.random.fold_in(rng, i_iter)
        dev_rng = jax.random.fold_in(step_rng, jax.lax.axis_index(AXIS))
        # ALL stochastic draws are per-replica, including the strong-aug
        # coin and the CutMix/Cutout box geometry: the reference draws them
        # from each rank's own RNG (train_semi.py:327 np.random per
        # process), so replicas must flip/aim independently
        k_drop, k_tdrop, k_contra, k_coin, k_mix = jax.random.split(dev_rng, 5)

        # ---- 1. pseudo-labels from the eval-mode teacher (:317-324) ----
        t_vars = {
            "params": state.teacher_params,
            "batch_stats": state.teacher_batch_stats,
        }
        pred_u_teacher = model.apply(t_vars, image_u, train=False)["pred"]
        # Upsampled teacher logits stay in the MODEL dtype (resize_bilinear
        # interpolates in f32 internally and casts back): under bf16 this
        # halves the largest live tensor in the step (513²x21 logits, 88 MB
        # f32 -> 44 MB) while f32 configs are bit-unchanged.  Reductions
        # below cast to f32 element-wise, which XLA fuses (no f32 copy in
        # HBM).
        pred_u_teacher = _upsample(pred_u_teacher, hw)
        pt32 = pred_u_teacher.astype(jnp.float32)
        # max softmax prob == exp(max logit - logsumexp): two reductions
        # instead of materializing the (B, H, W, C) softmax (~88 MB at
        # 513²/21c) just to take its max/argmax (reference :322-324)
        logits_u_aug = jnp.exp(pt32.max(axis=-1) - jax.nn.logsumexp(pt32, axis=-1))
        label_u_aug = pred_u_teacher.argmax(axis=-1).astype(jnp.int32)

        # ---- 2. strong augmentation, 50% coin (:326-337) ----
        if unsup_cfg.apply_aug:
            aug_img, aug_lab, aug_log = generate_unsup_data(
                k_mix,
                image_u,
                label_u_aug,
                logits_u_aug,
                mode=unsup_cfg.apply_aug,
                num_classes=num_classes,
                ignore_label=ignore_label,
            )
            coin = jax.random.uniform(k_coin, ()) < 0.5
            image_u_aug = jnp.where(coin, aug_img, image_u)
            label_u_aug = jnp.where(coin, aug_lab, label_u_aug)
            logits_u_aug = jnp.where(coin, aug_log, logits_u_aug)
        else:
            image_u_aug = image_u

        image_all = jnp.concatenate([image_l, image_u_aug], axis=0)

        # ---- teacher train-mode forward (:360-374), independent of params
        t_out, t_mut = model.apply(
            t_vars,
            image_all,
            train=True,
            mutable=["batch_stats"],
            rngs={"dropout": k_tdrop},
        )
        # Teacher outputs stay in MODEL dtype: under bf16 they were computed
        # in bf16 anyway, so a full-resolution f32 upcast adds no information
        # — only HBM traffic (pred 14 MB, rep 68 MB at os4).  Consumers that
        # reduce (softmax, entropy, contrastive accumulations) upcast
        # element-wise, which XLA fuses; f32 configs are bit-unchanged.
        pred_all_teacher = jax.lax.stop_gradient(t_out["pred"])
        rep_all_teacher = jax.lax.stop_gradient(t_out["rep"])
        prob_all_teacher = jax.nn.softmax(
            pred_all_teacher.astype(jnp.float32), axis=-1
        )
        prob_l_teacher = prob_all_teacher[:b_l]
        prob_u_teacher = prob_all_teacher[b_l:]
        pred_u_large_teacher = _upsample(pred_all_teacher[b_l:], hw)

        # ---- shared entropy machinery: ONE radix selection serves the
        # unsup drop percentile and both contrastive thresholds (the
        # reference pays three np.percentile host syncs; loss_helper.py:38,
        # train_semi.py:405,412).  masked_percentiles finds the exact order
        # statistics without sorting the ~1M-pixel entropy map — measured
        # 1.0 ms vs 2.8 ms for the masked-sort path at the flagship shape
        # (tools/bench_percentile.py), bit-identical selections ----
        entropy = teacher_entropy(pred_u_large_teacher)
        valid_u = label_u_aug != ignore_label

        # drop-percent annealing (:377-379)
        percent_unreliable = (100.0 - unsup_cfg.drop_percent) * (
            1.0 - epoch / epochs
        )
        drop_percent = 100.0 - percent_unreliable

        # ---- contrastive masks (:397-465), on-device percentiles ----
        contra_prep = None
        if contra_cfg is not None:
            alpha_t = contra_cfg.low_entropy_threshold * (1.0 - epoch / epochs)
            drop_thresh, low_thresh, high_thresh = masked_percentiles(
                entropy,
                valid_u,
                jnp.stack([drop_percent, alpha_t, 100.0 - alpha_t]),
            )
            low_entropy_mask = (entropy <= low_thresh) & valid_u
            high_entropy_mask = (entropy >= high_thresh) & valid_u

            lab_valid = (label_l != ignore_label).astype(jnp.float32)[..., None]
            low_mask_all = jnp.concatenate(
                [lab_valid, low_entropy_mask.astype(jnp.float32)[..., None]], 0
            )
            if contra_cfg.negative_high_entropy:
                high_u = high_entropy_mask.astype(jnp.float32)[..., None]
            else:
                high_u = jnp.ones_like(high_entropy_mask, jnp.float32)[..., None]
            high_mask_all = jnp.concatenate([lab_valid, high_u], 0)

            small_hw = (pred_all_teacher.shape[1], pred_all_teacher.shape[2])
            low_mask_small = resize_nearest(low_mask_all, small_hw)
            high_mask_small = resize_nearest(high_mask_all, small_hw)
            # one-hot AFTER the nearest resize: nearest is a pure index
            # gather, so onehot(resize(x)) == resize(onehot(x)) exactly —
            # skips materializing two (B, H, W, C) f32 one-hots (~88 MB
            # each at 513²/21c) that the reference builds at full res
            # (train_semi.py:427-437)
            label_l_small = label_onehot(
                resize_nearest(label_l, small_hw), num_classes, ignore_label
            )
            label_u_small = label_onehot(
                resize_nearest(label_u_aug, small_hw), num_classes, ignore_label
            )
            contra_prep = (
                label_l_small,
                label_u_small,
                low_mask_small,
                high_mask_small,
            )
        else:
            (drop_thresh,) = masked_percentiles(
                entropy, valid_u, jnp.stack([drop_percent])
            )

        # CE-tail rematerialisation (U2PL_CE_REMAT=1): the sup/unsup CE
        # tails upsample os4 logits to (B, 513, 513, C) and the softmax/CE
        # intermediates at that size (~88 MB f32 each at the flagship
        # shape) otherwise stay resident in the grad graph between forward
        # and backward.  The tails are pure functions of SMALL os4 inputs,
        # so jax.checkpoint recomputes them during backward instead of
        # keeping the full-resolution residuals in HBM.
        remat_tails = os.environ.get("U2PL_CE_REMAT", "0") == "1"

        def sup_tail(pred_small, aux_small, label):
            pred = _upsample(pred_small, hw)
            aux = _upsample(aux_small, hw) if aux_small is not None else None
            return sup_loss_fn(pred, label, aux)

        def unsup_tail(pred_small, label_u, pt_large, ent, thr):
            return compute_unsupervised_loss(
                _upsample(pred_small, hw),
                label_u,
                drop_percent,
                pt_large,
                ignore_label,
                entropy=ent,
                thresh=thr,
            )

        if remat_tails:
            sup_tail = jax.checkpoint(sup_tail)
            unsup_tail = jax.checkpoint(unsup_tail)

        def loss_fn(params):
            outs, mut = model.apply(
                {"params": params, "batch_stats": state.batch_stats},
                image_all,
                train=True,
                mutable=["batch_stats"],
                rngs={"dropout": k_drop},
            )
            pred_all, rep_all = outs["pred"], outs["rep"]

            aux_small = outs["aux"][:b_l] if has_aux else None
            sup_loss = sup_tail(pred_all[:b_l], aux_small, label_l)

            unsup_loss = (
                unsup_tail(
                    pred_all[b_l:],
                    label_u_aug,
                    pred_u_large_teacher,
                    entropy,
                    drop_thresh,
                )
                * unsup_cfg.loss_weight
            )

            new_bank, new_proto = state.bank, state.prototype
            if contra_cfg is not None:
                label_l_small, label_u_small, low_m, high_m = contra_prep
                res = compute_contra_memobank_loss(
                    rep_all,
                    label_l_small,
                    label_u_small,
                    prob_l_teacher,
                    prob_u_teacher,
                    low_m,
                    high_m,
                    contra_cfg,
                    state.bank,
                    rep_all_teacher,
                    k_contra,
                    axis_name=AXIS,
                    prototype=state.prototype if contra_cfg.anchor_ema else None,
                    i_iter=i_iter,
                    return_info=True,
                )
                if contra_cfg.anchor_ema:
                    new_proto, new_bank, contra_loss, contra_info = res
                else:
                    new_bank, contra_loss, contra_info = res
                contra_loss = contra_loss * contra_cfg.loss_weight
                neg_cand = contra_info["neg_candidates"]
            else:
                contra_loss = jnp.zeros(())
                neg_cand = jnp.zeros((num_classes,), jnp.int32)

            total = sup_loss + unsup_loss + contra_loss
            return total, (
                mut["batch_stats"],
                new_bank,
                new_proto,
                sup_loss,
                unsup_loss,
                contra_loss,
                neg_cand,
            )

        (_, aux_out), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.params
        )
        (
            new_bs,
            new_bank,
            new_proto,
            sup_loss,
            unsup_loss,
            contra_loss,
            neg_cand,
        ) = aux_out

        new_params, new_opt_state, lr = _grad_metrics_and_update(
            cfg, tx, max_iter, steps_per_epoch, state, grads, AXIS
        )

        # ---- EMA teacher update (:530-548), parameters only ----
        ema_decay = jnp.minimum(
            1.0
            - 1.0
            / (
                i_iter.astype(jnp.float32)
                - steps_per_epoch * sup_only_epoch
                + 1.0
            ),
            ema_decay_origin,
        )
        # Reference quirk (train_semi.py:309-315 + :542-547): every step of
        # the FIRST semi epoch re-runs the student->teacher copy as
        # `t.data = s.data`, which ALIASES teacher params to student
        # storage; optimizer.step() then mutates them in place, so the EMA
        # blend reads d*s_new + (1-d)*s_new and the teacher leaves every
        # step of that epoch exactly equal to the post-step student.
        # Reproduce by forcing decay 0 for that epoch (the driver's
        # pre-step copy already gives the pseudo-label forwards the
        # pre-step student, like the aliased reference teacher).
        ema_decay = jnp.where(
            i_iter // steps_per_epoch == sup_only_epoch, 0.0, ema_decay
        )
        new_teacher = jax.tree_util.tree_map(
            lambda t, s: ema_decay * t + (1.0 - ema_decay) * s,
            state.teacher_params,
            new_params,
        )

        metrics = {
            "sup_loss": jax.lax.psum(sup_loss, AXIS),
            "uns_loss": jax.lax.psum(unsup_loss, AXIS),
            "con_loss": jax.lax.psum(contra_loss, AXIS),
            "lr": lr,
            # worst per-device negative-candidate count per class this step
            # (pre-cap); sizes contrastive.max_keys_per_class_per_step
            "neg_cand": jax.lax.pmax(neg_cand, AXIS),
            # entropy-gate telemetry (mean of the per-device thresholds —
            # like the reference, each replica gates on its own batch's
            # percentiles): dtype-sensitivity tracking for tools/ab_bf16.py
            "drop_thresh": jax.lax.pmean(drop_thresh, AXIS),
        }
        if contra_cfg is not None:
            metrics["low_thresh"] = jax.lax.pmean(low_thresh, AXIS)
            metrics["high_thresh"] = jax.lax.pmean(high_thresh, AXIS)
        new_state = state.replace(
            step=i_iter + 1,
            params=new_params,
            batch_stats=new_bs,
            opt_state=new_opt_state,
            teacher_params=new_teacher,
            teacher_batch_stats=t_mut["batch_stats"],
            bank=new_bank,
            prototype=new_proto,
        )
        return new_state, metrics

    sharded = jax.shard_map(
        step_fn,
        mesh=mesh,
        in_specs=(P(), P(AXIS), P(AXIS), P(AXIS), P()),
        out_specs=(P(), P()),
        check_vma=False,
    )
    return jax.jit(sharded, donate_argnums=(0,))
