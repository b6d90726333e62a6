"""Long-horizon convergence-equivalence harness, shared by
tests/test_convergence.py (slow tier) and tools/convergence_ab.py (the
docs/ACCURACY.md artifact generator).

The golden step/trajectory tests pin the first steps bit-tight; this
harness answers the complementary question — do the two frameworks
*converge to the same place*?  Both sides start from converter-synced
weights and consume the IDENTICAL deterministic batch sequence from a
small learnable synthetic pool, but each uses its OWN stochastic
machinery (dropout masks, contrastive anchor/negative sampling, key
subset selection) — no determinism patches.  After a few hundred steps
the comparison is the final train-set mIoU of each framework's student
(and the loss trajectories), which is robust to the per-pixel gate chaos
that makes long bitwise trajectories meaningless (see
test_golden_trajectory.py's module docstring).

Reference loop glue: train_semi.py:272-592 (warmup branch :287-306, semi
branch :308-548, epoch-1 aliasing copy :309-315, post-step EMA :549-561).
"""

from __future__ import annotations

import numpy as np

C = 5
HW = 65
BL = BU = 2
QSIZE = 4096
CAP = 2048
LR0 = 0.01


# --------------------------- data ------------------------------------------


def make_pool(seed: int, n_labeled: int, n_unlabeled: int):
    """Learnable synthetic segmentation pool: coarse random class regions
    (5x5 grid -> 13x upsampled), each class rendered with a distinct color
    plus pixel noise.  A small net reaches high train mIoU quickly, so
    final-accuracy comparison is meaningful."""
    rng = np.random.RandomState(seed)
    n = n_labeled + n_unlabeled
    coarse = rng.randint(0, C, (n, 5, 5))
    lab = np.kron(coarse, np.ones((13, 13), np.int64))[:, :HW, :HW]
    palette = rng.rand(C, 3) * 2.0 - 1.0
    img = (palette[lab] + rng.randn(n, HW, HW, 3) * 0.15).astype(np.float32)
    lab = lab.astype(np.int64)
    return (
        img[:n_labeled],
        lab[:n_labeled],
        img[n_labeled:],
        lab[n_labeled:],  # held-back ground truth of the unlabeled pool
    )


def batch_at(i: int, img_l, lab_l, img_u):
    """Deterministic cycling batches — the identical sequence both
    frameworks consume."""
    nl, nu = len(img_l), len(img_u)
    li = [(i * BL + j) % nl for j in range(BL)]
    ui = [(i * BU + j) % nu for j in range(BU)]
    return img_l[li], lab_l[li], img_u[ui]


def _raw_cfg(variant: str, epochs: int, spe: int):
    raw = {
        "dataset": {"type": "pascal_semi", "batch_size": BL, "n_sup": 64,
                    "ignore_label": 255},
        "criterion": {"type": "CELoss", "kwargs": {}},
        "trainer": {
            "epochs": epochs,
            "sup_only_epoch": 1,
            "optimizer": {
                "type": "SGD",
                "kwargs": {"lr": LR0, "momentum": 0.9, "weight_decay": 0.0001},
            },
            "lr_scheduler": {"mode": "poly", "kwargs": {"power": 0.9}},
            "unsupervised": {"drop_percent": 80},  # no apply_aug: coin skipped
            "contrastive": {
                "negative_high_entropy": True,
                "low_rank": 1,
                "high_rank": 3,
                "current_class_threshold": 0.3,
                "current_class_negative_threshold": 1,
                "low_entropy_threshold": 20,
                "num_negatives": 4,
                "num_queries": 8,
                "temperature": 0.5,
                "max_keys_per_class_per_step": CAP,
            },
        },
        "net": {
            "num_classes": C,
            "sync_bn": False,
            "ema_decay": 0.99,
            "encoder": {
                "type": "u2pl.models.resnet.resnet50",
                "kwargs": {
                    "pretrained": False,
                    "multi_grid": True,
                    "zero_init_residual": True,
                    "fpn": True,
                    "replace_stride_with_dilation": [False, True, True],
                },
            },
            "decoder": {
                "type": "u2pl.models.decoder.dec_deeplabv3_plus",
                "kwargs": {"inner_planes": 64, "dilations": [2, 4, 6]},
            },
        },
    }
    if variant == "city":
        # the cityscapes family: OHEM + aux head; thresh chosen so the
        # min_kept threshold BINDS at random init (see
        # test_golden_trajectory.py).  aux_plane must equal the encoder's
        # layer3 width (1024 for resnet50) — the reference's Aux_Module
        # takes it as in_planes (model_helper.py:23-24)
        raw["net"]["aux_loss"] = {"aux_plane": 1024, "loss_weight": 0.4}
        raw["criterion"] = {"type": "ohem",
                            "kwargs": {"thresh": 0.05, "min_kept": 2000}}
    return raw


# --------------------------- mIoU ------------------------------------------


def miou_np(preds: np.ndarray, labels: np.ndarray) -> float:
    inter = np.zeros(C)
    union = np.zeros(C)
    for c in range(C):
        p = preds == c
        t = labels == c
        inter[c] += (p & t).sum()
        union[c] += (p | t).sum()
    present = union > 0
    return float((inter[present] / union[present]).mean())


# --------------------------- our side --------------------------------------


def run_ours(variant: str, pool, n_steps: int, spe: int, student, teacher,
             record=None, key_seed: int = 7):
    """Run n_steps of OUR trainer (real RNG) from converter-synced torch
    weights; returns (final TrainState, per-step loss dict list)."""
    import jax
    import jax.numpy as jnp

    from u2pl_tpu.config import parse_config
    from u2pl_tpu.dist import make_mesh
    from u2pl_tpu.memobank import init_memobank
    from u2pl_tpu.models import build_model
    from u2pl_tpu.train.optim import make_optimizer
    from u2pl_tpu.train.state import TrainState, copy_student_to_teacher
    from u2pl_tpu.train.steps import make_semi_step, make_semi_warmup_step
    from u2pl_tpu.utils.convert_torch import torch_to_flax

    img_l, lab_l, img_u, _ = pool
    epochs = n_steps // spe
    raw = _raw_cfg(variant, epochs, spe)
    cfg = parse_config(raw)
    model = build_model(cfg.net, axis_name="data")
    dummy = build_model(cfg.net, axis_name=None)
    variables = dummy.init(
        jax.random.PRNGKey(0), jnp.zeros((1, HW, HW, 3)), train=False
    )
    tx = make_optimizer(cfg.trainer.optimizer, variables["params"], 10.0)
    sv = torch_to_flax(student.state_dict(), variables)
    tv = torch_to_flax(teacher.state_dict(), variables)
    sv = jax.tree_util.tree_map(jnp.asarray, sv)
    tv = jax.tree_util.tree_map(jnp.asarray, tv)
    bank = init_memobank(C, 256, queue_size=QSIZE, class0_size=QSIZE,
                         dtype=jnp.float32)
    state = TrainState(
        step=jnp.asarray(0, jnp.int32),
        params=sv["params"],
        batch_stats=sv["batch_stats"],
        opt_state=tx.init(sv["params"]),
        teacher_params=tv["params"],
        teacher_batch_stats=tv["batch_stats"],
        bank=bank,
        prototype=jnp.zeros((C, 8, 1, 256)),
    )

    mesh = make_mesh(1)
    warmup_step = make_semi_warmup_step(cfg, model, tx, spe, mesh)
    semi_step = make_semi_step(cfg, model, tx, spe, mesh)
    key = jax.random.PRNGKey(key_seed)
    losses = []
    sup_only = cfg.trainer.sup_only_epoch
    for i in range(n_steps):
        epoch = i // spe
        bi, bl, bu = batch_at(i, img_l, lab_l, img_u)
        if epoch == sup_only and i % spe == 0:
            state = copy_student_to_teacher(state)
        step_fn = warmup_step if epoch < sup_only else semi_step
        state, metrics = step_fn(
            state,
            jnp.asarray(bi),
            jnp.asarray(bl.astype(np.int32)),
            jnp.asarray(bu),
            jax.random.fold_in(key, i),
        )
        m = jax.device_get(metrics)
        # scalars only: the semi step also emits per-class telemetry
        # vectors (neg_cand) that don't belong in a loss trajectory
        losses.append(
            {k: float(np.asarray(v)) for k, v in m.items()
             if np.asarray(v).size == 1}
        )
        if record is not None:
            record(i, losses[-1])

    # train-pool predictions (eval mode, student weights)
    def predict(imgs):
        out = []
        v = {"params": state.params, "batch_stats": state.batch_stats}
        from u2pl_tpu.ops.resize import resize_bilinear

        for k in range(0, len(imgs), 4):
            pred = dummy.apply(v, jnp.asarray(imgs[k : k + 4]), train=False)[
                "pred"
            ]
            pred = resize_bilinear(pred, (HW, HW))
            out.append(np.asarray(jnp.argmax(pred, -1)))
        return np.concatenate(out)

    return state, losses, predict


# --------------------------- torch side -------------------------------------


def make_torch_models(variant: str, epochs: int, spe: int):
    import sys

    sys.path.insert(0, "/root/repo/tests")
    from ref_oracle import init_gloo, setup_reference

    setup_reference()
    init_gloo()
    import torch

    from u2pl.models.model_helper import ModelBuilder

    raw = _raw_cfg(variant, epochs, spe)

    def _randomize(model, seed):
        g = torch.Generator().manual_seed(seed)
        sd = model.state_dict()
        for k, v in sd.items():
            if v.dtype.is_floating_point:
                if "running_var" in k:
                    sd[k] = torch.rand(v.shape, generator=g) + 0.5
                else:
                    sd[k] = torch.randn(v.shape, generator=g) * 0.05
        model.load_state_dict(sd)
        return model

    student = _randomize(ModelBuilder(raw["net"]), seed=0)
    teacher = _randomize(ModelBuilder(raw["net"]), seed=1)
    for p in teacher.parameters():
        p.requires_grad = False
    return raw, student, teacher


def run_torch(variant: str, pool, n_steps: int, spe: int, raw, student,
              teacher, record=None, seed: int = 11):
    """The faithful reference loop (train_semi.py:272-592) with torch's own
    RNG; returns (student, teacher, per-step loss list, predict fn)."""
    import torch
    import torch.nn.functional as F

    import u2pl.utils.loss_helper as lh
    from u2pl.utils.utils import label_onehot

    img_l_pool, lab_l_pool, img_u_pool, _ = pool
    epochs = n_steps // spe
    sup_only = raw["trainer"]["sup_only_epoch"]
    sup_loss_fn = lh.get_criterion(raw)
    groups = [
        dict(params=list(student.encoder.parameters()), lr=LR0),
        dict(params=list(student.decoder.parameters()), lr=LR0 * 10),
    ]
    optimizer = torch.optim.SGD(
        groups, lr=LR0, momentum=0.9, weight_decay=0.0001
    )

    memobank, queue_ptrlis, queue_size = [], [], []
    for _ in range(C):
        memobank.append([torch.zeros(0, 256)])
        queue_ptrlis.append(torch.zeros(1, dtype=torch.long))
        queue_size.append(QSIZE)

    def nchw(a):
        return torch.from_numpy(np.ascontiguousarray(a.transpose(0, 3, 1, 2)))

    torch.manual_seed(seed)
    losses = []
    for i in range(n_steps):
        factor = (1.0 - i / n_steps) ** 0.9
        for group, base in zip(optimizer.param_groups, (LR0, LR0 * 10)):
            group["lr"] = base * factor
        epoch = i // spe
        img_l_np, lab_l_np, img_u_np = batch_at(
            i, img_l_pool, lab_l_pool, img_u_pool
        )
        image_l, label_l = nchw(img_l_np), torch.from_numpy(lab_l_np)
        image_u = nchw(img_u_np)
        h = w = HW

        if epoch < sup_only:
            student.train()
            outs = student(image_l)
            pred = F.interpolate(outs["pred"], (h, w), mode="bilinear",
                                 align_corners=True)
            if "aux_loss" in raw["net"]:
                aux = F.interpolate(outs["aux"], (h, w), mode="bilinear",
                                    align_corners=True)
                sup_loss = sup_loss_fn([pred, aux], label_l.clone())
            else:
                sup_loss = sup_loss_fn(pred, label_l.clone())
            teacher.train()
            with torch.no_grad():
                _ = teacher(image_l)
            loss = sup_loss
            optimizer.zero_grad()
            loss.backward()
            optimizer.step()
            losses.append({"sup_loss": float(sup_loss), "uns_loss": 0.0,
                           "con_loss": 0.0})
            if record is not None:
                record(i, losses[-1])
            continue

        if epoch == sup_only:
            with torch.no_grad():
                for t_params, s_params in zip(
                    teacher.parameters(), student.parameters()
                ):
                    t_params.data = s_params.data

        student.train()
        teacher.eval()
        with torch.no_grad():
            pred_u_teacher = teacher(image_u)["pred"]
            pred_u_teacher = F.interpolate(
                pred_u_teacher, (h, w), mode="bilinear", align_corners=True
            )
            pred_u_teacher = F.softmax(pred_u_teacher, dim=1)
            logits_u_aug, label_u_aug = torch.max(pred_u_teacher, dim=1)

        num_labeled = len(image_l)
        image_all = torch.cat((image_l, image_u))
        outs = student(image_all)
        pred_all, rep_all = outs["pred"], outs["rep"]
        pred_l_large = F.interpolate(
            pred_all[:num_labeled], size=(h, w), mode="bilinear",
            align_corners=True,
        )
        pred_u_large = F.interpolate(
            pred_all[num_labeled:], size=(h, w), mode="bilinear",
            align_corners=True,
        )
        if "aux_loss" in raw["net"]:
            aux = F.interpolate(
                outs["aux"][:num_labeled], (h, w), mode="bilinear",
                align_corners=True,
            )
            sup_loss = sup_loss_fn([pred_l_large, aux], label_l.clone())
        else:
            sup_loss = sup_loss_fn(pred_l_large, label_l.clone())

        teacher.train()
        with torch.no_grad():
            out_t = teacher(image_all)
            pred_all_teacher, rep_all_teacher = out_t["pred"], out_t["rep"]
            prob_all_teacher = F.softmax(pred_all_teacher, dim=1)
            prob_l_teacher = prob_all_teacher[:num_labeled]
            prob_u_teacher = prob_all_teacher[num_labeled:]
            pred_u_large_teacher = F.interpolate(
                pred_all_teacher[num_labeled:], size=(h, w), mode="bilinear",
                align_corners=True,
            )

        drop_percent = raw["trainer"]["unsupervised"]["drop_percent"]
        percent_unreliable = (100 - drop_percent) * (1 - epoch / epochs)
        drop_percent = 100 - percent_unreliable
        unsup_loss = lh.compute_unsupervised_loss(
            pred_u_large, label_u_aug.clone(), drop_percent,
            pred_u_large_teacher.detach(),
        )

        cfg_contra = raw["trainer"]["contrastive"]
        alpha_t = cfg_contra["low_entropy_threshold"] * (1 - epoch / epochs)
        with torch.no_grad():
            prob = torch.softmax(pred_u_large_teacher, dim=1)
            entropy = -torch.sum(prob * torch.log(prob + 1e-10), dim=1)
            low_thresh = np.percentile(
                entropy[label_u_aug != 255].cpu().numpy().flatten(), alpha_t
            )
            low_entropy_mask = (
                entropy.le(low_thresh).float() * (label_u_aug != 255).bool()
            )
            high_thresh = np.percentile(
                entropy[label_u_aug != 255].cpu().numpy().flatten(),
                100 - alpha_t,
            )
            high_entropy_mask = (
                entropy.ge(high_thresh).float() * (label_u_aug != 255).bool()
            )
            low_mask_all = torch.cat(
                ((label_l.unsqueeze(1) != 255).float(),
                 low_entropy_mask.unsqueeze(1))
            )
            low_mask_all = F.interpolate(
                low_mask_all, size=pred_all.shape[2:], mode="nearest"
            )
            high_mask_all = torch.cat(
                ((label_l.unsqueeze(1) != 255).float(),
                 high_entropy_mask.unsqueeze(1))
            )
            high_mask_all = F.interpolate(
                high_mask_all, size=pred_all.shape[2:], mode="nearest"
            )
            label_l_small = F.interpolate(
                label_onehot(label_l, C), size=pred_all.shape[2:],
                mode="nearest",
            )
            label_u_small = F.interpolate(
                label_onehot(label_u_aug, C), size=pred_all.shape[2:],
                mode="nearest",
            )

        _, contra_loss = lh.compute_contra_memobank_loss(
            rep_all,
            label_l_small.long(),
            label_u_small.long(),
            prob_l_teacher.detach(),
            prob_u_teacher.detach(),
            low_mask_all,
            high_mask_all,
            cfg_contra,
            memobank,
            queue_ptrlis,
            queue_size,
            rep_all_teacher.detach(),
        )

        loss = sup_loss + unsup_loss + contra_loss
        optimizer.zero_grad()
        loss.backward()
        optimizer.step()

        with torch.no_grad():
            ema_decay = min(1 - 1 / (i - spe * sup_only + 1), 0.99)
            for t_params, s_params in zip(
                teacher.parameters(), student.parameters()
            ):
                t_params.data = (
                    ema_decay * t_params.data + (1 - ema_decay) * s_params.data
                )
        losses.append({"sup_loss": float(sup_loss),
                       "uns_loss": float(unsup_loss),
                       "con_loss": float(contra_loss)})
        if record is not None:
            record(i, losses[-1])

    def predict(imgs):
        import torch

        student.eval()
        out = []
        with torch.no_grad():
            for k in range(0, len(imgs), 4):
                pred = student(nchw(imgs[k : k + 4]))["pred"]
                pred = F.interpolate(pred, (HW, HW), mode="bilinear",
                                     align_corners=True)
                out.append(pred.argmax(1).numpy())
        return np.concatenate(out)

    return student, teacher, losses, predict
