"""Whole-step golden parity vs the reference PyTorch trainer.

The strongest trainability evidence obtainable without real data: ONE full
semi-supervised U2PL step (reference train_semi.py:308-548) and one warmup
step (:288-307) are executed in BOTH frameworks from converter-synced
weights on an identical batch, and the sup/unsup/contrastive losses plus
the post-step student params, EMA-teacher params, and teacher BN running
stats are compared.  This composes the parity of everything the
per-component oracle tests check in isolation: percentile gating x loss
weights x optimizer (head x10, poly LR, momentum, weight decay) x EMA.

Stochastic elements are pinned identically on both sides so values are
comparable:
  * dropout is neutralized (torch Dropout2d p=0; flax Dropout patched to
    identity) — dropout masks are framework RNG and can never match;
  * the strong-aug coin is avoided by omitting `apply_aug` (reference
    :326-337 skips generate_unsup_data when the config key is absent);
  * contrastive anchor/negative sampling is patched ON BOTH SIDES to the
    same deterministic "cycling" scheme (index j picks candidate j mod n,
    in flattened pixel / queue order), and per-step key selection to
    "first-k in pixel order", which equals the reference's unbounded
    enqueue order (loss_helper.py:142-150) when the cap exceeds the
    candidate count.

Residual differences are conv reduction-order float noise (XLA vs ATen),
so tolerances are small-relative, not bit-exact.
"""

import os
import sys

import numpy as np
import pytest

REF = "/root/reference"
pytestmark = [
    pytest.mark.slow,
    pytest.mark.skipif(
        not os.path.isdir(os.path.join(REF, "u2pl")),
        reason="reference not mounted",
    ),
]

torch = pytest.importorskip("torch")

import flax.linen as fnn  # noqa: E402
import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from ref_oracle import init_gloo, setup_reference  # noqa: E402

from u2pl_tpu.config import parse_config  # noqa: E402
from u2pl_tpu.dist import make_mesh  # noqa: E402
from u2pl_tpu.memobank import MemoryBank, init_memobank  # noqa: E402
from u2pl_tpu.models import build_model  # noqa: E402
from u2pl_tpu.train.optim import make_optimizer  # noqa: E402
from u2pl_tpu.train.state import TrainState  # noqa: E402
from u2pl_tpu.train.steps import make_semi_step, make_semi_warmup_step  # noqa: E402
from u2pl_tpu.utils.convert_torch import torch_to_flax  # noqa: E402

C = 5
HW = 65
BL = BU = 2
SPE = 10  # steps per epoch
EPOCHS = 4
MAX_ITER = EPOCHS * SPE
LR0 = 0.01
CAP = 2048  # per-step key cap, far above any candidate count at 17x17 rep
QSIZE = 4096  # queue size (both classes incl. 0, both frameworks)


def _raw_cfg():
    return {
        "dataset": {
            "type": "pascal_semi",
            "batch_size": BL,
            "n_sup": 64,
            "ignore_label": 255,
        },
        "criterion": {"type": "CELoss", "kwargs": {}},
        "trainer": {
            "epochs": EPOCHS,
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
            "sync_bn": False,  # single process; plain train-mode BN
            "ema_decay": 0.99,
            "encoder": {
                # resnet50: the smallest reference encoder that supports
                # dilated stages (BasicBlock forbids dilation>1)
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


def _zero_dropout(model):
    for m in model.modules():
        if isinstance(m, (torch.nn.Dropout2d, torch.nn.Dropout)):
            m.p = 0.0


def _poly_lr(i_iter):
    return LR0 * (1.0 - i_iter / MAX_ITER) ** 0.9


def _torch_models(raw=None):
    setup_reference()
    init_gloo()
    from u2pl.models.model_helper import ModelBuilder

    raw = _raw_cfg() if raw is None else raw
    student = _randomize(ModelBuilder(raw["net"]), seed=0)
    teacher = _randomize(ModelBuilder(raw["net"]), seed=1)
    _zero_dropout(student)
    _zero_dropout(teacher)
    for p in teacher.parameters():
        p.requires_grad = False
    return raw, student, teacher


def _make_optimizer_torch(raw, student):
    # backbone lr x1, head lr x10 on pascal (reference train_semi.py:81-112)
    groups = [
        dict(params=list(student.encoder.parameters()), lr=LR0),
        dict(params=list(student.decoder.parameters()), lr=LR0 * 10),
    ]
    return torch.optim.SGD(groups, lr=LR0, momentum=0.9, weight_decay=0.0001)


def _set_poly_lr(optimizer, i_iter):
    factor = (1.0 - i_iter / MAX_ITER) ** 0.9
    for group, base in zip(optimizer.param_groups, (LR0, LR0 * 10)):
        group["lr"] = base * factor


def _batch(seed):
    rng = np.random.RandomState(seed)
    img_l = (rng.randn(BL, HW, HW, 3) * 0.7).astype(np.float32)
    lab_l = rng.randint(0, C, (BL, HW, HW)).astype(np.int64)
    lab_l[:, :5] = 255  # some ignored rows
    img_u = (rng.randn(BU, HW, HW, 3) * 0.7).astype(np.float32)
    return img_l, lab_l, img_u


def _flax_state(cfg, model, tx, student, teacher, i_iter):
    variables = model.init(
        jax.random.PRNGKey(0), jnp.zeros((1, HW, HW, 3)), train=False
    )
    sv = torch_to_flax(student.state_dict(), variables)
    tv = torch_to_flax(teacher.state_dict(), variables)
    sv = jax.tree_util.tree_map(jnp.asarray, sv)
    tv = jax.tree_util.tree_map(jnp.asarray, tv)
    bank = init_memobank(C, 256, queue_size=QSIZE, class0_size=QSIZE,
                         dtype=jnp.float32)
    return TrainState(
        step=jnp.asarray(i_iter, jnp.int32),
        params=sv["params"],
        batch_stats=sv["batch_stats"],
        opt_state=tx.init(sv["params"]),
        teacher_params=tv["params"],
        teacher_batch_stats=tv["batch_stats"],
        bank=bank,
        prototype=jnp.zeros((C, 8, 1, 256)),
    )


def _patch_ours_deterministic(mp):
    """Patch our jitted samplers to the cycling/first-k scheme (see module
    docstring); must be installed before make_semi_step traces."""
    import u2pl_tpu.losses.contrastive as con

    def det_sample_with_replacement(mask, rng, num):
        cs = jnp.cumsum(mask.astype(jnp.int32))
        n = cs[-1]
        r = jnp.arange(num, dtype=jnp.int32) % jnp.maximum(n, 1)
        idx = jnp.searchsorted(cs, r + 1, side="left")
        return jnp.clip(idx, 0, mask.shape[0] - 1), n

    def det_select_keys(mask, rng, k, lowering="argsort"):
        npix = mask.shape[0]
        pri = jnp.where(mask, jnp.arange(npix, dtype=jnp.float32), jnp.inf)
        order = jnp.argsort(pri)
        idx = order[: min(k, npix)]
        if idx.shape[0] < k:
            idx = jnp.concatenate(
                [idx, jnp.zeros((k - idx.shape[0],), idx.dtype)]
            )
        valid = jnp.arange(k) < jnp.minimum(mask.sum(), k)
        return idx, valid

    def det_bank_sample(bank: MemoryBank, rng, num_samples, dtype=jnp.float32):
        c = bank.keys.shape[0]
        occ = jnp.maximum(bank.occupancy, 1)
        idx = (
            jnp.arange(num_samples, dtype=jnp.int32)[None, :] % occ[:, None]
        )
        samples = jnp.take_along_axis(bank.keys, idx[:, :, None], axis=1)
        if dtype is not None:
            samples = samples.astype(dtype)
        return samples, bank.occupancy > 0

    mp.setattr(con, "_sample_with_replacement", det_sample_with_replacement)
    mp.setattr(con, "_select_keys", det_select_keys)
    mp.setattr(con, "sample", det_bank_sample)
    # flax dropout -> identity (torch side runs with p=0)
    mp.setattr(fnn.Dropout, "__call__", lambda self, x, **kw: x)


def _patch_torch_randint(mp):
    def cycling_randint(high, size=None, **kw):
        n = int(np.prod(size))
        return (torch.arange(n) % int(high)).reshape(size)

    mp.setattr(torch, "randint", cycling_randint)


def _nchw(x):
    return torch.from_numpy(x).permute(0, 3, 1, 2).contiguous()


def _delta_close(a, b, name):
    """Param-update comparison robust to f32 cancellation noise: the
    tensor-level L2 agreement is the primary check (catches wrong signs,
    missing loss terms, wrong lr/wd/momentum at a glance), with a loose
    element-wise backstop against single-element blowups.  Individual
    elements of conv/BN grads are sums of thousands of cancellation-heavy
    f32 products; XLA-vs-ATen reassociation legitimately shifts tiny
    elements by tens of percent while the tensor as a whole agrees to <2%."""
    a, b = np.asarray(a), np.asarray(b)
    nb = np.linalg.norm(b)
    diff = np.linalg.norm(a - b)
    assert diff <= 0.05 * max(nb, 1e-12), (
        f"{name}: delta L2 mismatch {diff:.3e} vs ||ref||={nb:.3e}"
    )
    np.testing.assert_allclose(
        a, b, rtol=0.1, atol=0.25 * max(np.abs(b).max(), 1e-12),
        err_msg=f"{name} (element backstop)",
    )


def _assert_tree_close(ours, ref_sd, variables_template, what, rtol, atol_frac):
    """Compare a flax tree against a torch state_dict via the converter's
    translation (convert the torch dict and diff tree-to-tree)."""
    ref_tree = torch_to_flax(ref_sd, variables_template)
    flat_ours = jax.tree_util.tree_leaves_with_path(ours)
    ref_by_path = {
        jax.tree_util.keystr(p): v
        for p, v in jax.tree_util.tree_leaves_with_path(ref_tree)
    }
    assert flat_ours, what
    for path, got in flat_ours:
        key = jax.tree_util.keystr(path)
        want = np.asarray(ref_by_path[key])
        got = np.asarray(got)
        scale = np.abs(want).max()
        np.testing.assert_allclose(
            got, want, rtol=rtol, atol=atol_frac * max(scale, 1e-8),
            err_msg=f"{what}:{key}",
        )


@pytest.fixture(scope="module")
def golden():
    raw, student, teacher = _torch_models()
    cfg = parse_config(raw)
    model = build_model(cfg.net, axis_name="data")
    dummy = build_model(cfg.net, axis_name=None)
    variables = dummy.init(
        jax.random.PRNGKey(0), jnp.zeros((1, HW, HW, 3)), train=False
    )
    tx = make_optimizer(
        cfg.trainer.optimizer, variables["params"], head_lr_multiplier=10.0
    )
    return raw, cfg, student, teacher, model, dummy, tx, variables


def test_one_semi_step_golden(golden):
    raw, cfg, student, teacher, model, dummy, tx, variables = golden
    import torch.nn.functional as F

    import u2pl.utils.loss_helper as lh
    from u2pl.utils.utils import label_onehot

    i_iter = 25  # epoch 2 of 4: past the first-semi-epoch teacher copy
    epoch = i_iter // SPE
    img_l_np, lab_l_np, img_u_np = _batch(42)

    # ---------------- our side (full fused step, 1-device mesh) ----------
    with pytest.MonkeyPatch.context() as mp:
        _patch_ours_deterministic(mp)
        state = _flax_state(cfg, dummy, tx, student, teacher, i_iter)
        step = make_semi_step(cfg, model, tx, steps_per_epoch=SPE,
                              mesh=make_mesh(1))
        new_state, metrics = step(
            state,
            jnp.asarray(img_l_np),
            jnp.asarray(lab_l_np.astype(np.int32)),
            jnp.asarray(img_u_np),
            jax.random.PRNGKey(0),
        )
        metrics = jax.device_get(metrics)

    # ---------------- torch side (reference step glue, :308-548) ---------
    sup_loss_fn = lh.get_criterion(raw)
    optimizer = _make_optimizer_torch(raw, student)
    _set_poly_lr(optimizer, i_iter)
    params_before = {
        k: v.detach().clone() for k, v in student.state_dict().items()
    }
    teacher_before = {
        k: v.detach().clone() for k, v in teacher.state_dict().items()
    }

    image_l, label_l = _nchw(img_l_np), torch.from_numpy(lab_l_np)
    image_u = _nchw(img_u_np)
    h = w = HW

    student.train()
    # pseudo-labels from the eval-mode teacher (:317-324)
    teacher.eval()
    with torch.no_grad():
        pred_u_teacher = teacher(image_u)["pred"]
        pred_u_teacher = F.interpolate(
            pred_u_teacher, (h, w), mode="bilinear", align_corners=True
        )
        pred_u_teacher = F.softmax(pred_u_teacher, dim=1)
        logits_u_aug, label_u_aug = torch.max(pred_u_teacher, dim=1)
    image_u_aug = image_u  # no apply_aug

    num_labeled = len(image_l)
    image_all = torch.cat((image_l, image_u_aug))
    outs = student(image_all)
    pred_all, rep_all = outs["pred"], outs["rep"]
    pred_l_large = F.interpolate(
        pred_all[:num_labeled], size=(h, w), mode="bilinear", align_corners=True
    )
    pred_u_large = F.interpolate(
        pred_all[num_labeled:], size=(h, w), mode="bilinear", align_corners=True
    )
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
    percent_unreliable = (100 - drop_percent) * (1 - epoch / EPOCHS)
    drop_percent = 100 - percent_unreliable
    unsup_loss = lh.compute_unsupervised_loss(
        pred_u_large, label_u_aug.clone(), drop_percent,
        pred_u_large_teacher.detach(),
    )

    cfg_contra = raw["trainer"]["contrastive"]
    alpha_t = cfg_contra["low_entropy_threshold"] * (1 - epoch / EPOCHS)
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
            entropy[label_u_aug != 255].cpu().numpy().flatten(), 100 - alpha_t
        )
        high_entropy_mask = (
            entropy.ge(high_thresh).float() * (label_u_aug != 255).bool()
        )
        low_mask_all = torch.cat(
            (
                (label_l.unsqueeze(1) != 255).float(),
                low_entropy_mask.unsqueeze(1),
            )
        )
        low_mask_all = F.interpolate(
            low_mask_all, size=pred_all.shape[2:], mode="nearest"
        )
        high_mask_all = torch.cat(
            (
                (label_l.unsqueeze(1) != 255).float(),
                high_entropy_mask.unsqueeze(1),
            )
        )
        high_mask_all = F.interpolate(
            high_mask_all, size=pred_all.shape[2:], mode="nearest"
        )
        label_l_small = F.interpolate(
            label_onehot(label_l, C), size=pred_all.shape[2:], mode="nearest"
        )
        label_u_small = F.interpolate(
            label_onehot(label_u_aug, C), size=pred_all.shape[2:],
            mode="nearest",
        )

    memobank, queue_ptrlis, queue_size = [], [], []
    for _ in range(C):
        memobank.append([torch.zeros(0, 256)])
        queue_ptrlis.append(torch.zeros(1, dtype=torch.long))
        queue_size.append(QSIZE)

    with pytest.MonkeyPatch.context() as mp:
        _patch_torch_randint(mp)
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

    ema_decay = min(1 - 1 / (i_iter - SPE * 1 + 1), 0.99)
    with torch.no_grad():
        for t_params, s_params in zip(teacher.parameters(), student.parameters()):
            t_params.data = (
                ema_decay * t_params.data + (1 - ema_decay) * s_params.data
            )

    # ---------------- compare -------------------------------------------
    np.testing.assert_allclose(
        metrics["sup_loss"], float(sup_loss), rtol=2e-3, err_msg="sup"
    )
    np.testing.assert_allclose(
        metrics["uns_loss"], float(unsup_loss), rtol=5e-3, err_msg="unsup"
    )
    np.testing.assert_allclose(
        metrics["con_loss"], float(contra_loss), rtol=5e-3, err_msg="contra"
    )
    np.testing.assert_allclose(
        metrics["lr"], _poly_lr(i_iter), rtol=1e-6, err_msg="lr"
    )

    # post-step parameter parity: compare the UPDATES (new - old), which is
    # what the step actually computes; raw params would hide sign errors
    # behind the unchanged 99.9% of the value.
    tpl = {"params": variables["params"]}

    def deltas(tree_new, sd_old_to_tree):
        return jax.tree_util.tree_map(
            lambda a, b: np.asarray(a) - np.asarray(b), tree_new, sd_old_to_tree
        )

    before_tree = torch_to_flax(params_before, {"params": variables["params"]})
    ours_delta = deltas({"params": jax.device_get(new_state.params)}, before_tree)
    after_tree = torch_to_flax(student.state_dict(), {"params": variables["params"]})
    ref_delta = deltas(after_tree, before_tree)
    for (path, a), (_, b) in zip(
        jax.tree_util.tree_leaves_with_path(ours_delta),
        jax.tree_util.tree_leaves_with_path(ref_delta),
    ):
        _delta_close(a, b, f"param delta {jax.tree_util.keystr(path)}")

    # EMA-teacher params and teacher BN running stats (train-mode teacher
    # forward updates them, reference :361-374)
    _assert_tree_close(
        {"params": jax.device_get(new_state.teacher_params)},
        teacher.state_dict(),
        {"params": variables["params"]},
        "teacher params",
        rtol=1e-3,
        atol_frac=1e-4,
    )
    _assert_tree_close(
        {"batch_stats": jax.device_get(new_state.teacher_batch_stats)},
        teacher.state_dict(),
        {"batch_stats": variables["batch_stats"]},
        "teacher batch stats",
        rtol=5e-3,
        atol_frac=1e-3,
    )


def test_one_warmup_step_golden(golden):
    """Warmup branch (reference :288-307): sup loss on the labeled batch,
    dummy train-mode teacher forward updating teacher BN stats only."""
    raw, cfg, student, teacher, model, dummy, tx, variables = golden
    import torch.nn.functional as F

    import u2pl.utils.loss_helper as lh

    i_iter = 5  # epoch 0 (warmup)
    img_l_np, lab_l_np, img_u_np = _batch(7)

    with pytest.MonkeyPatch.context() as mp:
        _patch_ours_deterministic(mp)
        state = _flax_state(cfg, dummy, tx, student, teacher, i_iter)
        step = make_semi_warmup_step(
            cfg, model, tx, steps_per_epoch=SPE, mesh=make_mesh(1)
        )
        new_state, metrics = step(
            state,
            jnp.asarray(img_l_np),
            jnp.asarray(lab_l_np.astype(np.int32)),
            jnp.asarray(img_u_np),
            jax.random.PRNGKey(0),
        )
        metrics = jax.device_get(metrics)

    sup_loss_fn = lh.get_criterion(raw)
    optimizer = _make_optimizer_torch(raw, student)
    _set_poly_lr(optimizer, i_iter)
    params_before = {
        k: v.detach().clone() for k, v in student.state_dict().items()
    }

    image_l, label_l = _nchw(img_l_np), torch.from_numpy(lab_l_np)
    student.train()
    outs = student(image_l)
    pred = F.interpolate(
        outs["pred"], (HW, HW), mode="bilinear", align_corners=True
    )
    sup_loss = sup_loss_fn(pred, label_l)
    teacher.train()
    with torch.no_grad():
        _ = teacher(image_l)
    loss = sup_loss + 0 * outs["rep"].sum()
    optimizer.zero_grad()
    loss.backward()
    optimizer.step()

    np.testing.assert_allclose(
        metrics["sup_loss"], float(sup_loss), rtol=2e-3, err_msg="sup"
    )
    assert metrics["uns_loss"] == 0.0 and metrics["con_loss"] == 0.0

    before_tree = torch_to_flax(params_before, {"params": variables["params"]})
    after_tree = torch_to_flax(student.state_dict(), {"params": variables["params"]})
    ours_new = {"params": jax.device_get(new_state.params)}
    for (path, a_new), (_, b_old), (_, b_new) in zip(
        jax.tree_util.tree_leaves_with_path(ours_new),
        jax.tree_util.tree_leaves_with_path(before_tree),
        jax.tree_util.tree_leaves_with_path(after_tree),
    ):
        da = np.asarray(a_new) - np.asarray(b_old)
        db = np.asarray(b_new) - np.asarray(b_old)
        _delta_close(da, db, f"warmup param delta {jax.tree_util.keystr(path)}")

    # teacher BN stats tracked the labeled batch (reference :303-304)
    _assert_tree_close(
        {"batch_stats": jax.device_get(new_state.teacher_batch_stats)},
        teacher.state_dict(),
        {"batch_stats": variables["batch_stats"]},
        "warmup teacher batch stats",
        rtol=5e-3,
        atol_frac=1e-3,
    )
