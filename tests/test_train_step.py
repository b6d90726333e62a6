"""End-to-end fused train-step tests on the 8-device CPU mesh.

Exercises: shard_map SPMD, SyncBN pmean, gradient pmean, on-device
percentiles, strong aug, contrastive loss + all_gather queue exchange,
EMA update — checking loss finiteness, state evolution, and queue
occupancy (SURVEY.md §4 test strategy)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from u2pl_tpu.config import parse_config
from u2pl_tpu.dist import make_mesh
from u2pl_tpu.memobank import init_memobank
from u2pl_tpu.models import build_model
from u2pl_tpu.train.optim import make_optimizer
from u2pl_tpu.train.state import (
    TrainState,
    copy_student_to_teacher,
    create_train_state,
)
from u2pl_tpu.train.steps import make_semi_step, make_semi_warmup_step, make_sup_step

HW = 32
C = 5


def tiny_cfg(**trainer_extra):
    raw = {
        "dataset": {
            "type": "pascal_semi",
            "batch_size": 8,
            "n_sup": 64,
            "ignore_label": 255,
        },
        "criterion": {"type": "CELoss", "kwargs": {}},
        "trainer": {
            "epochs": 4,
            "sup_only_epoch": 1,
            "optimizer": {
                "type": "SGD",
                "kwargs": {"lr": 0.01, "momentum": 0.9, "weight_decay": 0.0001},
            },
            "lr_scheduler": {"mode": "poly", "kwargs": {"power": 0.9}},
            "unsupervised": {"drop_percent": 80, "apply_aug": "cutmix"},
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
                "max_keys_per_class_per_step": 16,
            },
            **trainer_extra,
        },
        "net": {
            "num_classes": C,
            "sync_bn": True,
            "ema_decay": 0.99,
            "aux_loss": {"aux_plane": 1024, "loss_weight": 0.4},
            "encoder": {
                "type": "u2pl.models.resnet.resnet10",
                "kwargs": {
                    "multi_grid": True,
                    "fpn": True,
                    "replace_stride_with_dilation": [False, True, True],
                },
            },
            "decoder": {
                "type": "u2pl.models.decoder.dec_deeplabv3_plus",
                "kwargs": {"inner_planes": 32, "dilations": [2, 4, 6]},
            },
        },
    }
    return parse_config(raw)


def make_batch(rng, b=8):
    img_l = rng.randn(b, HW, HW, 3).astype(np.float32)
    lab_l = rng.randint(0, C, (b, HW, HW)).astype(np.int32)
    lab_l[:, :2] = 255
    img_u = rng.randn(b, HW, HW, 3).astype(np.float32)
    return jnp.asarray(img_l), jnp.asarray(lab_l), jnp.asarray(img_u)


@pytest.fixture(scope="module")
def setup():
    cfg = tiny_cfg()
    mesh = make_mesh()
    model = build_model(cfg.net, axis_name="data")
    tx = make_optimizer(cfg.trainer.optimizer, None, head_lr_multiplier=10.0)
    bank = init_memobank(C, 256, queue_size=64, class0_size=96)
    proto = jnp.zeros((C, cfg.trainer.contrastive.num_queries, 1, 256))
    # tx needs params for mask; rebuild after init
    dummy_model = build_model(cfg.net)
    variables = dummy_model.init(
        jax.random.PRNGKey(0), jnp.zeros((1, HW, HW, 3)), train=False
    )
    tx = make_optimizer(
        cfg.trainer.optimizer, variables["params"], head_lr_multiplier=10.0
    )
    state = create_train_state(
        model,
        tx,
        jax.random.PRNGKey(0),
        (1, HW, HW, 3),
        with_teacher=True,
        bank=bank,
        prototype=proto,
    )
    return cfg, mesh, model, tx, state


def _fresh(state):
    # steps donate their input state; give each test its own copy
    return jax.tree_util.tree_map(jnp.copy, state)


def test_warmup_and_semi_steps(setup):
    cfg, mesh, model, tx, state = setup
    state = _fresh(state)
    steps_per_epoch = 2
    warmup = make_semi_warmup_step(cfg, model, tx, steps_per_epoch, mesh)
    semi = make_semi_step(cfg, model, tx, steps_per_epoch, mesh)

    rng = np.random.RandomState(0)
    img_l, lab_l, img_u = make_batch(rng)
    key = jax.random.PRNGKey(42)

    p0 = np.asarray(
        jax.tree_util.tree_leaves(state.params)[0]
    ).copy()
    t_bs0 = np.asarray(jax.tree_util.tree_leaves(state.teacher_batch_stats)[0]).copy()

    # warmup epoch (2 steps)
    for _ in range(steps_per_epoch):
        state, m = warmup(state, img_l, lab_l, img_u, key)
        assert np.isfinite(float(m["sup_loss"]))
        assert float(m["uns_loss"]) == 0.0

    p1 = np.asarray(jax.tree_util.tree_leaves(state.params)[0])
    assert not np.allclose(p0, p1), "student params must update"
    t_bs1 = np.asarray(jax.tree_util.tree_leaves(state.teacher_batch_stats)[0])
    assert not np.allclose(t_bs0, t_bs1), "teacher BN stats must track warmup"

    # first semi epoch: copy student -> teacher then run semi steps
    state = copy_student_to_teacher(state)
    for i in range(2 * steps_per_epoch):
        state, m = semi(state, img_l, lab_l, img_u, key)
        for k in ("sup_loss", "uns_loss", "con_loss"):
            assert np.isfinite(float(m[k])), (k, float(m[k]))
    assert int(state.step) == 3 * steps_per_epoch

    occ = np.asarray(state.bank.occupancy)
    assert occ.sum() > 0, "memory bank should receive negative keys"
    # ring capacity respected
    assert (occ <= np.asarray(state.bank.sizes)).all()

    # teacher moved towards student
    t1 = np.asarray(jax.tree_util.tree_leaves(state.teacher_params)[0])
    s1 = np.asarray(jax.tree_util.tree_leaves(state.params)[0])
    assert np.isfinite(t1).all() and np.isfinite(s1).all()


def test_sup_step(setup):
    cfg, mesh, model, tx, state = setup
    state = _fresh(state)
    sup = make_sup_step(cfg, model, tx, steps_per_epoch=2, mesh=mesh)
    rng = np.random.RandomState(1)
    img_l, lab_l, _ = make_batch(rng)
    state2, m = sup(state, img_l, lab_l, jax.random.PRNGKey(7))
    assert np.isfinite(float(m["sup_loss"]))
    assert float(m["lr"]) > 0
