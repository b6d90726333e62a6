"""Sharded in-loop validation == single-device validation, exactly.

The reference shards validation across GPUs (train_semi.py:639-641,
DistributedSampler); our validate() shard_maps the val forward over all
local devices and pads ragged final batches with ignore-labeled rows.
Integer inter/union counts must be bit-identical to the one-device path:
padding rows map out of range in intersection_and_union_device and the
psum of per-device counts equals the whole-batch count.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.sharding import Mesh

from u2pl_tpu.config import parse_config
from u2pl_tpu.models import build_model
from u2pl_tpu.train.validate import (
    VAL_AXIS,
    accumulate_val_sums,
    make_val_step,
)

C = 4
HW = 17


@pytest.fixture(scope="module")
def tiny():
    raw = {
        "dataset": {"type": "pascal", "batch_size": 4, "n_sup": 8},
        "criterion": {"type": "CELoss", "kwargs": {}},
        "trainer": {
            "epochs": 1,
            "optimizer": {"type": "SGD", "kwargs": {"lr": 0.01}},
            "lr_scheduler": {"mode": "poly", "kwargs": {"power": 0.9}},
        },
        "net": {
            "num_classes": C,
            "sync_bn": False,
            "ema_decay": 0.99,
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
                "kwargs": {"inner_planes": 16, "dilations": [2, 4, 6]},
            },
        },
    }
    cfg = parse_config(raw)
    model = build_model(cfg.net, axis_name=None)
    variables = model.init(
        jax.random.PRNGKey(0), jnp.zeros((1, HW, HW, 3)), train=False
    )
    return cfg, model, variables


class FakeLoader:
    """Yields fixed numpy batches; mimics the EpochLoader attrs that
    accumulate_val_sums reads for its pad target."""

    def __init__(self, batches, batch_size, replicas_per_process):
        self.batches = batches
        self.batch_size = batch_size
        self.replicas_per_process = replicas_per_process

    def epoch(self, epoch):
        yield from self.batches


def test_sharded_val_matches_single_device(tiny):
    cfg, model, variables = tiny
    rng = np.random.RandomState(3)
    full = (
        rng.randn(8, HW, HW, 3).astype(np.float32),
        rng.randint(0, C, (8, HW, HW)).astype(np.int32),
    )
    ragged = (
        rng.randn(3, HW, HW, 3).astype(np.float32),
        rng.randint(0, C, (3, HW, HW)).astype(np.int32),
    )
    ragged[1][:, :4] = 255  # some ignored rows in the real data too

    single = make_val_step(model, C, 255)
    mesh = Mesh(np.asarray(jax.devices()[:8]), (VAL_AXIS,))
    sharded = make_val_step(model, C, 255, mesh=mesh)

    want_i = np.zeros(C, np.int64)
    want_u = np.zeros(C, np.int64)
    for img, lab in (full, ragged):
        i, u, _ = single(variables, jnp.asarray(img), jnp.asarray(lab))
        want_i += np.asarray(i, np.int64)
        want_u += np.asarray(u, np.int64)

    got_i, got_u = accumulate_val_sums(
        sharded,
        variables,
        FakeLoader([full, ragged], batch_size=1, replicas_per_process=8),
        epoch=0,
        num_classes=C,
        n_devices=8,
        ignore_label=255,
    )
    assert (got_i == want_i).all(), (got_i, want_i)
    assert (got_u == want_u).all(), (got_u, want_u)
    assert want_u.sum() > 0
