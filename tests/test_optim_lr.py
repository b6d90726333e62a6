"""Optimizer/LR parity: the optax chain must reproduce torch SGD
(momentum + weight decay + per-group lr, head x10) step-for-step, and the
in-graph LR schedule must match the reference LRScheduler values."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from u2pl_tpu.config import LRSchedulerCfg, OptimizerCfg
from u2pl_tpu.train.lr import lr_at
from u2pl_tpu.train.optim import apply_updates_with_lr, head_mask, make_optimizer

torch = pytest.importorskip("torch")


def test_sgd_matches_torch_with_head_multiplier():
    rng = np.random.RandomState(0)
    enc_w = rng.randn(4, 3).astype(np.float32)
    dec_w = rng.randn(5).astype(np.float32)
    params = {"encoder": {"w": jnp.asarray(enc_w)}, "decoder": {"w": jnp.asarray(dec_w)}}

    cfg = OptimizerCfg(type="SGD", lr=0.1, momentum=0.9, weight_decay=0.01)
    tx = make_optimizer(cfg, params, head_lr_multiplier=10.0)
    opt_state = tx.init(params)

    t_enc = torch.nn.Parameter(torch.from_numpy(enc_w.copy()))
    t_dec = torch.nn.Parameter(torch.from_numpy(dec_w.copy()))
    topt = torch.optim.SGD(
        [
            {"params": [t_enc], "lr": 0.1},
            {"params": [t_dec], "lr": 1.0},  # head x10
        ],
        momentum=0.9,
        weight_decay=0.01,
    )

    lrs = [0.1, 0.09, 0.05]  # simulate a schedule
    for lr in lrs:
        genc = rng.randn(4, 3).astype(np.float32)
        gdec = rng.randn(5).astype(np.float32)
        grads = {
            "encoder": {"w": jnp.asarray(genc)},
            "decoder": {"w": jnp.asarray(gdec)},
        }
        updates, opt_state = tx.update(grads, opt_state, params)
        params = apply_updates_with_lr(params, updates, jnp.asarray(lr))

        topt.param_groups[0]["lr"] = lr
        topt.param_groups[1]["lr"] = lr * 10
        t_enc.grad = torch.from_numpy(genc)
        t_dec.grad = torch.from_numpy(gdec)
        topt.step()

    np.testing.assert_allclose(
        np.asarray(params["encoder"]["w"]), t_enc.detach().numpy(), rtol=1e-5, atol=1e-6
    )
    np.testing.assert_allclose(
        np.asarray(params["decoder"]["w"]), t_dec.detach().numpy(), rtol=1e-5, atol=1e-6
    )


def test_head_mask_scopes():
    params = {"encoder": {"a": jnp.zeros(1)}, "decoder": {"b": jnp.zeros(1)},
              "auxor": {"c": jnp.zeros(1)}}
    mask = head_mask(params)
    assert mask["encoder"]["a"] is False
    assert mask["decoder"]["b"] is True
    assert mask["auxor"]["c"] is True


def test_poly_lr_matches_reference_formula():
    # reference lr_helper.py:90-95: lr * (1 - iter/max_iter)^0.9 stepped per
    # iteration
    cfg = LRSchedulerCfg(mode="poly", power=0.9)
    max_iter = 100
    for it in [0, 1, 37, 99]:
        got = float(lr_at(cfg, 0.01, jnp.asarray(it), max_iter))
        want = 0.01 * (1 - it / max_iter) ** 0.9
        assert abs(got - want) < 1e-7  # schedule computed in f32 in-graph


def test_cosine_lr_matches_reference_formula():
    from math import cos, pi

    cfg = LRSchedulerCfg(mode="cosine", targetlr=0.0001)
    max_iter = 80
    for it in [0, 10, 79]:
        got = float(lr_at(cfg, 0.01, jnp.asarray(it), max_iter))
        want = 0.0001 + (0.01 - 0.0001) * (1 + cos(pi * it / max_iter)) / 2
        assert abs(got - want) < 1e-7


def test_ema_decay_schedule_matches_reference():
    # reference train_semi.py:530-548:
    # decay = min(1 - 1/(i_iter - steps*sup_only + 1), ema_decay)
    steps_per_epoch, sup_only = 10, 1
    for i_iter, want in [(10, 0.0), (11, 0.5), (30, min(1 - 1 / 21, 0.99)),
                         (5000, 0.99)]:
        got = min(1 - 1 / (i_iter - steps_per_epoch * sup_only + 1), 0.99)
        assert abs(got - want) < 1e-12
