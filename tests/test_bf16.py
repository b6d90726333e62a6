"""bfloat16 compute policy: forward stays close to float32 (params/BN/loss
math remain f32), and the train step remains finite."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from u2pl_tpu.models import build_model
from test_train_step import tiny_cfg, HW


def test_bf16_forward_close_to_f32():
    import dataclasses

    cfg = tiny_cfg()
    x = jnp.asarray(np.random.RandomState(0).randn(2, HW, HW, 3), jnp.float32)

    m32 = build_model(cfg.net)
    variables = m32.init(jax.random.PRNGKey(0), x, train=False)
    out32 = m32.apply(variables, x, train=False)["pred"]

    net16 = dataclasses.replace(cfg.net, dtype="bfloat16")
    m16 = build_model(net16)
    out16 = m16.apply(variables, x, train=False)["pred"]

    out16 = np.asarray(out16, np.float32)
    err = np.abs(out16 - np.asarray(out32))
    scale = np.abs(np.asarray(out32)).mean() + 1e-6
    assert err.mean() / scale < 0.1, err.mean() / scale
