"""Space-to-depth stem conv lowering (models/resnet.py Conv.s2d).

The bf16 train path lowers the deep stem's 3-channel 3x3/s2 first conv as
a 2x2/s1 conv on the 2x2-block-packed input (the classic TPU low-Cin
rewrite).  These tests pin the contract:
  * the lowering is the SAME linear map (exact in f32 up to one fused-sum
    reordering ulp; we check against a float64 oracle),
  * the parameter tree (names, shapes) is identical to the plain conv, so
    checkpoints and the torch converter are unaffected,
  * gradients flow to the original (3, 3, 3, 64) layout,
  * odd and even input sizes both match the reference conv's shape
    arithmetic.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from u2pl_tpu.models.resnet import Conv, ResNet, _s2d_kernel, _s2d_pack


def _ref_conv(x, w, stride=2):
    return jax.lax.conv_general_dilated(
        x, w, (stride, stride), ((1, 1), (1, 1)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )


@pytest.mark.parametrize("hw", [33, 32, 65, 513 // 8 * 8 + 1])
def test_s2d_matches_plain_conv_f64(hw):
    # float64 on CPU: both orderings are exact, so equality is strict
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(2, hw, hw, 3))
    w = jnp.asarray(rng.randn(3, 3, 3, 8))
    ref = _ref_conv(x.astype(jnp.float32), w.astype(jnp.float32))
    got = jax.lax.conv_general_dilated(
        _s2d_pack(x).astype(jnp.float32),
        _s2d_kernel(w).astype(jnp.float32),
        (1, 1), ((1, 0), (1, 0)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    assert got.shape == ref.shape
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(ref), rtol=1e-5, atol=1e-5
    )


def test_conv_module_s2d_param_tree_identical():
    rng = np.random.RandomState(1)
    x = jnp.asarray(rng.randn(1, 33, 33, 3).astype(np.float32))
    plain = Conv(16, 3, 2, dtype=jnp.bfloat16, name="c")
    s2d = Conv(16, 3, 2, dtype=jnp.bfloat16, s2d=True, name="c")
    vp = plain.init(jax.random.PRNGKey(0), x)
    vs = s2d.init(jax.random.PRNGKey(0), x)
    tp = jax.tree_util.tree_map(lambda a: (a.shape, a.dtype), vp)
    ts = jax.tree_util.tree_map(lambda a: (a.shape, a.dtype), vs)
    assert tp == ts
    # same init stream -> same initial weights at the same path
    np.testing.assert_array_equal(
        np.asarray(vp["params"]["Conv_0"]["kernel"]),
        np.asarray(vs["params"]["Conv_0"]["kernel"]),
    )
    # forwards agree within bf16 accumulation-order tolerance
    yp = plain.apply(vp, x)
    ys = s2d.apply(vs, x)
    np.testing.assert_allclose(
        np.asarray(yp, np.float32), np.asarray(ys, np.float32),
        rtol=2e-2, atol=2e-2,
    )


def test_s2d_gradients_reach_hwio_layout():
    rng = np.random.RandomState(2)
    x = jnp.asarray(rng.randn(1, 17, 17, 3).astype(np.float32))
    mod = Conv(8, 3, 2, dtype=jnp.float32, s2d=True, name="c")
    v = mod.init(jax.random.PRNGKey(0), x)

    g = jax.grad(
        lambda p: jnp.sum(mod.apply({"params": p}, x) ** 2)
    )(v["params"])
    gk = np.asarray(g["Conv_0"]["kernel"])
    assert gk.shape == (3, 3, 3, 8)
    assert np.abs(gk).max() > 0

    # numeric check against the plain lowering's grad
    plain = Conv(8, 3, 2, dtype=jnp.float32, name="c")
    gp = jax.grad(
        lambda p: jnp.sum(plain.apply({"params": p}, x) ** 2)
    )(v["params"])
    np.testing.assert_allclose(
        gk, np.asarray(gp["Conv_0"]["kernel"]), rtol=1e-4, atol=1e-4
    )


def test_resnet_param_tree_unchanged_by_dtype_gate():
    """bf16 ResNet (s2d stem) and f32 ResNet must expose identical param
    trees — the torch checkpoint converter walks these names."""
    x = jnp.zeros((1, 33, 33, 3))
    spec = dict(layers=(1, 1, 1, 1), block="bottleneck")
    vb = ResNet(dtype=jnp.bfloat16, **spec).init(
        jax.random.PRNGKey(0), x, train=False
    )
    vf = ResNet(dtype=jnp.float32, **spec).init(
        jax.random.PRNGKey(0), x, train=False
    )
    tb = jax.tree_util.tree_map(lambda a: a.shape, vb)
    tf = jax.tree_util.tree_map(lambda a: a.shape, vf)
    assert tb == tf
