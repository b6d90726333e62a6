"""Shape-bucketed whole-image eval: padded masked forwards must match
unpadded forwards in the valid region, and one compiled program per bucket
must serve every image size inside it (no per-image-size compile storm on
the reference's whole-image VOC path, reference eval.py:226-232, 313-361).

The masking invariant under test (models/resnet.py Conv, decoder masking):
with the input zero-padded beyond the valid top-left region and every 3x3
conv input re-masked, explicit bucket padding is indistinguishable from the
convs' own SAME zero padding, ASPP pools over valid pixels only, and the
decoder's internal align-corners upsample uses dynamic-valid interpolation
matrices — so the valid output region equals the unpadded program's output
up to reduction-order float noise.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from u2pl_tpu.config import parse_config
from u2pl_tpu.evallib.slide import (
    bucket_dim,
    make_net_process,
    make_net_process_bucketed,
    predict_whole,
)
from u2pl_tpu.models import build_model
from u2pl_tpu.models.resnet import valid_feature_sizes

C = 5


def tiny_cfg(decoder_type="u2pl.models.decoder.dec_deeplabv3_plus"):
    raw = {
        "dataset": {"type": "pascal", "batch_size": 1, "n_sup": 1},
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
                "type": decoder_type,
                "kwargs": {"inner_planes": 16, "dilations": [2, 4, 6]},
            },
        },
    }
    return parse_config(raw)


@pytest.fixture(scope="module")
def model_and_vars():
    cfg = tiny_cfg()
    model = build_model(cfg.net, axis_name=None)
    variables = model.init(
        jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3)), train=False
    )

    # Freshly-initialized BN (beta=0, mean=0, var=1) is near-identity, which
    # would keep the pad region zero even WITHOUT masking — jitter the BN
    # parameters/statistics so an unmasked pad region would poison the
    # output.  Conv kernels stay at their (unit-gain kaiming) init so
    # benign reduction-order float noise between the two program shapes is
    # NOT amplified — a leak shows up orders of magnitude above it (see the
    # negative control below).
    rng = np.random.RandomState(7)

    def jitter(path, leaf):
        name = path[-1].key if hasattr(path[-1], "key") else str(path[-1])
        a = np.asarray(leaf)
        if name == "var":
            return jnp.asarray(rng.uniform(0.7, 1.3, a.shape).astype(a.dtype))
        if name == "mean":
            return jnp.asarray(rng.normal(0, 0.2, a.shape).astype(a.dtype))
        if name in ("bias", "scale") and a.ndim == 1:  # BN beta/gamma, conv bias
            return jnp.asarray(a + rng.normal(0, 0.2, a.shape).astype(a.dtype))
        return jnp.asarray(a)

    variables = jax.tree_util.tree_map_with_path(jitter, variables)
    return model, variables


@pytest.mark.parametrize("size", [(65, 97), (83, 70), (64, 64)])
def test_masked_forward_matches_unpadded(model_and_vars, size):
    model, variables = model_and_vars
    h, w = size
    rng = np.random.RandomState(hash(size) % 2**31)
    img = rng.randn(1, h, w, 3).astype(np.float32)

    out = model.apply(variables, jnp.asarray(img), train=False)

    bh, bw = bucket_dim(h, 64), bucket_dim(w, 64)
    padded = np.zeros((1, bh, bw, 3), np.float32)
    padded[0, :h, :w] = img[0]
    out_b = model.apply(
        variables,
        jnp.asarray(padded),
        train=False,
        valid_hw=(jnp.int32(h), jnp.int32(w)),
    )

    v2h = valid_feature_sizes(h)[1]
    v2w = valid_feature_sizes(w)[1]
    for key in ("pred", "rep"):
        a = np.asarray(out[key])
        b = np.asarray(out_b[key])[:, :v2h, :v2w]
        assert a.shape == b.shape, (key, a.shape, b.shape)
        # Tolerance relative to the tensor's scale.  The decoder's 3x3x512
        # convs accumulate ~4600 cancellation-heavy products (gross
        # magnitude ~40x the net output), so compiling at a different
        # spatial shape legitimately reassociates the f32 reduction and
        # shifts outputs by ~1e-3 relative — inherent float noise, not a
        # leak.  A real masking leak is ~0.7 relative (negative control
        # below), 100x above this tolerance.
        scale = np.abs(a).max()
        assert np.abs(b - a).max() <= 5e-3 * scale, (
            key,
            np.abs(b - a).max(),
            scale,
        )
    # pixel labels in the valid region match except at near-ties
    la, lb = np.asarray(out["pred"]), np.asarray(out_b["pred"])[:, :v2h, :v2w]
    top2 = np.sort(la, axis=-1)
    margin = top2[..., -1] - top2[..., -2]
    solid = margin > 2e-2 * np.abs(la).max()
    assert solid.mean() > 0.5
    assert (la.argmax(-1) == lb.argmax(-1))[solid].all()

    # negative control: WITHOUT the masked forward, bucket padding must
    # poison the valid region well above the tolerance — i.e. this test has
    # the power to detect a masking leak (only meaningful when the bucket
    # actually pads the image)
    if (bh, bw) != (h, w):
        out_leak = model.apply(variables, jnp.asarray(padded), train=False)
        leak = np.asarray(out_leak["pred"])[:, :v2h, :v2w]
        a = np.asarray(out["pred"])
        assert np.abs(leak - a).max() > 5e-2 * np.abs(a).max(), (
            np.abs(leak - a).max(),
            np.abs(a).max(),
        )


def test_bucketed_eval_compile_count_and_masks(model_and_vars):
    model, variables = model_and_vars
    net_b = make_net_process_bucketed(model, variables, quantum=64)
    net_u = make_net_process(model, variables)

    rng = np.random.RandomState(3)
    sizes = [(int(rng.randint(40, 121)), int(rng.randint(40, 121))) for _ in range(50)]
    images = {}
    for i, (h, w) in enumerate(sizes):
        img = rng.randn(h, w, 3).astype(np.float32)
        images[i] = img
        predict_whole(net_b, img, C, scales=[1.0])

    # two dim-buckets (64, 128) -> at most 4 distinct compiled programs
    assert net_b.compiles() <= 4, net_b.compiles()

    for i in list(images)[:8]:
        img = images[i]
        lb = net_b(img[None])[0]
        lu = net_u(img[None])[0]
        scale = np.abs(lu).max()
        assert np.abs(lb - lu).max() <= 5e-3 * scale
        top2 = np.sort(lu, axis=-1)
        margin = top2[..., -1] - top2[..., -2]
        solid = margin > 2e-2 * scale
        assert solid.mean() > 0.5
        assert (lb.argmax(-1) == lu.argmax(-1))[solid].all()


def test_pred_os_index_dispatch():
    from u2pl_tpu.evallib.slide import pred_os_index

    assert pred_os_index("u2pl.models.decoder.dec_deeplabv3_plus") == 1
    assert pred_os_index("u2pl.models.decoder.dec_deeplabv3") == 2
    with pytest.raises(ValueError):
        pred_os_index("u2pl.models.decoder.dec_unknown")


def test_bucketed_matches_unbucketed_deeplabv3_os8():
    """Regression (advisor r2): the bucketed path used to hardcode os4
    valid sizes, silently corrupting predictions for dec_deeplabv3, whose
    pred is at os8 (reference decoder.py:8-42)."""
    from u2pl_tpu.evallib.slide import pred_os_index

    cfg = tiny_cfg("u2pl.models.decoder.dec_deeplabv3")
    model = build_model(cfg.net, axis_name=None)
    variables = model.init(
        jax.random.PRNGKey(1), jnp.zeros((1, 64, 64, 3)), train=False
    )
    net_b = make_net_process_bucketed(
        model, variables, quantum=64,
        pred_os=pred_os_index(cfg.net.decoder.type),
    )
    net_u = make_net_process(model, variables)

    rng = np.random.RandomState(11)
    for h, w in [(65, 97), (83, 70)]:
        img = rng.randn(h, w, 3).astype(np.float32)
        lb = net_b(img[None])[0]
        lu = net_u(img[None])[0]
        scale = np.abs(lu).max()
        assert np.abs(lb - lu).max() <= 5e-3 * scale, np.abs(lb - lu).max()
