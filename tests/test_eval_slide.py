"""Sliding-window eval parity: our crop-grid/canvas logic vs the reference
scale_crop_process (eval.py:184-223), with the SAME underlying network
function (a fake torch 'model' wrapping a fixed numpy convolution), so any
difference isolates the grid/stride/pad/average bookkeeping."""

import os
import sys

import numpy as np
import pytest

REF = "/root/reference"
pytestmark = pytest.mark.skipif(
    not os.path.isdir(os.path.join(REF, "u2pl")), reason="reference not mounted"
)

torch = pytest.importorskip("torch")

from u2pl_tpu.evallib.slide import (  # noqa: E402
    predict_whole,
    scale_crop_process,
    scale_whole_process,
)

CLASSES = 4


def _fake_logits(images: np.ndarray) -> np.ndarray:
    """Deterministic 'network': channel mixes + coordinate ramp (NHWC)."""
    b, h, w, _ = images.shape
    ys = np.linspace(0, 1, h)[None, :, None, None]
    xs = np.linspace(0, 1, w)[None, None, :, None]
    base = images.mean(-1, keepdims=True)
    return np.concatenate(
        [base + ys, base * 0.5 + xs, base**2, np.broadcast_to(ys * xs, base.shape)],
        axis=-1,
    ).astype(np.float32)


def _net_process_ours(images: np.ndarray) -> np.ndarray:
    # upsampling to input size is identity here (logits already input-sized)
    return _fake_logits(images)


class _FakeTorchModel:
    def eval(self):
        return self

    def __call__(self, x):
        out = _fake_logits(x.permute(0, 2, 3, 1).cpu().numpy())
        return {"pred": torch.from_numpy(out).permute(0, 3, 1, 2)}


@pytest.fixture(scope="module")
def ref_eval():
    from ref_oracle import setup_reference

    setup_reference()
    # import the REFERENCE eval.py (shadowed name: load by path)
    import importlib.util

    spec = importlib.util.spec_from_file_location(
        "ref_eval_mod", os.path.join(REF, "eval.py")
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def test_scale_crop_process_matches_reference(ref_eval):
    rng = np.random.RandomState(0)
    image = rng.rand(70, 120, 3).astype(np.float32)
    crop_h = crop_w = 33
    h, w = 70, 120

    got = scale_crop_process(
        _net_process_ours, image, CLASSES, crop_h, crop_w, h, w
    )

    timg = torch.from_numpy(image).permute(2, 0, 1)[None]
    want = ref_eval.scale_crop_process(
        _FakeTorchModel(), timg, CLASSES, crop_h, crop_w, h, w
    )
    want = want.permute(1, 2, 0).numpy()
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)


def test_scale_crop_process_with_padding(ref_eval):
    rng = np.random.RandomState(1)
    image = rng.rand(20, 25, 3).astype(np.float32)  # smaller than crop
    crop_h = crop_w = 33
    got = scale_crop_process(_net_process_ours, image, CLASSES, crop_h, crop_w, 20, 25)
    timg = torch.from_numpy(image).permute(2, 0, 1)[None]
    want = ref_eval.scale_crop_process(
        _FakeTorchModel(), timg, CLASSES, crop_h, crop_w, 20, 25
    ).permute(1, 2, 0).numpy()
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)


def test_predict_whole_multiscale():
    rng = np.random.RandomState(2)
    image = rng.rand(30, 40, 3).astype(np.float32)
    mask = predict_whole(_net_process_ours, image, CLASSES, scales=[0.75, 1.0, 1.25])
    assert mask.shape == (30, 40)
    assert mask.max() < CLASSES
