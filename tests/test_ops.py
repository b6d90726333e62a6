import numpy as np
import pytest

import jax.numpy as jnp

from u2pl_tpu.ops import (
    label_onehot,
    masked_percentile,
    max_pool_ceil,
    resize_bilinear,
    resize_nearest,
)
from u2pl_tpu.ops.resize import resize_bilinear_numpy, resize_nearest_numpy

torch = pytest.importorskip("torch")
import torch.nn.functional as F  # noqa: E402


SIZES = [
    ((129, 129), (513, 513)),  # rep/logit upsample os4 -> crop
    ((513, 513), (129, 129)),
    ((97, 65), (513, 513)),
    ((7, 9), (33, 17)),
    ((33, 17), (7, 9)),
    ((1, 5), (4, 10)),
]


@pytest.mark.parametrize("insz,outsz", SIZES)
@pytest.mark.parametrize("align", [True, False])
def test_bilinear_matches_torch(insz, outsz, align):
    rng = np.random.RandomState(0)
    x = rng.randn(2, insz[0], insz[1], 3).astype(np.float32)
    got = np.asarray(resize_bilinear(jnp.asarray(x), outsz, align_corners=align))
    ref = (
        F.interpolate(
            torch.from_numpy(x).permute(0, 3, 1, 2),
            size=outsz,
            mode="bilinear",
            align_corners=align,
        )
        .permute(0, 2, 3, 1)
        .numpy()
    )
    np.testing.assert_allclose(got, ref, rtol=1e-4, atol=1e-4)


@pytest.mark.parametrize("insz,outsz", SIZES)
def test_bilinear_numpy_matches_torch(insz, outsz):
    rng = np.random.RandomState(1)
    x = rng.randn(insz[0], insz[1], 3).astype(np.float32)
    got = resize_bilinear_numpy(x, outsz, align_corners=True)
    ref = (
        F.interpolate(
            torch.from_numpy(x).permute(2, 0, 1)[None],
            size=outsz,
            mode="bilinear",
            align_corners=True,
        )[0]
        .permute(1, 2, 0)
        .numpy()
    )
    np.testing.assert_allclose(got, ref, rtol=1e-5, atol=1e-5)


@pytest.mark.parametrize("insz,outsz", SIZES)
def test_nearest_matches_torch(insz, outsz):
    rng = np.random.RandomState(2)
    x = rng.randint(0, 21, size=(2, insz[0], insz[1])).astype(np.float32)
    got = np.asarray(resize_nearest(jnp.asarray(x), outsz))
    ref = F.interpolate(torch.from_numpy(x)[:, None], size=outsz, mode="nearest")[
        :, 0
    ].numpy()
    np.testing.assert_array_equal(got, ref)
    got_np = resize_nearest_numpy(x[0], outsz)
    np.testing.assert_array_equal(got_np, ref[0])


@pytest.mark.parametrize("pct", [0.0, 7.3, 20.0, 50.0, 80.0, 97.5, 100.0])
def test_masked_percentile_matches_numpy(pct):
    rng = np.random.RandomState(3)
    vals = rng.randn(4, 33, 33).astype(np.float32)
    mask = rng.rand(4, 33, 33) > 0.3
    got = float(masked_percentile(jnp.asarray(vals), jnp.asarray(mask), pct))
    ref = float(np.percentile(vals[mask], pct))
    assert abs(got - ref) < 1e-5


def test_masked_percentile_empty_mask():
    vals = jnp.ones((4, 4))
    mask = jnp.zeros((4, 4), bool)
    assert np.isinf(float(masked_percentile(vals, mask, 50.0)))


class TestRadixPercentiles:
    """masked_percentiles (sort-free radix selection) must be BIT-identical
    to the masked_sort + percentile_from_sorted path it replaces in the semi
    step (u2pl_tpu/train/steps.py entropy thresholds)."""

    def _both(self, vals, mask, pcts):
        from u2pl_tpu.ops.quantile import (
            masked_percentiles,
            masked_sort,
            percentile_from_sorted,
        )

        got = np.asarray(
            masked_percentiles(
                jnp.asarray(vals), jnp.asarray(mask), jnp.asarray(pcts)
            )
        )
        sv, n = masked_sort(jnp.asarray(vals), jnp.asarray(mask))
        ref = np.asarray(
            [float(percentile_from_sorted(sv, n, p)) for p in pcts]
        )
        return got, ref

    @pytest.mark.parametrize("seed", [0, 1, 2])
    def test_matches_sorted_path_bitwise(self, seed):
        rng = np.random.RandomState(seed)
        vals = (rng.randn(3, 57, 41) * 10).astype(np.float32)
        mask = rng.rand(3, 57, 41) > 0.3
        pcts = [0.0, 3.7, 25.0, 50.0, 80.0, 99.1, 100.0]
        got, ref = self._both(vals, mask, pcts)
        np.testing.assert_array_equal(got, ref)

    def test_heavy_ties(self):
        # integer-valued floats: duplicates exercise the sorted[lo+1]==
        # sorted[lo] shortcut and the strict-greater fallback
        rng = np.random.RandomState(7)
        vals = rng.randint(0, 5, (2, 40, 40)).astype(np.float32)
        mask = rng.rand(2, 40, 40) > 0.1
        got, ref = self._both(vals, mask, [0.0, 12.5, 50.0, 87.5, 100.0])
        np.testing.assert_array_equal(got, ref)

    def test_negative_and_mixed_sign(self):
        rng = np.random.RandomState(11)
        vals = (rng.randn(500) * 100).astype(np.float32)
        vals[::17] = 0.0
        vals[::23] = -0.0
        mask = np.ones(500, bool)
        got, ref = self._both(vals, mask, [0.0, 10.0, 60.0, 100.0])
        np.testing.assert_array_equal(got, ref)

    @pytest.mark.parametrize("n", [0, 1, 2])
    def test_tiny_valid_counts(self, n):
        vals = np.asarray([3.0, -1.0, 2.0, 5.0], np.float32)
        mask = np.zeros(4, bool)
        mask[:n] = True
        got, ref = self._both(vals, mask, [0.0, 50.0, 100.0])
        np.testing.assert_array_equal(got, ref)
        if n == 0:
            assert np.all(np.isinf(got))

    def test_matches_numpy_linear(self):
        rng = np.random.RandomState(5)
        vals = rng.randn(4, 33, 33).astype(np.float32)
        mask = rng.rand(4, 33, 33) > 0.3
        pcts = [0.0, 7.3, 20.0, 50.0, 80.0, 97.5, 100.0]
        got, _ = self._both(vals, mask, pcts)
        ref = np.percentile(vals[mask], pcts)
        np.testing.assert_allclose(got, ref, atol=1e-5)

    def test_traced_percents_under_jit(self):
        import jax

        from u2pl_tpu.ops.quantile import masked_percentiles

        rng = np.random.RandomState(9)
        vals = jnp.asarray(rng.randn(1000).astype(np.float32))
        mask = jnp.asarray(rng.rand(1000) > 0.5)

        @jax.jit
        def f(p):
            return masked_percentiles(vals, mask, jnp.stack([p, 100.0 - p]))

        got = np.asarray(f(jnp.float32(20.0)))
        ref = np.percentile(np.asarray(vals)[np.asarray(mask)], [20.0, 80.0])
        np.testing.assert_allclose(got, ref, atol=1e-5)


@pytest.mark.parametrize("hw", [(513, 513), (769, 769), (512, 512), (97, 130), (33, 32)])
def test_max_pool_ceil_matches_torch(hw):
    rng = np.random.RandomState(4)
    x = rng.randn(2, hw[0], hw[1], 5).astype(np.float32)
    got = np.asarray(max_pool_ceil(jnp.asarray(x)))
    ref = (
        torch.nn.functional.max_pool2d(
            torch.from_numpy(x).permute(0, 3, 1, 2),
            kernel_size=3,
            stride=2,
            padding=1,
            ceil_mode=True,
        )
        .permute(0, 2, 3, 1)
        .numpy()
    )
    assert got.shape == ref.shape
    np.testing.assert_array_equal(got, ref)


def test_label_onehot():
    labels = jnp.asarray([[[0, 1], [255, 2]]])
    oh = np.asarray(label_onehot(labels, 3))
    assert oh.shape == (1, 2, 2, 3)
    np.testing.assert_array_equal(oh[0, 0, 0], [1, 0, 0])
    np.testing.assert_array_equal(oh[0, 0, 1], [0, 1, 0])
    np.testing.assert_array_equal(oh[0, 1, 0], [0, 0, 0])  # ignore -> zeros
    np.testing.assert_array_equal(oh[0, 1, 1], [0, 0, 1])


@pytest.mark.parametrize("ch", [64, 256])
def test_bilinear_bf16_wide_path_close_to_f32(ch):
    """Wide bf16 inputs take the bf16 MXU path (ops/resize.py); its only
    deviation from the f32 path is the bf16 rounding of the separable
    intermediate between the two passes, so outputs must agree to ~1 bf16
    ulp of the f32-path result computed on the same bf16 input."""
    rng = np.random.RandomState(0)
    x16 = jnp.asarray(rng.randn(2, 129, 129, ch), jnp.bfloat16)
    out16 = resize_bilinear(x16, (513, 513), True)
    assert out16.dtype == jnp.bfloat16
    ref = resize_bilinear(x16.astype(jnp.float32), (513, 513), True)
    np.testing.assert_allclose(
        np.asarray(out16, np.float32), np.asarray(ref), rtol=2e-2, atol=2e-2
    )


def test_bilinear_bf16_narrow_keeps_f32_path_bits():
    """Narrow (<64-channel) bf16 inputs must keep the f32 path bit-exactly
    (the logit upsamples measured slower on the bf16 path and are
    percentile-gate-sensitive)."""
    rng = np.random.RandomState(1)
    x16 = jnp.asarray(rng.randn(2, 129, 129, 21), jnp.bfloat16)
    out = resize_bilinear(x16, (513, 513), True)
    ref = resize_bilinear(x16.astype(jnp.float32), (513, 513), True).astype(
        jnp.bfloat16
    )
    np.testing.assert_array_equal(
        np.asarray(out, np.float32), np.asarray(ref, np.float32)
    )
