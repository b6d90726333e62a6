"""Distributional/structural checks of on-device cutout/cutmix/classmix
against the reference mask-generation rules (augmentation.py:471-541)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from u2pl_tpu.ops.mixing import generate_unsup_data

B, H, W, C = 4, 40, 40, 5


def _batch(seed=0):
    rng = np.random.RandomState(seed)
    data = jnp.asarray(rng.randn(B, H, W, 3), jnp.float32)
    target = jnp.asarray(rng.randint(0, C, (B, H, W)), jnp.int32)
    logits = jnp.asarray(rng.rand(B, H, W), jnp.float32)
    return data, target, logits


def test_cutout_marks_box_ignored():
    data, target, logits = _batch()
    nd, nt, nl = generate_unsup_data(
        jax.random.PRNGKey(0), data, target, logits, "cutout", C
    )
    nt = np.asarray(nt)
    nd = np.asarray(nd)
    for i in range(B):
        hole = nt[i] == 255
        frac = hole.mean()
        # box area is H*W/2 by construction (ratio=2)
        assert 0.35 < frac < 0.65, frac
        assert np.all(nd[i][hole] == 0)
        assert np.allclose(nd[i][~hole], np.asarray(data)[i][~hole])


def test_cutmix_swaps_box_with_next_sample():
    data, target, logits = _batch(1)
    nd, nt, _ = generate_unsup_data(
        jax.random.PRNGKey(1), data, target, logits, "cutmix", C
    )
    nd, nt = np.asarray(nd), np.asarray(nt)
    t = np.asarray(target)
    d = np.asarray(data)
    for i in range(B):
        j = (i + 1) % B
        from_self = np.isclose(nd[i], d[i]).all(-1)
        from_next = np.isclose(nd[i], d[j]).all(-1)
        assert (from_self | from_next).all()
        # pixels from the partner carry the partner's labels
        assert (nt[i][from_next & ~from_self] == t[j][from_next & ~from_self]).all()


def test_classmix_takes_half_the_classes():
    data, target, logits = _batch(2)
    nd, nt, _ = generate_unsup_data(
        jax.random.PRNGKey(2), data, target, logits, "classmix", C
    )
    nd = np.asarray(nd)
    d = np.asarray(data)
    t = np.asarray(target)
    for i in range(B):
        from_self = np.isclose(nd[i], d[i]).all(-1)
        present = np.unique(t[i])
        kept_classes = np.unique(t[i][from_self]) if from_self.any() else np.array([])
        # exactly n_present//2 classes are kept, and kept classes are whole
        assert len(kept_classes) == len(present) // 2
        for c in kept_classes:
            assert from_self[t[i] == c].all()


def test_cutmix_box_statistics_match_reference_distribution():
    """Box widths ~ U{W/2+1,...,W-1}; area == round(H*W/2 / w) * w approx."""
    widths, areas = [], []
    data, target, logits = _batch(3)
    for s in range(40):
        nd, nt, _ = generate_unsup_data(
            jax.random.PRNGKey(s), data, target, logits, "cutmix", C
        )
        d = np.asarray(data)
        for i in range(B):
            j = (i + 1) % B
            swapped = ~np.isclose(np.asarray(nd)[i], d[i]).all(-1)
            if swapped.any():
                ys, xs = np.nonzero(swapped)
                wbox = xs.max() - xs.min() + 1
                widths.append(wbox)
                areas.append(swapped.sum())
    widths = np.asarray(widths)
    assert widths.min() >= W // 2 - 1
    assert widths.max() <= W
    # mean area ~ H*W/2 within sampling noise
    assert abs(np.mean(areas) - H * W / 2) < H * W * 0.12
