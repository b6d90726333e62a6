"""Host-pipeline Cutout/Cutmix parity vs the reference transforms (same
np.random seed -> identical masks)."""

import os
import sys

import numpy as np
import pytest

from u2pl_tpu.data.transforms import Cutmix, Cutout

sys.path.insert(0, os.path.dirname(__file__))
from ref_oracle import REF, reference_available, setup_reference

pytestmark = pytest.mark.skipif(
    not reference_available(), reason="reference not mounted"
)

torch = pytest.importorskip("torch")


@pytest.fixture(scope="module")
def ref_aug():
    setup_reference()
    import u2pl.dataset.augmentation as aug

    return aug


def test_cutout_matches_reference(ref_aug):
    rng = np.random.RandomState(0)
    img = rng.rand(20, 24, 3).astype(np.float32)
    lab = rng.randint(0, 19, (20, 24)).astype(np.float32)

    np.random.seed(3)
    io, lo, ci, cl, valid = Cutout(n_holes=3, length=8)(img, lab)

    timg = torch.from_numpy(img).permute(2, 0, 1)[None]
    tlab = torch.from_numpy(lab)[None, None]
    np.random.seed(3)
    tio, tlo, tci, tcl, tvalid = ref_aug.Cutout(n_holes=3, length=8)(timg, tlab)

    np.testing.assert_allclose(ci, tci[0].permute(1, 2, 0).numpy(), atol=1e-6)
    np.testing.assert_array_equal(valid, tvalid[0, 0].numpy())
    np.testing.assert_allclose(io, tio[0].permute(1, 2, 0).numpy(), atol=1e-6)


def test_cutmix_mask_matches_reference(ref_aug):
    rng = np.random.RandomState(1)
    img = rng.rand(32, 32, 3).astype(np.float32)
    lab = rng.randint(0, 19, (32, 32)).astype(np.float32)

    np.random.seed(5)
    _, _, masks = Cutmix(prop_range=0.5)(img, lab)

    timg = torch.from_numpy(img).permute(2, 0, 1)[None]
    tlab = torch.from_numpy(lab)[None, None]
    np.random.seed(5)
    _, _, tmasks = ref_aug.Cutmix(prop_range=0.5)(timg, tlab)

    np.testing.assert_array_equal(masks, tmasks.numpy())
