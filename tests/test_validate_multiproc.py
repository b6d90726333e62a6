"""Multi-process validation correctness (reference train_semi.py:630-647
all_reduces val intersection/union across ranks).

jax.process_count() is always 1 under test, so the cross-process psum
itself cannot execute here; what IS testable end-to-end is the contract it
relies on: per-process loaders slice every val batch disjointly and
exhaustively, and summing the per-process intersection/union accumulations
reproduces the single-process sums exactly (identical mIoU).
"""

import numpy as np
import jax.numpy as jnp

from u2pl_tpu.data.loader import EpochLoader
from u2pl_tpu.dist import all_sum_across_processes
from u2pl_tpu.evallib.metrics import intersection_and_union_device

C = 4
HW = 9


class FakeValSet:
    """Deterministic (image, label) pairs; image encodes a fake 'pred'."""

    def __init__(self, n):
        rng = np.random.RandomState(0)
        self.items = [
            (
                rng.randint(0, C, (HW, HW)).astype(np.float32),  # pred-as-image
                rng.randint(0, C, (HW, HW)).astype(np.int32),
            )
            for _ in range(n)
        ]

    def __len__(self):
        return len(self.items)

    def __getitem__(self, i):
        return self.items[i]


def _val_sums(loader):
    inter = np.zeros(C, np.int64)
    union = np.zeros(C, np.int64)
    for images, labels in loader.epoch(0):
        i, u, _ = intersection_and_union_device(
            jnp.asarray(images, jnp.int32), jnp.asarray(labels), C, 255
        )
        inter += np.asarray(i, np.int64)
        union += np.asarray(u, np.int64)
    return inter, union


def test_two_process_slices_reproduce_single_process_miou():
    # odd-sized val set => ragged final batch exercises the empty-slice guard
    ds = FakeValSet(11)
    single = EpochLoader(ds, batch_size=2, seed=0, shuffle=False, drop_last=False)
    want_i, want_u = _val_sums(single)

    got_i = np.zeros(C, np.int64)
    got_u = np.zeros(C, np.int64)
    seen = 0
    for proc in range(2):
        lo = EpochLoader(
            ds, batch_size=1, seed=0, shuffle=False, drop_last=False,
            process_index=proc, process_count=2,
        )
        for images, _labels in lo.epoch(0):
            seen += images.shape[0]
        i, u = _val_sums(lo)
        got_i += i
        got_u += u

    assert seen == len(ds), "process slices must cover the val set exactly"
    np.testing.assert_array_equal(got_i, want_i)
    np.testing.assert_array_equal(got_u, want_u)
    want_miou = (want_i / (want_u + 1e-10)).mean()
    got_miou = (got_i / (got_u + 1e-10)).mean()
    assert abs(want_miou - got_miou) < 1e-12


def test_all_sum_across_processes_single_process_identity():
    x = np.arange(5, dtype=np.int64)
    np.testing.assert_array_equal(all_sum_across_processes(x), x)
