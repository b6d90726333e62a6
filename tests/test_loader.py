"""EpochLoader semantics: deterministic epoch shuffling, drop_last,
multi-process batch slicing, prefetch correctness."""

import numpy as np

from u2pl_tpu.data.loader import EpochLoader, epoch_indices


class _ArrayDataset:
    def __init__(self, n):
        self.n = n

    def __len__(self):
        return self.n

    def __getitem__(self, i):
        img = np.full((4, 4, 3), i, np.float32)
        lab = np.full((4, 4), i, np.int32)
        return img, lab


def test_epoch_shuffling_deterministic():
    a = epoch_indices(100, epoch=3, seed=7)
    b = epoch_indices(100, epoch=3, seed=7)
    c = epoch_indices(100, epoch=4, seed=7)
    np.testing.assert_array_equal(a, b)
    assert not np.array_equal(a, c)
    assert sorted(a.tolist()) == list(range(100))


def test_drop_last_and_batch_contents():
    ds = _ArrayDataset(10)
    loader = EpochLoader(ds, batch_size=4, seed=0, shuffle=True, drop_last=True)
    assert len(loader) == 2
    seen = []
    for imgs, labs in loader.epoch(0):
        assert imgs.shape == (4, 4, 4, 3)
        np.testing.assert_array_equal(imgs[:, 0, 0, 0].astype(int), labs[:, 0, 0])
        seen += labs[:, 0, 0].tolist()
    assert len(seen) == 8 and len(set(seen)) == 8


def test_process_slicing_partitions_batch():
    # batch_size is PER REPLICA (reference per-GPU convention): global batch
    # = batch_size * replicas_per_process * process_count
    ds = _ArrayDataset(16)
    shards = []
    for pi in range(2):
        loader = EpochLoader(
            ds, batch_size=2, seed=1, shuffle=True, drop_last=True,
            process_index=pi, process_count=2, replicas_per_process=2,
        )
        assert loader.global_batch == 8
        assert len(loader) == 2
        shards.append([labs[:, 0, 0].tolist() for _, labs in loader.epoch(0)])
    # per-batch: the two process slices are disjoint 4-sample halves of the
    # global batch of 8
    for b0, b1 in zip(shards[0], shards[1]):
        assert len(b0) == len(b1) == 4
        assert not set(b0) & set(b1)


def test_no_shuffle_order():
    ds = _ArrayDataset(6)
    loader = EpochLoader(ds, batch_size=2, seed=0, shuffle=False, drop_last=False)
    order = []
    for _, labs in loader.epoch(0):
        order += labs[:, 0, 0].tolist()
    assert order == list(range(6))
