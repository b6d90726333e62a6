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


class _RandomAugDataset:
    """__getitem__ draws from the global RNGs, like the real transforms."""

    def __init__(self, n):
        self.n = n

    def __len__(self):
        return self.n

    def __getitem__(self, i):
        import random

        jitter = random.random() + np.random.rand()
        img = np.full((4, 4, 3), i + jitter, np.float32)
        lab = np.full((4, 4), i, np.int32)
        return img, lab


def test_process_mode_matches_thread_contents():
    # same index partitioning/prefetch protocol in both modes for a
    # deterministic dataset
    ds = _ArrayDataset(12)
    out = {}
    for mode in ("thread", "process"):
        loader = EpochLoader(
            ds, batch_size=3, seed=5, shuffle=True, drop_last=True,
            workers=2, workers_mode=mode,
        )
        out[mode] = [
            (imgs.copy(), labs.copy()) for imgs, labs in loader.epoch(2)
        ]
        loader.close()
    assert len(out["thread"]) == len(out["process"]) == 4
    for (ti, tl), (pi, pl) in zip(out["thread"], out["process"]):
        np.testing.assert_array_equal(ti, pi)
        np.testing.assert_array_equal(tl, pl)


def test_process_mode_augmentation_deterministic():
    # per-task RNG reseeding: two independent loaders produce bit-identical
    # augmented batches regardless of worker scheduling (thread mode cannot
    # promise this — concurrent assembles interleave on the global RNG)
    ds = _RandomAugDataset(16)
    runs = []
    for _ in range(2):
        loader = EpochLoader(
            ds, batch_size=4, seed=9, shuffle=True, drop_last=True,
            workers=3, workers_mode="process", prefetch=4,
        )
        runs.append([imgs.copy() for imgs, _ in loader.epoch(1)])
        loader.close()
    for a, b in zip(runs[0], runs[1]):
        np.testing.assert_array_equal(a, b)
    # different epochs draw different augmentation randomness
    loader = EpochLoader(
        ds, batch_size=4, seed=9, shuffle=False, drop_last=True,
        workers=2, workers_mode="process",
    )
    e0 = [imgs.copy() for imgs, _ in loader.epoch(0)]
    e1 = [imgs.copy() for imgs, _ in loader.epoch(1)]
    # pool persists across epochs (no respawn per epoch)
    assert loader._proc_pool is not None
    loader.close()
    assert loader._proc_pool is None
    assert any(not np.array_equal(a, b) for a, b in zip(e0, e1))
