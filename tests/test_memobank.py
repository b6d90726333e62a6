import numpy as np

import jax
import jax.numpy as jnp

from u2pl_tpu.memobank import MemoryBank, enqueue, init_memobank, sample


def test_enqueue_and_wraparound():
    bank = init_memobank(2, 4, queue_size=5, class0_size=8, dtype=jnp.float32)
    assert bank.keys.shape == (2, 8, 4)

    def slab(start, n, k=6):
        keys = np.zeros((k, 4), np.float32)
        valid = np.zeros((k,), bool)
        keys[:n] = np.arange(start, start + n)[:, None]
        valid[:n] = True
        return keys, valid

    k0, v0 = slab(0, 3)
    k1, v1 = slab(100, 6)
    bank = enqueue(bank, jnp.asarray([k0, k1]), jnp.asarray([v0, v1]))
    np.testing.assert_array_equal(np.asarray(bank.occupancy), [3, 5])
    np.testing.assert_array_equal(np.asarray(bank.ptr), [3, 1])  # 6 % 5 == 1
    # class 1 ring: positions 0..4 hold 100..104, then 105 wrapped to pos 0
    np.testing.assert_array_equal(
        np.asarray(bank.keys[1, :5, 0]), [105, 101, 102, 103, 104]
    )

    # sampling only returns stored keys
    samples, nonempty = sample(bank, jax.random.PRNGKey(0), 64)
    assert bool(nonempty[0]) and bool(nonempty[1])
    got0 = set(np.asarray(samples[0, :, 0]).tolist())
    assert got0.issubset({0.0, 1.0, 2.0})


def test_empty_class_sampling_flag():
    bank = init_memobank(3, 4, queue_size=5, class0_size=5, dtype=jnp.float32)
    _, nonempty = sample(bank, jax.random.PRNGKey(0), 8)
    assert not bool(nonempty.any())


def test_valid_mask_compaction_preserves_order():
    bank = init_memobank(1, 2, queue_size=10, class0_size=10, dtype=jnp.float32)
    keys = np.arange(8, dtype=np.float32).repeat(2).reshape(8, 2)
    valid = np.array([0, 1, 0, 1, 1, 0, 0, 1], bool)
    bank = enqueue(bank, jnp.asarray(keys[None]), jnp.asarray(valid[None]))
    np.testing.assert_array_equal(np.asarray(bank.keys[0, :4, 0]), [1, 3, 4, 7])
    assert int(bank.occupancy[0]) == 4


def test_enqueue_segments_matches_general_enqueue():
    """The scatter-free segment path (used by the train step) must equal
    the general enqueue on prefix-compact slabs — including multi-device
    segments and wrap-over past the queue size."""
    from u2pl_tpu.memobank import enqueue_segments

    rng = np.random.RandomState(0)
    C, W, K, F = 3, 4, 16, 5
    for trial in range(6):
        qsize = [7, 40, 13][trial % 3]
        bank_a = init_memobank(C, F, queue_size=qsize, class0_size=qsize + 4,
                               dtype=jnp.float32)
        # pre-fill with a first slab so ptr/occ are non-trivial
        pre = rng.randn(C, 1, K, F).astype(np.float32)
        pre_n = rng.randint(0, K + 1, (C, 1))
        slab = rng.randn(C, W, K, F).astype(np.float32)
        n = rng.randint(0, K + 1, (C, W))

        bank_b = bank_a
        for keys4, counts in [(pre, pre_n), (slab, n)]:
            bank_a = enqueue_segments(bank_a, jnp.asarray(keys4),
                                      jnp.asarray(counts))
            flat = jnp.asarray(keys4.reshape(C, -1, F))
            valid = np.zeros((C, keys4.shape[1] * K), bool)
            for c in range(C):
                for w in range(keys4.shape[1]):
                    valid[c, w * K: w * K + counts[c, w]] = True
            bank_b = enqueue(bank_b, flat, jnp.asarray(valid))

        np.testing.assert_array_equal(np.asarray(bank_a.ptr), np.asarray(bank_b.ptr))
        np.testing.assert_array_equal(np.asarray(bank_a.occupancy),
                                      np.asarray(bank_b.occupancy))
        np.testing.assert_allclose(np.asarray(bank_a.keys), np.asarray(bank_b.keys))


def test_overfull_single_enqueue_keeps_newest_size_keys():
    """Enqueueing more keys than the queue size in ONE call (multi-chip:
    W x 8192-cap slabs vs a 30k queue) must keep exactly the newest `size`
    keys in ring order — scatter indices are de-duplicated to the newest
    rank, because XLA scatter order with duplicate indices is undefined
    (reference append-then-trim, utils.py:27-47)."""
    C, F, qsize = 2, 3, 5
    bank = init_memobank(C, F, queue_size=qsize, class0_size=qsize, dtype=jnp.float32)
    # advance ptr to 2 with an initial partial write
    first = jnp.arange(C * 2 * F, dtype=jnp.float32).reshape(C, 2, F)
    bank = enqueue(bank, first, jnp.ones((C, 2), bool))
    assert int(bank.ptr[0]) == 2

    n = 12  # > 2 * qsize, two full wraps
    keys = (100 + jnp.arange(C * n * F, dtype=jnp.float32)).reshape(C, n, F)
    bank = enqueue(bank, keys, jnp.ones((C, n), bool))

    np.testing.assert_array_equal(np.asarray(bank.occupancy), [qsize, qsize])
    np.testing.assert_array_equal(np.asarray(bank.ptr), [(2 + n) % qsize] * C)
    for c in range(C):
        for r in range(n - qsize, n):  # the newest qsize ranks
            pos = (2 + r) % qsize
            np.testing.assert_array_equal(
                np.asarray(bank.keys[c, pos]), np.asarray(keys[c, r])
            )
