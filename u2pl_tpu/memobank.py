"""Per-class negative-key memory bank as a fixed-shape device ring buffer.

The reference keeps a Python list of CPU tensors per class and syncs it
with pickle-based `dist.all_gather_object` + `dist.barrier` per class per
step (reference utils.py:16-47, ~num_classes host round-trips every
iteration).  Here the bank is a dense device array updated inside the
compiled step; cross-replica key exchange is a single fixed-shape
`lax.all_gather` over the data axis (ICI), and "keep the last queue_size
keys" becomes a ring-buffer scatter.

Capacities follow train_semi.py:161-169: 30,000 keys/class, 50,000 for
class 0.  Storage defaults to bfloat16 (keys feed a cosine-similarity
InfoNCE; bf16 is ample) — a documented deviation from the reference's
float32 CPU lists that keeps the whole bank (<=0.6 GB) resident in HBM.
"""

from __future__ import annotations

from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp


class MemoryBank(NamedTuple):
    keys: jax.Array  # (C, cap, feat) storage ring
    ptr: jax.Array  # (C,) int32 next write position
    occupancy: jax.Array  # (C,) int32 number of valid keys
    sizes: jax.Array  # (C,) int32 effective per-class capacity


def init_memobank(
    num_classes: int,
    feat_dim: int = 256,
    queue_size: int = 30000,
    class0_size: int = 50000,
    dtype=jnp.bfloat16,
) -> MemoryBank:
    sizes = jnp.full((num_classes,), queue_size, jnp.int32)
    sizes = sizes.at[0].set(class0_size)
    cap = int(max(queue_size, class0_size))
    return MemoryBank(
        keys=jnp.zeros((num_classes, cap, feat_dim), dtype),
        ptr=jnp.zeros((num_classes,), jnp.int32),
        occupancy=jnp.zeros((num_classes,), jnp.int32),
        sizes=sizes,
    )


def _enqueue_one(
    keys: jax.Array,
    ptr: jax.Array,
    occ: jax.Array,
    size: jax.Array,
    new_keys: jax.Array,
    valid: jax.Array,
) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """Ring-write rows of `new_keys` where `valid` into one class queue,
    preserving slab order (valid rows are compacted by rank)."""
    cap = keys.shape[0]
    validi = valid.astype(jnp.int32)
    n_new = validi.sum()
    rank = jnp.cumsum(validi) - 1
    # When one call enqueues more than `size` keys (possible multi-chip:
    # W devices x 8192-cap slabs vs a 30k queue), ring positions would
    # collide and XLA scatter order with duplicate indices is UNDEFINED.
    # Keep only the newest `size` ranks — indices become unique and the
    # reference's append-then-keep-newest semantics (utils.py:27-47) hold
    # exactly; invalid/dropped rows scatter out-of-bounds.
    keep = valid & (rank >= n_new - size)
    idx = jnp.where(keep, (ptr + rank) % size, cap)
    keys = keys.at[idx].set(new_keys.astype(keys.dtype), mode="drop")
    ptr = (ptr + n_new) % size
    occ = jnp.minimum(occ + n_new, size)
    return keys, ptr, occ


def enqueue(bank: MemoryBank, new_keys: jax.Array, valid: jax.Array) -> MemoryBank:
    """new_keys: (C, K, feat) per-class key slabs (already all-gathered
    across replicas); valid: (C, K) bool row-validity. Returns the updated
    bank.

    Equivalent to reference dequeue_and_enqueue (utils.py:27-47): append
    then keep the newest `size` keys (a full ring overwrites oldest first).
    """
    keys, ptr, occ = jax.vmap(_enqueue_one)(
        bank.keys, bank.ptr, bank.occupancy, bank.sizes, new_keys, valid
    )
    return MemoryBank(keys, ptr, occ, bank.sizes)


def enqueue_segments(
    bank: MemoryBank, new_keys: jax.Array, n: jax.Array
) -> MemoryBank:
    """Enqueue entry point for the train step: new_keys (C, W, K, feat)
    holds one prefix-compact slab per device (what `_select_keys` emits,
    one row of the cross-replica all_gather each); n (C, W) the per-slab
    key counts.  Only the (C, W) COUNT crosses ICI alongside the keys — the
    (C, W*K) bool validity mask the general `enqueue` needs is rebuilt
    locally here for free.

    The local write stays the `.at[idx].set` ring scatter of `enqueue`:
    a scatter-free "every bank row gathers the slab row that lands on it"
    streaming rewrite was measured 4x SLOWER at flagship shapes (19.6 ms vs
    5.0 ms net, tools/micro_piece_bench.py on v5e) — the scatter touches
    only the K incoming rows while the rewrite streams the full 30k-row
    queue through a row gather."""
    c, w, k, f = new_keys.shape
    valid = (
        jnp.arange(k, dtype=jnp.int32)[None, None, :]
        < jnp.minimum(n.astype(jnp.int32), k)[:, :, None]
    )
    return enqueue(bank, new_keys.reshape(c, w * k, f), valid.reshape(c, w * k))


def sample(
    bank: MemoryBank, rng: jax.Array, num_samples: int, dtype=jnp.float32
) -> Tuple[jax.Array, jax.Array]:
    """Uniform with-replacement sample of `num_samples` keys per class
    (reference randint over the queue, loss_helper.py:194-197).

    Returns (samples (C, num_samples, feat) in `dtype` (None = the bank's
    storage dtype), valid (C,) bool — False where a class queue is empty).
    """
    c = bank.keys.shape[0]
    u = jax.random.uniform(rng, (c, num_samples))
    occ = jnp.maximum(bank.occupancy, 1)
    idx = jnp.floor(u * occ[:, None]).astype(jnp.int32)
    samples = jnp.take_along_axis(bank.keys, idx[:, :, None], axis=1)
    if dtype is not None:
        samples = samples.astype(dtype)
    return samples, bank.occupancy > 0
