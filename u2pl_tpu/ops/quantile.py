"""On-device masked percentile matching np.percentile semantics.

The reference pays three device->host syncs per train step to run
`np.percentile` on masked entropy maps (reference loss_helper.py:38,
train_semi.py:405,412).  This computes the same linear-interpolated
percentile fully on device with a fixed-shape masked sort, so the semi
train step stays one fused XLA program.

np.percentile (default 'linear' interpolation) over n valid values:
    rank = percent/100 * (n-1)
    out  = v[floor(rank)] + (rank - floor(rank)) * (v[ceil(rank)] - v[floor(rank)])
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def masked_sort(values: jax.Array, mask: jax.Array):
    """Sort `values` with invalid entries pushed to +inf.  Returns
    (sorted_values (N,), n_valid scalar int32).  One sort can then serve
    several percentile queries (the semi step needs three percentiles of
    the SAME masked entropy per iteration — reference loss_helper.py:38,
    train_semi.py:405,412)."""
    v = values.reshape(-1).astype(jnp.float32)
    m = mask.reshape(-1)
    n = m.sum().astype(jnp.int32)
    big = jnp.asarray(jnp.inf, jnp.float32)
    v = jnp.where(m, v, big)
    return jnp.sort(v), n


def percentile_from_sorted(
    sorted_vals: jax.Array, n: jax.Array, percent: jax.Array
) -> jax.Array:
    """numpy 'linear' percentile from a masked sort."""
    pct = jnp.asarray(percent, jnp.float32)
    rank = pct / 100.0 * jnp.maximum(n - 1, 0).astype(jnp.float32)
    lo = jnp.floor(rank).astype(jnp.int32)
    hi = jnp.minimum(lo + 1, jnp.maximum(n - 1, 0))
    frac = rank - lo.astype(jnp.float32)
    v_lo = sorted_vals[jnp.clip(lo, 0, sorted_vals.shape[0] - 1)]
    v_hi = sorted_vals[jnp.clip(hi, 0, sorted_vals.shape[0] - 1)]
    out = v_lo + frac * (v_hi - v_lo)
    return jnp.where(n > 0, out, jnp.asarray(jnp.inf, jnp.float32))


def masked_percentile(
    values: jax.Array, mask: jax.Array, percent: jax.Array
) -> jax.Array:
    """Percentile of `values[mask]` with numpy 'linear' interpolation.

    values: any shape, float. mask: same shape, bool. percent: scalar in
    [0, 100] (may be traced). Returns a float32 scalar.  If the mask is
    empty returns +inf (callers gate on validity; the reference would have
    crashed on an empty mask).
    """
    sorted_vals, n = masked_sort(values, mask)
    return percentile_from_sorted(sorted_vals, n, percent)


# ---------------------------------------------------------------------------
# Sort-free exact percentiles via radix selection.
#
# The semi train step needs three percentiles of ONE masked entropy map
# (~1M pixels at the flagship shape); the full `jnp.sort` behind
# masked_sort costs ~4-6 ms of the ~250 ms step on a v5e.  The order
# statistics it feeds can be found exactly without sorting: map f32 to
# its order-preserving uint32 key and descend a 4-level radix-256
# histogram to the k-th smallest key.  Each level is one fused
# compare-and-reduce over the data (no scatter — TPU scatters serialize
# under manual partitioning, see losses/contrastive.py), so the whole
# selection is 4 parallel passes + O(256) scalar work per level, and the
# recovered values are BIT-IDENTICAL to indexing the sorted array.
# ---------------------------------------------------------------------------


def _order_keys(v32: jax.Array) -> jax.Array:
    """Monotonic f32 -> u32 key: x < y  <=>  key(x) < key(y).

    Standard float-radix transform: flip all bits of negatives, flip only
    the sign bit of non-negatives (+inf maps below NaN keys, so +inf mask
    filler sorts last like in masked_sort)."""
    bits = jax.lax.bitcast_convert_type(v32, jnp.uint32)
    neg = (bits >> 31) == 1
    return jnp.where(neg, ~bits, bits | jnp.uint32(0x80000000))


def _keys_to_f32(keys: jax.Array) -> jax.Array:
    """Inverse of _order_keys."""
    neg = (keys >> 31) == 0
    bits = jnp.where(neg, ~keys, keys & jnp.uint32(0x7FFFFFFF))
    return jax.lax.bitcast_convert_type(bits, jnp.float32)


def _kth_smallest_keys(
    keys: jax.Array, ks: jax.Array, radix_bits: int = 4
) -> jax.Array:
    """Exact k-th smallest (0-based, per k in `ks` (K,)) of u32 `keys` (N,).

    32/radix_bits radix levels; each level is ONE fused compare-and-reduce
    over the data (a key lands in bin b of query k iff its shifted high
    bits equal `prefix[k]`'s shifted bits with b appended — a single
    equality per element-bin pair).  Narrow radix (16 bins) trades level
    count for per-level VPU work, which measures faster than radix-256 on
    v5e at ~1M keys.  Counts accumulate in f32 (exact below 2^24 keys)."""
    if keys.shape[0] >= (1 << 24):  # f32 count exactness bound
        raise ValueError("radix select supports < 2^24 keys")
    n_bins = 1 << radix_bits
    bins = jnp.arange(n_bins, dtype=jnp.uint32)
    prefix = jnp.zeros((ks.shape[0],), jnp.uint32)
    remaining = ks.astype(jnp.float32)
    for level in range(32 // radix_bits):
        shift = 32 - radix_bits * (level + 1)
        # target[k, b] == high bits of any key whose first `level` digits
        # match prefix[k] and whose next digit is b
        target = (prefix >> shift)[:, None] | bins[None, :]  # (K, n_bins)
        hist = jnp.sum(
            ((keys[:, None, None] >> shift) == target[None]).astype(
                jnp.float32
            ),
            axis=0,
        )  # (K, n_bins); generated-and-reduced in one fusion
        csum = jnp.cumsum(hist, axis=-1)
        # first bin whose cumulative count exceeds the remaining rank
        sel = jnp.argmax(csum > remaining[:, None], axis=-1)
        below = jnp.take_along_axis(csum, sel[:, None], axis=-1)[
            :, 0
        ] - jnp.take_along_axis(hist, sel[:, None], axis=-1)[:, 0]
        remaining = remaining - below
        prefix = prefix | (sel.astype(jnp.uint32) << shift)
    return prefix


def masked_percentiles(
    values: jax.Array, mask: jax.Array, percents: jax.Array
) -> jax.Array:
    """numpy-'linear' percentiles of `values[mask]` without sorting.

    values: any shape, float. mask: same shape, bool. percents: (K,)
    scalars in [0, 100] (may be traced). Returns (K,) float32 —
    bit-identical to `percentile_from_sorted(*masked_sort(values, mask))`
    per entry, via exact radix selection of the two order statistics each
    percentile interpolates between. Empty mask returns +inf (same
    contract as masked_percentile)."""
    v = values.reshape(-1).astype(jnp.float32)
    m = mask.reshape(-1)
    n = m.sum().astype(jnp.int32)
    v = jnp.where(m, v, jnp.inf)
    keys = _order_keys(v)

    pct = jnp.asarray(percents, jnp.float32)
    rank = pct / 100.0 * jnp.maximum(n - 1, 0).astype(jnp.float32)
    lo = jnp.floor(rank).astype(jnp.int32)
    hi = jnp.minimum(lo + 1, jnp.maximum(n - 1, 0))
    frac = rank - lo.astype(jnp.float32)

    lo_keys = _kth_smallest_keys(keys, jnp.clip(lo, 0, keys.shape[0] - 1))
    v_lo = _keys_to_f32(lo_keys)
    # sorted[lo+1] without a second descent: if sorted[lo] still covers
    # rank lo+1 (duplicates), it IS the next order statistic; otherwise
    # it's the smallest key strictly greater — one more fused pass.
    count_le = jnp.sum(
        (keys[:, None] <= lo_keys[None, :]).astype(jnp.int32), axis=0
    )  # (K,)
    next_key = jnp.min(
        jnp.where(
            keys[:, None] > lo_keys[None, :],
            keys[:, None],
            jnp.uint32(0xFFFFFFFF),
        ),
        axis=0,
    )
    v_next = _keys_to_f32(next_key)
    v_hi = jnp.where(count_le > hi, v_lo, v_next)
    # hi == lo (rank pinned at n-1): frac is 0 there, but keep the value
    # finite so 0 * (v_hi - v_lo) can't turn into 0 * inf = nan
    v_hi = jnp.where(hi == lo, v_lo, v_hi)

    out = v_lo + frac * (v_hi - v_lo)
    return jnp.where(n > 0, out, jnp.asarray(jnp.inf, jnp.float32))
