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
