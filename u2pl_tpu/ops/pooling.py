"""Ceil-mode max pooling matching torch nn.MaxPool2d(ceil_mode=True).

The reference ResNet stem uses MaxPool2d(kernel=3, stride=2, padding=1,
ceil_mode=True) (reference resnet.py:189-191).  XLA reduce_window only does
floor-mode output sizing, so ceil mode is realised by padding the right /
bottom edge with -inf just enough that floor sizing produces the ceil-mode
output size.  torch additionally guarantees the last window starts inside
the (zero-)padded input; the computed extra padding below respects that.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


def _ceil_pool_pad(size: int, kernel: int, stride: int, pad: int) -> tuple:
    out_floor = (size + 2 * pad - kernel) // stride + 1
    out_ceil = -(-(size + 2 * pad - kernel) // stride) + 1
    # torch: last window must start at index < size + pad (left pad counted)
    if out_ceil > out_floor:
        start_last = (out_ceil - 1) * stride
        if start_last >= size + pad:
            out_ceil -= 1
    extra = (out_ceil - 1) * stride + kernel - (size + 2 * pad)
    return out_ceil, max(extra, 0)


def max_pool_ceil(
    x: jax.Array, kernel: int = 3, stride: int = 2, pad: int = 1
) -> jax.Array:
    """NHWC max pool, ceil_mode=True, padding value -inf."""
    b, h, w, c = x.shape
    _, extra_h = _ceil_pool_pad(h, kernel, stride, pad)
    _, extra_w = _ceil_pool_pad(w, kernel, stride, pad)
    # NB: init value must be a host scalar — a DeviceArray init breaks
    # reverse-mode linearization of reduce_window under shard_map
    if jnp.issubdtype(x.dtype, jnp.floating):
        neg = np.asarray(-np.inf, x.dtype)
    else:
        neg = np.asarray(np.iinfo(x.dtype).min, x.dtype)
    return jax.lax.reduce_window(
        x,
        neg,
        jax.lax.max,
        window_dimensions=(1, kernel, kernel, 1),
        window_strides=(1, stride, stride, 1),
        padding=((0, 0), (pad, pad + extra_h), (pad, pad + extra_w), (0, 0)),
    )
