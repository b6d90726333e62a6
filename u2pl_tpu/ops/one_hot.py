"""One-hot encoding with ignore-label zeroing.

Matches reference `label_onehot` (utils.py:50-59): pixels whose label is the
ignore index (255) produce an all-zero one-hot row rather than a class.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def label_onehot(
    labels: jax.Array, num_classes: int, ignore_label: int = 255
) -> jax.Array:
    """labels: (B, H, W) int -> (B, H, W, C) float32; ignore rows all-zero."""
    valid = labels != ignore_label
    safe = jnp.where(valid, labels, 0)
    oh = jax.nn.one_hot(safe, num_classes, dtype=jnp.float32)
    return oh * valid[..., None].astype(jnp.float32)
