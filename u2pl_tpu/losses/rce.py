"""Reverse cross-entropy (symmetric-CE component).

Parity with reference `compute_rce_loss` (loss_helper.py:10-27), which the
reference defines but never calls from its trainers; provided for the same
API surface.  rce = -sum_c softmax(pred)_c * log(clamp(onehot_c, 1e-4, 1)),
averaged over non-ignored pixels.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def compute_rce_loss(
    predict: jax.Array, target: jax.Array, ignore_label: int = 255
) -> jax.Array:
    """predict: (B, H, W, C) logits; target: (B, H, W) int labels."""
    num_cls = predict.shape[-1]
    prob = jax.nn.softmax(predict.astype(jnp.float32), axis=-1)
    valid = target != ignore_label
    safe = jnp.where(valid, target, 0)
    onehot = jax.nn.one_hot(safe, num_cls, dtype=jnp.float32)
    label = jnp.clip(onehot, 1e-4, 1.0)
    rce = -jnp.sum(prob * jnp.log(label), axis=-1) * valid
    return rce.sum() / jnp.maximum(valid.sum(), 1)
