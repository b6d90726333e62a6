"""Entropy-gated unsupervised CE on pseudo-labels.

Parity with reference `compute_unsupervised_loss` (loss_helper.py:30-48):
pixels whose teacher-prediction entropy is >= the `percent`-th percentile
of entropy over currently-valid pixels are dropped (label -> 255), and the
CE is re-weighted by batch_size*h*w / num_kept.

The reference runs np.percentile on host (a device->host sync every step,
loss_helper.py:38); here the percentile is computed on device with
`masked_percentile`, keeping the train step a single XLA program.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

from u2pl_tpu.losses.ce import cross_entropy_ignore
from u2pl_tpu.ops.quantile import masked_percentile


def teacher_entropy(pred_teacher: jax.Array) -> jax.Array:
    """-sum p log(p + 1e-10) over classes (loss_helper.py:35-36)."""
    prob = jax.nn.softmax(pred_teacher.astype(jnp.float32), axis=-1)
    return -jnp.sum(prob * jnp.log(prob + 1e-10), axis=-1)


def compute_unsupervised_loss(
    pred: jax.Array,
    target: jax.Array,
    percent: jax.Array,
    pred_teacher: jax.Array,
    ignore_label: int = 255,
    entropy: Optional[jax.Array] = None,
    thresh: Optional[jax.Array] = None,
) -> jax.Array:
    """pred/pred_teacher: (B, H, W, C) logits at label resolution;
    target: (B, H, W) pseudo-labels. percent may be a traced scalar
    (it anneals with epoch, train_semi.py:377-379).  `entropy`/`thresh`
    can be precomputed by the caller (the semi step shares one masked
    entropy sort across the three per-step percentiles)."""
    b, h, w, _ = pred.shape
    if entropy is None:
        entropy = teacher_entropy(pred_teacher)

    valid = target != ignore_label
    if thresh is None:
        thresh = masked_percentile(entropy, valid, percent)
    drop = (entropy >= thresh) & valid
    new_target = jnp.where(drop, ignore_label, target)

    kept = (new_target != ignore_label).sum().astype(jnp.float32)
    weight = (b * h * w) / jnp.maximum(kept, 1.0)
    return weight * cross_entropy_ignore(pred, new_target, ignore_label)
