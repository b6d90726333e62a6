"""Cross-entropy criteria with ignore-index, parity with the reference
`Criterion` (reference loss_helper.py:258-320) and torch
nn.CrossEntropyLoss(ignore_index=255) semantics.

Logits are NHWC; labels (B, H, W) int32.  Reductions happen in float32.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

# 19-entry binary class-weight vector used by Criterion(use_weight=True)
# (reference loss_helper.py:267-289) — cityscapes-only auxiliary weighting.
CITYSCAPES_BINARY_WEIGHT = (
    0.0, 0.0, 0.0, 1.0, 1.0, 1.0, 1.0, 0.0, 0.0, 1.0,
    0.0, 0.0, 1.0, 0.0, 1.0, 0.0, 1.0, 1.0, 1.0,
)


def cross_entropy_ignore(
    logits: jax.Array,
    labels: jax.Array,
    ignore_label: int = 255,
    class_weight: Optional[jax.Array] = None,
) -> jax.Array:
    """Mean CE over non-ignored pixels (torch CrossEntropyLoss parity).

    With class_weight w: sum(w[y]*nll) / sum(w[y]) over valid pixels (torch
    weighted-CE normalization).  Empty valid set returns 0 (torch would
    produce NaN; the train step never feeds an all-ignored batch, but 0 is
    the safe compiled behavior).
    """
    valid = labels != ignore_label
    safe = jnp.where(valid, labels, 0)
    logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
    nll = -jnp.take_along_axis(logp, safe[..., None], axis=-1)[..., 0]
    if class_weight is not None:
        w = jnp.asarray(class_weight, jnp.float32)[safe] * valid
        denom = w.sum()
        return jnp.where(denom > 0, (nll * w).sum() / jnp.maximum(denom, 1e-12), 0.0)
    vf = valid.astype(jnp.float32)
    denom = vf.sum()
    return jnp.where(denom > 0, (nll * vf).sum() / jnp.maximum(denom, 1.0), 0.0)


def supervised_loss(
    pred: jax.Array,
    labels: jax.Array,
    aux: Optional[jax.Array] = None,
    aux_weight: float = 0.0,
    ignore_label: int = 255,
    use_weight: bool = False,
) -> jax.Array:
    """`Criterion` parity (loss_helper.py:295-320): main CE (+ the binary-
    weighted CE added on top when use_weight) + aux_weight * aux CE.
    pred/aux must already be upsampled to label resolution.

    Reference quirk kept: use_weight only takes effect together with the
    aux head — the non-aux branch (:316-319) ignores it entirely."""
    loss = cross_entropy_ignore(pred, labels, ignore_label)
    has_aux = aux is not None and aux_weight > 0
    if use_weight and has_aux:
        loss = loss + cross_entropy_ignore(
            pred, labels, ignore_label, jnp.asarray(CITYSCAPES_BINARY_WEIGHT)
        )
    if has_aux:
        loss = loss + aux_weight * cross_entropy_ignore(aux, labels, ignore_label)
    return loss
