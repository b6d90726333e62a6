"""Online hard-example-mining CE, parity with the reference tensor variant
`OhemCrossEntropy2dTensor` (reference loss_helper.py:451-531), which is the
one the Cityscapes configs exercise (criterion.type: ohem, thresh 0.7,
min_kept 100000).  The numpy/`nd.zoom` variant (loss_helper.py:363-448) is
legacy and not built (see SURVEY.md §2 dead paths).

Algorithm (fixed-shape, fully on device):
  * p_y = softmax prob of the target class per pixel, 1.0 at ignored pixels
    (reference masked_fill(~valid, 1), :516)
  * if min_kept <= num_valid: threshold = max(thresh, min_kept-th smallest
    p_y overall) and keep only pixels with p_y <= threshold (:519-526);
    otherwise keep every valid pixel (:512-513)
  * mean CE over kept pixels (optionally with the 19-class cityscapes
    weight vector, :464-486)
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

from u2pl_tpu.losses.ce import cross_entropy_ignore
from u2pl_tpu.ops.quantile import _keys_to_f32, _kth_smallest_keys, _order_keys

# use_weight=True vector (reference loss_helper.py:464-486)
CITYSCAPES_OHEM_WEIGHT = (
    0.8373, 0.918, 0.866, 1.0345, 1.0166, 0.9969, 0.9754, 1.0489, 0.8786,
    1.0023, 0.9539, 0.9843, 1.1116, 0.9037, 1.0865, 1.0955, 1.0865, 1.1529,
    1.0507,
)


def _kth_smallest(p_y: jax.Array, k: int) -> jax.Array:
    """k-th smallest of `p_y` (ascending, 1-based k — the min_kept-th
    smallest target-class prob, reference loss_helper.py:519-526).

    OHEM only consumes this as a scalar THRESHOLD (`p_y <= threshold`), so
    the order statistic is radix-selected from the order-preserving u32
    float keys (ops/quantile._kth_smallest_keys: fused compare-and-reduce
    passes, no sort, no (k,)-slab) instead of `lax.top_k(-p_y, k)` — the
    same machinery that beat the masked sort 2.7x on the entropy
    percentiles, and here it also avoids materializing a 100k-value top-k
    slab over 1-2M pixels per OHEM head (docs/PERF.md).  Bit-identical to
    `-lax.top_k(-p_y, k)[0][k-1]` (unit-tested, tests/test_losses.py).
    Falls back to top_k past the radix counter's 2^24-key exactness bound
    (only reachable at batch*769^2 >= 16.7M pixels, i.e. per-device batch
    >= 29)."""
    if p_y.shape[0] >= (1 << 24):
        return -jax.lax.top_k(-p_y, k)[0][k - 1]
    keys = _order_keys(p_y.astype(jnp.float32))
    return _keys_to_f32(_kth_smallest_keys(keys, jnp.asarray([k - 1], jnp.int32)))[0]


def ohem_cross_entropy(
    logits: jax.Array,
    labels: jax.Array,
    thresh: float = 0.7,
    min_kept: int = 100000,
    ignore_label: int = 255,
    use_weight: bool = False,
) -> jax.Array:
    b, h, w, c = logits.shape
    n = b * h * w
    flat_logits = logits.reshape(n, c).astype(jnp.float32)
    flat_labels = labels.reshape(n)
    valid = flat_labels != ignore_label
    target = jnp.where(valid, flat_labels, 0)

    prob = jax.nn.softmax(flat_logits, axis=-1)
    p_y = jnp.take_along_axis(prob, target[:, None], axis=-1)[:, 0]
    p_y = jnp.where(valid, p_y, 1.0)

    num_valid = valid.sum()
    k = min(n, int(min_kept))
    kth = _kth_smallest(p_y, k)
    threshold = jnp.maximum(jnp.asarray(thresh, jnp.float32), kth)
    apply_ohem = (num_valid > 0) & (min_kept <= num_valid)
    kept = jnp.where(apply_ohem, p_y <= threshold, True)

    new_labels = jnp.where(valid & kept, flat_labels, ignore_label)
    weight = jnp.asarray(CITYSCAPES_OHEM_WEIGHT) if use_weight else None
    return cross_entropy_ignore(
        flat_logits[None], new_labels[None], ignore_label, weight
    )


def ohem_supervised_loss(
    pred: jax.Array,
    labels: jax.Array,
    aux: Optional[jax.Array] = None,
    aux_weight: float = 0.0,
    thresh: float = 0.7,
    min_kept: int = 100000,
    ignore_label: int = 255,
    use_weight: bool = False,
) -> jax.Array:
    """`CriterionOhem` parity (loss_helper.py:323-360): OHEM on the main
    head, plain-weight OHEM on the aux head."""
    loss = ohem_cross_entropy(
        pred, labels, thresh, min_kept, ignore_label, use_weight
    )
    if aux is not None and aux_weight > 0:
        loss = loss + aux_weight * ohem_cross_entropy(
            aux, labels, thresh, min_kept, ignore_label, False
        )
    return loss
