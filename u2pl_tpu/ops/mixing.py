"""On-device strong augmentation for the unlabeled batch: cutout / cutmix /
classmix, parity with reference `generate_unsup_data`
(augmentation.py:498-541) plus `generate_cutout_mask` (:471-485) and
`generate_class_mask` (:488-495).

The reference builds masks with host numpy RNG per sample; here masks are
built inside the compiled step from a jax PRNG key via coordinate
comparisons (no dynamic shapes), so strong augmentation costs zero host
round-trips.  Same distributions: box width ~ U{W/ratio+1, ..., W-1}, box
height = round(area/ratio / w), uniform placement; classmix selects a
random half of the classes present in the pseudo-label map.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp


def _randint(rng: jax.Array, lo, hi) -> jax.Array:
    """np.random.randint(lo, hi) parity for traced bounds: lo + floor(u*(hi-lo))."""
    u = jax.random.uniform(rng, ())
    lo = jnp.asarray(lo, jnp.float32)
    hi = jnp.asarray(hi, jnp.float32)
    return (lo + jnp.floor(u * (hi - lo))).astype(jnp.int32)


def _cutout_box_mask(rng: jax.Array, im_h: int, im_w: int, ratio: float) -> jax.Array:
    """generate_cutout_mask parity (:471-485): 0 inside the box, 1 outside."""
    area = im_h * im_w / ratio
    r1, r2, r3 = jax.random.split(rng, 3)
    w = _randint(r1, int(im_w / ratio) + 1, im_w)
    h = jnp.round(area / w.astype(jnp.float32)).astype(jnp.int32)
    x0 = _randint(r2, 0, im_w - w + 1)
    y0 = _randint(r3, 0, im_h - h + 1)
    ys = jax.lax.broadcasted_iota(jnp.int32, (im_h, im_w), 0)
    xs = jax.lax.broadcasted_iota(jnp.int32, (im_h, im_w), 1)
    inside = (ys >= y0) & (ys < y0 + h) & (xs >= x0) & (xs < x0 + w)
    return jnp.where(inside, 0, 1).astype(jnp.int32)


def _class_half_mask(
    rng: jax.Array, target: jax.Array, num_classes: int
) -> jax.Array:
    """generate_class_mask parity (:488-495): 1 on pixels whose label is in
    a uniformly random half (len//2) of the classes present in `target`."""
    flat = target.reshape(-1)
    present = jnp.zeros((num_classes,), bool).at[jnp.clip(flat, 0, num_classes - 1)].set(
        True, mode="drop"
    )
    n_present = present.sum()
    k = n_present // 2  # len(labels)//2
    scores = jnp.where(present, jax.random.uniform(rng, (num_classes,)), jnp.inf)
    order = jnp.argsort(scores)
    sel_rank = jnp.argsort(order)  # rank of each class by score
    selected = present & (sel_rank < k)
    return selected[jnp.clip(target, 0, num_classes - 1)].astype(jnp.int32)


def generate_unsup_data(
    rng: jax.Array,
    data: jax.Array,  # (B, H, W, 3)
    target: jax.Array,  # (B, H, W) int pseudo-labels
    logits: jax.Array,  # (B, H, W) max teacher prob
    mode: str,
    num_classes: int,
    ignore_label: int = 255,
) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """Parity with reference generate_unsup_data (:498-541).

    cutout:   zero the box in image/logits, label 255 inside the box
    cutmix:   paste the box region FROM the next sample ((i+1) % B)
    classmix: paste pixels of a random half of sample i's classes kept from
              i, rest from the next sample
    """
    b, im_h, im_w = target.shape
    keys = jax.random.split(rng, b)

    if mode == "cutout":
        masks = jax.vmap(lambda k: _cutout_box_mask(k, im_h, im_w, 2.0))(keys)
        mf = masks.astype(data.dtype)[..., None]
        new_data = data * mf
        new_target = jnp.where(masks == 0, ignore_label, target)
        new_logits = logits * masks.astype(logits.dtype)
        return new_data, new_target, new_logits

    if mode == "cutmix":
        masks = jax.vmap(lambda k: _cutout_box_mask(k, im_h, im_w, 2.0))(keys)
    elif mode == "classmix":
        masks = jax.vmap(lambda k, t: _class_half_mask(k, t, num_classes))(
            keys, target
        )
    else:
        raise ValueError(f"unknown unsup aug mode {mode!r}")

    nxt = lambda x: jnp.roll(x, -1, axis=0)  # (i+1) % batch_size partner
    mf = masks.astype(data.dtype)[..., None]
    new_data = data * mf + nxt(data) * (1 - mf)
    mt = masks.astype(target.dtype)
    new_target = target * mt + nxt(target) * (1 - mt)
    ml = masks.astype(logits.dtype)
    new_logits = logits * ml + nxt(logits) * (1 - ml)
    return new_data, new_target, new_logits
