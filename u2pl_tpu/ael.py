"""Adaptive-CutMix (AEL) helper machinery.

Equivalent of the reference CutMix-bank helpers (utils.py:97-435) that
support the `with_AEL` workflow (README:208-226).  Like the reference main
branch, these helpers are shipped but not wired into the main trainers —
the AEL trainer itself lives on a separate branch of the reference that is
not part of the mounted tree (SURVEY.md §2).

Host-side (numpy + scipy) because the core op is connected-component
labeling of an argmax map — inherently sequential and executed once per
sampled image, off the hot path.  scipy.ndimage.label replaces the
reference's skimage label/regionprops (utils.py:250-252).  Class-
confidence and copy-paste compose are provided as device (jnp) functions.
"""

from __future__ import annotations

import random
from typing import List, Sequence, Tuple

import numpy as np
from scipy import ndimage

import jax
import jax.numpy as jnp


def cal_pixel_num(pred_map: np.ndarray, num_classes: int = 19) -> np.ndarray:
    """Per-class pixel counts of an argmax map, ignoring 255
    (utils.py:97-104; the reference hardcodes 19 classes)."""
    p = np.asarray(pred_map).ravel()
    p = p[p != 255]
    return np.bincount(p, minlength=num_classes)[:num_classes]


def init_cutmix(crop_size: int) -> np.ndarray:
    """Random rectangle covering half the crop area with random aspect
    (utils.py:106-124). Returns [y0, x0, y1, x1]."""
    h = w = crop_size
    mask_prop = 0.5
    y_prop = float(np.exp(np.random.uniform(0, 1) * np.log(mask_prop)))
    x_prop = mask_prop / y_prop
    size = np.round(np.array([y_prop * h, x_prop * w]))
    pos = np.round((np.array([h, w]) - size) * np.random.uniform(0, 1, 2))
    return np.concatenate([pos, pos + size])


def sliming_bbox(rect: Sequence[float], size: int) -> List[float]:
    """Shrink an over-large box towards half the crop area (utils.py:175-206)."""
    area = 0.5 * size**2
    y0, x0, y1, x1 = rect
    h, w = y1 - y0, x1 - x0
    lower_h = int(area / w)
    new_h = h if lower_h > h else random.randint(int(lower_h), int(h))
    new_w = int(area / new_h)
    if new_w > w:
        new_w = w - 1
    delta_h, delta_w = h - new_h, w - new_w
    if random.random() > 0.5:
        y1 = max(random.randint(int(y1 - delta_h), int(y1)), y0)
        y0 = max(y1 - new_h, y0)
    else:
        y0 = min(random.randint(int(y0), int(y0 + delta_h)), y1)
        y1 = min(y0 + new_h, y1)
    if random.random() > 0.5:
        x1 = max(random.randint(int(x1 - delta_w), int(x1)), x0)
        x0 = max(x1 - new_w, x0)
    else:
        x0 = min(random.randint(int(x0), int(x0 + delta_w)), x1)
        x1 = min(x0 + new_w, x1)
    return [y0, x0, y1, x1]


def padding_bbox(rect: Sequence[float], size: int) -> List[float]:
    """Grow an under-sized box towards half the crop area (utils.py:209-241)."""
    area = 0.5 * size**2
    y0, x0, y1, x1 = rect
    h, w = y1 - y0, x1 - x0
    upper_h, upper_w = int(area / w), int(area / h)
    if random.random() > 0.5:
        new_h = random.randint(int(h), upper_h) if upper_h > h else h
        new_w = int(area / new_h)
    else:
        new_w = random.randint(int(w), upper_w) if upper_w > w else w
        new_h = int(area / new_w)
    delta_h, delta_w = new_h - h, new_w - w
    if random.random() > 0.5:
        y1 = min(random.randint(int(y1), int(y1 + delta_h)), size)
        y0 = max(y1 - new_h, 0)
    else:
        y0 = max(random.randint(int(y0 - delta_h), int(y0)), 0)
        y1 = min(y0 + new_h, size)
    if random.random() > 0.5:
        x1 = min(random.randint(int(x1), int(x1 + delta_w)), size)
        x0 = max(x1 - new_w, 0)
    else:
        x0 = max(random.randint(int(x0 - delta_w), int(x0)), 0)
        x1 = min(x0 + new_w, size)
    return [y0, x0, y1, x1]


def padding_bbox_old(rect: Sequence[float], size: int) -> List[float]:
    """Legacy deterministic grow variant (utils.py:127-150): pad the long
    axis by a fixed 40 px, then widen the short axis symmetrically toward
    `area / long_side`.  Two reference quirks kept for parity: the target
    area is the FULL crop (`size**2`, not the half-area every other variant
    uses) and the short-`h` branch clamps with `x1 = max(x1 + 40, size)`
    (max, not min — x1 can exceed the crop)."""
    area = size**2
    y0, x0, y1, x1 = rect
    if (y1 - y0) >= (x1 - x0):
        y0 = max(y0 - 40, 0)
        y1 = min(y1 + 40, size)
        new_delta = area / (y1 - y0)
        if new_delta > (x1 - x0):
            new_delta = (new_delta - (x1 - x0)) / 2
            x0 = max(x0 - new_delta, 0)
            x1 = min(x1 + new_delta, size)
    else:
        x0 = max(x0 - 40, 0)
        x1 = max(x1 + 40, size)
        new_delta = area / (x1 - x0)
        if new_delta > (y1 - y0):
            new_delta = (new_delta - (y1 - y0)) / 2
            y0 = max(y0 - new_delta, 0)
            y1 = min(y1 + new_delta, size)
    return [y0, x0, y1, x1]


def padding_bbox_new(rect: Sequence[float], size: int) -> List[float]:
    """Ratio-preserving variant (utils.py:153-172)."""
    area = 0.5 * size**2
    y0, x0, y1, x1 = rect
    h, w = y1 - y0, x1 - x0
    new_h = int(size * np.exp(np.random.uniform(0, 1) * np.log(0.5)))
    new_w = int(area / max(new_h, 1))
    delta_h, delta_w = new_h - h, new_w - w
    y_ratio = y0 / (size - y1 + 1)
    x_ratio = x0 / (size - x1 + 1)
    x1 = min(x1 + int(delta_w * (1 / (1 + x_ratio))), size)
    x0 = max(x0 - int(delta_w * (x_ratio / (1 + x_ratio))), 0)
    y1 = min(y1 + int(delta_h * (1 / (1 + y_ratio))), size)
    y0 = max(y0 - int(delta_h * (y_ratio / (1 + y_ratio))), 0)
    return [y0, x0, y1, x1]


def generate_cutmix(
    pred: np.ndarray, cat: int, area_thresh: float, no_pad=False, no_slim=False
) -> Sequence[float]:
    """Class-conditional box from a random large-enough connected component
    of `pred == cat` (utils.py:244-271)."""
    h = pred.shape[0]
    area_all = h**2
    comp, n = ndimage.label((pred == cat).astype(np.int32))
    values = list(range(1, n + 1))
    random.shuffle(values)
    chosen = None
    for value in values:
        if np.sum(comp == value) > area_thresh * area_all:
            chosen = value
            break
    if chosen is None:
        return init_cutmix(h)
    sl = ndimage.find_objects(comp == chosen)[0]
    rect = (sl[0].start, sl[1].start, sl[0].stop, sl[1].stop)
    area = (rect[2] - rect[0]) * (rect[3] - rect[1])
    if area >= 0.5 * area_all and not no_slim:
        return sliming_bbox(rect, h)
    if area < 0.5 * area_all and not no_pad:
        return padding_bbox_new(rect, h)
    return rect


def generate_cutmix_mask(
    pred: np.ndarray, sample_cat: int, area_thresh: float = 0.0001,
    no_pad=False, no_slim=False,
) -> np.ndarray:
    """(h, w) {0,1} mask over the chosen class-conditional box
    (utils.py:290-306)."""
    h, w = pred.shape
    if sample_cat not in np.unique(pred):
        rect = init_cutmix(h)
    else:
        rect = generate_cutmix(pred, sample_cat, area_thresh, no_pad, no_slim)
    y0, x0, y1, x1 = (int(v) for v in rect)
    mask = np.zeros((h, w), np.int64)
    mask[y0:y1, x0:x1] = 1
    return mask


def sample_from_bank(
    cutmix_bank: np.ndarray, conf: np.ndarray, smooth: bool = False
) -> Tuple[int, int]:
    """Confidence-weighted class + image sampling (utils.py:274-287):
    softmax over (1 - per-class confidence)."""
    conf = 1.0 - np.asarray(conf, np.float64)
    if smooth:
        conf = conf ** (1 / 3)
    p = np.exp(conf) / np.sum(np.exp(conf))
    class_id = int(np.random.choice(cutmix_bank.shape[0], p=p))
    candidates = np.nonzero(cutmix_bank[class_id])[0]
    if len(candidates) > 0:
        sample_id = int(random.choice(list(candidates)))
    else:
        sample_id = random.randint(0, cutmix_bank.shape[1] - 1)
    return sample_id, class_id


def update_cutmix_bank(
    cutmix_bank: np.ndarray,
    preds_teacher_unsup: np.ndarray,  # (2, h, w, C) logits/probs NHWC
    img_id: int,
    sample_id: int,
    area_thresh: float = 0.0001,
) -> np.ndarray:
    """Mark which classes are present-with-enough-area in the two mixed
    images (utils.py:309-336)."""
    area_all = preds_teacher_unsup.shape[1] ** 2
    for k, target in ((0, img_id), (1, sample_id)):
        pred = preds_teacher_unsup[k].argmax(-1)
        for idx in range(cutmix_bank.shape[0]):
            present = np.sum(pred == idx)
            cutmix_bank[idx][target] = int(present >= max(area_thresh * area_all, 1))
    return cutmix_bank


def cal_category_confidence(
    preds_student_sup: jax.Array,  # (B, h, w, C) logits
    gt: jax.Array,  # (B, h, w)
    num_classes: int,
) -> jax.Array:
    """Mean GT-class softmax confidence per class (utils.py:418-435),
    vectorized on device."""
    prob = jax.nn.softmax(preds_student_sup.astype(jnp.float32), axis=-1)
    out = []
    for ind in range(num_classes):
        mask = (gt == ind).astype(jnp.float32)
        denom = mask.sum()
        val = jnp.where(denom > 0, (prob[..., ind] * mask).sum() / (denom + 1e-12), 0.0)
        out.append(val)
    return jnp.stack(out)


def dynamic_copy_paste(
    images_sup: jax.Array,  # (B, h, w, 6): image | paste image stacked on C
    labels_sup: jax.Array,  # (B, 2, h, w)
    query_cat: Sequence[int],
) -> Tuple[jax.Array, jax.Array]:
    """Paste pixels of the query classes from the paste sample
    (utils.py:389-415), on device."""
    img, paste_img = jnp.split(images_sup, 2, axis=-1)
    lab, paste_lab = labels_sup[:, 0], labels_sup[:, 1]
    alpha = jnp.zeros_like(paste_lab, dtype=bool)
    for cat in query_cat:
        alpha = alpha | (paste_lab == cat)
    empty = (paste_lab.sum(axis=(1, 2)) == 0)[:, None, None]
    alpha = alpha & ~empty
    af = alpha[..., None].astype(img.dtype)
    out_img = (1 - af) * img + af * paste_img
    out_lab = jnp.where(alpha, paste_lab, lab)
    return out_img, out_lab
