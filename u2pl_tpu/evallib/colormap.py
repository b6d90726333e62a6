"""Label colormaps + mask colorization (reference utils.py:526-565,
639-696) for eval/infer PNG outputs."""

from __future__ import annotations

import numpy as np

try:
    from PIL import Image
except ImportError:  # pragma: no cover
    Image = None


def create_cityscapes_label_colormap() -> np.ndarray:
    colormap = np.zeros((256, 3), dtype=np.uint8)
    rows = [
        [128, 64, 128], [244, 35, 232], [70, 70, 70], [102, 102, 156],
        [190, 153, 153], [153, 153, 153], [250, 170, 30], [220, 220, 0],
        [107, 142, 35], [152, 251, 152], [70, 130, 180], [220, 20, 60],
        [255, 0, 0], [0, 0, 142], [0, 0, 70], [0, 60, 100], [0, 80, 100],
        [0, 0, 230], [119, 11, 32],
    ]
    for i, r in enumerate(rows):
        colormap[i] = r
    return colormap


def create_pascal_label_colormap() -> np.ndarray:
    colormap = 255 * np.ones((256, 3), dtype=np.uint8)
    rows = [
        [0, 0, 0], [128, 0, 0], [0, 128, 0], [128, 128, 0], [0, 0, 128],
        [128, 0, 128], [0, 128, 128], [128, 128, 128], [64, 0, 0],
        [192, 0, 0], [64, 128, 0], [192, 128, 0], [64, 0, 128],
        [192, 0, 128], [64, 128, 128], [192, 128, 128], [0, 64, 0],
        [128, 64, 0], [0, 192, 0], [128, 192, 0], [0, 64, 128],
    ]
    for i, r in enumerate(rows):
        colormap[i] = r
    return colormap


def get_palette(num_cls: int) -> list:
    """PNG palette by bit-shuffling class ids (reference utils.py:544-565)."""
    palette = [0] * (num_cls * 3)
    for j in range(num_cls):
        lab, i = j, 0
        while lab:
            palette[j * 3 + 0] |= ((lab >> 0) & 1) << (7 - i)
            palette[j * 3 + 1] |= ((lab >> 1) & 1) << (7 - i)
            palette[j * 3 + 2] |= ((lab >> 2) & 1) << (7 - i)
            i += 1
            lab >>= 3
    return palette


def colorize(mask: np.ndarray, colormap: np.ndarray):
    color = colormap[mask.astype(np.int64)]
    if Image is None:
        return color
    return Image.fromarray(np.uint8(color))
