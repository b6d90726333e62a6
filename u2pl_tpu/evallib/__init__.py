from u2pl_tpu.evallib.metrics import intersection_and_union, intersection_and_union_device
from u2pl_tpu.evallib.colormap import (
    create_pascal_label_colormap,
    create_cityscapes_label_colormap,
    colorize,
)

__all__ = [
    "intersection_and_union",
    "intersection_and_union_device",
    "create_pascal_label_colormap",
    "create_cityscapes_label_colormap",
    "colorize",
]
