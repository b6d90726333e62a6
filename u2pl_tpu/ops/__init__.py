from u2pl_tpu.ops.resize import (
    resize_bilinear,
    resize_nearest,
    resize_bilinear_numpy,
)
from u2pl_tpu.ops.quantile import masked_percentile
from u2pl_tpu.ops.pooling import max_pool_ceil
from u2pl_tpu.ops.one_hot import label_onehot

__all__ = [
    "resize_bilinear",
    "resize_nearest",
    "resize_bilinear_numpy",
    "masked_percentile",
    "max_pool_ceil",
    "label_onehot",
]
