"""Bilinear / nearest resize matching torch.nn.functional.interpolate.

The reference uses `F.interpolate(..., mode="bilinear", align_corners=True)`
on every logit/feature upsample (e.g. reference train_semi.py:293,320-322,
decoder.py:114-116, base.py:92-94, eval.py:165,220-222) and
`mode="nearest"` for mask downsampling (train_semi.py:427-465).

`jax.image.resize` uses half-pixel centers (align_corners=False semantics
only), so we build the interpolation as two *separable dense matmuls* with
exact align-corners source coordinates.  On TPU this maps straight onto the
MXU and is differentiable for free; the (H_out x H_in) weight matrices are
computed in numpy at trace time (shapes are static under jit) and constant-
folded by XLA.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np


@functools.lru_cache(maxsize=256)
def _interp_matrix_np(
    in_size: int, out_size: int, align_corners: bool
) -> np.ndarray:
    """Dense 1-D linear-interpolation matrix W s.t. out = W @ in.

    align_corners=True : src = i * (in-1)/(out-1)        (torch semantics)
    align_corners=False: src = (i+0.5) * in/out - 0.5    (half-pixel)
    """
    w = np.zeros((out_size, in_size), dtype=np.float32)
    if in_size == 1 or out_size == 1:
        if align_corners or out_size == 1:
            # single-pixel edge cases: torch maps everything to src index
            # computed with scale 0 (align_corners, out==1) -> src 0 .. clamp
            if align_corners:
                src = np.zeros(out_size) if in_size == 1 else np.arange(
                    out_size, dtype=np.float64
                ) * ((in_size - 1) / max(out_size - 1, 1))
            else:
                src = (np.arange(out_size) + 0.5) * (in_size / out_size) - 0.5
        else:
            src = (np.arange(out_size) + 0.5) * (in_size / out_size) - 0.5
    elif align_corners:
        src = np.arange(out_size, dtype=np.float64) * (
            (in_size - 1) / (out_size - 1)
        )
    else:
        src = (np.arange(out_size, dtype=np.float64) + 0.5) * (
            in_size / out_size
        ) - 0.5
    src = np.clip(src, 0.0, in_size - 1)
    lo = np.floor(src).astype(np.int64)
    hi = np.minimum(lo + 1, in_size - 1)
    frac = (src - lo).astype(np.float32)
    rows = np.arange(out_size)
    w[rows, lo] += 1.0 - frac
    w[rows, hi] += frac
    return w


@functools.lru_cache(maxsize=256)
def _bf16_exact(in_size: int, out_size: int, align_corners: bool) -> bool:
    """True when every weight of the 1-D interpolation matrix is exactly
    representable in bfloat16 (e.g. the power-of-two-fraction fracs of the
    4x/8x training upsamples)."""
    import ml_dtypes

    w = _interp_matrix_np(in_size, out_size, align_corners)
    return bool(np.all(w.astype(ml_dtypes.bfloat16).astype(np.float32) == w))


def resize_bilinear(
    x: jax.Array, size: tuple, align_corners: bool = True
) -> jax.Array:
    """Bilinear resize of NHWC (or HWC) arrays to spatial `size` (h, w).

    Bit-matches torch F.interpolate(mode="bilinear") for both align_corners
    settings (verified against torch in tests/test_ops.py).

    Wide (>=64-channel) bfloat16 inputs whose weight matrices are bf16-exact
    (all training shapes: the os4/os8 ratios give power-of-two fracs) take a
    bf16 MXU path — same exact products accumulated in f32, ~1/6 the MXU
    passes of the f32-HIGHEST path and half the HBM traffic.  Only
    difference vs the f32 path: the separable intermediate is rounded to
    bf16 between the two passes (~1 output ulp); float32 inputs always take
    the f32 path.  Narrow tensors (e.g. 21-class logits) keep the f32 path
    even in bf16 — measured on v5e (tools/micro_piece_bench.py): c=256
    bf16 4.5 ms vs f32 7.3 ms, but c=21 bf16 5.2 ms vs f32 3.3 ms (narrow
    channels underfill the MXU lanes and the cast overhead dominates).
    """
    squeeze = x.ndim == 3
    if squeeze:
        x = x[None]
    b, h, w, c = x.shape
    oh, ow = int(size[0]), int(size[1])
    if (oh, ow) == (h, w):
        return x[0] if squeeze else x
    dtype = x.dtype
    if (
        dtype == jnp.bfloat16
        and x.shape[-1] >= 64
        and _bf16_exact(h, oh, align_corners)
        and _bf16_exact(w, ow, align_corners)
    ):
        wh = jnp.asarray(_interp_matrix_np(h, oh, align_corners), jnp.bfloat16)
        ww = jnp.asarray(_interp_matrix_np(w, ow, align_corners), jnp.bfloat16)
        y = jnp.einsum(
            "oh,bhwc->bowc", wh, x, preferred_element_type=jnp.float32
        ).astype(jnp.bfloat16)
        y = jnp.einsum(
            "pw,bowc->bopc", ww, y, preferred_element_type=jnp.float32
        ).astype(dtype)
        return y[0] if squeeze else y
    xf = x.astype(jnp.float32)
    wh = jnp.asarray(_interp_matrix_np(h, oh, align_corners))
    ww = jnp.asarray(_interp_matrix_np(w, ow, align_corners))
    # (oh,h) x (b,h,w,c) -> (b,oh,w,c); then (ow,w) x ... -> (b,oh,ow,c)
    y = jnp.einsum("oh,bhwc->bowc", wh, xf, precision=jax.lax.Precision.HIGHEST)
    y = jnp.einsum("pw,bowc->bopc", ww, y, precision=jax.lax.Precision.HIGHEST)
    y = y.astype(dtype)
    return y[0] if squeeze else y


def interp_matrix_dynamic(
    in_bucket: int, out_bucket: int, v_in: jax.Array, v_out: jax.Array
) -> jax.Array:
    """Align-corners 1-D interpolation matrix with DYNAMIC valid sizes.

    The static path above bakes (in, out) sizes into the compiled program —
    one recompile per image shape, a compile storm on VOC's hundreds of val
    sizes.  Here the array shapes are fixed BUCKET sizes and the true sizes
    (v_in, v_out) are traced scalars: the returned (out_bucket, in_bucket)
    matrix resizes the top-left v_in entries to the top-left v_out entries
    (rows >= v_out and cols >= v_in are zero), with exactly torch's
    align_corners=True weights.  Built from iota comparisons, so one
    compiled program serves every image size within a bucket.
    """
    i = jnp.arange(out_bucket, dtype=jnp.int32)[:, None]
    j = jnp.arange(in_bucket, dtype=jnp.int32)[None, :]
    v_in_i = jnp.asarray(v_in, jnp.int32)
    v_out_i = jnp.asarray(v_out, jnp.int32)
    # src = i*(v_in-1)/(v_out-1) split into exact integer floor/remainder so
    # `frac` is correctly rounded at its own (small) scale — computing src
    # directly in f32 costs ~1 ulp of src's magnitude, which downstream conv
    # towers amplify visibly against the f64-computed static-path weights
    num = i * (v_in_i - 1)
    den = jnp.maximum(v_out_i - 1, 1)
    lo = num // den
    frac = (num - lo * den).astype(jnp.float32) / den.astype(jnp.float32)
    hi = jnp.minimum(lo + 1, v_in_i - 1)
    w = jnp.where(j == lo, 1.0 - frac, 0.0) + jnp.where(j == hi, frac, 0.0)
    return w * (i < v_out_i) * (j < v_in_i)


def resize_bilinear_valid(
    x: jax.Array,
    out_bucket_hw: tuple,
    v_in_hw: tuple,
    v_out_hw: tuple,
) -> jax.Array:
    """Bilinear align-corners resize of the valid top-left (v_in_h, v_in_w)
    region of NHWC `x` into the valid top-left (v_out_h, v_out_w) region of
    a (out_bucket_h, out_bucket_w) output; everything outside valid is 0.
    Valid sizes are traced scalars — no recompile across image sizes."""
    b, h, w, c = x.shape
    oh, ow = int(out_bucket_hw[0]), int(out_bucket_hw[1])
    dtype = x.dtype
    xf = x.astype(jnp.float32)
    wh = interp_matrix_dynamic(h, oh, v_in_hw[0], v_out_hw[0])
    ww = interp_matrix_dynamic(w, ow, v_in_hw[1], v_out_hw[1])
    y = jnp.einsum("oh,bhwc->bowc", wh, xf, precision=jax.lax.Precision.HIGHEST)
    y = jnp.einsum("pw,bowc->bopc", ww, y, precision=jax.lax.Precision.HIGHEST)
    return y.astype(dtype)


@functools.lru_cache(maxsize=256)
def _nearest_index_np(in_size: int, out_size: int) -> np.ndarray:
    # torch mode="nearest": src = floor(i * in/out)
    return np.minimum(
        (np.arange(out_size, dtype=np.float64) * (in_size / out_size)).astype(
            np.int64
        ),
        in_size - 1,
    )


def resize_nearest(x: jax.Array, size: tuple) -> jax.Array:
    """Nearest resize matching torch F.interpolate(mode="nearest").

    Works on NHWC / NHW / HW arrays (spatial axes are the two trailing axes
    before an optional channel axis for 4-D input; for 2-D/3-D input the
    trailing two axes are spatial).
    """
    oh, ow = int(size[0]), int(size[1])
    if x.ndim == 4:
        h, w = x.shape[1], x.shape[2]
        ih = jnp.asarray(_nearest_index_np(h, oh))
        iw = jnp.asarray(_nearest_index_np(w, ow))
        return x[:, ih][:, :, iw]
    elif x.ndim == 3:
        h, w = x.shape[1], x.shape[2]
        ih = jnp.asarray(_nearest_index_np(h, oh))
        iw = jnp.asarray(_nearest_index_np(w, ow))
        return x[:, ih][:, :, iw]
    elif x.ndim == 2:
        h, w = x.shape
        ih = jnp.asarray(_nearest_index_np(h, oh))
        iw = jnp.asarray(_nearest_index_np(w, ow))
        return x[ih][:, iw]
    raise ValueError(f"unsupported ndim {x.ndim}")


def resize_bilinear_numpy(
    x: np.ndarray, size: tuple, align_corners: bool = True
) -> np.ndarray:
    """Host-side (numpy) variant for the data pipeline / eval host code.

    x: (..., H, W) with spatial axes LAST TWO if 2-D/3-D channel-first, or
    (H, W, C) when chw=False. Here we take (H, W, C) or (H, W).
    """
    if x.ndim == 2:
        xx = x[:, :, None]
    else:
        xx = x
    h, w = xx.shape[0], xx.shape[1]
    oh, ow = int(size[0]), int(size[1])
    wh = _interp_matrix_np(h, oh, align_corners)
    ww = _interp_matrix_np(w, ow, align_corners)
    y = np.einsum("oh,hwc->owc", wh, xx.astype(np.float32))
    y = np.einsum("pw,owc->opc", ww, y)
    if x.ndim == 2:
        y = y[:, :, 0]
    return y


def resize_nearest_numpy(x: np.ndarray, size: tuple) -> np.ndarray:
    """Host-side nearest resize matching torch mode="nearest". (H,W[,C])."""
    h, w = x.shape[0], x.shape[1]
    ih = _nearest_index_np(h, int(size[0]))
    iw = _nearest_index_np(w, int(size[1]))
    return x[ih][:, iw]
