"""Single-forward inference CLI (reference infer.py parity): resize each
val image to 769x769 (cityscapes) / 513x513 (VOC) with align-corners
bilinear, one forward, upsample logits back, argmax, save gray + color
masks.  The reference always uses the Pascal colormap, even for
cityscapes paths (infer.py:112) — reproduced for parity.
"""

from __future__ import annotations

import logging
import os
from argparse import ArgumentParser

import jax.numpy as jnp
import numpy as np

from u2pl_tpu.config import load_config
from u2pl_tpu.evallib.colormap import colorize, create_pascal_label_colormap
from u2pl_tpu.evallib.slide import make_net_process
from u2pl_tpu.models import build_model
from u2pl_tpu.ops.resize import resize_bilinear_numpy
from u2pl_tpu.utils.checkpoint import load_eval_variables as load_variables
from u2pl_tpu.utils.compile_cache import maybe_enable_compilation_cache
from u2pl_tpu.utils.logging_utils import init_log

try:
    from PIL import Image
except ImportError:  # pragma: no cover
    Image = None


def get_parser():
    parser = ArgumentParser(description="TPU Inference")
    parser.add_argument("--config", type=str, default="config.yaml")
    parser.add_argument("--model_path", type=str, default="checkpoints/ckpt_best.ckpt")
    parser.add_argument("--save_folder", type=str, default="viewer")
    parser.add_argument(
        "--batch_size",
        type=int,
        default=1,
        help="images per forward (all inputs share the fixed 513/769 "
        "inference size, so batching amortizes launch overhead and fills "
        "the MXU; the final partial batch is zero-padded to keep one "
        "compiled program). 1 reproduces the reference's per-image loop.",
    )
    parser.add_argument(
        "--dtype",
        type=str,
        default="float32",
        choices=["float32", "bfloat16"],
        help="forward compute dtype. float32 (default) matches the "
        "reference; bfloat16 is the TPU serving option (quality A/B in "
        "docs/PERF.md, tools/ab_bf16.py)",
    )
    parser.add_argument(
        "--compilation_cache_dir",
        type=str,
        default="",
        help="enable JAX's persistent compilation cache in this directory "
        "(or set U2PL_COMPILE_CACHE); repeat runs skip the XLA compile",
    )
    return parser


def main():
    args = get_parser().parse_args()
    cfg = load_config(args.config)
    logger = init_log("main-logger", logging.INFO)
    logger.info(args)

    mean = np.asarray(cfg.dataset.mean, np.float32)
    std = np.asarray(cfg.dataset.std, np.float32)
    data_root = cfg.dataset.val.data_root
    f_list = cfg.dataset.val.data_list

    gray_folder = os.path.join(args.save_folder, "gray")
    color_folder = os.path.join(args.save_folder, "color")
    os.makedirs(gray_folder, exist_ok=True)
    os.makedirs(color_folder, exist_ok=True)

    data_list = []
    if "cityscapes" in data_root or "cityscapes" in cfg.dataset.type:
        input_scale = (769, 769)
        for line in open(f_list):
            s = line.strip()
            data_list.append(os.path.join(data_root, s))
    else:
        input_scale = (513, 513)
        for line in open(f_list):
            s = line.strip()
            data_list.append(os.path.join(data_root, f"JPEGImages/{s}.jpg"))

    maybe_enable_compilation_cache(args.compilation_cache_dir, logger)

    # f32 compute by default regardless of training dtype (see eval.py);
    # --dtype bfloat16 opts into the faster TPU serving path
    model = build_model(cfg.net, axis_name=None, dtype=jnp.dtype(args.dtype))
    variables = load_variables(model, args.model_path, input_scale)
    net_process = make_net_process(model, variables, block=False)
    logger.info("Load Model Done!")

    colormap = create_pascal_label_colormap()  # reference quirk: always pascal
    bs = max(1, args.batch_size)

    def prep(chunk):
        images, sizes = [], []
        for image_path in chunk:
            image = np.asarray(Image.open(image_path).convert("RGB"), np.float32)
            sizes.append(image.shape[:2])
            image = (image - mean) / std
            images.append(
                resize_bilinear_numpy(image, input_scale, align_corners=True)
            )
        batch = np.stack(images)
        if len(chunk) < bs:  # zero-pad the tail so one program serves all
            pad = np.zeros((bs - len(chunk),) + batch.shape[1:], batch.dtype)
            batch = np.concatenate([batch, pad], axis=0)
        return batch, sizes

    def post(chunk, sizes, logits_batch):
        logits_batch = np.asarray(logits_batch)  # sync point
        for image_path, (h, w), logits in zip(chunk, sizes, logits_batch):
            image_name = os.path.basename(image_path)
            logits = resize_bilinear_numpy(logits, (h, w), align_corners=True)
            mask = logits.argmax(-1).astype(np.uint8)
            colorize(mask, colormap).save(os.path.join(color_folder, image_name))
            Image.fromarray(mask).save(os.path.join(gray_folder, image_name))

    # Double-buffered serving loop: net_process dispatches asynchronously
    # (block=False), so while the device runs batch i's forward the host
    # decodes/normalizes batch i+1 and writes batch i-1's PNGs.  The
    # reference's loop (infer.py:84-118) is fully serial.
    pending = None
    for start in range(0, len(data_list), bs):
        chunk = data_list[start : start + bs]
        batch, sizes = prep(chunk)
        logits = net_process(batch)
        if pending is not None:
            post(*pending)
        pending = (chunk, sizes, logits)
    if pending is not None:
        post(*pending)


if __name__ == "__main__":
    main()
