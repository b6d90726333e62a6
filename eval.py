"""Offline sliding-window / multi-scale evaluator CLI (reference eval.py
parity): same flags (--config --model_path --save_folder --scales
--base_size --names_path --crop), prefers teacher_state, cityscapes uses
the overlapping crop grid averaged by visit counts, VOC the whole-image
path; gray + color PNG masks are written and per-class IoU + mIoU printed.

Additionally (an upgrade over the reference, which computes no metric on
the VOC path — its cal_acc call is commented out, eval.py:155): mIoU is
reported for both datasets.  Accepts this repo's .ckpt checkpoints AND
reference torch .pth checkpoints (via the weight converter), enabling
bit-matched comparisons.
"""

from __future__ import annotations

import logging
import os
from argparse import ArgumentParser

import numpy as np

import jax.numpy as jnp

from u2pl_tpu.config import load_config
from u2pl_tpu.evallib.colormap import (
    colorize,
    create_cityscapes_label_colormap,
    create_pascal_label_colormap,
)
from u2pl_tpu.evallib.metrics import intersection_and_union
from u2pl_tpu.evallib.slide import (
    make_net_process,
    make_net_process_bucketed,
    pred_os_index,
    predict_city,
    predict_whole,
)
from u2pl_tpu.models import build_model
from u2pl_tpu.utils.checkpoint import load_eval_variables
from u2pl_tpu.utils.compile_cache import maybe_enable_compilation_cache
from u2pl_tpu.utils.logging_utils import AverageMeter, init_log

try:
    from PIL import Image
except ImportError:  # pragma: no cover
    Image = None


def get_parser():
    parser = ArgumentParser(description="TPU Evaluation")
    parser.add_argument("--base_size", type=int, default=2048)
    parser.add_argument("--scales", type=float, default=[1.0], nargs="+")
    parser.add_argument("--config", type=str, default="config.yaml")
    parser.add_argument("--model_path", type=str, default="checkpoints/ckpt_best.ckpt")
    parser.add_argument("--save_folder", type=str, default="checkpoints/results/")
    # accepted-but-unused, exactly like the reference eval.py (it parses
    # --names_path into args and never reads it; kept so launcher scripts
    # written for the reference run unmodified)
    parser.add_argument("--names_path", type=str, default="")
    parser.add_argument("--crop", action="store_true", default=False)
    parser.add_argument(
        "--no_bucket",
        action="store_true",
        default=False,
        help="disable shape-bucketed whole-image forwards (bucketing pads "
        "each image to a 128-multiple grid with a masked forward so one "
        "compiled program serves every image size in the bucket; results "
        "match the unbucketed path)",
    )
    parser.add_argument(
        "--dtype",
        type=str,
        default="float32",
        choices=["float32", "bfloat16"],
        help="forward compute dtype. float32 (default) matches the "
        "reference bit-for-bit; bfloat16 is the TPU serving option — "
        "~1.5-2x faster forwards at these widths with argmax flips only "
        "on near-tie boundary pixels (quality A/B in docs/PERF.md, "
        "tools/ab_bf16.py)",
    )
    parser.add_argument(
        "--compilation_cache_dir",
        type=str,
        default="",
        help="enable JAX's persistent compilation cache in this directory "
        "(or set U2PL_COMPILE_CACHE); repeat runs skip the minutes-long "
        "XLA compile of the big eval programs",
    )
    return parser


def build_data_list(cfg):
    data_root = cfg.dataset.val.data_root
    f_list = cfg.dataset.val.data_list
    data_list = []
    if "cityscapes" in data_root or "cityscapes" in cfg.dataset.type:
        colormap = create_cityscapes_label_colormap()
        for line in open(f_list):
            s = line.strip()
            data_list.append(
                (
                    os.path.join(data_root, s),
                    os.path.join(
                        data_root, "gtFine/" + s[12:-15] + "gtFine_labelTrainIds.png"
                    ),
                )
            )
    else:
        colormap = create_pascal_label_colormap()
        for line in open(f_list):
            s = line.strip()
            data_list.append(
                (
                    os.path.join(data_root, f"JPEGImages/{s}.jpg"),
                    os.path.join(data_root, f"SegmentationClassAug/{s}.png"),
                )
            )
    return data_list, colormap


load_variables = load_eval_variables  # back-compat alias (moved to utils)


def main():
    args = get_parser().parse_args()
    cfg = load_config(args.config)
    logger = init_log("main-logger", logging.INFO)
    logger.info(args)

    num_classes = cfg.net.num_classes
    mean = np.asarray(cfg.dataset.mean, np.float32)
    std = np.asarray(cfg.dataset.std, np.float32)
    crop_size = cfg.dataset.val.crop.size if cfg.dataset.val.crop else (769, 769)

    gray_folder = os.path.join(args.save_folder, "gray")
    color_folder = os.path.join(args.save_folder, "color")
    os.makedirs(gray_folder, exist_ok=True)
    os.makedirs(color_folder, exist_ok=True)

    data_list, colormap = build_data_list(cfg)

    maybe_enable_compilation_cache(args.compilation_cache_dir, logger)

    # eval builds the model without SyncBN (reference eval.py:120) and,
    # by default, with float32 compute regardless of the training dtype:
    # the reference evaluates in f32, and bf16 forwards can flip argmax
    # at near-ties.  --dtype bfloat16 opts into the faster TPU serving
    # path (quality A/B: docs/PERF.md).
    model = build_model(cfg.net, axis_name=None, dtype=jnp.dtype(args.dtype))
    variables = load_variables(model, args.model_path, crop_size)
    is_city = "cityscapes" in cfg.dataset.type
    # whole-image (VOC) path: bucketed masked forwards avoid one recompile
    # per unique val image size; the crop-grid path already runs at a fixed
    # crop shape
    if is_city or args.no_bucket:
        net_process = make_net_process(model, variables)
    else:
        net_process = make_net_process_bucketed(
            model, variables, pred_os=pred_os_index(cfg.net.decoder.type)
        )
    logger.info("Load Model Done!")
    inter_meter, union_meter = AverageMeter(), AverageMeter()
    for i, (img_path, lab_path) in enumerate(data_list):
        image = np.asarray(Image.open(img_path).convert("RGB"), np.float32)
        image = (image - mean) / std
        label = np.asarray(Image.open(lab_path).convert("L"), np.uint8)

        if is_city:
            gray = predict_city(
                net_process, image, num_classes, args.base_size,
                crop_size[0], crop_size[1], args.scales,
            )
        else:
            gray = predict_whole(net_process, image, num_classes, args.scales)

        name = os.path.splitext(os.path.basename(img_path))[0]
        Image.fromarray(gray).save(os.path.join(gray_folder, name + ".png"))
        colorize(gray, colormap).save(os.path.join(color_folder, name + ".png"))

        inter, union, _ = intersection_and_union(gray, label, num_classes)
        inter_meter.update(inter)
        union_meter.update(union)
        if (i + 1) % 10 == 0:
            logger.info(f"Test: [{i + 1}/{len(data_list)}]")

    iou_class = inter_meter.sum / (union_meter.sum + 1e-10)
    for i, iou in enumerate(iou_class):
        logger.info(" * class [{}] IoU {:.2f}".format(i, iou * 100))
    logger.info(" * mIoU {:.2f}".format(np.mean(iou_class) * 100))


if __name__ == "__main__":
    main()
