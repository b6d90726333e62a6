"""Long-lived inference server CLI.

The reference has no serving story beyond per-invocation CLIs
(reference infer.py reloads the model and re-autotunes every run); on
TPU the XLA compile makes that model untenable, so this process loads
the checkpoint once, compiles (or cache-loads) one fixed-size program,
and then answers JSON-lines requests on stdin until shutdown/EOF —
see u2pl_tpu/serving.py for the protocol and micro-batching rules.

Typical deployment:

    U2PL_COMPILE_CACHE=/var/cache/u2pl U2PL_COMPILE_CACHE_MAX_GB=4 \\
    python serve.py --config exp/config.yaml \\
        --model_path exp/checkpoints/ckpt_best.ckpt \\
        --batch_size 8 --dtype bfloat16 < requests.jsonl

Responses are written to stdout (one JSON line per request); logs go to
stderr so the two streams never interleave.
"""

from __future__ import annotations

import logging
import sys
from argparse import ArgumentParser

from u2pl_tpu.config import load_config
from u2pl_tpu.serving import InferEngine, run_server
from u2pl_tpu.utils.compile_cache import maybe_enable_compilation_cache
from u2pl_tpu.utils.logging_utils import init_log


def get_parser():
    parser = ArgumentParser(description="TPU Inference Server")
    parser.add_argument("--config", type=str, default="config.yaml")
    parser.add_argument("--model_path", type=str, default="checkpoints/ckpt_best.ckpt")
    parser.add_argument(
        "--save_folder",
        type=str,
        default="viewer",
        help="default output directory for requests that omit save_folder",
    )
    parser.add_argument(
        "--batch_size",
        type=int,
        default=1,
        help="micro-batch cap: consecutive queued infer requests are "
        "fused into one device batch of at most this size",
    )
    parser.add_argument(
        "--batch_window_ms",
        type=float,
        default=0.0,
        help="after the first queued request, wait up to this long for "
        "more before dispatching (0 = dispatch whatever is already queued)",
    )
    parser.add_argument(
        "--dtype",
        type=str,
        default="float32",
        choices=["float32", "bfloat16"],
        help="forward compute dtype (bfloat16 is the TPU serving option; "
        "quality A/B in docs/PERF.md)",
    )
    parser.add_argument(
        "--compilation_cache_dir",
        type=str,
        default="",
        help="persistent XLA compilation cache directory (or set "
        "U2PL_COMPILE_CACHE); restarts then skip the compile",
    )
    parser.add_argument(
        "--no_warmup",
        action="store_true",
        help="skip the startup compile; the first request pays it instead",
    )
    return parser


def main():
    args = get_parser().parse_args()
    logger = init_log("main-logger", logging.INFO)
    logger.info(args)
    cfg = load_config(args.config)
    maybe_enable_compilation_cache(args.compilation_cache_dir, logger)

    engine = InferEngine(
        cfg, args.model_path, batch_size=args.batch_size, dtype=args.dtype
    )
    logger.info("Load Model Done!")
    if not args.no_warmup:
        logger.info("warmup compile: %.1fs", engine.warmup())
    logger.info("ready: serving on stdin (batch_size=%d)", args.batch_size)
    run_server(
        sys.stdin,
        sys.stdout,
        engine,
        default_save_folder=args.save_folder,
        batch_window_s=args.batch_window_ms / 1e3,
        logger=logger,
    )


if __name__ == "__main__":
    main()
