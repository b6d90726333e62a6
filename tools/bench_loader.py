"""Host data-plane throughput benchmark (tools/bench_loader.py).

The device consumes ``2 * batch`` 513x513 crops per semi step (~30 img/s
per chip at the flagship shape, docs/PERF.md); this tool measures whether
the HOST pipeline — JPEG decode + augmentation (rand-resize 0.5-2.0, hflip,
crop-with-pad) through `EpochLoader`'s threaded prefetch — can feed that
rate, and how many host cores per chip that requires.  Reference
equivalent: torch DataLoader worker processes (pascal_voc.py:136-156).

Generates VOC-sized synthetic JPEGs (500x375, the PASCAL modal size) in a
temp dir and times a full epoch of batches for each (pipeline, workers)
combination:

  native   fused C++ single-pass pipeline (u2pl_tpu/native/augment.cc)
  numpy    the sequential numpy/PIL fallback (U2PL_TPU_NO_NATIVE=1)

Prints one JSON line per combination and a final summary with the implied
host-cores-per-chip requirement against a target device rate
(--device_rate, default 30.6 img/s/chip).
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import tempfile
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def make_dataset(root: str, n_images: int, seed: int = 0):
    from PIL import Image

    rng = np.random.RandomState(seed)
    img_dir = os.path.join(root, "JPEGImages")
    lab_dir = os.path.join(root, "SegmentationClassAug")
    os.makedirs(img_dir, exist_ok=True)
    os.makedirs(lab_dir, exist_ok=True)
    ids = []
    for i in range(n_images):
        s = f"img{i:04d}"
        ids.append(s)
        # VOC modal size 500x375; draw smooth noise so JPEG decode cost is
        # realistic (pure white noise compresses pathologically)
        base = rng.rand(24, 32, 3)
        img = np.kron(base, np.ones((16, 16, 1)))[:375, :500]
        img = (img * 255).astype(np.uint8)
        lab = rng.randint(0, 21, (375, 500)).astype(np.uint8)
        Image.fromarray(img).save(os.path.join(img_dir, s + ".jpg"), quality=90)
        Image.fromarray(lab).save(os.path.join(lab_dir, s + ".png"))
    with open(os.path.join(root, "pascal_list.txt"), "w") as f:
        f.write("\n".join(ids) + "\n")
    return os.path.join(root, "pascal_list.txt")


def bench_one(root, list_path, workers: int, batch: int, crop: int,
              mode: str = "thread"):
    from u2pl_tpu.config import CropCfg, SplitCfg
    from u2pl_tpu.data.loader import EpochLoader, SegDataset
    from u2pl_tpu.data.transforms import build_transform

    split = SplitCfg(
        data_root=root,
        data_list=list_path,
        flip=True,
        rand_resize=(0.5, 2.0),
        crop=CropCfg(type="rand", size=(crop, crop)),
    )
    tf = build_transform(
        split,
        mean=[123.675, 116.28, 103.53],
        std=[58.395, 57.12, 57.375],
        ignore_label=255,
    )
    ds = SegDataset(root, list_path, tf, seed=0, n_sup=None, split="val")
    loader = EpochLoader(
        ds, batch, seed=0, shuffle=True, drop_last=True, workers=workers,
        workers_mode=mode, prefetch=max(2, workers),
    )
    # warm one epoch (page cache, worker pool spin-up), then time three
    for _ in loader.epoch(0):
        pass
    t0 = time.perf_counter()
    n = 0
    for ep in (1, 2, 3):
        for img, lab in loader.epoch(ep):
            n += img.shape[0]
    dt = time.perf_counter() - t0
    loader.close()
    return n / dt


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--images", type=int, default=64)
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--crop", type=int, default=513)
    ap.add_argument("--workers", type=int, nargs="+", default=[1, 2, 4])
    ap.add_argument(
        "--modes", nargs="+", default=["thread", "process"],
        help="EpochLoader workers_mode values to sweep",
    )
    ap.add_argument(
        "--device_rate", type=float, default=30.6,
        help="target device img/s/chip to compare against (docs/PERF.md)",
    )
    args = ap.parse_args()

    results = {}
    with tempfile.TemporaryDirectory() as root:
        list_path = make_dataset(root, args.images)
        for pipeline in ("native", "numpy"):
            os.environ.pop("U2PL_TPU_NO_NATIVE", None)
            if pipeline == "numpy":
                os.environ["U2PL_TPU_NO_NATIVE"] = "1"
            for mode in args.modes:
                for w in args.workers:
                    rate = bench_one(
                        root, list_path, w, args.batch, args.crop, mode
                    )
                    results[f"{pipeline}_{mode}_w{w}_img_s"] = round(rate, 1)
                    print(
                        json.dumps(
                            {"pipeline": pipeline, "mode": mode, "workers": w,
                             "img_per_sec": round(rate, 1)}
                        ),
                        flush=True,
                    )
    os.environ.pop("U2PL_TPU_NO_NATIVE", None)

    best = max(results.values())
    host_cores = os.cpu_count() or 1
    summary = {
        "metric": "host_loader_throughput",
        "host_cores": host_cores,
        "device_rate_img_s": args.device_rate,
        "best_img_s": best,
        # one worker-thread's rate bounds cores/chip from below; threads
        # share cores, so cores_per_chip ~= device_rate / single-worker rate
        "single_worker_native_img_s": results.get("native_thread_w1_img_s"),
        "implied_cores_per_chip": round(
            args.device_rate
            / max(results.get("native_thread_w1_img_s") or best, 1e-9),
            2,
        ),
        **results,
    }
    print(json.dumps(summary))


if __name__ == "__main__":
    main()
