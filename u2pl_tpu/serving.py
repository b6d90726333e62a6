"""Long-lived inference serving: engine + request loop for serve.py.

The reference ships only batch CLIs (infer.py / eval.py re-pay model load
and cuDNN autotune per invocation).  On TPU the compile cost makes a
process-per-request model untenable (minutes-long XLA compiles,
docs/PERF.md), so serving is a resident process: load the checkpoint
once, compile the fixed-size forward once (optionally from the
persistent compilation cache), then answer requests over a JSON-lines
protocol for the life of the process.

Protocol (one JSON object per line on the request stream):

    {"op": "infer", "id": "r1", "image": "/abs/img.jpg",
     "save_folder": "/out"}            -> {"id": "r1", "ok": true,
                                           "gray": ..., "color": ...}
    {"op": "ping", "id": "p"}          -> {"id": "p", "ok": true,
                                           "served": N}
    {"op": "shutdown", "id": "s"}      -> {"id": "s", "ok": true} + exit

EOF on the request stream also shuts the server down.  Consecutive
``infer`` requests are micro-batched up to ``batch_size`` (a reader
thread feeds an internal queue, so a burst of lines becomes one MXU
batch; ``batch_window_s`` optionally waits for stragglers).  Unlike
infer.py's list-file templates, requests carry full image paths.

Preprocessing and mask encoding match infer.py exactly: align-corners
bilinear resize to the fixed 513/769 input scale (reference
infer.py:84-118), argmax at original resolution, gray + Pascal-colormap
PNGs (the reference's always-pascal quirk, reference infer.py:112).
"""

from __future__ import annotations

import json
import os
import queue
import threading
import time
from typing import IO, List, Optional, Tuple

import numpy as np

from u2pl_tpu.evallib.colormap import colorize, create_pascal_label_colormap
from u2pl_tpu.evallib.slide import make_net_process
from u2pl_tpu.models import build_model
from u2pl_tpu.ops.resize import resize_bilinear_numpy
from u2pl_tpu.utils.checkpoint import load_eval_variables

try:
    from PIL import Image
except ImportError:  # pragma: no cover
    Image = None


def input_scale_for(cfg) -> Tuple[int, int]:
    """Fixed inference size per dataset family (reference infer.py:62-79)."""
    if "cityscapes" in cfg.dataset.type or "cityscapes" in (
        cfg.dataset.val.data_root or ""
    ):
        return (769, 769)
    return (513, 513)


class InferEngine:
    """Resident single-forward inference: one model, one compiled program.

    All inputs share the fixed input scale, so exactly one XLA program
    (per batch shape) serves every request; the final partial batch is
    zero-padded rather than recompiled (same policy as infer.py).
    """

    def __init__(self, cfg, model_path: str, batch_size: int = 1, dtype="float32"):
        import jax.numpy as jnp

        self.cfg = cfg
        self.batch_size = max(1, batch_size)
        self.input_scale = input_scale_for(cfg)
        self.mean = np.asarray(cfg.dataset.mean, np.float32)
        self.std = np.asarray(cfg.dataset.std, np.float32)
        self.colormap = create_pascal_label_colormap()
        model = build_model(cfg.net, axis_name=None, dtype=jnp.dtype(str(dtype)))
        variables = load_eval_variables(model, model_path, self.input_scale)
        self._net_process = make_net_process(model, variables, block=True)
        self.served = 0

    def warmup(self) -> float:
        """Compile (or cache-load) the serving program; returns seconds."""
        t0 = time.monotonic()
        zeros = np.zeros(
            (self.batch_size,) + self.input_scale + (3,), np.float32
        )
        self._net_process(zeros)
        return time.monotonic() - t0

    def load(self, image_path: str) -> Tuple[np.ndarray, Tuple[int, int]]:
        """Decode + normalize + resize one image to the serving scale."""
        image = np.asarray(Image.open(image_path).convert("RGB"), np.float32)
        size = image.shape[:2]
        image = (image - self.mean) / self.std
        return resize_bilinear_numpy(image, self.input_scale, True), size

    def forward(self, images: List[np.ndarray]) -> np.ndarray:
        """Batched forward; zero-pads to batch_size to reuse one program."""
        batch = np.stack(images)
        n = len(images)
        if n < self.batch_size:
            pad = np.zeros(
                (self.batch_size - n,) + batch.shape[1:], batch.dtype
            )
            batch = np.concatenate([batch, pad], axis=0)
        logits = self._net_process(batch)
        self.served += n
        return np.asarray(logits)[:n]

    def to_mask(self, logits: np.ndarray, size: Tuple[int, int]) -> np.ndarray:
        logits = resize_bilinear_numpy(logits, size, align_corners=True)
        return logits.argmax(-1).astype(np.uint8)

    def save_mask(
        self, mask: np.ndarray, image_path: str, save_folder: str
    ) -> Tuple[str, str]:
        gray_dir = os.path.join(save_folder, "gray")
        color_dir = os.path.join(save_folder, "color")
        os.makedirs(gray_dir, exist_ok=True)
        os.makedirs(color_dir, exist_ok=True)
        name = os.path.basename(image_path)
        gray = os.path.join(gray_dir, name)
        color = os.path.join(color_dir, name)
        Image.fromarray(mask).save(gray)
        colorize(mask, self.colormap).save(color)
        return gray, color


def _reader_thread(stream: IO[str], q: "queue.Queue[Optional[str]]") -> None:
    for line in stream:
        q.put(line)
    q.put(None)  # EOF sentinel


def run_server(
    reader: IO[str],
    writer: IO[str],
    engine: InferEngine,
    default_save_folder: str = "viewer",
    batch_window_s: float = 0.0,
    logger=None,
) -> int:
    """Serve JSONL requests until shutdown/EOF; returns requests served.

    A daemon reader thread feeds an internal queue so a burst of request
    lines is visible at once: consecutive ``infer`` requests drain into a
    single device batch (up to ``engine.batch_size``), amortizing launch
    overhead exactly like infer.py's --batch_size.  Control ops flush the
    pending batch first, preserving per-client response ordering.
    """
    q: "queue.Queue[Optional[str]]" = queue.Queue()
    threading.Thread(target=_reader_thread, args=(reader, q), daemon=True).start()

    def respond(obj) -> None:
        writer.write(json.dumps(obj) + "\n")
        writer.flush()

    def flush(batch) -> None:
        if not batch:
            return
        t0 = time.monotonic()
        logits = engine.forward([img for _, img, _ in batch])
        ms = (time.monotonic() - t0) * 1e3
        for (req, _, size), logit in zip(batch, logits):
            mask = engine.to_mask(logit, size)
            folder = req.get("save_folder") or default_save_folder
            gray, color = engine.save_mask(mask, req["image"], folder)
            respond(
                {
                    "id": req.get("id"),
                    "ok": True,
                    "gray": gray,
                    "color": color,
                    "batch_ms": round(ms, 3),
                }
            )
        batch.clear()

    served = 0
    batch: list = []
    running = True
    while running:
        try:
            timeout = batch_window_s if batch else None
            line = q.get(timeout=timeout) if timeout else q.get_nowait()
        except queue.Empty:
            if batch:
                flush(batch)
                continue
            line = q.get()  # idle: block for the next request
        if line is None:  # EOF
            flush(batch)
            break
        line = line.strip()
        if not line:
            continue
        try:
            req = json.loads(line)
            if not isinstance(req, dict):
                raise ValueError("request must be a JSON object")
            op = req.get("op", "infer")
        except Exception as exc:  # malformed line: answer, keep serving
            flush(batch)
            respond({"id": None, "ok": False, "error": f"bad request: {exc}"})
            continue
        if op == "infer":
            try:
                img, size = engine.load(req["image"])
            except Exception as exc:
                flush(batch)
                respond(
                    {"id": req.get("id"), "ok": False, "error": str(exc)}
                )
                continue
            batch.append((req, img, size))
            served += 1
            if len(batch) >= engine.batch_size:
                flush(batch)
        elif op == "ping":
            flush(batch)
            respond({"id": req.get("id"), "ok": True, "served": engine.served})
        elif op == "shutdown":
            flush(batch)
            respond({"id": req.get("id"), "ok": True})
            running = False
        else:
            flush(batch)
            respond(
                {"id": req.get("id"), "ok": False, "error": f"unknown op: {op}"}
            )
    if logger is not None:
        logger.info("server exiting after %d inference requests", served)
    return served
