"""Shared helpers for using the read-only reference checkout as a test
oracle: sys.path setup, stubs for missing host libs, CPU-safe .cuda()
patching, and a single-process gloo group for its collectives."""

import os
import sys
import types

REF = "/root/reference"


def reference_available() -> bool:
    return os.path.isdir(os.path.join(REF, "u2pl"))


def setup_reference():
    if REF not in sys.path:
        sys.path.insert(0, REF)
    if "skimage" not in sys.modules:
        sk = types.ModuleType("skimage")
        skm = types.ModuleType("skimage.measure")

        def _unavailable(*a, **k):
            raise NotImplementedError("skimage stubbed in tests")

        skm.label = _unavailable
        skm.regionprops = _unavailable
        sk.measure = skm
        sys.modules["skimage"] = sk
        sys.modules["skimage.measure"] = skm
    import torch

    torch.Tensor.cuda = lambda self, *a, **k: self


def init_gloo():
    import torch.distributed as dist

    if not dist.is_initialized():
        dist.init_process_group(
            "gloo", init_method="tcp://127.0.0.1:29517", rank=0, world_size=1
        )
