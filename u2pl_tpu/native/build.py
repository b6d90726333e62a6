"""Build the native host data-plane library: python -m u2pl_tpu.native.build"""

from __future__ import annotations

import os
import subprocess

_DIR = os.path.dirname(os.path.abspath(__file__))


def build(verbose: bool = True) -> str:
    src = os.path.join(_DIR, "augment.cc")
    out = os.path.join(_DIR, "libu2pl_data.so")
    cmd = [
        "g++", "-O3", "-shared", "-fPIC", "-std=c++17", "-ffast-math",
        "-o", out, src,
    ]
    if verbose:
        print(" ".join(cmd))
    subprocess.run(cmd, check=True)
    return out


if __name__ == "__main__":
    path = build()
    print("built", path)
