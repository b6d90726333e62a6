#!/usr/bin/env python
"""Populate data/splits/ from an existing U2PL checkout.

The split lists (labeled/unlabeled/val image-ID files for every VOC and
Cityscapes partition) are dataset metadata published with the reference
repo; this framework consumes the identical files.  To keep this
repository free of copied assets, fetch them from a reference checkout:

    python tools/sync_splits.py --source /path/to/U2PL [--dest data/splits]

Default source is /root/reference (the read-only mounted reference).
"""

from __future__ import annotations

import argparse
import os
import shutil


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--source", default="/root/reference")
    ap.add_argument(
        "--dest", default=os.path.join(os.path.dirname(__file__), "..", "data", "splits")
    )
    args = ap.parse_args()
    src = os.path.join(args.source, "data", "splits")
    if not os.path.isdir(src):
        raise SystemExit(f"no split directory at {src}")
    dest = os.path.abspath(args.dest)
    n = 0
    for root, _, files in os.walk(src):
        rel = os.path.relpath(root, src)
        out_dir = os.path.join(dest, rel)
        os.makedirs(out_dir, exist_ok=True)
        for f in files:
            if f.endswith(".txt"):
                shutil.copyfile(os.path.join(root, f), os.path.join(out_dir, f))
                n += 1
    print(f"copied {n} split files to {dest}")


if __name__ == "__main__":
    main()
