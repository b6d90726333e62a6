#!/usr/bin/env python
"""Populate data/splits/ from an existing U2PL checkout.

The split lists (labeled/unlabeled/val image-ID files for every VOC and
Cityscapes partition) are dataset metadata published with the reference
repo; this framework consumes the identical files.  To keep this
repository free of copied assets, fetch them from a reference checkout:

    python tools/sync_splits.py --source /path/to/U2PL [--dest data/splits]

Default source is /root/reference (the read-only mounted reference).
The loaders also auto-sync on first use when a configured split list is
missing (u2pl_tpu/data/splits.py:_maybe_sync_missing_split), honoring
U2PL_SPLITS_SOURCE; this tool is the explicit/offline variant.
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from u2pl_tpu.data.splits import sync_split_dir  # noqa: E402


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--source", default="/root/reference")
    ap.add_argument(
        "--dest",
        default=os.path.join(os.path.dirname(__file__), "..", "data", "splits"),
    )
    args = ap.parse_args()
    dest = os.path.abspath(args.dest)
    n = sync_split_dir(args.source, dest)
    print(f"copied {n} split files to {dest}")


if __name__ == "__main__":
    main()
