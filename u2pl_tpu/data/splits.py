"""Split-file parsing and deterministic sub/over-sampling.

Parity with reference BaseDataset.parse_input_list (dataset/base.py:12-41)
path templates and the seeded `random.sample` selection
(pascal_voc.py:24-33 / cityscapes.py:24-32): identical seeds produce the
identical labeled subset as the reference.
"""

from __future__ import annotations

import logging
import math
import os
import random
import shutil
from typing import List, Tuple

log = logging.getLogger("global")


def sync_split_dir(source_root: str, dest_root: str) -> int:
    """Copy every ``*.txt`` under ``<source_root>/data/splits`` into
    ``dest_root``, preserving layout.  The split lists (labeled/unlabeled/
    val image-ID files, reference data/splits/**) are dataset metadata and
    ARE vendored at the repo root (data/splits/**, sha256 manifest in
    tests/test_data.py) so a bare clone trains out of the box; this tool
    refreshes them from a reference checkout.  Returns files copied."""
    src = os.path.join(source_root, "data", "splits")
    if not os.path.isdir(src):
        raise FileNotFoundError(f"no split directory at {src}")
    n = 0
    for root, _, files in os.walk(src):
        rel = os.path.relpath(root, src)
        out_dir = os.path.join(dest_root, rel)
        os.makedirs(out_dir, exist_ok=True)
        for f in files:
            if f.endswith(".txt"):
                shutil.copyfile(os.path.join(root, f), os.path.join(out_dir, f))
                n += 1
    return n


def _maybe_sync_missing_split(d_list: str) -> bool:
    """Auto-populate a data/splits/ tree OUTSIDE this repo (e.g. a config
    pointing at a dataset checkout) from a reference checkout
    (U2PL_SPLITS_SOURCE, default /root/reference).  The repo's own
    data/splits/** is vendored, so this only fires for external paths.
    Returns True if the file now exists."""
    parts = os.path.normpath(os.path.abspath(d_list)).split(os.sep)
    try:
        i = len(parts) - 1 - parts[::-1].index("splits")
    except ValueError:
        return False
    if i == 0 or parts[i - 1] != "data":
        return False
    dest_root = os.sep.join(parts[: i + 1])
    source = os.environ.get("U2PL_SPLITS_SOURCE", "/root/reference")
    if not os.path.isdir(os.path.join(source, "data", "splits")):
        return False
    n = sync_split_dir(source, dest_root)
    log.info(
        "split list %s was missing; synced %d split files from %s "
        "(tools/sync_splits.py does the same by hand)", d_list, n, source
    )
    return os.path.isfile(d_list)


def parse_split(d_list: str) -> List[Tuple[str, str]]:
    if not os.path.isfile(d_list) and not _maybe_sync_missing_split(d_list):
        raise FileNotFoundError(
            f"split list {d_list!r} does not exist. The standard lists are "
            "vendored under this repo's data/splits/** — point the config "
            "there, or run `python tools/sync_splits.py --source "
            "/path/to/U2PL` (or set U2PL_SPLITS_SOURCE and retry) to "
            "populate an external data/splits/ tree."
        )
    pairs: List[Tuple[str, str]] = []
    if "cityscapes" in d_list:
        for line in open(d_list, "r"):
            s = line.strip()
            pairs.append((s, "gtFine/" + s[12:-15] + "gtFine_labelTrainIds.png"))
    elif "pascal" in d_list or "VOC" in d_list:
        for line in open(d_list, "r"):
            s = line.strip()
            pairs.append((f"JPEGImages/{s}.jpg", f"SegmentationClassAug/{s}.png"))
    else:
        raise ValueError(f"unknown dataset for list {d_list!r}")
    assert pairs, f"empty split list {d_list}"
    return pairs


def subsample(
    pairs: List[Tuple[str, str]], n_sup: int, seed: int, split: str
) -> List[Tuple[str, str]]:
    """reference voc_dset/city_dset __init__ semantics: seeded
    random.sample of n_sup entries, repeating the list first when n_sup
    exceeds its length; val split returns the list untouched."""
    random.seed(seed)
    if split != "train":
        return list(pairs)
    if len(pairs) >= n_sup:
        return random.sample(pairs, n_sup)
    num_repeat = math.ceil(n_sup / len(pairs))
    return random.sample(pairs * num_repeat, n_sup)
