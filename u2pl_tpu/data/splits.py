"""Split-file parsing and deterministic sub/over-sampling.

Parity with reference BaseDataset.parse_input_list (dataset/base.py:12-41)
path templates and the seeded `random.sample` selection
(pascal_voc.py:24-33 / cityscapes.py:24-32): identical seeds produce the
identical labeled subset as the reference.
"""

from __future__ import annotations

import math
import random
from typing import List, Tuple


def parse_split(d_list: str) -> List[Tuple[str, str]]:
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
