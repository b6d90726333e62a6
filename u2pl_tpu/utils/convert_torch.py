"""PyTorch checkpoint -> Flax variables converter.

Lets reference checkpoints (single torch pickle with keys
{epoch, model_state, optimizer_state, teacher_state, best_miou}, reference
train_semi.py:211-224) be loaded into the Flax model for bit-matched eval,
and serves as the layer-by-layer parity oracle in tests.

Name mapping is deterministic from this repo's Flax module names to the
reference torch module names (reference u2pl/models/*.py); conv kernels are
transposed OIHW -> HWIO for the NHWC TPU layout.
"""

from __future__ import annotations

import re
from typing import Any, Dict, Mapping, Tuple

import numpy as np


def strip_module_prefix(state_dict: Mapping[str, Any]) -> Dict[str, Any]:
    """Remove the DDP 'module.' prefix (reference utils.py:494-499)."""
    out = {}
    for k, v in state_dict.items():
        out[k[7:] if k.startswith("module.") else k] = v
    return out


def _translate(path: Tuple[str, ...]) -> str:
    """Flax variable path (module names + leaf) -> torch state-dict key."""
    parts = [p for p in path if p != "Conv_0"]
    leaf = parts[-1]
    mods = parts[:-1]

    torch_mods = []
    i = 0
    while i < len(mods):
        m = mods[i]
        if m == "encoder":
            torch_mods.append("encoder")
        elif m == "decoder":
            torch_mods.append("decoder")
        elif m == "auxor":
            torch_mods.append("auxor")
            rest = mods[i + 1 :]
            sub = {"conv1": "aux.0", "bn1": "aux.1", "out": "aux.4"}[rest[0]]
            torch_mods.append(sub)
            i = len(mods)
            continue
        elif m.startswith("stem_conv"):
            torch_mods.append({"stem_conv1": "conv1.0", "stem_conv2": "conv1.3",
                               "stem_conv3": "conv1.6"}[m])
        elif m.startswith("stem_bn"):
            torch_mods.append({"stem_bn1": "conv1.1", "stem_bn2": "conv1.4"}[m])
        elif re.fullmatch(r"layer\d+_\d+", m):
            stage, blk = m[5:].split("_")
            torch_mods.append(f"layer{stage}.{blk}")
        elif m in ("conv1", "conv2", "conv3", "bn1", "bn2", "bn3") and torch_mods and (
            torch_mods[-1].startswith("layer") or torch_mods[-1] == "encoder"
        ):
            torch_mods.append(m)
        elif m == "ds_conv":
            torch_mods.append("downsample.0")
        elif m == "ds_bn":
            torch_mods.append("downsample.1")
        elif m == "aspp":
            torch_mods.append("aspp")
        elif m == "img_conv":
            torch_mods.append("conv1.1")
        elif m == "img_bn":
            torch_mods.append("conv1.2")
        elif m == "conv1x1":
            torch_mods.append("conv2.0")
        elif m == "bn1x1":
            torch_mods.append("conv2.1")
        elif m.startswith("conv_d"):
            torch_mods.append(f"conv{3 + int(m[6:])}.0")
        elif m.startswith("bn_d"):
            torch_mods.append(f"conv{3 + int(m[4:])}.1")
        elif m == "low_conv":
            torch_mods.append("low_conv.0")
        elif m == "low_bn":
            torch_mods.append("low_conv.1")
        elif m == "head_conv":
            torch_mods.append("head.0")
        elif m == "head_bn":
            torch_mods.append("head.1")
        elif m == "head_out":
            torch_mods.append("head.4")
        elif m.startswith("cls_") or m.startswith("rep_"):
            prefix = "classifier" if m.startswith("cls_") else "representation"
            sub = {"conv1": "0", "bn1": "1", "conv2": "4", "bn2": "5", "out": "8"}[
                m.split("_", 1)[1]
            ]
            torch_mods.append(f"{prefix}.{sub}")
        else:
            raise KeyError(f"no torch mapping for flax module {m!r} in {path}")
        i += 1

    torch_leaf = {
        "kernel": "weight",
        "bias": "bias",
        "scale": "weight",
        "mean": "running_mean",
        "var": "running_var",
    }[leaf]
    return ".".join(torch_mods + [torch_leaf])


def _to_np(t: Any) -> np.ndarray:
    try:
        return t.detach().cpu().numpy()
    except AttributeError:
        return np.asarray(t)


def torch_to_flax(
    state_dict: Mapping[str, Any],
    variables: Mapping[str, Any],
    tolerant: bool = False,
) -> Dict[str, Any]:
    """Fill a Flax {params, batch_stats} tree with reference torch weights.

    `variables` is the output of model.init (provides structure/shapes);
    returns a new tree of numpy arrays.  By default raises on missing keys
    or shape mismatches.  `tolerant=True` mirrors the reference load_state
    (utils.py:595-613): size-mismatched or missing keys are dropped with a
    warning and keep their init values — used for class-count transfer
    (e.g. a VOC-21 head checkpoint warm-starting a 19-class model).
    """
    import logging

    import jax

    log = logging.getLogger("global")
    sd = strip_module_prefix(dict(state_dict))
    flat = jax.tree_util.tree_flatten_with_path(variables)[0]
    out = {}
    for keypath, val in flat:
        path = tuple(
            k.key if hasattr(k, "key") else str(k) for k in keypath
        )  # ('params'|'batch_stats', ...)
        coll, subpath = path[0], path[1:]
        tkey = _translate(subpath)
        if tkey not in sd:
            if tolerant:
                log.warning(f"caution: missing keys from checkpoint: {tkey}")
                out[path] = np.asarray(val)
                continue
            raise KeyError(f"torch checkpoint missing {tkey} (for flax {path})")
        arr = _to_np(sd[tkey]).astype(np.float32)
        if subpath[-1] == "kernel" and arr.ndim == 4:
            arr = arr.transpose(2, 3, 1, 0)  # OIHW -> HWIO
        if arr.shape != val.shape:
            if tolerant:
                log.warning(
                    "caution: size-mismatch key: {} size: {} -> {}".format(
                        tkey, arr.shape, val.shape
                    )
                )
                out[path] = np.asarray(val)
                continue
            raise ValueError(
                f"shape mismatch for {tkey}: torch {arr.shape} vs flax "
                f"{val.shape} at {path}"
            )
        out[path] = arr

    def rebuild(tree, prefix=()):
        if isinstance(tree, Mapping):
            return {k: rebuild(v, prefix + (k,)) for k, v in tree.items()}
        return out[prefix]

    return rebuild(variables)


def torch_encoder_to_flax(
    state_dict: Mapping[str, Any], variables: Mapping[str, Any]
) -> Tuple[Dict[str, Any], list, list]:
    """Load an ImageNet-pretrained deep-stem ResNet `.pth` state dict into
    the ENCODER subtree of a full-model Flax variables tree.

    The torch layout is the reference's `model_urls` checkpoint format
    (reference u2pl/models/resnet.py:16-22, loaded with strict=False at
    :380-402): keys `conv1.{0,1,3,4,6}.*` (deep stem), `bn1.*`,
    `layer{1..4}.{blk}.{conv,bn}{1,2,3}.*`, `downsample.{0,1}.*`, plus
    `fc.*` which the segmentation encoder discards.  strict=False
    semantics: flax leaves with no torch key keep their init values
    (missing), torch keys with no flax home are ignored (unexpected).

    Returns (new_variables, missing_keys, unexpected_keys).
    """
    import jax

    sd = strip_module_prefix(dict(state_dict))
    flat = jax.tree_util.tree_flatten_with_path(variables)[0]
    out = {}
    missing, used = [], set()
    for keypath, val in flat:
        path = tuple(k.key if hasattr(k, "key") else str(k) for k in keypath)
        subpath = path[1:]
        if not subpath or subpath[0] != "encoder":
            out[path] = np.asarray(val)
            continue
        tkey = _translate(subpath)
        assert tkey.startswith("encoder.")
        tkey = tkey[len("encoder.") :]
        if tkey not in sd:
            missing.append(tkey)
            out[path] = np.asarray(val)
            continue
        arr = _to_np(sd[tkey]).astype(np.float32)
        if subpath[-1] == "kernel" and arr.ndim == 4:
            arr = arr.transpose(2, 3, 1, 0)  # OIHW -> HWIO
        if arr.shape != val.shape:
            raise ValueError(
                f"shape mismatch for pretrained encoder key {tkey}: "
                f"torch {arr.shape} vs flax {val.shape}"
            )
        out[path] = arr
        used.add(tkey)

    unexpected = [
        k for k in sd if k not in used and not k.endswith("num_batches_tracked")
    ]

    def rebuild(tree, prefix=()):
        if isinstance(tree, Mapping):
            return {k: rebuild(v, prefix + (k,)) for k, v in tree.items()}
        return out[prefix]

    return rebuild(variables), missing, unexpected
