"""Every shipped experiment YAML must parse through the typed config and
carry the flagship settings its recipe depends on (reference experiment
surface: /root/reference/experiments/**/config.yaml)."""

import glob
import os

import pytest
import yaml

from u2pl_tpu.config import parse_config

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
YAMLS = sorted(glob.glob(os.path.join(ROOT, "experiments", "*", "*", "*", "config.yaml")))


def test_all_experiment_yamls_found():
    # 9 VOC splits + 4 cityscapes splits, x {suponly, ours}
    assert len(YAMLS) == 26, YAMLS


@pytest.mark.parametrize("path", YAMLS, ids=lambda p: "/".join(p.split(os.sep)[-4:-1]))
def test_yaml_parses(path):
    cfg = parse_config(yaml.safe_load(open(path)))
    # shipped TPU recipes run bf16 convs (docs/PERF.md A/B); float32 stays
    # available as an explicit override
    assert cfg.net.dtype == "bfloat16"
    is_city = "cityscapes" in path
    assert cfg.net.num_classes == (19 if is_city else 21)
    crop = cfg.dataset.train.crop.size[0]
    assert crop == (769 if is_city else 513)
    is_ours = path.split(os.sep)[-2] == "ours"
    if is_ours:
        assert cfg.dataset.type.endswith("_semi")
        assert cfg.trainer.contrastive is not None
        # cap >= measured p99 candidate tails (docs/CONFIG.md)
        assert cfg.trainer.contrastive.max_keys_per_class_per_step >= 8192
    else:
        assert cfg.trainer.contrastive is None
    # n_sup matches the split directory name
    n_sup_dir = int(path.split(os.sep)[-3])
    assert cfg.dataset.n_sup == n_sup_dir
