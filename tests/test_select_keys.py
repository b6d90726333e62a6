"""Both lowerings of the contrastive enqueue key selection
(losses/contrastive.py _select_keys_{argsort,radix}) implement the same
contract: at/under the cap the slab is exactly the masked index set
(reference utils.py:27-47 enqueues all candidates); over the cap it is a
k-subset of the masked set with all-valid slots."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from u2pl_tpu.losses.contrastive import (
    _select_keys_argsort,
    _select_keys_radix,
)

LOWERINGS = [_select_keys_argsort, _select_keys_radix]


@pytest.mark.parametrize("fn", LOWERINGS)
def test_under_cap_returns_exact_masked_set(fn):
    rng = np.random.RandomState(0)
    mask = jnp.asarray(rng.rand(503) < 0.3)
    idx, valid = fn(mask, jax.random.PRNGKey(1), 256)
    n_true = int(mask.sum())
    assert int(valid.sum()) == n_true
    got = set(np.asarray(idx)[np.asarray(valid)].tolist())
    assert got == set(np.flatnonzero(np.asarray(mask)).tolist())


def test_radix_under_cap_is_pixel_ordered():
    # the radix compaction preserves index order — the reference's
    # boolean-indexing enqueue order
    rng = np.random.RandomState(2)
    mask = jnp.asarray(rng.rand(400) < 0.25)
    idx, valid = _select_keys_radix(mask, jax.random.PRNGKey(3), 256)
    kept = np.asarray(idx)[np.asarray(valid)]
    assert (np.diff(kept) > 0).all()
    np.testing.assert_array_equal(kept, np.flatnonzero(np.asarray(mask)))


@pytest.mark.parametrize("fn", LOWERINGS)
def test_over_cap_uniform_subset(fn):
    rng = np.random.RandomState(4)
    mask = jnp.asarray(rng.rand(2048) < 0.7)  # ~1430 true >> k
    k = 128
    idx, valid = fn(mask, jax.random.PRNGKey(5), k)
    assert bool(valid.all())
    kept = np.asarray(idx)
    assert len(set(kept.tolist())) == k  # distinct
    assert np.asarray(mask)[kept].all()  # subset of the mask
    # different rngs give different subsets
    idx2, _ = fn(mask, jax.random.PRNGKey(6), k)
    assert set(kept.tolist()) != set(np.asarray(idx2).tolist())


@pytest.mark.parametrize("fn", LOWERINGS)
def test_empty_mask(fn):
    mask = jnp.zeros((300,), bool)
    idx, valid = fn(mask, jax.random.PRNGKey(0), 64)
    assert not bool(valid.any())
    assert idx.shape == (64,)
    assert (np.asarray(idx) >= 0).all() and (np.asarray(idx) < 300).all()


@pytest.mark.parametrize("fn", LOWERINGS)
def test_vmapped_like_the_step(fn):
    # exactly the call shape the contrastive loss uses: vmap over classes
    rng = np.random.RandomState(7)
    masks = jnp.asarray(rng.rand(5, 700) < 0.1)  # ~70 true/class, under cap
    keys = jax.random.split(jax.random.PRNGKey(8), 5)
    idx, valid = jax.vmap(lambda m, k: fn(m, k, 96))(masks, keys)
    assert idx.shape == (5, 96) and valid.shape == (5, 96)
    for c in range(5):
        got = set(np.asarray(idx[c])[np.asarray(valid[c])].tolist())
        assert got == set(np.flatnonzero(np.asarray(masks[c])).tolist())


def test_over_cap_selection_is_unbiased_enough():
    # sanity on uniformity: over many draws every masked pixel should be
    # selected a similar number of times (loose 4-sigma band)
    mask = jnp.ones((256,), bool)
    k = 64
    counts = np.zeros(256)
    trials = 200
    sel = jax.jit(lambda r: _select_keys_radix(mask, r, k))
    for t in range(trials):
        idx, valid = sel(jax.random.PRNGKey(t))
        counts[np.asarray(idx)] += 1
    p = k / 256
    sigma = np.sqrt(trials * p * (1 - p))
    assert np.abs(counts - trials * p).max() < 4.5 * sigma

def test_select_keys_parsed_from_yaml_and_validated():
    """The lowering choice is a config field (baked into the traced program;
    multi-host runs must trace identically on every host), so it must round-
    trip through the YAML parser and reject unknown values loudly."""
    import os

    import yaml

    from u2pl_tpu.config import parse_config

    p = os.path.join(
        os.path.dirname(__file__),
        "..",
        "experiments",
        "pascal",
        "1464",
        "ours",
        "config.yaml",
    )
    raw = yaml.safe_load(open(p))
    assert parse_config(raw).trainer.contrastive.select_keys == "argsort"
    raw["trainer"]["contrastive"]["select_keys"] = "radix"
    assert parse_config(raw).trainer.contrastive.select_keys == "radix"
    raw["trainer"]["contrastive"]["select_keys"] = "bogus"
    with pytest.raises(ValueError, match="select_keys"):
        parse_config(raw)
