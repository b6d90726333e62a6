"""Persistent compilation cache wiring (utils/compile_cache.py).

The reference ships no equivalent (cuDNN kernels come precompiled); here
the cache is the restart-latency answer to XLA's minutes-long 769-px
compiles (docs/PERF.md).  Covers precedence (flag > env > disabled) and
the functional path: enabling the cache makes jit compiles write
deserializable entries into the directory.
"""

from __future__ import annotations

import os

import jax
import jax.numpy as jnp

from u2pl_tpu.utils.compile_cache import (
    maybe_enable_compilation_cache,
    prune_compile_cache,
)


def test_disabled_by_default(monkeypatch):
    monkeypatch.delenv("U2PL_COMPILE_CACHE", raising=False)
    assert maybe_enable_compilation_cache(None) is None
    assert maybe_enable_compilation_cache("") is None


def test_env_var_enables_and_flag_wins(tmp_path, monkeypatch):
    env_dir = tmp_path / "env"
    flag_dir = tmp_path / "flag"
    monkeypatch.setenv("U2PL_COMPILE_CACHE", str(env_dir))
    assert maybe_enable_compilation_cache(None) == str(env_dir)
    assert env_dir.is_dir()
    assert maybe_enable_compilation_cache(str(flag_dir)) == str(flag_dir)
    assert flag_dir.is_dir()


def test_jit_writes_cache_entries(tmp_path):
    cache_dir = tmp_path / "cc"
    assert maybe_enable_compilation_cache(str(cache_dir)) == str(cache_dir)
    try:
        f = jax.jit(lambda x: (x @ x).sum())
        f(jnp.ones((32, 32), jnp.float32)).block_until_ready()
        entries = os.listdir(cache_dir)
        assert entries, "persistent cache wrote no entries"
        assert any(e.endswith("-cache") for e in entries)
    finally:
        # Leave no process-global cache config behind for other tests.
        jax.config.update("jax_compilation_cache_dir", None)


def _mk_entry(d, name, size, age_s):
    path = d / name
    path.touch()
    os.truncate(path, size)  # sparse: st_size without allocating blocks
    t = os.stat(path).st_mtime - age_s
    os.utime(path, (t, t))
    return path


def test_prune_evicts_lru_until_under_cap(tmp_path):
    old = _mk_entry(tmp_path, "old-cache", 100, age_s=300)
    mid = _mk_entry(tmp_path, "mid-cache", 100, age_s=200)
    new = _mk_entry(tmp_path, "new-cache", 100, age_s=100)
    # subdirs and dotfiles are never touched
    (tmp_path / "sub").mkdir()
    dot = _mk_entry(tmp_path, ".lock", 100, age_s=999)

    assert prune_compile_cache(str(tmp_path), max_bytes=1000) == 0
    assert old.exists() and mid.exists() and new.exists()

    assert prune_compile_cache(str(tmp_path), max_bytes=150) == 2
    assert not old.exists() and not mid.exists()
    assert new.exists() and dot.exists() and (tmp_path / "sub").is_dir()


def test_max_gb_env_prunes_at_enable(tmp_path, monkeypatch):
    cache_dir = tmp_path / "cc"
    cache_dir.mkdir()
    old = _mk_entry(cache_dir, "old-cache", 600_000_000, age_s=300)
    new = _mk_entry(cache_dir, "new-cache", 600_000_000, age_s=100)
    monkeypatch.setenv("U2PL_COMPILE_CACHE_MAX_GB", "1")
    try:
        assert maybe_enable_compilation_cache(str(cache_dir)) == str(cache_dir)
    finally:
        import jax

        jax.config.update("jax_compilation_cache_dir", None)
    assert not old.exists()
    assert new.exists()


def test_cli_parsers_accept_the_flag():
    import eval as eval_cli
    import infer as infer_cli

    for mod in (eval_cli, infer_cli):
        args = mod.get_parser().parse_args(
            ["--compilation_cache_dir", "/tmp/x", "--dtype", "bfloat16"]
        )
        assert args.compilation_cache_dir == "/tmp/x"
        assert args.dtype == "bfloat16"

    import train_semi
    import train_sup

    for mod in (train_semi, train_sup):
        args, _ = mod.parser.parse_known_args(
            ["--compilation_cache_dir", "/tmp/x"]
        )
        assert args.compilation_cache_dir == "/tmp/x"
