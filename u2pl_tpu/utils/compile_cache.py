"""Persistent XLA compilation cache wiring for the CLIs.

The 769-px cityscapes train/eval programs take minutes to compile (up to
~7 min under a tunneled backend, docs/PERF.md); the reference never pays
this because cuDNN kernels ship precompiled.  JAX's persistent
compilation cache closes the gap across process restarts: the first run
compiles and writes the serialized executable, every later run with the
same program/topology deserializes it in seconds.

Enabled by ``--compilation_cache_dir DIR`` on every CLI (train_sup,
train_semi, eval, infer) or the ``U2PL_COMPILE_CACHE`` env var; the flag
wins when both are set.  Off by default: parity runs and tests stay
hermetic.  Long-lived deployments bound the directory with
``U2PL_COMPILE_CACHE_MAX_GB`` (LRU eviction at startup, see
``prune_compile_cache``) — without it the cache grows without bound as
shapes/configs churn.
"""

from __future__ import annotations

import logging
import os
from typing import Optional


def maybe_enable_compilation_cache(
    cache_dir: Optional[str] = None,
    logger: Optional[logging.Logger] = None,
) -> Optional[str]:
    """Enable JAX's persistent compilation cache if a directory is given.

    ``cache_dir`` (CLI flag) takes precedence over the
    ``U2PL_COMPILE_CACHE`` environment variable; an empty/unset value in
    both leaves the cache disabled and returns ``None``.  Returns the
    directory actually enabled.  Must run before the first jit trace to
    cover every program in the process.
    """
    cache_dir = cache_dir or os.environ.get("U2PL_COMPILE_CACHE") or None
    if not cache_dir:
        return None
    import jax

    os.makedirs(cache_dir, exist_ok=True)
    max_gb = os.environ.get("U2PL_COMPILE_CACHE_MAX_GB")
    if max_gb:
        evicted = prune_compile_cache(cache_dir, float(max_gb) * 1e9)
        if evicted and logger is not None:
            logger.info(
                "compilation cache: evicted %d LRU entries to honor "
                "U2PL_COMPILE_CACHE_MAX_GB=%s",
                evicted,
                max_gb,
            )
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    # Serving/eval programs are worth caching even when they compile
    # fast (the default 1 s / 0-byte thresholds skip small programs);
    # cache everything so restart latency is deserialization-bound.
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    if logger is not None:
        logger.info("persistent compilation cache: %s", cache_dir)
    return cache_dir


def prune_compile_cache(cache_dir: str, max_bytes: float) -> int:
    """Evict least-recently-used cache entries until the directory fits.

    JAX writes one file per compiled executable and touches (reads) it on
    every cache hit, so ``st_atime`` (falling back to ``st_mtime`` on
    noatime mounts, where atime==mtime) orders entries by last use.
    Deletes oldest-first until total size <= ``max_bytes``; never touches
    subdirectories or dotfiles.  Returns the number of files removed.
    Safe to call while no JAX process is mid-write (we run it before
    enabling the cache); a concurrently-removed file is skipped.
    """
    entries = []
    for name in os.listdir(cache_dir):
        if name.startswith("."):
            continue
        path = os.path.join(cache_dir, name)
        try:
            st = os.stat(path)
        except OSError:
            continue
        if not os.path.isfile(path):
            continue
        entries.append((max(st.st_atime, st.st_mtime), st.st_size, path))
    total = sum(size for _, size, _ in entries)
    if total <= max_bytes:
        return 0
    entries.sort()  # oldest last-use first
    removed = 0
    for _, size, path in entries:
        if total <= max_bytes:
            break
        try:
            os.remove(path)
        except OSError:
            continue
        total -= size
        removed += 1
    return removed
