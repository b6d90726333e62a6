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
hermetic, and the cache directory grows without bound unless the
deployment manages it.
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
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    # Serving/eval programs are worth caching even when they compile
    # fast (the default 1 s / 0-byte thresholds skip small programs);
    # cache everything so restart latency is deserialization-bound.
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    if logger is not None:
        logger.info("persistent compilation cache: %s", cache_dir)
    return cache_dir
