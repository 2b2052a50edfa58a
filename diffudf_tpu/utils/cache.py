"""Persistent XLA compilation cache.

TPU compiles of the large fused graphs take 20–40 s; caching them on disk
makes every CLI invocation after the first start instantly.  Called by the
CLI entry points and bench.py.
"""

from __future__ import annotations

import os


def enable_compilation_cache(path: str | None = None):
    import jax

    cache_dir = path or os.path.expanduser("~/.cache/jax_compilation")
    os.makedirs(cache_dir, exist_ok=True)
    try:
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass
    return cache_dir
