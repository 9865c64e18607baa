"""Persistent XLA compilation cache.

First compiles of the flagship model take ~60s over the remote-TPU tunnel;
enabling JAX's persistent cache makes every later process start warm.
Call once at program start (bench.py / train.py / tools do).
"""
from __future__ import annotations

import os

__all__ = ["enable_compilation_cache"]


def enable_compilation_cache(cache_dir: str = None):
    import jax

    cache_dir = cache_dir or os.environ.get(
        "JAX_COMPILATION_CACHE_DIR",
        os.path.expanduser("~/.cache/centernet_tpu_xla"),
    )
    try:
        os.makedirs(cache_dir, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    except Exception:
        pass  # older jax or read-only fs: compilation just stays per-process
