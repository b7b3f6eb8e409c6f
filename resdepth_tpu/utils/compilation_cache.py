"""Persistent XLA compilation cache setup.

First compiles of the fused train/inference programs take tens of seconds to
minutes on TPU; the persistent cache makes repeat CLI invocations (the normal
train -> test -> test... workflow) skip them. Backends that do not support
the cache simply ignore it.
"""

from __future__ import annotations

import os


def enable(cache_dir: str | None = None) -> str | None:
    """Point JAX at a persistent compilation cache directory."""
    import jax

    if cache_dir is None:
        cache_dir = os.environ.get(
            "RESDEPTH_COMPILATION_CACHE",
            os.path.join(os.path.expanduser("~"), ".cache", "resdepth_tpu", "xla"))
    if not cache_dir or cache_dir.lower() == "off":
        return None
    try:
        os.makedirs(cache_dir, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
        return cache_dir
    except Exception:
        return None
