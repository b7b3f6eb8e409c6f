"""Persistent XLA compilation cache setup.

First compiles of the fused train/inference programs take tens of seconds to
minutes on TPU; the persistent cache makes repeat CLI invocations (the normal
train -> test -> test... workflow) skip them. Backends that do not support
the cache simply ignore it.
"""

from __future__ import annotations

import hashlib
import os
import platform


def _host_fingerprint() -> str:
    """Short stable id of this host's CPU feature set.

    XLA:CPU AOT cache entries embed the compile machine's feature flags;
    loading them on a host with different features logs errors and can
    SIGILL. Scoping the cache directory per fingerprint means a cache
    populated on one machine is simply cold (never poisonous) on another.
    TPU entries are target-keyed anyway, so scoping them too only costs a
    recompile after a host change.
    """
    try:
        with open("/proc/cpuinfo") as f:
            for line in f:
                # x86 spells it 'flags'; aarch64 spells it 'Features'.
                if line.lower().startswith(("flags", "features")):
                    feats = line.split(":", 1)[1]
                    break
            else:
                feats = platform.processor()
    except OSError:
        feats = platform.processor()
    raw = f"{platform.machine()}:{feats}".encode()
    return hashlib.sha256(raw).hexdigest()[:10]


def enable(cache_dir: str | None = None) -> str | None:
    """Point JAX at a persistent compilation cache directory."""
    import jax

    if cache_dir is None:
        cache_dir = os.environ.get(
            "RESDEPTH_COMPILATION_CACHE",
            os.path.join(os.path.expanduser("~"), ".cache", "resdepth_tpu", "xla"))
    if not cache_dir or cache_dir.lower() == "off":
        return None
    cache_dir = os.path.join(cache_dir, f"host-{_host_fingerprint()}")
    try:
        os.makedirs(cache_dir, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
        return cache_dir
    except Exception:
        return None
