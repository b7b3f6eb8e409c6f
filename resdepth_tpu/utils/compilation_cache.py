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

    The flags line alone is NOT enough: LLVM also derives tuning features
    from the cpuid identity (family/model/stepping — e.g. scatter/gather
    preference differs across microarchitectures with identical flag sets),
    and a foreign AOT entry loaded under a colliding fingerprint has been
    observed to crash in ThunkExecutor. Hash every identity line of the
    first CPU block (x86: vendor_id/cpu family/model/model name/stepping/
    flags; aarch64: CPU implementer/architecture/variant/part/revision/
    Features).
    """
    try:
        with open("/proc/cpuinfo") as f:
            text = f.read()
    except OSError:
        text = ""
    return _fingerprint_from_cpuinfo(text)


_IDENTITY_KEYS = ("flags", "features", "vendor_id", "cpu family", "model",
                  "model name", "stepping", "cpu implementer",
                  "cpu architecture", "cpu variant", "cpu part",
                  "cpu revision")


def _fingerprint_from_cpuinfo(text: str) -> str:
    ident: list[str] = []
    for line in text.splitlines():
        if not line.strip():
            break  # end of the first processor block
        if line.lower().startswith(_IDENTITY_KEYS):
            ident.append(line.strip())
    if not ident:
        ident = [platform.processor()]
    raw = "\n".join([platform.machine(), *ident]).encode()
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
