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


def _cpuid_words() -> list[int]:
    """Raw CPUID identity/feature words — what LLVM's host detection reads.

    Hypervisors can synthesize IDENTICAL /proc/cpuinfo identity blocks
    (generic model name, masked family/model/stepping) for VMs on different
    physical microarchitectures, while LLVM reads CPUID directly and derives
    different tuning features (+prefer-no-scatter/-gather, ...) — observed:
    two hosts with byte-identical cpuinfo identities produced incompatible
    XLA:CPU AOT entries under one fingerprint. Executes CPUID via a tiny
    JIT-mapped stub; returns [] off x86-64 or when W+X mappings are denied.
    """
    if platform.machine() != "x86_64":
        return []
    import ctypes
    import mmap
    code = bytes([
        0x53,                          # push rbx
        0x49, 0x89, 0xD0,              # mov r8, rdx   (save out ptr)
        0x89, 0xF8,                    # mov eax, edi  (leaf)
        0x89, 0xF1,                    # mov ecx, esi  (subleaf)
        0x0F, 0xA2,                    # cpuid
        0x41, 0x89, 0x00,              # mov [r8], eax
        0x41, 0x89, 0x58, 0x04,        # mov [r8+4], ebx
        0x41, 0x89, 0x48, 0x08,        # mov [r8+8], ecx
        0x41, 0x89, 0x50, 0x0C,        # mov [r8+12], edx
        0x5B,                          # pop rbx
        0xC3,                          # ret
    ])
    try:
        buf = mmap.mmap(-1, mmap.PAGESIZE,
                        prot=mmap.PROT_READ | mmap.PROT_WRITE | mmap.PROT_EXEC)
        buf.write(code)
        addr = ctypes.addressof(ctypes.c_char.from_buffer(buf))
        fn = ctypes.CFUNCTYPE(None, ctypes.c_uint32, ctypes.c_uint32,
                              ctypes.POINTER(ctypes.c_uint32))(addr)
        words: list[int] = []
        for leaf, sub in ((0, 0), (1, 0), (6, 0), (7, 0), (7, 1), (0xD, 0),
                          (0xD, 1), (0x80000000, 0), (0x80000001, 0),
                          (0x80000007, 0), (0x80000008, 0)):
            out = (ctypes.c_uint32 * 4)()
            fn(leaf, sub, ctypes.cast(out, ctypes.POINTER(ctypes.c_uint32)))
            eax, ebx, ecx, edx = out
            if leaf == 1:
                # EBX[31:24] is the initial APIC ID of the CORE the stub
                # happened to run on — hashing it would flap the fingerprint
                # per scheduling decision on multi-core hosts. (Leaf
                # 0x8000001E is omitted above for the same reason.)
                ebx &= 0x00FFFFFF
            words.extend((leaf, sub, eax, ebx, ecx, edx))
        del fn  # release the buffer export before closing the mapping
        return words
    except Exception:
        return []


def _runtime_cpu_features() -> list[str]:
    """numpy's runtime-detected (raw-CPUID-based) feature set."""
    try:
        from numpy._core._multiarray_umath import __cpu_features__
    except Exception:
        try:
            from numpy.core._multiarray_umath import __cpu_features__
        except Exception:
            return []
    return sorted(k for k, v in __cpu_features__.items() if v)


def _host_fingerprint() -> str:
    """Short stable id of this host's CPU identity + feature set.

    XLA:CPU AOT cache entries embed the compile machine's feature flags;
    loading them on a host with different features logs errors and can
    SIGILL. Scoping the cache directory per fingerprint means a cache
    populated on one machine is simply cold (never poisonous) on another.
    TPU entries are target-keyed anyway, so scoping them too only costs a
    recompile after a host change.

    Three identity sources are hashed, strongest first: raw CPUID words
    (what LLVM's host detection actually reads — /proc identities can be
    hypervisor-masked to collide across different physical machines),
    numpy's runtime feature set, and the /proc/cpuinfo identity lines.
    """
    try:
        with open("/proc/cpuinfo") as f:
            text = f.read()
    except OSError:
        text = ""
    extra = [f"cpuid:{w}" for w in _cpuid_words()] + _runtime_cpu_features()
    extra += _toolchain_versions()
    return _fingerprint_from_cpuinfo(text, extra)


def _toolchain_versions() -> list[str]:
    """jax/jaxlib versions: the AOT tuning-feature set also depends on the
    embedded LLVM (a jaxlib upgrade between runs can flip flags like
    +prefer-no-scatter with identical hardware), so entries must not be
    shared across toolchains either."""
    out = []
    try:
        import jaxlib.version
        out.append(f"jaxlib:{jaxlib.version.__version__}")
    except Exception:
        pass
    try:
        import jax.version
        out.append(f"jax:{jax.version.__version__}")
    except Exception:
        pass
    return out


_IDENTITY_KEYS = ("flags", "features", "vendor_id", "cpu family", "model",
                  "model name", "stepping", "cpu implementer",
                  "cpu architecture", "cpu variant", "cpu part",
                  "cpu revision")


def _fingerprint_from_cpuinfo(text: str, extra: list[str] | None = None) -> str:
    ident: list[str] = []
    for line in text.splitlines():
        if not line.strip():
            break  # end of the first processor block
        if line.lower().startswith(_IDENTITY_KEYS):
            ident.append(line.strip())
    if not ident:
        ident = [platform.processor()]
    raw = "\n".join([platform.machine(), *ident, *(extra or [])]).encode()
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
