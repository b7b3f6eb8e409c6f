"""Bounded device-backend liveness probe.

A dead device tunnel makes ``jax.devices()`` hang FOREVER inside native init
(it blocks, it does not raise — observed on relayed TPU chips), which turns
any CLI that touches the backend into a silent hang. Probing in a subprocess
with a timeout converts that into a clear, fast failure. The reference has no
counterpart (its device selection is a constructor argument,
/root/reference/lib/Trainer.py:34).

Used by ``train.py``, ``test.py`` and ``bench.py`` before their first
backend touch. Skipped automatically when the target platform is the host
CPU (``JAX_PLATFORMS=cpu`` — nothing to tunnel) or when
``RESDEPTH_SKIP_BACKEND_PROBE=1``.
"""

from __future__ import annotations

import os
import subprocess
import sys


class BackendUnavailable(RuntimeError):
    pass


def _platform_pinned_to_cpu() -> bool:
    """True when the JAX platform is pinned to the host CPU — via the env
    var, or via in-process config (``jax.config.update("jax_platforms",
    "cpu")``, the test-conftest pattern; a subprocess would NOT inherit that
    and would probe the real device)."""
    if "cpu" in os.environ.get("JAX_PLATFORMS", "").lower():
        return True
    jax_mod = sys.modules.get("jax")
    if jax_mod is not None:
        try:
            return "cpu" in str(jax_mod.config.jax_platforms or "").lower()
        except Exception:
            pass
    return False


def probe_backend(timeout_s: float | None = None, logger=None) -> str | None:
    """Check that the JAX backend can initialize, in a bounded subprocess.

    Returns the platform name (e.g. ``'tpu'``) on success, ``None`` when the
    probe is skipped. Raises :class:`BackendUnavailable` on failure/timeout.
    """
    if os.environ.get("RESDEPTH_SKIP_BACKEND_PROBE"):
        return None
    if _platform_pinned_to_cpu():
        return None
    if timeout_s is None:
        timeout_s = float(os.environ.get("RESDEPTH_BACKEND_PROBE_TIMEOUT", 300))

    code = "import jax; print(jax.devices()[0].platform)"
    try:
        proc = subprocess.run([sys.executable, "-c", code],
                              capture_output=True, text=True,
                              timeout=timeout_s)
    except subprocess.TimeoutExpired:
        raise BackendUnavailable(
            f"device backend init did not finish within {timeout_s:.0f}s "
            "(dead device tunnel?); aborting instead of hanging. "
            "Set JAX_PLATFORMS=cpu to run on the host CPU, or "
            "RESDEPTH_SKIP_BACKEND_PROBE=1 to skip this check.")
    if proc.returncode != 0:
        raise BackendUnavailable(
            "device backend failed to initialize:\n"
            + proc.stderr.strip()[-2000:])
    platform = proc.stdout.strip().splitlines()[-1]
    if logger is not None:
        logger.info(f"Device backend OK: {platform}")
    return platform
