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


def _primary_platform(spec: str) -> str:
    """First entry of a comma-separated ``jax_platforms`` list — the platform
    JAX will actually target. Trailing entries are fallbacks (some hosts pin
    ``'axon,cpu'``: the CPU is only reached if the device backend fails)."""
    return spec.split(",")[0].strip().lower()


def _platform_pinned_to_cpu() -> bool:
    """True when the JAX platform is pinned to the host CPU.

    The IN-PROCESS config is authoritative when jax is already imported:
    device-plugin sitecustomize hooks (axon) run ``register()`` at
    interpreter start and override ``jax_platforms`` to ``'axon,cpu'``
    regardless of a ``JAX_PLATFORMS=cpu`` env var — the env alone does NOT
    guarantee a CPU run on such hosts. The env var decides only when jax is
    not imported (no plugin hook ran). A list like ``'axon,cpu'`` is never
    pinned: its primary target is the tunneled device, which can still hang.
    """
    jax_mod = sys.modules.get("jax")
    if jax_mod is not None:
        try:
            spec = str(jax_mod.config.jax_platforms or "")
        except Exception:
            spec = ""
        if spec:
            return _primary_platform(spec) == "cpu"
    env_spec = os.environ.get("JAX_PLATFORMS", "")
    return bool(env_spec) and _primary_platform(env_spec) == "cpu"


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
            "To run on the host CPU set JAX_PLATFORMS=cpu AND unset "
            "PALLAS_AXON_POOL_IPS (the device plugin's sitecustomize "
            "otherwise overrides the platform list at interpreter start); "
            "or set RESDEPTH_SKIP_BACKEND_PROBE=1 to skip this check.")
    if proc.returncode != 0:
        raise BackendUnavailable(
            "device backend failed to initialize:\n"
            + proc.stderr.strip()[-2000:])
    platform = proc.stdout.strip().splitlines()[-1]
    if logger is not None:
        logger.info(f"Device backend OK: {platform}")
    return platform
