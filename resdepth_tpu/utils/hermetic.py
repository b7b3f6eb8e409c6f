"""Hermetic host-CPU backend environment for subprocesses.

The container sitecustomize pins every Python process to the tunneled TPU
plugin (registered when PALLAS_AXON_POOL_IPS is set). Subprocesses that need
a clean N-virtual-device CPU backend (multichip dry runs, golden
regeneration) share this env recipe.
"""

from __future__ import annotations

import os

_DEVICE_COUNT_FLAG = "--xla_force_host_platform_device_count"


def host_cpu_env(n_devices: int, base: dict | None = None) -> dict:
    env = dict(os.environ if base is None else base)
    env.pop("PALLAS_AXON_POOL_IPS", None)   # skip the TPU plugin registration
    env["JAX_PLATFORMS"] = "cpu"
    env["JAX_NUM_CPU_DEVICES"] = str(n_devices)
    # Replace (not append to) any inherited device-count flag: a stale
    # =1 pin from the parent env would otherwise appear twice and which
    # value wins depends on XLA's flag-parsing order.
    kept = [f for f in env.get("XLA_FLAGS", "").split()
            if not f.startswith(_DEVICE_COUNT_FLAG)]
    env["XLA_FLAGS"] = " ".join(
        kept + [f"{_DEVICE_COUNT_FLAG}={n_devices}"])
    return env
