"""Multi-process (multi-host / multi-slice) runtime bootstrap.

The reference is strictly single-device (hardcoded ``cuda:0``,
/root/reference/lib/Trainer.py:34). This framework's compute paths are
mesh-first and the fused train step is process-count-agnostic: batch
arrays are generated identically on every process from the seeded host
RNG and enter the jitted ``shard_map`` as replicated host values, which
JAX shards over the global mesh; gradients/BN statistics ``psum`` over
all mesh axes. A 2-process run over a 2x4 virtual CPU mesh is therefore
bit-identical to the single-process 8-device run
(tests/test_multiprocess.py) — the ONLY thing a multi-host launch needs
beyond a bigger mesh is this process bootstrap, which makes the
SCALING.md claim ("multi-slice is a config change") literally true.

Artifact-writing responsibilities under multi-process launches live with
process 0 (the chief): ``is_chief()`` gates checkpoint/metrics writes in
the Trainer.
"""

from __future__ import annotations

import os

_ENV_COORDINATOR = "RESDEPTH_DIST_COORDINATOR"
_ENV_NUM_PROCESSES = "RESDEPTH_DIST_NUM_PROCESSES"
_ENV_PROCESS_ID = "RESDEPTH_DIST_PROCESS_ID"
_ENV_AUTO = "RESDEPTH_DISTRIBUTED"

_initialized = False


def maybe_initialize_distributed(tpu_cfg=None, logger=None) -> bool:
    """Initialize ``jax.distributed`` when a multi-process launch is
    requested; no-op (returning False) otherwise.

    Triggers, first match wins:

    1. Explicit coordination env vars — ``RESDEPTH_DIST_COORDINATOR``
       (host:port), ``RESDEPTH_DIST_NUM_PROCESSES``,
       ``RESDEPTH_DIST_PROCESS_ID`` — work on any backend, including the
       CPU backend (used by the 2-process equivalence test and by manual
       launchers).
    2. ``RESDEPTH_DISTRIBUTED=1`` in the env or ``distributed: true`` in
       the config's ``tpu`` section — calls
       ``jax.distributed.initialize()`` with no arguments, deferring to
       JAX's cluster auto-detection (TPU pod metadata, SLURM, OpenMPI).

    Must run before the first JAX backend access on each process.
    Idempotent: repeated calls (e.g. once env-only at CLI start, once
    after the config is parsed) initialize at most once.
    """
    global _initialized
    if _initialized:
        return True

    coordinator = os.environ.get(_ENV_COORDINATOR)
    cfg_wants = bool(tpu_cfg and tpu_cfg.get("distributed"))
    # Case/whitespace-insensitive falsy spellings: "RESDEPTH_DISTRIBUTED=False"
    # must DISABLE the bootstrap, not trigger cluster auto-detection on a
    # single host (which would crash or hang waiting for peers).
    env_wants = (os.environ.get(_ENV_AUTO, "").strip().lower()
                 not in ("", "0", "false", "no", "off"))
    if not coordinator and not cfg_wants and not env_wants:
        return False

    import jax

    if coordinator:
        num = int(os.environ[_ENV_NUM_PROCESSES])
        pid = int(os.environ[_ENV_PROCESS_ID])
        jax.distributed.initialize(coordinator_address=coordinator,
                                   num_processes=num, process_id=pid)
    else:
        jax.distributed.initialize()  # cluster auto-detection
    _initialized = True
    if logger is not None:
        logger.info("jax.distributed initialized: process %d of %d, "
                    "%d/%d local/global devices",
                    jax.process_index(), jax.process_count(),
                    jax.local_device_count(), jax.device_count())
    return True


def is_chief() -> bool:
    """True on the process responsible for writing run artifacts
    (process 0; trivially true single-process).

    Deliberately backend-free unless a multi-process runtime is actually
    up: the CLIs consult the chief flag BEFORE routing their first
    backend access through the bounded ``utils/backend_probe``
    subprocess, and an eager ``jax.process_index()`` here would
    initialize the PJRT client in-process — on a wedged TPU that means
    hanging at the chief check instead of the probe's clean
    ``BackendUnavailable`` timeout path.
    """
    if _initialized:
        import jax

        return jax.process_index() == 0
    # Not bootstrapped by us. If some other actor already initialized
    # jax.distributed, respect its process id (reading global_state is
    # passive — it never constructs a backend client); otherwise this is
    # a single-process run and process 0 is the only process.
    import sys

    if "jax" in sys.modules:
        try:
            from jax._src import distributed as _dist

            if _dist.global_state.client is not None:
                return sys.modules["jax"].process_index() == 0
        except Exception:  # private layout changed: single-process default
            pass
    return True
