"""Device mesh construction for data-parallel training and tiled inference.

The reference trains on a single hardcoded device
(/root/reference/lib/Trainer.py:34, no distributed code anywhere — SURVEY.md
§2b). The TPU build is mesh-first: a 1-D ``jax.sharding.Mesh`` over all local
devices carries batch-sharded training (gradients and BatchNorm statistics
reduced over ICI with ``psum``/``pmean``) and tile-sharded full-scene
inference. Multi-slice over DCN would extend the same mesh with a second
axis — a config change, not a code change (SURVEY.md §5).
"""

from __future__ import annotations

import jax
from jax.sharding import Mesh

DATA_AXIS = "data"


def device_count() -> int:
    return len(jax.devices())


def data_mesh(n_devices: int | None = None, axis_name: str = DATA_AXIS) -> Mesh:
    """1-D mesh over the first ``n_devices`` local devices."""
    devices = jax.devices()
    if n_devices is not None:
        devices = devices[:n_devices]
    return jax.make_mesh((len(devices),), (axis_name,), devices=devices)


def pad_to_multiple(n: int, multiple: int) -> int:
    return ((n + multiple - 1) // multiple) * multiple
