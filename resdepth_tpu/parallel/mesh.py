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
DCN_AXIS = "dcn"


def device_count() -> int:
    return len(jax.devices())


def data_mesh(n_devices: int | None = None, axis_name: str = DATA_AXIS) -> Mesh:
    """1-D mesh over the first ``n_devices`` local devices."""
    devices = jax.devices()
    if n_devices is not None:
        devices = devices[:n_devices]
    return jax.make_mesh((len(devices),), (axis_name,), devices=devices)


def data_mesh_2d(n_slices: int, n_devices: int | None = None,
                 axis_name: str = DATA_AXIS, slice_axis: str = DCN_AXIS) -> Mesh:
    """2-D (slices x per-slice) mesh: the outer axis maps onto DCN when the
    devices span multiple slices, the inner axis onto ICI. The train/infer
    steps shard batches over BOTH axes and reduce over both, so multi-slice
    is purely this mesh shape (SURVEY.md §2b / docs/SCALING.md)."""
    devices = jax.devices()
    if n_devices is not None:
        devices = devices[:n_devices]
    n = len(devices)
    if n % n_slices != 0:
        raise ValueError(f"{n} devices not divisible into {n_slices} slices")
    return jax.make_mesh((n_slices, n // n_slices), (slice_axis, axis_name),
                         devices=devices)


def pad_to_multiple(n: int, multiple: int) -> int:
    return ((n + multiple - 1) // multiple) * multiple
