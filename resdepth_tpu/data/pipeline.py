"""Device-resident data pipeline: gather -> mask -> normalise -> augment.

TPU-first replacement for the reference's multiprocess DataLoader
(/root/reference/lib/utils.py:203-272 + DsmOrthoDataset.__getitem__
:161-291). Instead of worker processes slicing patches on the host and
shipping megabytes per batch over PCIe, the full scene rasters are placed in
HBM ONCE and every per-pixel step runs inside jit:

  * patch gather      — vmapped ``lax.dynamic_slice`` at (y, x) positions
                        (the host ships only (B, 2) int32 per batch),
  * loss masking      — nodata + exclusive-region bounds, computed from the
                        RAW ground truth before normalisation (parity with
                        lib/DsmOrthoDataset.py:177-188, incl. the ``!= 0``
                        quirk at :462),
  * normalisation     — per-patch masked mean centring + global sigma
                        (lib/DsmOrthoDataset.py:190-243),
  * in-pair permutation — uniform random view-order shuffle (:224-227),
  * augmentation      — per-sample rot90 x k + vertical/horizontal flips
                        applied identically across mask/target/input channels
                        (:262-276), as vectorised device ops instead of the
                        reference's per-channel numpy loops.

``build_batch`` is a pure function of (rasters, indices, rng) designed to be
inlined INTO the jitted train/eval step, so XLA fuses preprocessing with the
first conv layer's HBM reads.
"""

from __future__ import annotations

import dataclasses
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from resdepth_tpu.data.dataset import TileDataset


@jax.tree_util.register_pytree_node_class
@dataclasses.dataclass
class DeviceRasters:
    """Scene rasters + pair table living in device memory.

    Orthos are stored IMAGE-MAJOR, (n_images, rows, cols): the TPU tiles the
    two minor-most dims, so a trailing images axis of size ~3 would be padded
    to the 128-lane width — ~40x wasted HBM and gather bandwidth (measured:
    the image-minor layout made full-scene inference ~100x slower than the
    model itself).
    """
    dsm_input: jax.Array            # (rows, cols) f32
    dsm_target: jax.Array | None    # (rows, cols) f32 or None
    orthos: jax.Array | None        # (n_images, rows, cols) f32 or None
    pairs: jax.Array                # (P, V) int32
    nodata: jax.Array               # () f32

    def tree_flatten(self):
        children = (self.dsm_input, self.dsm_target, self.orthos, self.pairs,
                    self.nodata)
        return children, None

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(*children)


@dataclasses.dataclass(frozen=True)
class BatchSpec:
    """Static preprocessing configuration (hashable; part of the jit key)."""
    input_channels: str
    tile_size: int
    dsm_std: float
    dsm_mean: float | None = None          # None => per-patch masked mean
    ortho_std: float = 1.0
    ortho_mean: float | None = None        # None => per-sample mean over views
    permute_images_within_pair: bool = False
    augment: bool = False
    strict_zero_mask: bool = True
    transform_dsm: bool = True
    transform_orthos: bool = True
    has_target: bool = True
    use_bounds: bool = False


def device_put_dataset(ds: TileDataset, sharding=None,
                       include_target: bool = True) -> DeviceRasters:
    """Move a TileDataset's rasters into device memory (HBM).

    ``include_target=False`` skips the ground-truth DSM: inference never
    reads it, and a full-scene GT would otherwise occupy HBM (and transfer
    bandwidth) for the whole run.
    """
    put = partial(jax.device_put, device=sharding) if sharding else jax.device_put
    include_target = include_target and ds.dsm_target is not None
    return DeviceRasters(
        dsm_input=put(jnp.asarray(ds.dsm_input)),
        dsm_target=put(jnp.asarray(ds.dsm_target)) if include_target else None,
        orthos=(put(jnp.asarray(ds.orthos.transpose(2, 0, 1)))
                if ds.orthos is not None else None),
        pairs=jnp.asarray(ds.pairs_array),
        nodata=jnp.asarray(ds.nodata, jnp.float32),
    )


def batch_spec_for(ds: TileDataset, transform_dsm=True, transform_orthos=True,
                   augment=None) -> BatchSpec:
    return BatchSpec(
        input_channels=ds.input_channels,
        tile_size=ds.tile_size,
        dsm_std=ds.dsm_std if transform_dsm else 1.0,
        dsm_mean=ds.dsm_mean if transform_dsm else 0.0,
        ortho_std=ds.ortho_std if transform_orthos else 1.0,
        ortho_mean=ds.ortho_mean if transform_orthos else 0.0,
        permute_images_within_pair=ds.permute_images_within_pair,
        augment=ds.augment if augment is None else augment,
        strict_zero_mask=ds.strict_zero_mask,
        transform_dsm=transform_dsm,
        transform_orthos=transform_orthos,
        has_target=ds.dsm_target is not None,
        use_bounds=ds.valid_bounds is not None,
    )


def _gather_tiles(raster, positions, tile):
    """(B, T, T) patches from a (rows, cols) raster at (B, 2) positions."""
    def slice_one(pos):
        return jax.lax.dynamic_slice(raster, (pos[0], pos[1]), (tile, tile))
    return jax.vmap(slice_one)(positions)


def _gather_ortho_views(orthos, positions, view_ids, tile):
    """(B, T, T, V) ortho patches; orthos: (I, rows, cols); view_ids: (B, V)."""
    def slice_one(pos, views):
        def one_view(v):
            return jax.lax.dynamic_slice(orthos, (v, pos[0], pos[1]),
                                         (1, tile, tile))[0]
        return jax.vmap(one_view, out_axes=-1)(views)
    return jax.vmap(slice_one)(positions, view_ids)


def _masked_patch_mean(patches, nodata):
    """(B,) masked mean height per patch (invalid = nodata)."""
    valid = (patches != nodata).astype(jnp.float32)
    count = jnp.maximum(valid.sum(axis=(1, 2)), 1.0)
    return (patches * valid).sum(axis=(1, 2)) / count


def _bounds_mask(bounds, tile):
    """(B, T, T) bool: True inside each sample's inclusive (uly,ulx,lry,lrx)."""
    rows = jax.lax.broadcasted_iota(jnp.int32, (tile, tile), 0)
    cols = jax.lax.broadcasted_iota(jnp.int32, (tile, tile), 1)

    def one(b):
        return ((rows >= b[0]) & (rows <= b[2]) & (cols >= b[1]) & (cols <= b[3]))
    return jax.vmap(one)(bounds)


def _augment(stacked, rng):
    """Uniform random dihedral transform per sample; ``stacked``: (B, H, W, C).

    The reference composes rot90^k (k uniform in 0..3) with independent p=0.5
    vertical and horizontal flips (lib/DsmOrthoDataset.py:262-276,
    lib/torch_transforms.py:20-22) — that composition is exactly the UNIFORM
    distribution over the square's 8 symmetries (each dihedral element is hit
    by 2 of the 16 (k, v, h) combinations). The dihedral group factors as
    (transpose?) ∘ (flip rows?) ∘ (flip cols?) with three independent fair
    bits, which lowers to three batched selects — a per-sample rot90 switch
    would instead make XLA execute every rotation branch for the whole batch
    (vmapped ``switch`` runs all branches) plus per-sample transposes.
    Requires square tiles (always true: tiles are tile_size x tile_size).
    """
    b = stacked.shape[0]
    t_rng, r_rng, c_rng = jax.random.split(rng, 3)
    transpose = jax.random.bernoulli(t_rng, 0.5, (b,))[:, None, None, None]
    flip_rows = jax.random.bernoulli(r_rng, 0.5, (b,))[:, None, None, None]
    flip_cols = jax.random.bernoulli(c_rng, 0.5, (b,))[:, None, None, None]
    stacked = jnp.where(transpose, jnp.swapaxes(stacked, 1, 2), stacked)
    stacked = jnp.where(flip_rows, stacked[:, ::-1, :, :], stacked)
    stacked = jnp.where(flip_cols, stacked[:, :, ::-1, :], stacked)
    return stacked


def _permutation_per_sample(rng, batch, n_views):
    keys = jax.random.split(rng, batch)
    return jax.vmap(lambda k: jax.random.permutation(k, n_views))(keys)


def build_batch(rasters: DeviceRasters, positions, pair_indices, bounds, rng,
                spec: BatchSpec):
    """Assemble one training/eval batch entirely on device.

    Returns dict with: ``input`` (B,T,T,C), ``target`` (B,T,T,1),
    ``loss_mask`` (B,T,T,1) f32, ``dsm_mean`` (B,) — normalisation mean per
    sample for the denormalised loss.
    """
    tile = spec.tile_size
    dsm_in = _gather_tiles(rasters.dsm_input, positions, tile)   # (B, T, T)

    if spec.has_target:
        target_raw = _gather_tiles(rasters.dsm_target, positions, tile)
        # Loss mask from the RAW ground truth (before normalisation).
        mask = target_raw != rasters.nodata
        if spec.strict_zero_mask:
            mask = mask & (target_raw != 0)
        if spec.use_bounds:
            mask = mask & _bounds_mask(bounds, tile)
    else:
        target_raw = jnp.zeros_like(dsm_in)
        mask = jnp.zeros(dsm_in.shape, bool)

    # DSM normalisation (per-patch masked mean when dsm_mean is None).
    if spec.transform_dsm:
        if spec.dsm_mean is None:
            dsm_mean = _masked_patch_mean(dsm_in, rasters.nodata)
        else:
            dsm_mean = jnp.full((dsm_in.shape[0],), spec.dsm_mean, jnp.float32)
        dsm_in = (dsm_in - dsm_mean[:, None, None]) / spec.dsm_std
        if spec.has_target:
            target = (target_raw - dsm_mean[:, None, None]) / spec.dsm_std
        else:
            target = target_raw
    else:
        dsm_mean = jnp.zeros((dsm_in.shape[0],), jnp.float32)
        target = target_raw

    # Ortho views.
    if spec.input_channels != "geom":
        view_ids = rasters.pairs[pair_indices]                    # (B, V)
        if spec.permute_images_within_pair:
            rng, perm_rng = jax.random.split(rng)
            perm = _permutation_per_sample(perm_rng, view_ids.shape[0],
                                           view_ids.shape[1])
            view_ids = jnp.take_along_axis(view_ids, perm, axis=1)
        orthos = _gather_ortho_views(rasters.orthos, positions, view_ids, tile)
        if spec.transform_orthos:
            if spec.ortho_mean is None:
                ortho_mean = orthos.mean(axis=(1, 2, 3), keepdims=True)
            else:
                ortho_mean = spec.ortho_mean
            orthos = (orthos - ortho_mean) / spec.ortho_std

        if spec.input_channels == "stereo":
            inputs = orthos
        else:
            inputs = jnp.concatenate([dsm_in[..., None], orthos], axis=-1)
    else:
        inputs = dsm_in[..., None]

    target = target[..., None]
    mask_f = mask[..., None].astype(jnp.float32)

    if spec.augment:
        rng, aug_rng = jax.random.split(rng)
        stacked = jnp.concatenate([mask_f, target, inputs], axis=-1)
        stacked = _augment(stacked, aug_rng)
        mask_f = stacked[..., 0:1]
        target = stacked[..., 1:2]
        inputs = stacked[..., 2:]

    return {"input": inputs, "target": target, "loss_mask": mask_f,
            "dsm_mean": dsm_mean}


class BatchIndexIterator:
    """Host-side epoch iterator over sample indices with static batch shapes.

    Yields ``(positions, pair_indices, bounds, weights)`` numpy arrays of a
    FIXED emitted batch size: the final partial batch — and, when
    ``emit_size > batch_size``, every batch — is padded with wrap-around
    samples at weight 0, so jit never recompiles. Padded samples contribute
    NOTHING downstream: loss, gradients, metrics, and training-mode
    BatchNorm statistics are all weighted by the 0/1 sample weights
    (models/unet.py::_batch_norm). The reference's DataLoader instead emits
    a ragged final batch — lib/utils.py:269.

    ``emit_size`` exists to fill the device mesh regardless of the configured
    batch size: e.g. the reference-default batch 20 on an 8-chip slice emits
    24-sample batches (20 real + 4 zero-weight) so all 8 chips are used while
    the optimisation trajectory stays numerically that of batch 20.
    """

    def __init__(self, ds: TileDataset, batch_size: int, shuffle: bool,
                 seed: int = 0, drop_last: bool = False,
                 emit_size: int | None = None):
        self.ds = ds
        self.batch_size = batch_size
        self.emit_size = batch_size if emit_size is None else int(emit_size)
        if self.emit_size < batch_size:
            raise ValueError(f"emit_size {self.emit_size} < batch_size {batch_size}")
        self.shuffle = shuffle
        self.drop_last = drop_last
        self.rng = np.random.default_rng(seed)

    def __len__(self):
        n = len(self.ds)
        if self.drop_last:
            return n // self.batch_size
        return (n + self.batch_size - 1) // self.batch_size

    def __iter__(self):
        n = len(self.ds)
        order = self.rng.permutation(n) if self.shuffle else np.arange(n)
        bs = self.batch_size
        emit = self.emit_size
        bounds_all = self.ds.valid_bounds
        for start in range(0, n, bs):
            idx = order[start:start + bs]
            if len(idx) < bs and self.drop_last:
                return
            if len(idx) < emit:
                n_pad = emit - len(idx)
                # wrap-around padding at weight 0 (values are irrelevant —
                # they are excluded from loss, grads and BN statistics).
                pad = np.resize(order[:max(start, 1)] if start else idx, n_pad)
                weights = np.concatenate([np.ones(len(idx), np.float32),
                                          np.zeros(n_pad, np.float32)])
                idx = np.concatenate([idx, pad])
            else:
                weights = np.ones(emit, np.float32)
            positions = self.ds.positions[idx]
            pair_indices = self.ds.pair_indices[idx]
            bounds = (bounds_all[idx] if bounds_all is not None
                      else np.zeros((emit, 4), np.int32))
            yield positions, pair_indices, bounds, weights
