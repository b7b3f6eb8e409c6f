"""Full-scene tiled inference with on-device linear-blend stitching.

Replaces the reference's per-tile host loop
(/root/reference/lib/evaluation.py:460-513: batch size 1, a device->host
round-trip per 256x256 tile, numpy blending into the scene raster) with a
single jitted program:

  * the scene rasters live in HBM; tile positions are batched and the whole
    overlapping grid is consumed by one ``lax.scan``;
  * each scan step gathers + normalises a batch of tiles (the same fused
    ``build_batch`` stage used in training), runs the UNet in eval mode,
    denormalises with the per-tile masked mean, applies the separable blend
    weights, and scatter-adds the weighted tiles into the device-resident
    scene raster (duplicate indices accumulate — exactly overlap-add);
  * under a mesh, tile batches shard across devices; every device
    accumulates a partial scene and one final ``psum`` over ICI produces the
    blended raster, which crosses to the host once.

Blend semantics are identical to the reference (partition of unity over the
region; weight 1 in each tile's exclusive area, linear ramps over overlap
bands — see ops/blend.py).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import PartitionSpec as P

from resdepth_tpu.data.dataset import TileDataset
from resdepth_tpu.data.pipeline import (BatchSpec, batch_spec_for, build_batch,
                                        device_put_dataset)
from resdepth_tpu.models.unet import UNetConfig, apply_unet
from resdepth_tpu.ops import blend
from resdepth_tpu.ops.pallas_stitch import (crop_scene, pad_scene,
                                            stitch_tiles_pallas, stitch_tiles_xla)


def _pad_round_up(array, n, pad_value=0):
    pad = n - array.shape[0]
    if pad == 0:
        return array
    pad_block = np.full((pad,) + array.shape[1:], pad_value, array.dtype)
    return np.concatenate([array, pad_block], axis=0)


def _make_scene_fn(config: UNetConfig, spec: BatchSpec, shape, dsm_std,
                   compute_dtype, mesh, axis_name, use_pallas):

    def scene_fn(params, bn_state, rasters, pos_b, pair_b, wy_b, wx_b):
        zeros_bounds = jnp.zeros((pos_b.shape[1], 4), jnp.int32)
        key = jax.random.PRNGKey(0)  # inference consumes no randomness

        def body(carry, xs):
            pos, pair, wy, wx = xs
            batch = build_batch(rasters, pos, pair, zeros_bounds, key, spec)
            x = batch["input"].astype(compute_dtype)
            pred, _ = apply_unet(config, params, bn_state, x, train=False)
            pred = pred[..., 0].astype(jnp.float32)
            # Denormalisation + blend weighting + overlap-add fuse into the
            # stitch op (Pallas kernel on TPU, scatter-add elsewhere). The
            # Pallas path carries an alignment-padded scene through the scan.
            if use_pallas:
                carry = stitch_tiles_pallas(carry, pred, pos, wy, wx,
                                            batch["dsm_mean"], dsm_std)
            else:
                carry = stitch_tiles_xla(carry, pred, pos, wy, wx,
                                         batch["dsm_mean"], dsm_std)
            return carry, None

        out = jnp.zeros(shape, jnp.float32)
        if use_pallas:
            out = pad_scene(out)
        out, _ = jax.lax.scan(body, out, (pos_b, pair_b, wy_b, wx_b))
        if use_pallas:
            out = crop_scene(out)
        if axis_name is not None:
            out = jax.lax.psum(out, axis_name)
        return out

    if mesh is not None:
        scene_fn = jax.shard_map(
            scene_fn, mesh=mesh,
            in_specs=(P(), P(), P(), P(None, axis_name), P(None, axis_name),
                      P(None, axis_name), P(None, axis_name)),
            out_specs=P(), check_vma=False)
    return jax.jit(scene_fn)


def predict_linear_blend(config: UNetConfig, params, bn_state, ds: TileDataset,
                         *, batch_size: int = 32, mesh=None,
                         axis_name: str = "data", compute_dtype=jnp.float32,
                         rasters=None, use_pallas: bool | None = None,
                         fold_bn: bool = True) -> np.ndarray:
    """Refine a whole scene; returns the blended refined DSM (rows, cols).

    ``ds`` must be a 'test'-strategy TileDataset (overlapping grid). Interface
    parity with lib/evaluation.py:460: same spatial extent as the initial DSM;
    pixels outside the covered region remain 0. ``fold_bn`` folds eval-mode
    BatchNorm into the conv weights (exact; saves elementwise HBM passes).
    """
    if fold_bn and config.do_BN:
        from resdepth_tpu.models.unet import fold_batchnorm
        config, params, bn_state = fold_batchnorm(config, params, bn_state)
    if rasters is None:
        rasters = device_put_dataset(ds)
    spec = batch_spec_for(ds, transform_dsm=True,
                          transform_orthos=ds.input_channels != "geom",
                          augment=False)
    # Stitching needs no loss mask; drop bounds handling from the fused stage.
    import dataclasses
    spec = dataclasses.replace(spec, use_bounds=False)

    tile, stride = ds.tile_size, ds.stride
    n = len(ds)
    if mesh is not None:
        n_dev = mesh.devices.size
        per_step = batch_size * n_dev
    else:
        per_step = batch_size
    n_padded = ((n + per_step - 1) // per_step) * per_step
    n_steps = n_padded // per_step

    wy, wx = blend.weight_table(tile, stride, ds.valid_bounds)
    positions = _pad_round_up(ds.positions, n_padded)
    pair_idx = _pad_round_up(ds.pair_indices, n_padded)
    wy = _pad_round_up(wy, n_padded, 0.0)   # zero weights: padding adds nothing
    wx = _pad_round_up(wx, n_padded, 0.0)

    pos_b = positions.reshape(n_steps, per_step, 2)
    pair_b = pair_idx.reshape(n_steps, per_step)
    wy_b = wy.reshape(n_steps, per_step, tile)
    wx_b = wx.reshape(n_steps, per_step, tile)

    if use_pallas is None:
        use_pallas = jax.devices()[0].platform == "tpu"
    scene_fn = _make_scene_fn(config, spec, ds.dsm_input.shape, ds.dsm_std,
                              compute_dtype, mesh,
                              axis_name if mesh is not None else None,
                              use_pallas)
    out = scene_fn(params, bn_state, rasters, pos_b, pair_b, wy_b, wx_b)
    return np.asarray(out)
