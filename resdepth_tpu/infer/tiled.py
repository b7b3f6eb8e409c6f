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

import dataclasses
import functools
import itertools
import warnings

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import PartitionSpec as P

from resdepth_tpu.data.dataset import TileDataset
from resdepth_tpu.data.pipeline import (BatchSpec, DeviceRasters,
                                        batch_spec_for, build_batch,
                                        device_put_dataset)
from resdepth_tpu.models.unet import (SERVING_PRECISION_MODES, UNetConfig,
                                      apply_unet, serving_precision)
from resdepth_tpu.ops import blend
from resdepth_tpu.ops.pallas_stitch import (crop_scene, pad_scene,
                                            stitch_tiles_pallas,
                                            stitch_tiles_pallas_fused,
                                            stitch_tiles_xla)


# Dihedral-group subsets for test-time augmentation (general.tta). Element
# g encodes rot90 by (g % 4) quarter turns, composed with a horizontal flip
# when g >= 4. Each supported count is a SUBGROUP of D4 (closed under
# composition), so the averaged predictor is exactly invariant under it:
#   2 -> {identity, horizontal flip}; 4 -> the rotation subgroup; 8 -> D4.
TTA_SUBGROUPS = {1: (0,), 2: (0, 4), 4: (0, 1, 2, 3), 8: tuple(range(8))}

# How the tta predictions of one tile are merged (general.tta_merge).
TTA_MERGES = ("mean", "median")


def _dihedral_apply(x, g: int):
    """Apply dihedral element ``g`` to the spatial axes (1, 2) of a batched
    square tile tensor — (B, H, W) or (B, H, W, C)."""
    if g >= 4:
        x = jnp.flip(x, axis=2)
    return jnp.rot90(x, k=g % 4, axes=(1, 2))


def _dihedral_invert(y, g: int):
    """Inverse of :func:`_dihedral_apply`: (rot_k ∘ flip)⁻¹ = flip ∘ rot_-k."""
    y = jnp.rot90(y, k=-(g % 4), axes=(1, 2))
    if g >= 4:
        y = jnp.flip(y, axis=2)
    return y


def _pad_round_up(array, n, pad_value=0):
    pad = n - array.shape[0]
    if pad == 0:
        return array
    pad_block = np.full((pad,) + array.shape[1:], pad_value, array.dtype)
    return np.concatenate([array, pad_block], axis=0)


@functools.lru_cache(maxsize=32)
def _make_scene_fn(config: UNetConfig, spec: BatchSpec, shape, dsm_std,
                   compute_dtype, mesh, axis_name, use_pallas, tta,
                   tta_merge):
    """Build (and cache) the jitted scene program.

    Memoised on its static configuration: a fresh closure per call would give
    jax.jit a new function identity and force a retrace/recompile for every
    predict call (e.g. per image pair in test.py)."""

    def scene_fn(params, bn_state, rasters, pos_b, pair_b, wy_b, wx_b):
        zeros_bounds = jnp.zeros((pos_b.shape[1], 4), jnp.int32)
        key = jax.random.PRNGKey(0)  # inference consumes no randomness

        def run_model(x):
            if compute_dtype in SERVING_PRECISION_MODES:
                # String serving modes; see models.unet.serving_precision
                # for the registry and the semantics of each mode.
                sm = serving_precision(compute_dtype)
                pred, _ = apply_unet(config, params, bn_state,
                                     x.astype(jnp.float32),
                                     train=False, **sm.apply_kwargs())
            else:
                pred, _ = apply_unet(config, params, bn_state,
                                     x.astype(compute_dtype), train=False)
            return pred[..., 0].astype(jnp.float32)

        def body(carry, xs):
            pos, pair, wy, wx = xs
            batch = build_batch(rasters, pos, pair, zeros_bounds, key, spec)
            if tta == 1:
                pred = run_model(batch["input"])
            elif tta_merge == "median":
                # Median merge (opt-in general.tta_merge): the per-tile
                # denorm is a monotone affine map shared by all tta replicas
                # of a tile, so the normalised-space median commutes with it
                # exactly like the mean does. Costs holding tta prediction
                # maps (not activations) live for the sort.
                pred = jnp.median(jnp.stack([
                    _dihedral_invert(
                        run_model(_dihedral_apply(batch["input"], g)), g)
                    for g in TTA_SUBGROUPS[tta]]), axis=0)
            else:
                # Test-time augmentation: average the model over a dihedral
                # subgroup (opt-in general.tta; measured accuracy gains in
                # BASELINE.md). Averaging the NORMALISED predictions equals
                # averaging the denormalised ones (the stitch's per-tile
                # affine denorm is linear), so the accumulation stays here,
                # upstream of the fused stitch. The unrolled loop keeps peak
                # activation memory at one forward pass.
                acc = 0.0
                for g in TTA_SUBGROUPS[tta]:
                    acc += _dihedral_invert(
                        run_model(_dihedral_apply(batch["input"], g)), g)
                pred = acc / tta
            # Denormalisation + blend weighting + overlap-add fuse into the
            # stitch op (Pallas kernel on TPU, scatter-add elsewhere). The
            # Pallas path carries an alignment-padded scene through the scan.
            if use_pallas == "fused":
                carry = stitch_tiles_pallas_fused(carry, pred, pos, wy, wx,
                                                  batch["dsm_mean"], dsm_std)
            elif use_pallas:
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
            out = jax.lax.psum(out, axis_name)  # tuple for multi-axis meshes
        return out

    if mesh is not None:
        axes = tuple(mesh.axis_names)  # 1-D ICI or 2-D DCN x ICI uniformly
        scene_fn = jax.shard_map(
            scene_fn, mesh=mesh,
            in_specs=(P(), P(), P(), P(None, axes), P(None, axes),
                      P(None, axes), P(None, axes)),
            out_specs=P(), check_vma=False)
    fn = jax.jit(scene_fn)
    if jax.process_count() > 1:
        return _CompileBarrierFn(fn)
    return fn


_barrier_counter = itertools.count()


def _wait_at_barrier(name: str, timeout_ms: int = 600_000) -> None:
    # JAX-version coupling: the distributed-runtime barrier is only reachable
    # through the PRIVATE jax._src.distributed.global_state.client (no public
    # barrier API as of jax 0.8). If an upgrade moves it, the except arm
    # degrades LOUDLY below instead of hanging or crashing; the degradation
    # is pinned by tests/test_multiprocess.py::test_compile_barrier_*.
    try:
        from jax._src import distributed
        client = distributed.global_state.client
    except Exception:       # jax internals moved
        client = None
    if client is not None:
        client.wait_at_barrier(name, timeout_in_ms=timeout_ms)
    elif jax.process_count() > 1:
        # The barrier exists to keep compile skew out of the scene
        # program's first collective (see _CompileBarrierFn). Losing it
        # silently would reintroduce intermittent collective-timeout
        # failures with no breadcrumb — warn so a JAX upgrade that moves
        # the private distributed state is caught from the logs.
        warnings.warn(
            "multi-process compile barrier unavailable (jax._src."
            "distributed.global_state has no client); dispatch proceeds "
            "unaligned and may hit collective timeouts under compile skew",
            RuntimeWarning, stacklevel=2)


class _CompileBarrierFn:
    """Multi-process dispatch guard: compile FIRST, align every process at
    the distributed-runtime barrier (which waits up to 10 min, not the
    collective deadline), THEN dispatch.

    Without it the first process to finish compiling sits inside the scene
    program's first collective while its peers still compile — on the CPU
    backend gloo enforces a hard 30 s context-init deadline there, and
    compile skew on loaded hosts exceeds it (observed in
    tests/test_multiprocess.py); on TPU pods the same alignment avoids
    collective-timeout flakiness after long first compiles. Barrier names
    come from a module counter: every process runs the identical call
    sequence on replicated inputs, so the names line up."""

    def __init__(self, fn):
        self._fn = fn
        self._compiled = {}

    def __call__(self, *args):
        key = tuple((tuple(leaf.shape), str(leaf.dtype))
                    for leaf in jax.tree_util.tree_leaves(args))
        exe = self._compiled.get(key)
        if exe is None:
            exe = self._fn.lower(*args).compile()
            _wait_at_barrier(f"resdepth_scene_compile_{next(_barrier_counter)}")
            self._compiled[key] = exe
        return exe(*args)


def _inference_spec(ds: TileDataset) -> BatchSpec:
    """Prediction needs no loss mask / target gather — strip them from the
    fused stage (the stitch uses blend weights, not exclusive bounds)."""
    spec = batch_spec_for(ds, transform_dsm=True,
                          transform_orthos=ds.input_channels != "geom",
                          augment=False)
    return dataclasses.replace(spec, use_bounds=False, has_target=False)


def _predict_tiles(config, params, bn_state, rasters, positions, pair_idx,
                   wy, wx, shape, spec, dsm_std, batch_size, mesh,
                   compute_dtype, use_pallas, tta=1, tta_merge="mean"):
    """Run the jitted scan over one set of tiles into a (rows, cols) canvas.

    Returns the DEVICE canvas: the scan is dispatched asynchronously, so the
    caller can overlap the fetch with further host/device work."""
    if tta not in TTA_SUBGROUPS:
        raise ValueError(f"tta must be one of {sorted(TTA_SUBGROUPS)}, "
                         f"got {tta!r}")
    if tta_merge not in TTA_MERGES:
        raise ValueError(f"tta_merge must be one of {TTA_MERGES}, "
                         f"got {tta_merge!r}")
    if tta == 1:
        # Merge mode is a no-op over a single prediction, but it keys the
        # lru_cache'd jitted scene program — normalize so tta=1 + any merge
        # reuses one compiled program instead of recompiling an identical one.
        tta_merge = "mean"
    tile = spec.tile_size
    n = len(positions)
    n_dev = mesh.devices.size if mesh is not None else 1
    # Don't pad small scenes up to a huge global step: cap the per-device
    # batch at the per-device share of the tile count (zero-weight padding
    # is correct but wasted forward compute).
    batch_size = max(1, min(batch_size, -(-n // n_dev)))
    per_step = batch_size * n_dev
    n_padded = ((n + per_step - 1) // per_step) * per_step
    n_steps = n_padded // per_step

    positions = _pad_round_up(positions, n_padded)
    pair_idx = _pad_round_up(pair_idx, n_padded)
    wy = _pad_round_up(wy, n_padded, 0.0)   # zero weights: padding adds nothing
    wx = _pad_round_up(wx, n_padded, 0.0)

    scene_fn = _make_scene_fn(config, spec, tuple(shape), float(dsm_std),
                              compute_dtype, mesh,
                              tuple(mesh.axis_names) if mesh is not None
                              else None,
                              use_pallas, tta, tta_merge)
    return scene_fn(params, bn_state, rasters,
                    positions.reshape(n_steps, per_step, 2),
                    pair_idx.reshape(n_steps, per_step),
                    wy.reshape(n_steps, per_step, tile),
                    wx.reshape(n_steps, per_step, tile))


def predict_linear_blend(config: UNetConfig, params, bn_state, ds: TileDataset,
                         *, batch_size: int = 64, mesh=None,
                         compute_dtype=jnp.float32,
                         rasters=None, use_pallas: bool | None = None,
                         fold_bn: bool = True, as_numpy: bool = True,
                         tta: int = 1, tta_merge: str = "mean"):
    """Refine a whole scene; returns the blended refined DSM (rows, cols).

    ``ds`` must be a 'test'-strategy TileDataset (overlapping grid). Interface
    parity with lib/evaluation.py:460: same spatial extent as the initial DSM;
    pixels outside the covered region remain 0. ``fold_bn`` applies the exact
    serving-time rewrites (models.unet.fold_serving): eval-mode BatchNorm
    folded into conv weights, and the top upconv composed into the final
    conv.
    ``use_pallas``: False = XLA scatter-add, True = per-tile-program Pallas
    kernel, "fused" = single-program Pallas kernel with double-buffered tile
    DMA (ops/pallas_stitch.py); None = auto (True on TPU).

    ``compute_dtype``: jnp.float32 (default, parity path) | jnp.bfloat16 |
    "mixed" (bf16 conv stack, f32-accumulated height path) | the registry
    serving modes "balanced"/"balanced16" (models.unet.serving_precision;
    "balanced16" is the bench headline) | the library-only diagnostic modes
    "fast32" / "act2pass" — deviation data in BASELINE.md's studies.

    ``as_numpy``: True fetches the finished scene to host (blocking). False
    returns the DEVICE canvas right after the async dispatch, letting the
    caller overlap this scene's compute/fetch with other work (test.py
    pipelines consecutive image pairs this way); call ``np.asarray`` on the
    result to materialise it.

    ``tta``: dihedral test-time augmentation count in {1, 2, 4, 8}
    (``general.tta``) — each tile is predicted under that dihedral SUBGROUP
    of spatial symmetries and the inverse-transformed predictions merged:
    ``tta_merge`` = "mean" (default) or "median" (``general.tta_merge``).
    Costs ``tta``× model compute; accuracy trade measured in BASELINE.md.
    The reference has no analogue (its D4 augmentation is train-time only,
    lib/DsmOrthoDataset.py).
    """
    if fold_bn:
        from resdepth_tpu.models.unet import fold_serving
        config, params, bn_state = fold_serving(config, params, bn_state)
    if rasters is None:
        rasters = device_put_dataset(ds)
    rasters = dataclasses.replace(rasters, dsm_target=None)

    if use_pallas is None:
        use_pallas = jax.devices()[0].platform == "tpu"
    wy, wx = blend.weight_table(ds.tile_size, ds.stride, ds.valid_bounds)
    out = _predict_tiles(config, params, bn_state, rasters, ds.positions,
                         ds.pair_indices, wy, wx, ds.dsm_input.shape,
                         _inference_spec(ds), ds.dsm_std, batch_size, mesh,
                         compute_dtype, use_pallas, tta, tta_merge)
    return np.asarray(out) if as_numpy else out


def predict_linear_blend_streaming(config: UNetConfig, params, bn_state,
                                   ds: TileDataset, *,
                                   max_device_pixels: int = 1 << 28,
                                   batch_size: int = 64, mesh=None,
                                   compute_dtype=jnp.float32,
                                   use_pallas: bool | None = None,
                                   fold_bn: bool = True,
                                   tta: int = 1,
                                   tta_merge: str = "mean") -> np.ndarray:
    """Refine a scene too large for device memory by streaming row bands.

    The stitch is additive, so the tile grid can be partitioned arbitrarily:
    tiles are grouped into horizontal bands whose raster windows fit a device
    budget (``max_device_pixels`` counts raster pixels across all bands:
    DSM + ortho views); each band's window is uploaded, its tiles stitched on
    device, and the band canvas accumulated into the host scene. The result
    is bit-identical to the non-streaming path (unit-tested).

    The reference has no analogue — it holds every raster in host RAM
    (README.md:268) and round-trips each tile; this path bounds DEVICE memory
    while keeping the per-band compute fully fused.
    """
    if fold_bn:
        from resdepth_tpu.models.unet import fold_serving
        config, params, bn_state = fold_serving(config, params, bn_state)
    if use_pallas is None:
        use_pallas = jax.devices()[0].platform == "tpu"

    tile = ds.tile_size
    cols = ds.dsm_input.shape[1]
    n_views = 0 if ds.orthos is None else ds.orthos.shape[2]
    rows_budget = max(tile, int(max_device_pixels / (cols * (1 + n_views))))

    spec = _inference_spec(ds)
    wy_all, wx_all = blend.weight_table(tile, ds.stride, ds.valid_bounds)
    out = np.zeros(ds.dsm_input.shape, np.float32)

    for window, band_idx, band_positions in _iter_bands(ds, rows_budget):
        band_rasters = DeviceRasters(
            dsm_input=jnp.asarray(ds.dsm_input[window]),
            dsm_target=None,
            orthos=(jnp.asarray(ds.orthos[window].transpose(2, 0, 1))
                    if ds.orthos is not None else None),
            pairs=jnp.asarray(ds.pairs_array),
            nodata=jnp.asarray(ds.nodata, jnp.float32))

        band_out = _predict_tiles(
            config, params, bn_state, band_rasters, band_positions,
            ds.pair_indices[band_idx], wy_all[band_idx], wx_all[band_idx],
            (window.stop - window.start, cols), spec, ds.dsm_std, batch_size,
            mesh, compute_dtype, use_pallas, tta, tta_merge)
        out[window] += np.asarray(band_out)

    return out


def predict_linear_blend_scene_sharded(config: UNetConfig, params, bn_state,
                                       ds: TileDataset, *,
                                       max_device_pixels: int = 1 << 28,
                                       batch_size: int = 64,
                                       devices=None,
                                       compute_dtype=jnp.float32,
                                       use_pallas: bool | None = None,
                                       fold_bn: bool = True,
                                       tta: int = 1,
                                       tta_merge: str = "mean") -> np.ndarray:
    """Refine a scene too large for ONE chip's HBM using the whole slice.

    The sequential streaming path (``predict_linear_blend_streaming``) bounds
    device memory by processing row bands one at a time on one chip. This
    path distributes the bands ACROSS the slice's chips instead: each band's
    raster window is committed to its own device and the band programs are
    dispatched asynchronously, so all chips compute concurrently while each
    holds only its band — the scene capacity scales with the slice's
    aggregate HBM and the wall-clock with its chip count, with no
    collectives (the band canvases overlap-add on the host, which the
    additive stitch makes exact — same argument as streaming).

    Bands are padded to a common window height and tile count so every
    device runs the same program shape. ``max_device_pixels`` bounds the
    PER-DEVICE raster window exactly as in the streaming path; bands beyond
    the device count process in waves (each wave's fetches complete before
    the next dispatches, keeping one band resident per device).

    The reference has no analogue (single GPU, host-resident rasters,
    per-tile round trips — lib/evaluation.py:460-513).
    """
    import jax

    if fold_bn:
        from resdepth_tpu.models.unet import fold_serving
        config, params, bn_state = fold_serving(config, params, bn_state)
    if devices is None:
        devices = jax.devices()
    devices = list(devices)
    if use_pallas is None:
        use_pallas = devices[0].platform == "tpu"

    tile = ds.tile_size
    cols = ds.dsm_input.shape[1]
    n_views = 0 if ds.orthos is None else ds.orthos.shape[2]
    rows_budget = max(tile, int(max_device_pixels / (cols * (1 + n_views))))

    spec = _inference_spec(ds)
    wy_all, wx_all = blend.weight_table(tile, ds.stride, ds.valid_bounds)
    bands = list(_iter_bands(ds, rows_budget))
    # Uniform program shape across bands: common window height and tile
    # count (zero-weight tile padding adds nothing to the stitch; padded
    # window rows are never gathered by real tiles).
    window_rows = max(w.stop - w.start for w, _, _ in bands)
    n_tiles = max(len(idx) for _, idx, _ in bands)

    replicated = {d: jax.device_put((params, bn_state), d)
                  for d in devices[:len(bands)]}
    pairs = np.asarray(ds.pairs_array)
    nodata = np.float32(ds.nodata)

    out = np.zeros(ds.dsm_input.shape, np.float32)
    for wave_start in range(0, len(bands), len(devices)):
        wave = bands[wave_start:wave_start + len(devices)]
        pending = []
        for (window, band_idx, band_positions), device in zip(wave, devices):
            dsm_w = np.zeros((window_rows, cols), np.float32)
            dsm_w[:window.stop - window.start] = ds.dsm_input[window]
            if ds.orthos is not None:
                orthos_w = np.zeros((n_views, window_rows, cols), np.float32)
                orthos_w[:, :window.stop - window.start] = \
                    ds.orthos[window].transpose(2, 0, 1)
            band_rasters = DeviceRasters(
                dsm_input=jax.device_put(dsm_w, device),
                dsm_target=None,
                orthos=(jax.device_put(orthos_w, device)
                        if ds.orthos is not None else None),
                pairs=jax.device_put(pairs, device),
                nodata=jax.device_put(nodata, device))
            d_params, d_bn = replicated[device]
            band_out = _predict_tiles(
                config, d_params, d_bn, band_rasters,
                _pad_round_up(band_positions, n_tiles),
                _pad_round_up(ds.pair_indices[band_idx], n_tiles),
                _pad_round_up(wy_all[band_idx], n_tiles, 0.0),
                _pad_round_up(wx_all[band_idx], n_tiles, 0.0),
                (window_rows, cols), spec, ds.dsm_std, batch_size,
                None, compute_dtype, use_pallas, tta, tta_merge)
            pending.append((window, band_out))
        for window, band_out in pending:
            out[window] += np.asarray(band_out)[:window.stop - window.start]
    return out


def _iter_bands(ds: TileDataset, rows_budget: int):
    """Partition the tile grid into horizontal bands of <= rows_budget rows.

    Delegates to data/banded.py::iter_bands (shared with banded TRAINING
    residency). Tiles are assigned to the band containing their top row, so
    windows of adjacent bands overlap by < tile rows and the bands'
    overlap-added canvases reproduce the full stitch exactly.
    """
    from resdepth_tpu.data.banded import iter_bands
    yield from iter_bands(ds.positions, ds.tile_size, rows_budget)
