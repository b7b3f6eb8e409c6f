"""Pallas TPU kernel: weighted overlap-add of tiles into a scene raster.

The inference stitch (infer/tiled.py) accumulates B weighted (T, T) tiles
into the device-resident scene raster per step. The XLA formulation is a
scatter-add (``out.at[rows, cols].add(...)``) which lowers to a generic
scatter — correct, but it materialises (B, T, T) index tensors and cannot
exploit that each tile is a contiguous rectangle.

This kernel exploits exactly that: a 1-D sequential grid over tiles (TPU
grid programs execute in order, so read-modify-write across overlapping
tiles is race-free by construction); per program it

  1. DMAs the tile's (T, T) destination window HBM -> VMEM,
  2. fuses denormalisation (x * sigma + per-tile mean) and the separable
     blend-weight outer product (wy ⊗ wx) into the accumulate on the VPU,
  3. DMAs the window back VMEM -> HBM.

The scene raster is input/output-aliased, so the accumulation is in-place.
Tile positions arrive via scalar prefetch (PrefetchScalarGridSpec) — they
drive the dynamic DMA offsets and must be known before the body runs.

Falls back transparently to the XLA scatter-add on non-TPU backends
(``stitch_tiles`` dispatches; the Pallas path is also unit-tested in
interpreter mode against the XLA path).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


_SUBLANE = 8
_LANE = 128
# Scene padding must fit the ALIGNED superset window of a tile placed at the
# scene's bottom-right corner. The window extents are the tile plus the
# intra-window offset (< 8 / < 128), rounded UP to (sublane, lane) multiples
# (_win_extents) — Mosaic rejects unaligned DMA extents ("unsupported
# unaligned shape", observed on-chip for tile < 128 where tile + 128 is not
# a lane multiple). win_x - tile is at most 240 (tile 16), so one constant
# covers every valid tile size (powers of two >= 16).
_PAD_Y = _SUBLANE
_PAD_X = 2 * _LANE


def _win_extents(tile: int) -> tuple[int, int]:
    """Aligned (rows, cols) extents of the DMA window holding a (tile, tile)
    block at any intra-window offset (dy < 8, dx < 128)."""
    win_y = -(-(tile + _SUBLANE) // _SUBLANE) * _SUBLANE
    win_x = -(-(tile + _LANE) // _LANE) * _LANE
    return win_y, win_x


def _stitch_kernel(pos_ref, scene_ref, tiles_ref, wy_ref, wx_ref, mean_ref,
                   sigma_ref, out_ref, scratch, sem_in, sem_out):
    i = pl.program_id(0)
    y = pos_ref[i, 0]
    x = pos_ref[i, 1]
    tile = tiles_ref.shape[1]
    win_y, win_x = scratch.shape

    # HBM slices must start on (sublane, lane) = (8, 128) boundaries; tile
    # positions are arbitrary (edge-shifted tiles). Load the aligned superset
    # window and place the tile at its intra-window offset with dynamic rolls.
    y0 = (y // _SUBLANE) * _SUBLANE
    x0 = (x // _LANE) * _LANE
    y0 = pl.multiple_of(y0, _SUBLANE)
    x0 = pl.multiple_of(x0, _LANE)
    dy = y - y0
    dx = x - x0

    # On the first program, the aliased output already holds the input scene
    # (input_output_aliases) — nothing to initialise.
    load = pltpu.make_async_copy(
        out_ref.at[pl.ds(y0, win_y), pl.ds(x0, win_x)],
        scratch, sem_in)
    load.start()

    weighted = (tiles_ref[0] * sigma_ref[0] + mean_ref[i]) * (
        wy_ref[i][:, None] * wx_ref[i][None, :])
    padded = jnp.pad(weighted, ((0, win_y - tile), (0, win_x - tile)))
    # dy < 8 <= win_y - tile and dx < 128 <= win_x - tile: rolling never
    # wraps tile data around the window.
    padded = pltpu.roll(padded, dy, 0)
    padded = pltpu.roll(padded, dx, 1)

    load.wait()
    scratch[:] = scratch[:] + padded

    store = pltpu.make_async_copy(
        scratch,
        out_ref.at[pl.ds(y0, win_y), pl.ds(x0, win_x)],
        sem_out)
    store.start()
    store.wait()

    del scene_ref  # aliased with out_ref; listed only for the alias contract


def pad_scene(scene):
    """Pad a scene so every aligned superset window fits (bottom/right only)."""
    return jnp.pad(scene, ((0, _PAD_Y), (0, _PAD_X)))


def crop_scene(scene_padded):
    return scene_padded[:-_PAD_Y, :-_PAD_X]


@functools.partial(jax.jit, static_argnames=("interpret",), donate_argnums=(0,))
def stitch_tiles_pallas(scene_padded, tiles, positions, wy, wx, means, sigma,
                        interpret: bool = False):
    """scene[y_i:y_i+T, x_i:x_i+T] += (tiles_i * sigma + means_i) * wy_i ⊗ wx_i.

    ``scene_padded``: (rows + 8, cols + 256) f32 (see ``pad_scene``; donated);
    tiles: (B, T, T); positions: (B, 2) int32 in UNPADDED coordinates;
    wy/wx: (B, T); means: (B,); sigma: scalar.
    """
    scene = scene_padded
    b, tile, _ = tiles.shape
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(b,),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),                # scene (HBM)
            pl.BlockSpec((1, tile, tile), lambda i, *_: (i, 0, 0),
                         memory_space=pltpu.VMEM),               # tiles
            # (B, T) weight tables stay whole in VMEM (tiny); per-tile rows
            # are indexed by program id — a (1, T) block would violate the
            # TPU sublane-divisibility rule on the second-to-last dim.
            pl.BlockSpec(memory_space=pltpu.VMEM),               # wy
            pl.BlockSpec(memory_space=pltpu.VMEM),               # wx
            pl.BlockSpec(memory_space=pltpu.SMEM),               # means
            pl.BlockSpec(memory_space=pltpu.SMEM),               # sigma
        ],
        out_specs=pl.BlockSpec(memory_space=pl.ANY),
        scratch_shapes=[
            pltpu.VMEM(_win_extents(tile), jnp.float32),
            pltpu.SemaphoreType.DMA(()),
            pltpu.SemaphoreType.DMA(()),
        ],
    )
    return pl.pallas_call(
        _stitch_kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct(scene.shape, scene.dtype),
        input_output_aliases={1: 0},  # scene (after the prefetch arg) -> out
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
        interpret=interpret,
    )(positions, scene, tiles, wy, wx,
      means.astype(jnp.float32), jnp.asarray(sigma, jnp.float32).reshape(1))


def _stitch_kernel_fused(pos_ref, scene_ref, tiles_ref, wy_ref, wx_ref,
                         mean_ref, sigma_ref, out_ref, tile_buf, window_buf,
                         sem_tiles, sem_window):
    """Single-program variant: an internal loop over all B tiles.

    The per-tile-program variant pays fixed program-setup cost per tile
    (~1 ms observed); here one program loops over tiles with double-buffered
    HBM->VMEM tile loads overlapping compute. Window read-modify-writes stay
    serialized (consecutive tiles overlap), which the in-order DMA chain
    guarantees.
    """
    n_tiles = wy_ref.shape[0]
    tile = tile_buf.shape[1]
    win_y, win_x = window_buf.shape

    def tile_dma(slot, i):
        return pltpu.make_async_copy(tiles_ref.at[i], tile_buf.at[slot],
                                     sem_tiles.at[slot])

    tile_dma(0, 0).start()

    def body(i, carry):
        slot = i % 2

        @pl.when(i + 1 < n_tiles)
        def _():
            tile_dma((i + 1) % 2, i + 1).start()

        y = pos_ref[i, 0]
        x = pos_ref[i, 1]
        y0 = pl.multiple_of((y // _SUBLANE) * _SUBLANE, _SUBLANE)
        x0 = pl.multiple_of((x // _LANE) * _LANE, _LANE)

        window = out_ref.at[pl.ds(y0, win_y), pl.ds(x0, win_x)]
        read = pltpu.make_async_copy(window, window_buf, sem_window)
        read.start()

        tile_dma(slot, i).wait()
        weighted = (tile_buf[slot] * sigma_ref[0] + mean_ref[i]) * (
            wy_ref[i][:, None] * wx_ref[i][None, :])
        padded = jnp.pad(weighted, ((0, win_y - tile), (0, win_x - tile)))
        padded = pltpu.roll(padded, y - y0, 0)
        padded = pltpu.roll(padded, x - x0, 1)

        read.wait()
        window_buf[:] = window_buf[:] + padded
        write = pltpu.make_async_copy(window_buf, window, sem_window)
        write.start()
        write.wait()
        return carry

    jax.lax.fori_loop(0, n_tiles, body, 0)
    del scene_ref  # aliased with out_ref


@functools.partial(jax.jit, static_argnames=("interpret",), donate_argnums=(0,))
def stitch_tiles_pallas_fused(scene_padded, tiles, positions, wy, wx, means,
                              sigma, interpret: bool = False):
    """Fused single-program stitch (see ``_stitch_kernel_fused``).

    Same contract as ``stitch_tiles_pallas``. On real hardware, tiles
    narrower than one lane row (tile < 128) delegate to the per-tile-program
    kernel: the fused variant's manual (tile, tile) HBM tile DMA would be
    lane-unaligned (Mosaic rejects the extent on-chip), whereas the per-tile
    variant's BlockSpec-pipelined tiles are not subject to that rule — and
    sub-128 tiles are never a throughput case (the fused variant exists to
    amortise per-program setup over LARGE tile streams). Outputs are
    bit-identical either way (chip-measured). Interpret mode keeps the fused
    body at every tile size so tests exercise its logic.
    """
    b, tile, _ = tiles.shape
    if tile < _LANE and not interpret:
        return stitch_tiles_pallas(scene_padded, tiles, positions, wy, wx,
                                   means, sigma, interpret=interpret)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(1,),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),     # scene (HBM)
            pl.BlockSpec(memory_space=pl.ANY),     # tiles (HBM, DMA'd)
            pl.BlockSpec(memory_space=pltpu.VMEM),    # wy (B, T)
            pl.BlockSpec(memory_space=pltpu.VMEM),    # wx (B, T)
            pl.BlockSpec(memory_space=pltpu.SMEM),    # means (B,)
            pl.BlockSpec(memory_space=pltpu.SMEM),    # sigma (1,)
        ],
        out_specs=pl.BlockSpec(memory_space=pl.ANY),
        scratch_shapes=[
            pltpu.VMEM((2, tile, tile), jnp.float32),
            pltpu.VMEM(_win_extents(tile), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA(()),
        ],
    )
    return pl.pallas_call(
        _stitch_kernel_fused,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct(scene_padded.shape, scene_padded.dtype),
        input_output_aliases={1: 0},
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
        interpret=interpret,
    )(positions, scene_padded, tiles, wy, wx,
      means.astype(jnp.float32), jnp.asarray(sigma, jnp.float32).reshape(1))


def stitch_tiles_xla(scene, tiles, positions, wy, wx, means, sigma):
    """XLA scatter-add reference implementation (any backend)."""
    tile = tiles.shape[1]
    pred = tiles * sigma + means[:, None, None]
    weighted = pred * (wy[:, :, None] * wx[:, None, :])
    rows = positions[:, 0, None, None] + jax.lax.broadcasted_iota(
        jnp.int32, (1, tile, 1), 1)
    cols = positions[:, 1, None, None] + jax.lax.broadcasted_iota(
        jnp.int32, (1, 1, tile), 2)
    return scene.at[rows, cols].add(weighted)


def stitch_tiles(scene, tiles, positions, wy, wx, means, sigma,
                 use_pallas: bool | None = None, interpret: bool = False):
    """Dispatch: Pallas kernel on TPU, XLA scatter-add elsewhere.

    One-off convenience wrapper (handles scene padding). Inside a scan, carry
    the padded scene and call ``stitch_tiles_pallas`` directly to avoid
    per-step pad/crop copies.
    """
    if use_pallas is None:
        use_pallas = jax.devices()[0].platform == "tpu"
    if use_pallas:
        padded = stitch_tiles_pallas(pad_scene(scene), tiles, positions, wy, wx,
                                     means, sigma, interpret=interpret)
        return crop_scene(padded)
    return stitch_tiles_xla(scene, tiles, positions, wy, wx, means, sigma)
