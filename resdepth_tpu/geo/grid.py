"""Tile-grid generation over geographic regions.

Pure-function re-implementations of the reference's grid math:
  * ``create_regular_grid``  — lib/rasterutils.py:100-191
  * ``indices_from_area_defn`` — lib/data_allocation.py:332-378

Semantics preserved exactly (unit-tested against hand-derived goldens):
tiles advance by ``stride``; a tile that would cross the region border is
shifted inward so its trailing edge coincides with the border, and the
per-tile exclusive ("without overlap") pixel bounds account for the
accumulated shift. These exclusive bounds feed both validation loss masking
and inference blend weights.
"""

from __future__ import annotations

import numpy as np


def create_regular_grid(area_defn, tile_size: int, stride: int | None = None):
    """Enumerate (possibly overlapping) tiles covering each region.

    Returns ``(tile_position, region_wo_overlap)``:
      tile_position[i] = (uly, ulx): upper-left raster coordinates of tile i;
      region_wo_overlap[i] = (border_uly, border_ulx, border_lry, border_lrx):
        tile-local pixel bounds of the part of tile i not covered by any
        earlier tile along each axis.
    """
    if stride is None:
        stride = tile_size

    tile_position: list[tuple[int, int]] = []
    region_wo_overlap: list[tuple[int, int, int, int]] = []

    for x_ext, y_ext in zip(area_defn["x_extent"], area_defn["y_extent"]):
        x0, x1 = int(x_ext[0]), int(x_ext[1])
        y0, y1 = int(y_ext[0]), int(y_ext[1])

        uly = y0
        lry = y0
        border_uly = 0
        border_lry = stride - 1

        while lry < y1:
            ulx = x0
            lrx = x0
            border_ulx = 0
            border_lrx = stride - 1

            lry = uly + tile_size - 1
            if lry >= y1:
                # Shift the tile upward so its bottom edge meets the border.
                border_uly += lry - y1
                lry = y1
                uly = y1 - tile_size + 1
                border_lry = tile_size - 1

            while lrx < x1:
                lrx = ulx + tile_size - 1
                if lrx >= x1:
                    border_ulx += lrx - x1
                    lrx = x1
                    ulx = x1 - tile_size + 1
                    border_lrx = tile_size - 1

                tile_position.append((int(uly), int(ulx)))
                region_wo_overlap.append(
                    (int(border_uly), int(border_ulx), int(border_lry), int(border_lrx)))

                ulx += stride
                border_ulx = tile_size - stride

            uly += stride
            border_uly = tile_size - stride

    return tile_position, region_wo_overlap


def indices_from_area_defn(area_defn, tile_size: int):
    """All valid tile upper-left positions fully inside each region.

    Returns a list of (y, x) tuples; a position is valid when the whole
    ``tile_size`` x ``tile_size`` patch fits inside the region.
    """
    valid_positions: list[tuple[int, int]] = []
    for x_ext, y_ext in zip(area_defn["x_extent"], area_defn["y_extent"]):
        x_start, x_end = int(x_ext[0]), int(x_ext[1]) - tile_size + 1
        y_start, y_end = int(y_ext[0]), int(y_ext[1]) - tile_size + 1
        if x_end < x_start or y_end < y_start:
            continue
        ys = np.arange(y_start, y_end + 1)
        xs = np.arange(x_start, x_end + 1)
        grid_y, grid_x = np.meshgrid(ys, xs, indexing="ij")
        valid_positions.extend(zip(grid_y.ravel().tolist(), grid_x.ravel().tolist()))
    return valid_positions


def positions_as_array(positions) -> np.ndarray:
    """(N, 2) int32 array of (y, x) positions — device-friendly layout."""
    return np.asarray(positions, dtype=np.int32).reshape(-1, 2)
