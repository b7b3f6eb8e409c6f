"""Evaluation suite: masked statistics and per-class full-scene evaluation."""

import logging

import numpy as np
import pytest

from resdepth_tpu.evaluation import (compute_residuals, evaluate_performance,
                                     get_statistics, truncate_residuals)
from resdepth_tpu.geo import tiff

logger = logging.getLogger("test_eval")
logger.addHandler(logging.NullHandler())


def test_compute_residuals_masks_nodata_and_gt_mask():
    gt = np.array([[1.0, 2.0], [-9999.0, 4.0]])
    pred = np.array([[1.5, -9999.0], [3.0, 5.0]])
    mask_gt = np.array([[True, True], [True, False]])
    res = compute_residuals(pred, gt, -9999.0, mask_gt)
    assert res[0, 0] == pytest.approx(0.5)
    assert res.mask[0, 1]   # pred nodata
    assert res.mask[1, 0]   # gt nodata
    assert res.mask[1, 1]   # excluded by mask_gt


def test_get_statistics_golden():
    residuals = np.ma.masked_array(
        [1.0, -2.0, 3.0, 0.5, -0.5, 100.0],
        mask=[False, False, False, False, False, True])
    stats = get_statistics(residuals)
    vals = np.array([1.0, -2.0, 3.0, 0.5, -0.5])
    assert stats.count_total == 5
    assert stats.MAE == pytest.approx(np.abs(vals).mean())
    assert stats.RMSE == pytest.approx(np.sqrt((vals ** 2).mean()))
    assert stats.absolute_median == pytest.approx(np.median(np.abs(vals)))
    assert stats.median == pytest.approx(np.median(vals))
    assert stats.diff_max == pytest.approx(3.0)
    assert stats.diff_min == pytest.approx(-2.0)
    # reference quirk: NMAD centred on MedAE (=1.0), not the median (=0.5)
    assert stats.NMAD == pytest.approx(1.4826 * np.median(np.abs(vals - 1.0)))
    textbook = get_statistics(residuals, nmad_center="median")
    assert textbook.NMAD == pytest.approx(1.4826 * np.median(np.abs(vals - 0.5)))


def test_get_statistics_truncated():
    residuals = np.ma.masked_array([0.5, -0.2, 5.0, -7.0])
    stats = get_statistics(residuals, residual_threshold=1.0)
    assert stats.truncation is True
    assert stats.truncated.count_total == 2
    assert stats.truncated.MAE == pytest.approx(0.35)
    assert stats.truncated.threshold == 1.0
    kept = truncate_residuals(residuals, 1.0)
    assert kept.count() == 2


def _write_tif(path, data, nodata=255):
    tiff.write(str(path), np.asarray(data),
               geotransform=(0.0, 0.25, 0.0, 0.0, 0.0, -0.25), nodata=nodata)
    return str(path)


def test_evaluate_performance_classes(tmp_path):
    rng = np.random.default_rng(0)
    rows = cols = 40
    gt = rng.normal(100.0, 3.0, (rows, cols)).astype(np.float32)
    initial = gt + 2.0          # constant +2 m error before refinement
    prediction = gt + 0.5       # +0.5 m after

    building = np.zeros((rows, cols), np.uint8)
    building[10:16, 10:16] = 1
    water = np.zeros((rows, cols), np.uint8)
    water[30:34, :] = 1
    forest = np.zeros((rows, cols), np.uint8)
    forest[:, 34:] = 1

    gt_path = _write_tif(tmp_path / "gt.tif", gt, nodata=-9999.0)
    init_path = _write_tif(tmp_path / "init.tif", initial, nodata=-9999.0)
    building_path = _write_tif(tmp_path / "b.tif", building)
    water_path = _write_tif(tmp_path / "w.tif", water)
    forest_path = _write_tif(tmp_path / "f.tif", forest)

    residuals = evaluate_performance(
        prediction, init_path, gt_path, logger,
        area_defn={"x_extent": [(0, cols - 1)], "y_extent": [(0, rows - 1)]},
        path_building_mask=building_path, path_water_mask=water_path,
        path_forest_mask=forest_path, logger_stats=logger)

    assert set(residuals.keys()) == {"all", "building", "terrain",
                                     "terrain_nowater",
                                     "terrain_nowater_noforest"}
    # refined error is +0.5 everywhere
    np.testing.assert_allclose(residuals.all.compressed(), 0.5, atol=1e-5)

    # building mask dilated by 2 px (connectivity-1 element, scipy default)
    n_building = int(_dilated(building).sum())
    assert residuals.building.count() == n_building
    assert residuals.terrain.count() == rows * cols - n_building
    # water rows excluded from terrain_nowater (water does not overlap building)
    assert residuals.terrain_nowater.count() == rows * cols - n_building - 4 * cols
    # forest columns additionally excluded (minus overlaps already excluded)
    expected = residuals.terrain_nowater.count() - np.count_nonzero(
        (forest == 1)
        & ~_dilated(building)
        & ~(water == 1))
    assert residuals.terrain_nowater_noforest.count() == expected


def _dilated(building):
    from resdepth_tpu.geo.raster import dilate_mask
    return dilate_mask(building == 1, iterations=2)


def test_evaluate_performance_area_restriction(tmp_path):
    gt = np.full((20, 20), 50.0, np.float32)
    prediction = gt + 1.0
    initial = gt + 3.0
    gt_path = _write_tif(tmp_path / "gt.tif", gt, nodata=-9999.0)
    init_path = _write_tif(tmp_path / "init.tif", initial, nodata=-9999.0)

    residuals = evaluate_performance(
        prediction, init_path, gt_path, logger,
        area_defn={"x_extent": [(5, 9)], "y_extent": [(0, 19)]},
        logger_stats=logger)
    # only the 5-column stripe evaluates
    assert residuals.all.count() == 5 * 20
