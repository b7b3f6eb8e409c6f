"""Full-pipeline parity for scene evaluation against the ACTUAL reference.

The existing numerics parity tests cover ``compute_residuals`` /
``get_statistics`` in isolation; these tests run the REAL
``lib/evaluation.py::evaluate_performance`` (/root/reference/lib/
evaluation.py:163-457) end to end — mask loading, the 2-px building
dilation, nodata invalidation via the ``np.ma.masked``-into-bool-array
quirk, water/forest class composition (including the forest-without-water
branch), multi-stripe area restriction, and the printed statistics report —
against our ``resdepth_tpu.evaluation.performance.evaluate_performance``
over the same rasters. Mask/DSM files are written as real GeoTIFFs (read by
our first-party codec) and simultaneously registered with an in-memory GDAL
fake (read by the reference), so both sides consume identical pixel data.

Parity is asserted on (a) the returned per-class residual masked arrays and
(b) the exact numeric stream of the statistics report (both sides use the
same ``{:10.3f}`` format strings, so every printed metric — including the
before-refinement statistics that are never returned — must agree to the
printed digit).

Skipped automatically when /root/reference is absent.
"""

import logging
import os
import re
import types

import numpy as np
import pytest

from tests.test_reference_parity_dataset import _FakeGdalDataset, _gdal_stub
from tests.test_reference_parity_numerics import _load_with_stubs

REFERENCE = "/root/reference"

pytestmark = pytest.mark.skipif(not os.path.isdir(REFERENCE),
                                reason="reference implementation not available")

NODATA = -9999.0


class _ListHandler(logging.Handler):
    def __init__(self):
        super().__init__()
        self.lines = []

    def emit(self, record):
        self.lines.append(record.getMessage())


def _capture_logger(name):
    logger = logging.Logger(name)
    handler = _ListHandler()
    logger.addHandler(handler)
    return logger, handler


def _load_ref_evaluation(registry):
    """The real lib/evaluation.py wired to the real rasterutils (GDAL faked
    to an in-memory path registry); fdutil/utils/data_normalization stay
    stubbed (file_exists is always-true — the on-disk GeoTIFFs do exist)."""
    gdal = _gdal_stub(registry)
    ru = _load_with_stubs("lib/rasterutils.py", "ref_eval_ru",
                          extra_stubs=gdal)
    return _load_with_stubs("lib/evaluation.py", "ref_eval_full",
                            extra_stubs={**gdal, "lib.rasterutils": ru})


# ------------------------------- scene ------------------------------- #

@pytest.fixture(scope="module")
def scene():
    rng = np.random.default_rng(11)
    rows, cols = 60, 80
    initial = rng.normal(400.0, 5.0, (rows, cols)).astype(np.float32)
    gt = (initial + rng.normal(0.0, 1.0, (rows, cols))).astype(np.float32)
    gt[10:14, 20:30] = NODATA                       # nodata hole
    prediction = (gt + rng.normal(0.0, 0.3, (rows, cols))).astype(np.float32)

    gt_mask = (rng.uniform(size=(rows, cols)) > 0.1).astype(np.float32)
    building = np.zeros((rows, cols), np.float32)
    building[5:20, 5:25] = 1.0
    building[40:55, 50:70] = 1.0
    building[48:52, 55:60] = NODATA                 # nodata in the class mask
    water = np.zeros((rows, cols), np.float32)
    water[30:38, 10:40] = 1.0
    forest = np.zeros((rows, cols), np.float32)
    forest[22:45, 60:78] = 1.0
    return {"initial": initial, "gt": gt, "prediction": prediction,
            "gt_mask": gt_mask, "building": building, "water": water,
            "forest": forest}


@pytest.fixture()
def rasters(scene, make_geotiff):
    """Each raster exists twice from one array: a real GeoTIFF on disk (our
    codec's input) and a fake-GDAL registry entry at the same path."""
    registry = {}
    paths = {}
    for name, arr in scene.items():
        if name == "prediction":
            continue
        paths[name] = make_geotiff(f"{name}.tif", arr, nodata=NODATA)
        registry[paths[name]] = _FakeGdalDataset(arr, NODATA)
    return paths, registry


AREA = {"x_extent": [(0, 39), (42, 79)], "y_extent": [(0, 59), (4, 55)]}


def _run_both(scene, rasters, *, masks=(), area_defn=None,
              residual_threshold=None):
    from resdepth_tpu.evaluation.performance import evaluate_performance

    paths, registry = rasters
    ref_eval = _load_ref_evaluation(registry)
    mask_kwargs = {f"path_{m}_mask": paths["gt_mask" if m == "gt" else m]
                   for m in masks}

    ref_root, _ = _capture_logger("ref_root")
    ref_stats, ref_cap = _capture_logger("ref_stats")
    ref_res = ref_eval.evaluate_performance(
        scene["prediction"].copy(), paths["initial"], paths["gt"],
        ref_root, area_defn=area_defn, logger_stats=ref_stats,
        residual_threshold=residual_threshold, **mask_kwargs)

    our_root, _ = _capture_logger("our_root")
    our_stats, our_cap = _capture_logger("our_stats")
    our_res = evaluate_performance(
        scene["prediction"].copy(), paths["initial"], paths["gt"],
        logger_root=our_root, area_defn=area_defn, logger_stats=our_stats,
        residual_threshold=residual_threshold, **mask_kwargs)

    return ref_res, our_res, "\n".join(ref_cap.lines), "\n".join(our_cap.lines)


_NUMBER = re.compile(r"-?\d+\.\d+|-?\d+")


def _assert_parity(ref_res, our_res, ref_log, our_log):
    assert sorted(ref_res.keys()) == sorted(our_res.keys())
    for key in ref_res:
        ref_arr = np.ma.asarray(ref_res[key])
        our_arr = np.ma.asarray(our_res[key])
        np.testing.assert_array_equal(
            np.ma.getmaskarray(our_arr), np.ma.getmaskarray(ref_arr),
            err_msg=f"residual mask, class {key}")
        np.testing.assert_array_equal(
            our_arr.filled(0.0), ref_arr.filled(0.0),
            err_msg=f"residual values, class {key}")
    # Every printed number (pixel counts, area, thresholds, all before/after
    # metrics) must agree to the formatted digit and appear in the same order.
    assert _NUMBER.findall(our_log) == _NUMBER.findall(ref_log)


def test_full_masks_with_area_restriction(scene, rasters):
    """gt + building(+nodata) + water + forest masks over a 2-stripe area:
    the complete 5-class evaluation (lib/evaluation.py:268-459)."""
    ref_res, our_res, ref_log, our_log = _run_both(
        scene, rasters, masks=("gt", "building", "water", "forest"),
        area_defn=AREA)
    assert set(ref_res.keys()) == {"all", "building", "terrain",
                                   "terrain_nowater",
                                   "terrain_nowater_noforest"}
    _assert_parity(ref_res, our_res, ref_log, our_log)


def test_full_masks_with_truncation(scene, rasters):
    """residual_threshold engages the truncated-statistics block on every
    class (lib/evaluation.py:39-48,105-131)."""
    ref_res, our_res, ref_log, our_log = _run_both(
        scene, rasters, masks=("gt", "building", "water", "forest"),
        residual_threshold=1.0)
    assert "Truncated" in our_log
    _assert_parity(ref_res, our_res, ref_log, our_log)


def test_building_only(scene, rasters):
    """Building mask alone: all/building/terrain classes, terrain pixels
    invalidated where the mask raster is nodata (:291-296)."""
    ref_res, our_res, ref_log, our_log = _run_both(
        scene, rasters, masks=("building",))
    assert set(ref_res.keys()) == {"all", "building", "terrain"}
    _assert_parity(ref_res, our_res, ref_log, our_log)


def test_forest_without_water(scene, rasters):
    """Forest mask without a water mask takes the alternate composition
    branch terrain_nowater_noforest = terrain & ~forest (:317-322)."""
    ref_res, our_res, ref_log, our_log = _run_both(
        scene, rasters, masks=("building", "forest"))
    assert set(ref_res.keys()) == {"all", "building", "terrain",
                                   "terrain_nowater_noforest"}
    _assert_parity(ref_res, our_res, ref_log, our_log)


def test_no_masks(scene, rasters):
    """No masks at all: overall statistics only, every valid-height gt pixel
    participates (:276-277)."""
    ref_res, our_res, ref_log, our_log = _run_both(scene, rasters)
    assert set(ref_res.keys()) == {"all"}
    _assert_parity(ref_res, our_res, ref_log, our_log)


def test_prediction_loaded_from_path(scene, rasters, make_geotiff):
    """The prediction can also arrive as a GeoTIFF path (:233-240)."""
    from resdepth_tpu.evaluation.performance import evaluate_performance

    paths, registry = rasters
    pred_path = make_geotiff("pred.tif", scene["prediction"], nodata=NODATA)
    registry[pred_path] = _FakeGdalDataset(scene["prediction"], NODATA)
    ref_eval = _load_ref_evaluation(registry)

    ref_root, _ = _capture_logger("ref_root2")
    ref_stats, ref_cap = _capture_logger("ref_stats2")
    ref_res = ref_eval.evaluate_performance(
        pred_path, paths["initial"], paths["gt"], ref_root,
        logger_stats=ref_stats, path_gt_mask=paths["gt_mask"])

    our_root, _ = _capture_logger("our_root2")
    our_stats, our_cap = _capture_logger("our_stats2")
    our_res = evaluate_performance(
        pred_path, paths["initial"], paths["gt"], logger_root=our_root,
        logger_stats=our_stats, path_gt_mask=paths["gt_mask"])

    _assert_parity(ref_res, our_res,
                   "\n".join(ref_cap.lines), "\n".join(our_cap.lines))
