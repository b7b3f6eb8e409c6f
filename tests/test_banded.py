"""Banded training residency (data/banded.py): train on regions larger than
the per-device raster budget (tpu.max_device_pixels).

Reference capability being matched: host-RAM dataset residency
(/root/reference/lib/DsmOrthoDataset.py:293-314, README.md:268) — the
resident TPU pipeline otherwise caps region size at one chip's HBM."""

import jax
import numpy as np
import pytest

from resdepth_tpu.data import banded
from resdepth_tpu.data.dataset import TileDataset
from resdepth_tpu.data.pipeline import batch_spec_for
from resdepth_tpu.models.unet import UNetConfig, init_unet
from resdepth_tpu.train.optim import build_optimizer
from resdepth_tpu.train.step import (init_train_state, make_eval_step,
                                     make_train_step)
from resdepth_tpu.train.trainer import Trainer

ROWS, COLS, N_IMAGES = 96, 64, 3
PLANES = 2 + N_IMAGES          # dsm_in + gt + orthos (geom-stereo)
BUDGET = 32 * COLS * PLANES    # 32-row windows -> >= 3 bands over 96 rows


def _scene(make_geotiff, seed=0, nodata=-9999.0):
    rng = np.random.default_rng(seed)
    gt = rng.normal(400.0, 8.0, (ROWS, COLS)).astype(np.float32)
    dsm = gt + rng.normal(0.0, 1.0, (ROWS, COLS)).astype(np.float32)
    dsm[5:8, 5:8] = nodata
    gt[10:12, 4:6] = nodata
    images = rng.normal(120.0, 25.0, (ROWS, COLS, N_IMAGES)).astype(np.float32)
    return {
        "raster_in": make_geotiff("dsm.tif", dsm, nodata=nodata),
        "raster_gt": make_geotiff("gt.tif", gt, nodata=nodata),
        "image_list": [make_geotiff(f"img{j}.tif", images[..., j],
                                    nodata=nodata) for j in range(N_IMAGES)],
    }


def _dataset(paths, strategy="train", **kwargs):
    entry = {
        "raster_in": paths["raster_in"], "raster_gt": paths["raster_gt"],
        "image_list": paths["image_list"], "image_pairs": [(0, 1), (1, 2)],
        "area_defn": {"x_extent": [(0, COLS - 1)], "y_extent": [(0, ROWS - 1)]},
        "n_samples": 40,
    }
    defaults = dict(input_channels="geom-stereo", tile_size=16,
                    sampling_strategy=strategy, dsm_std=5.0, ortho_mean=120.0,
                    ortho_std=25.0, seed=3)
    defaults.update(kwargs)
    return TileDataset(entry, **defaults)


def test_banded_trajectory_matches_resident_path(make_geotiff, tmp_path):
    """Training under a max_device_pixels budget on a scene LARGER than the
    budget reproduces the resident path's trajectory (same seeds): the
    equivalence twin (band_resident=False) holds the full scene in device
    memory with global positions but has the identical loader structure,
    batch composition and epoch order — so any divergence isolates a
    residency bug (window slicing, position rebasing, pad rows, swaps)."""
    paths = _scene(make_geotiff)
    ds = _dataset(paths, "train", augment=True)
    val_ds = _dataset(paths, "val")
    assert banded.resident_pixels(ds) > BUDGET  # the scene exceeds the budget

    config = UNetConfig(n_input_channels=3, start_kernel=4,
                        max_filter_depth=8, depth=2)
    tx = build_optimizer("Adam", 1e-5)
    spec = batch_spec_for(ds)
    val_spec = batch_spec_for(val_ds)

    def run(band_resident, tag):
        params, bn = init_unet(jax.random.PRNGKey(0), config)
        state = init_train_state(params, bn, tx, 3e-3)
        train_step = make_train_step(config, spec, tx, mesh=None,
                                     donate=False, weighted_bn=True)
        eval_step = make_eval_step(config, val_spec, mesh=None)
        train_loaders = banded.make_banded_loaders(
            ds, 4, max_device_pixels=BUDGET, seed=7,
            band_resident=band_resident)
        val_loaders = banded.make_banded_loaders(
            val_ds, 4, max_device_pixels=BUDGET, seed=0, shuffle=False,
            band_resident=band_resident)
        trainer = Trainer(state=state, train_step=train_step,
                          eval_step=eval_step, train_loaders=train_loaders,
                          val_loaders=val_loaders, n_epochs=2,
                          checkpoint_dir=str(tmp_path / tag), rng_seed=5,
                          group_chunks_by_loader=True)
        trainer.train()
        return trainer, train_loaders

    trainer_b, loaders_b = run(True, "banded")
    trainer_r, loaders_r = run(False, "resident")

    n_bands = len(loaders_b)
    assert n_bands >= 3
    source = loaders_b[0][0].source
    # the budget is respected by construction of the common window height
    assert source.window_rows * COLS * PLANES <= BUDGET
    # one upload per band per epoch (validate() releases the train window
    # at each epoch's eval, so nothing carries over between epochs)
    assert source.uploads == n_bands * 2
    # release hooks left nothing resident after train()
    assert source._resident is None

    for a, b in zip(jax.tree_util.tree_leaves(trainer_b.state.params),
                    jax.tree_util.tree_leaves(trainer_r.state.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-6, atol=1e-7)
    assert trainer_b.best_loss == pytest.approx(trainer_r.best_loss, rel=1e-6)


def test_banded_source_keeps_one_window(make_geotiff):
    """Exactly one band window is device-resident per source; re-requesting
    the same band is a cache hit, release() drops it."""
    paths = _scene(make_geotiff)
    ds = _dataset(paths)
    loaders = banded.make_banded_loaders(ds, 4, max_device_pixels=BUDGET,
                                         seed=1)
    source = loaders[0][0].source
    first = loaders[0][0].resolve()
    assert source.uploads == 1
    assert loaders[0][0].resolve() is first      # cache hit
    assert source.uploads == 1
    second = loaders[1][0].resolve()             # swap
    assert source.uploads == 2
    assert second is not first
    assert source._resident is second            # only the newest is held
    loaders[1][0].release()
    assert source._resident is None
    # window rows x cols x planes fits the budget
    assert int(second.dsm_input.shape[0]) == source.window_rows
    assert source.window_rows * COLS * PLANES <= BUDGET


def test_window_pad_rows_use_nodata_and_common_height(make_geotiff):
    """All band windows share one height (one compiled train step); the
    bottom band's pad rows are nodata for the DSM planes."""
    paths = _scene(make_geotiff)
    ds = _dataset(paths)
    loaders = banded.make_banded_loaders(ds, 4, max_device_pixels=BUDGET,
                                         seed=1)
    source = loaders[0][0].source
    shapes = {tuple(p.resolve().dsm_input.shape) for p, _ in loaders}
    assert shapes == {(source.window_rows, COLS)}
    last = max((p for p, _ in loaders), key=lambda p: p.y0)
    window = last.resolve()
    true_rows = ROWS - last.y0
    if true_rows < source.window_rows:
        pad = np.asarray(window.dsm_input[true_rows:])
        np.testing.assert_array_equal(pad, np.full_like(pad, ds.nodata))


BUDGET_2D = 4000  # < one full-width 16-row band (5120) but >= 5*16*16


def test_iter_bands_2d_partition_and_rebase():
    """Every sample lands in exactly one 2-D band; rebased positions stay
    inside their band's true window; window extents respect the budgets."""
    rng = np.random.default_rng(11)
    tile, rb, cb = 16, 28, 28
    positions = np.stack([rng.integers(0, ROWS - tile, 40),
                          rng.integers(0, COLS - tile, 40)], axis=1)
    seen = []
    for rwin, cwin, idx, pos in banded.iter_bands_2d(positions, tile, rb, cb,
                                                     COLS):
        assert rwin.stop - rwin.start <= rb
        assert cwin.stop - cwin.start <= cb
        seen.extend(idx.tolist())
        assert np.all(pos >= 0)
        assert np.all(pos[:, 0] + tile <= rwin.stop - rwin.start)
        assert np.all(pos[:, 1] + tile <= cwin.stop - cwin.start)
        np.testing.assert_array_equal(positions[idx],
                                      pos + [rwin.start, cwin.start])
    assert sorted(seen) == list(range(40))


def test_banded_2d_trajectory_matches_resident_path(make_geotiff, tmp_path):
    """A region too WIDE for even one full-width tile-height band (VERDICT
    r4 missing item 2) trains via 2-D (column-cut) windows and reproduces
    the resident path's trajectory — same equivalence-twin protocol as the
    row-banded test above."""
    paths = _scene(make_geotiff)
    ds = _dataset(paths, "train", augment=True)
    val_ds = _dataset(paths, "val")
    # full-width row banding is infeasible at this budget...
    assert BUDGET_2D < COLS * PLANES * ds.tile_size
    with pytest.raises(ValueError, match="full\\s+width"):
        banded.rows_budget_for(ds, BUDGET_2D)
    # ...but 2-D windows are
    rb, cb = banded.window_budgets_for(ds, BUDGET_2D)
    assert cb < COLS and rb >= ds.tile_size and cb >= ds.tile_size

    config = UNetConfig(n_input_channels=3, start_kernel=4,
                        max_filter_depth=8, depth=2)
    tx = build_optimizer("Adam", 1e-5)
    spec = batch_spec_for(ds)
    val_spec = batch_spec_for(val_ds)

    def run(band_resident, tag):
        params, bn = init_unet(jax.random.PRNGKey(0), config)
        state = init_train_state(params, bn, tx, 3e-3)
        train_step = make_train_step(config, spec, tx, mesh=None,
                                     donate=False, weighted_bn=True)
        eval_step = make_eval_step(config, val_spec, mesh=None)
        train_loaders = banded.make_banded_loaders(
            ds, 4, max_device_pixels=BUDGET_2D, seed=7,
            band_resident=band_resident)
        val_loaders = banded.make_banded_loaders(
            val_ds, 4, max_device_pixels=BUDGET_2D, seed=0, shuffle=False,
            band_resident=band_resident)
        trainer = Trainer(state=state, train_step=train_step,
                          eval_step=eval_step, train_loaders=train_loaders,
                          val_loaders=val_loaders, n_epochs=2,
                          checkpoint_dir=str(tmp_path / tag), rng_seed=5,
                          group_chunks_by_loader=True)
        trainer.train()
        return trainer, train_loaders

    trainer_b, loaders_b = run(True, "banded2d")
    trainer_r, _ = run(False, "resident2d")

    source = loaders_b[0][0].source
    # the budget is respected by the common window SHAPE (not just height)
    assert source.window_rows * source.window_cols * PLANES <= BUDGET_2D
    # columns actually got cut: multiple distinct x-origins
    assert len({p.x0 for p, _ in loaders_b}) > 1
    assert source._resident is None  # release hooks ran

    for a, b in zip(jax.tree_util.tree_leaves(trainer_b.state.params),
                    jax.tree_util.tree_leaves(trainer_r.state.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-6, atol=1e-7)
    assert trainer_b.best_loss == pytest.approx(trainer_r.best_loss, rel=1e-6)


def test_infeasible_budget_raises_actionable(make_geotiff):
    paths = _scene(make_geotiff)
    ds = _dataset(paths)
    with pytest.raises(ValueError, match="tpu.max_device_pixels"):
        banded.make_banded_loaders(ds, 4, max_device_pixels=100, seed=0)


def test_validator_checks_max_device_pixels():
    """Config-time checks: type/positivity + the tile-window feasibility
    floor, with actionable messages."""
    import logging

    from resdepth_tpu.config import validate_train
    from resdepth_tpu.utils.attrdict import AttrDict

    logger = logging.getLogger("test_banded_validator")

    def check(value, tile=32):
        cfg = AttrDict({"tpu": {"max_device_pixels": value},
                        "training_settings": {"tile_size": tile}})
        return validate_train._valid_tpu_args(cfg, logger)

    assert check(1 << 26) is True
    assert check(0) is True                       # explicit off
    assert check(-5) is False
    assert check("big") is False
    assert check(100, tile=32) is False           # below one tile window


def test_window_budgets_boundaries(make_geotiff):
    """Exact boundary behaviour of the 2-D budget math: the tile-window
    floor, the full-width switchover, and budget adherence either side."""
    paths = _scene(make_geotiff)
    ds = _dataset(paths)  # 96x64, 5 planes, tile 16
    tile, planes = ds.tile_size, PLANES
    floor = planes * tile * tile                      # 1280
    full_width = planes * COLS * tile                 # 5120

    # one pixel below the floor -> actionable error
    with pytest.raises(ValueError, match="tile window"):
        banded.window_budgets_for(ds, floor - 1)
    # exactly the floor -> a single tile x tile window is feasible
    rb, cb = banded.window_budgets_for(ds, floor)
    assert rb >= tile and cb >= tile
    assert rb * cb * planes <= floor
    # exactly one full-width tile band -> the 1-D fast path kicks in
    rb, cb = banded.window_budgets_for(ds, full_width)
    assert cb == COLS and rb == tile
    # one below full-width -> 2-D, still within budget and >= tile
    rb, cb = banded.window_budgets_for(ds, full_width - 1)
    assert cb < COLS and rb >= tile and cb >= tile
    assert rb * cb * planes <= full_width - 1
    # a huge budget -> full width, rows clamp handled by iter_bands
    rb, cb = banded.window_budgets_for(ds, 10**9)
    assert cb == COLS and rb >= ROWS
