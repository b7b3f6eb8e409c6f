"""Device data pipeline: gather/mask/normalise parity with host oracles,
augmentation consistency, blend stitching."""

import dataclasses

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from resdepth_tpu.data.dataset import TileDataset
from resdepth_tpu.data.pipeline import (BatchIndexIterator, batch_spec_for,
                                        build_batch, device_put_dataset)
from resdepth_tpu.data import normalization
from resdepth_tpu.models.unet import UNetConfig, init_unet
from resdepth_tpu.ops import blend
from resdepth_tpu.geo import grid as grid_mod
from resdepth_tpu.infer import predict_linear_blend


def _scene(make_geotiff, rows=64, cols=80, n_images=3, nodata=-9999.0, seed=0):
    rng = np.random.default_rng(seed)
    gt = rng.normal(400.0, 8.0, (rows, cols)).astype(np.float32)
    dsm = gt + rng.normal(0.0, 1.0, (rows, cols)).astype(np.float32)
    dsm[5:8, 5:8] = nodata
    gt[10:12, 4:6] = nodata
    gt[20, 20] = 0.0  # strict-zero-mask quirk pixel
    images = rng.normal(120.0, 25.0, (rows, cols, n_images)).astype(np.float32)
    paths = {
        "raster_in": make_geotiff("dsm.tif", dsm, nodata=nodata),
        "raster_gt": make_geotiff("gt.tif", gt, nodata=nodata),
        "image_list": [make_geotiff(f"img{j}.tif", images[..., j], nodata=nodata)
                       for j in range(n_images)],
    }
    return paths, dsm, gt, images


def _dataset(paths, rows=64, cols=80, **kwargs):
    entry = {
        "raster_in": paths["raster_in"], "raster_gt": paths["raster_gt"],
        "image_list": paths["image_list"], "image_pairs": [(0, 1), (1, 2)],
        "area_defn": {"x_extent": [(0, cols - 1)], "y_extent": [(0, rows - 1)]},
        "n_samples": 8,
    }
    defaults = dict(input_channels="geom-stereo", tile_size=16,
                    sampling_strategy="train", dsm_std=5.0, ortho_mean=120.0,
                    ortho_std=25.0, seed=3)
    defaults.update(kwargs)
    return TileDataset(entry, **defaults)


def test_build_batch_matches_host_oracle(make_geotiff):
    paths, dsm, gt, images = _scene(make_geotiff)
    ds = _dataset(paths)
    rasters = device_put_dataset(ds)
    spec = batch_spec_for(ds)

    n = len(ds)
    batch = build_batch(rasters, jnp.asarray(ds.positions),
                        jnp.asarray(ds.pair_indices),
                        jnp.zeros((n, 4), jnp.int32), jax.random.PRNGKey(0), spec)

    t = ds.tile_size
    for i in range(n):
        y, x = ds.positions[i]
        patch = dsm[y:y + t, x:x + t]
        valid = patch != ds.nodata
        mean = patch[valid].mean() if valid.any() else 0.0
        # f32 device summation vs numpy: tolerance well under 1 mm in meters
        np.testing.assert_allclose(float(batch["dsm_mean"][i]), mean, atol=1e-3)
        np.testing.assert_allclose(
            np.asarray(batch["input"][i, :, :, 0]), (patch - mean) / 5.0,
            rtol=1e-4, atol=3e-4)
        # loss mask: host oracle incl. strict-zero quirk
        np.testing.assert_array_equal(
            np.asarray(batch["loss_mask"][i, :, :, 0]).astype(bool),
            ds.loss_mask_host(i))
        # ortho channels: correct images, normalised
        pair = ds.image_pairs[ds.pair_indices[i]]
        for v, img_id in enumerate(pair):
            np.testing.assert_allclose(
                np.asarray(batch["input"][i, :, :, 1 + v]),
                (images[y:y + t, x:x + t, img_id] - 120.0) / 25.0,
                rtol=1e-5, atol=1e-5)


def test_build_batch_val_bounds(make_geotiff):
    paths, dsm, gt, _ = _scene(make_geotiff)
    ds = _dataset(paths, sampling_strategy="val", input_channels="geom")
    rasters = device_put_dataset(ds)
    spec = batch_spec_for(ds)
    assert spec.use_bounds

    n = len(ds)
    batch = build_batch(rasters, jnp.asarray(ds.positions),
                        jnp.asarray(ds.pair_indices),
                        jnp.asarray(ds.valid_bounds), jax.random.PRNGKey(0), spec)
    for i in range(n):
        np.testing.assert_array_equal(
            np.asarray(batch["loss_mask"][i, :, :, 0]).astype(bool),
            ds.loss_mask_host(i))


def test_augmentation_consistent_across_channels(make_geotiff):
    """Mask, target and inputs must receive the identical transform."""
    paths, dsm, gt, _ = _scene(make_geotiff)
    # target == input channel 0 when raster_gt == raster_in
    entry = {
        "raster_in": paths["raster_in"], "raster_gt": paths["raster_in"],
        "area_defn": {"x_extent": [(0, 79)], "y_extent": [(0, 63)]},
        "n_samples": 6,
    }
    ds = TileDataset(entry, input_channels="geom", tile_size=16,
                     sampling_strategy="train", dsm_std=1.0, augment=True, seed=1)
    rasters = device_put_dataset(ds)
    spec = batch_spec_for(ds)
    assert spec.augment
    batch = build_batch(rasters, jnp.asarray(ds.positions),
                        jnp.asarray(ds.pair_indices),
                        jnp.zeros((len(ds), 4), jnp.int32),
                        jax.random.PRNGKey(7), spec)
    np.testing.assert_allclose(np.asarray(batch["input"][..., 0]),
                               np.asarray(batch["target"][..., 0]),
                               rtol=1e-6, atol=1e-6)
    # augmentation actually permutes pixels for some sample
    ds_plain = TileDataset(entry, input_channels="geom", tile_size=16,
                           sampling_strategy="train", dsm_std=1.0, augment=False,
                           seed=1)
    plain = build_batch(device_put_dataset(ds_plain),
                        jnp.asarray(ds_plain.positions),
                        jnp.asarray(ds_plain.pair_indices),
                        jnp.zeros((len(ds_plain), 4), jnp.int32),
                        jax.random.PRNGKey(7), batch_spec_for(ds_plain))
    assert not np.allclose(np.asarray(batch["input"]), np.asarray(plain["input"]))


def test_in_pair_permutation(make_geotiff):
    paths, _, _, images = _scene(make_geotiff)
    ds = _dataset(paths, permute_images_within_pair=True)
    ds.positions = np.zeros_like(ds.positions)  # same patch for all samples
    rasters = device_put_dataset(ds)
    spec = batch_spec_for(ds)
    batch = build_batch(rasters, jnp.asarray(ds.positions),
                        jnp.zeros(len(ds), jnp.int32),
                        jnp.zeros((len(ds), 4), jnp.int32),
                        jax.random.PRNGKey(5), spec)
    ch1 = np.asarray(batch["input"][:, :, :, 1])
    img0 = (images[:16, :16, 0] - 120.0) / 25.0
    img1 = (images[:16, :16, 1] - 120.0) / 25.0
    matches0 = [np.allclose(ch1[i], img0, atol=1e-5) for i in range(len(ds))]
    matches1 = [np.allclose(ch1[i], img1, atol=1e-5) for i in range(len(ds))]
    assert all(m0 or m1 for m0, m1 in zip(matches0, matches1))
    assert any(matches0) and any(matches1)  # both orders occur


def test_batch_iterator_pads_final_batch(make_geotiff):
    paths, *_ = _scene(make_geotiff)
    ds = _dataset(paths)  # 8 samples
    it = BatchIndexIterator(ds, batch_size=3, shuffle=False)
    batches = list(it)
    assert len(batches) == 3
    for positions, pair_idx, bounds, weights in batches:
        assert positions.shape == (3, 2) and weights.shape == (3,)
    assert batches[-1][3].tolist() == [1.0, 1.0, 0.0]


def test_sigma_sat_matches_exact(make_geotiff):
    paths, dsm, *_ = _scene(make_geotiff)
    ds = _dataset(paths)
    fast = normalization.sigma_from_positions(ds.dsm_input, ds.nodata,
                                              ds.positions, ds.tile_size)
    exact = normalization.sigma_from_positions(ds.dsm_input, ds.nodata,
                                               ds.positions, ds.tile_size,
                                               exact=True)
    np.testing.assert_allclose(fast, exact, rtol=1e-9)


# ------------------------------- stitching -------------------------------- #

def test_blend_weights_partition_of_unity():
    for region, tile, stride in [((0, 63, 0, 63), 16, 8), ((0, 53, 0, 45), 16, 8),
                                 ((0, 31, 0, 31), 16, 16), ((3, 60, 5, 50), 16, 8)]:
        y0, y1, x0, x1 = region
        area = {"x_extent": [(x0, x1)], "y_extent": [(y0, y1)]}
        positions, borders = grid_mod.create_regular_grid(area, tile, stride)
        wy, wx = blend.weight_table(tile, stride, borders)
        acc = np.zeros((y1 + 1, x1 + 1))
        for i, (uly, ulx) in enumerate(positions):
            acc[uly:uly + tile, ulx:ulx + tile] += np.outer(wy[i], wx[i])
        np.testing.assert_allclose(acc[y0:y1 + 1, x0:x1 + 1], 1.0, atol=1e-5)


def test_predict_linear_blend_identity_model(make_geotiff):
    """Zero weights + outer skip == identity on the DSM; stitching must then
    reproduce the input raster exactly inside the region."""
    paths, dsm, *_ = _scene(make_geotiff)
    entry = {"raster_in": paths["raster_in"],
             "area_defn": {"x_extent": [(0, 79)], "y_extent": [(0, 63)]}}
    ds = TileDataset(entry, input_channels="geom", tile_size=16,
                     sampling_strategy="test", dsm_std=5.0)
    config = UNetConfig(n_input_channels=1, start_kernel=4, max_filter_depth=8,
                        depth=2, do_BN=False, bias_conv_layer=False)
    params, bn_state = init_unet(jax.random.PRNGKey(0), config)
    params = jax.tree_util.tree_map(jnp.zeros_like, params)

    out = predict_linear_blend(config, params, bn_state, ds, batch_size=4)
    np.testing.assert_allclose(out, dsm, rtol=1e-4, atol=2e-3)


def test_predict_linear_blend_custom_strides(make_geotiff):
    """The opt-in tile_stride knob (general.tile_stride): with the identity
    model the stitched scene must reproduce the input DSM for every stride in
    the supported [tile/2, tile] domain — including tile-1 (degenerate 1-px
    overlap ramp) and tile (no overlap)."""
    paths, dsm, *_ = _scene(make_geotiff)
    entry = {"raster_in": paths["raster_in"],
             "area_defn": {"x_extent": [(0, 79)], "y_extent": [(0, 63)]}}
    config = UNetConfig(n_input_channels=1, start_kernel=4, max_filter_depth=8,
                        depth=2, do_BN=False, bias_conv_layer=False)
    params, bn_state = init_unet(jax.random.PRNGKey(0), config)
    params = jax.tree_util.tree_map(jnp.zeros_like, params)

    for stride in (8, 12, 15, 16):
        ds = TileDataset(entry, input_channels="geom", tile_size=16,
                         sampling_strategy="test", stride=stride, dsm_std=5.0)
        out = predict_linear_blend(config, params, bn_state, ds, batch_size=4)
        np.testing.assert_allclose(out, dsm, rtol=1e-4, atol=2e-3,
                                   err_msg=f"stride={stride}")


def test_predict_linear_blend_matches_host_stitch(make_geotiff):
    """Device scatter-add stitch == naive host stitching of per-tile outputs."""
    paths, dsm, *_ = _scene(make_geotiff, rows=48, cols=48)
    entry = {"raster_in": paths["raster_in"],
             "area_defn": {"x_extent": [(0, 47)], "y_extent": [(0, 47)]}}
    ds = TileDataset(entry, input_channels="geom", tile_size=16,
                     sampling_strategy="test", dsm_std=5.0)
    config = UNetConfig(n_input_channels=1, start_kernel=4, max_filter_depth=8,
                        depth=2)
    params, bn_state = init_unet(jax.random.PRNGKey(1), config)

    out = predict_linear_blend(config, params, bn_state, ds, batch_size=3)

    # Host oracle: run the model per tile, denormalise, blend with weights.
    from resdepth_tpu.models.unet import apply_unet
    expected = np.zeros_like(dsm)
    t = ds.tile_size
    for i in range(len(ds)):
        y, x = ds.positions[i]
        patch = dsm[y:y + t, x:x + t]
        valid = patch != ds.nodata
        mean = patch[valid].mean() if valid.any() else 0.0
        norm = (patch - mean) / ds.dsm_std
        pred, _ = apply_unet(config, params, bn_state,
                             jnp.asarray(norm)[None, :, :, None], train=False)
        pred = np.asarray(pred)[0, :, :, 0] * ds.dsm_std + mean
        weights = blend.tile_weights(t, ds.stride, ds.valid_bounds[i])
        expected[y:y + t, x:x + t] += pred * weights
    np.testing.assert_allclose(out, expected, rtol=1e-4, atol=1e-3)


def test_pallas_stitch_matches_xla_interpret():
    """Pallas stitch kernel (interpreter mode) == XLA scatter-add."""
    from resdepth_tpu.ops.pallas_stitch import stitch_tiles, stitch_tiles_xla
    import jax.numpy as jnp

    rng = np.random.default_rng(0)
    rows, cols, t, b = 64, 80, 16, 6
    scene = rng.normal(size=(rows, cols)).astype(np.float32)
    tiles = rng.normal(size=(b, t, t)).astype(np.float32)
    positions = np.stack([rng.integers(0, rows - t, b),
                          rng.integers(0, cols - t, b)], 1).astype(np.int32)
    positions[1] = positions[0]  # overlapping tiles must accumulate
    wy = rng.random((b, t)).astype(np.float32)
    wx = rng.random((b, t)).astype(np.float32)
    means = rng.normal(size=b).astype(np.float32)

    ref = stitch_tiles_xla(jnp.asarray(scene), jnp.asarray(tiles),
                           jnp.asarray(positions), jnp.asarray(wy),
                           jnp.asarray(wx), jnp.asarray(means), 3.0)
    out = stitch_tiles(jnp.asarray(scene), jnp.asarray(tiles),
                       jnp.asarray(positions), jnp.asarray(wy),
                       jnp.asarray(wx), jnp.asarray(means), 3.0,
                       use_pallas=True, interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)


@pytest.mark.parametrize("stride,tta", [(None, 1), (12, 1), (None, 4)])
def test_streaming_inference_matches_full(make_geotiff, stride, tta):
    """Band-streamed inference is identical to the HBM-resident path —
    including under a custom tile_stride (the bands split the dataset's
    global grid, so the stride must flow through unchanged) and under TTA
    (the merge is per tile, upstream of the additive stitch the band
    partition relies on)."""
    from resdepth_tpu.infer import predict_linear_blend_streaming

    paths, dsm, _, images = _scene(make_geotiff, rows=96, cols=64)
    entry = {"raster_in": paths["raster_in"],
             "image_list": paths["image_list"], "image_pairs": [(0, 1)],
             "area_defn": {"x_extent": [(0, 63)], "y_extent": [(0, 95)]}}
    ds = TileDataset(entry, input_channels="geom-stereo", tile_size=16,
                     sampling_strategy="test", stride=stride, dsm_std=5.0,
                     ortho_mean=120.0, ortho_std=25.0)
    config = UNetConfig(n_input_channels=3, start_kernel=4, max_filter_depth=8,
                        depth=2)
    params, bn = init_unet(jax.random.PRNGKey(0), config)

    full = predict_linear_blend(config, params, bn, ds, batch_size=4, tta=tta)
    # budget forcing ~3 bands: 32 rows x 64 cols x 4 rasters
    streamed = predict_linear_blend_streaming(
        config, params, bn, ds, batch_size=4,
        max_device_pixels=32 * 64 * 4, tta=tta)
    np.testing.assert_allclose(streamed, full, rtol=1e-5, atol=1e-4)


@pytest.mark.parametrize("rows_budget_px,tta", [(32 * 64 * 4, 1),
                                                (16 * 64 * 4, 1),
                                                (32 * 64 * 4, 4)])
def test_scene_sharded_inference_matches_full(make_geotiff, rows_budget_px,
                                              tta):
    """Scene-sharded inference (row bands committed to DIFFERENT devices,
    dispatched concurrently, host overlap-add) is identical to the resident
    single-device path — including when bands outnumber devices (waves) and
    bands need tile/window padding to the common program shape."""
    from resdepth_tpu.infer import predict_linear_blend_scene_sharded

    paths, dsm, _, images = _scene(make_geotiff, rows=144, cols=64)
    entry = {"raster_in": paths["raster_in"],
             "image_list": paths["image_list"], "image_pairs": [(0, 1)],
             "area_defn": {"x_extent": [(0, 63)], "y_extent": [(0, 143)]}}
    ds = TileDataset(entry, input_channels="geom-stereo", tile_size=16,
                     sampling_strategy="test", dsm_std=5.0, ortho_mean=120.0,
                     ortho_std=25.0)
    config = UNetConfig(n_input_channels=3, start_kernel=4, max_filter_depth=8,
                        depth=2)
    params, bn = init_unet(jax.random.PRNGKey(0), config)

    full = predict_linear_blend(config, params, bn, ds, batch_size=4, tta=tta)
    devices = jax.devices()
    assert len(devices) >= 2  # conftest forces the 8-device CPU mesh
    sharded = predict_linear_blend_scene_sharded(
        config, params, bn, ds, batch_size=4,
        max_device_pixels=rows_budget_px, devices=devices, tta=tta)
    np.testing.assert_allclose(sharded, full, rtol=1e-5, atol=1e-4)


def test_batch_iterator_pads_with_distinct_samples(make_geotiff):
    paths, *_ = _scene(make_geotiff)
    ds = _dataset(paths)  # 8 samples
    it = BatchIndexIterator(ds, batch_size=5, shuffle=True, seed=1)
    batches = list(it)
    assert len(batches) == 2
    positions, pair_idx, bounds, weights = batches[-1]
    assert weights.tolist() == [1.0, 1.0, 1.0, 0.0, 0.0]
    # padded rows must be distinct real samples, not duplicates of row 0
    rows = {tuple(p) for p in positions}
    assert len(rows) == 5


def test_pallas_fused_stitch_matches_xla_interpret():
    from resdepth_tpu.ops.pallas_stitch import (crop_scene, pad_scene,
                                                stitch_tiles_pallas_fused,
                                                stitch_tiles_xla)
    rng = np.random.default_rng(3)
    rows, cols, t, b = 64, 80, 16, 6
    scene = rng.normal(size=(rows, cols)).astype(np.float32)
    tiles = rng.normal(size=(b, t, t)).astype(np.float32)
    positions = np.stack([rng.integers(0, rows - t, b),
                          rng.integers(0, cols - t, b)], 1).astype(np.int32)
    positions[2] = positions[1]  # overlap must accumulate in order
    wy = rng.random((b, t)).astype(np.float32)
    wx = rng.random((b, t)).astype(np.float32)
    means = rng.normal(size=b).astype(np.float32)

    ref = stitch_tiles_xla(jnp.asarray(scene), jnp.asarray(tiles),
                           jnp.asarray(positions), jnp.asarray(wy),
                           jnp.asarray(wx), jnp.asarray(means), 3.0)
    out = crop_scene(stitch_tiles_pallas_fused(
        pad_scene(jnp.asarray(scene)), jnp.asarray(tiles),
        jnp.asarray(positions), jnp.asarray(wy), jnp.asarray(wx),
        jnp.asarray(means), 3.0, interpret=True))
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)


def test_stitch_window_alignment_covers_all_tile_sizes():
    """Mosaic rejects lane-unaligned DMA extents on real TPUs: the stitch
    kernels' window extents must be (sublane, lane) = (8, 128) multiples for
    EVERY valid tile size (powers of two >= 16, config/checks.py), and the
    constant scene padding must fit the worst-case window — a lane-aligned
    tile position at the scene's bottom-right edge. Regression for a
    chip-only compile failure ("unsupported unaligned shape") at
    tile < 128, where the old extent tile + 128 is not a lane multiple."""
    from resdepth_tpu.ops.pallas_stitch import (_LANE, _PAD_X, _PAD_Y,
                                                _SUBLANE, _win_extents)

    for tile in (16, 32, 64, 128, 256, 512, 1024):
        win_y, win_x = _win_extents(tile)
        assert win_y % _SUBLANE == 0 and win_x % _LANE == 0
        # must hold a tile at any intra-window offset (dy < 8, dx < 128)
        assert win_y >= tile + _SUBLANE - 1
        assert win_x >= tile + _LANE - 1
        # pad sufficiency: y0 <= y <= rows - tile  ->  y0 + win_y <= rows + pad
        assert win_y - tile <= _PAD_Y
        assert win_x - tile <= _PAD_X


@pytest.mark.parametrize("fused", [False, True])
def test_stitch_small_tile_edge_windows_interpret(fused):
    """Sub-lane tiles (t = 64 < 128) at adversarial positions — lane-aligned
    AND edge-shifted tiles at the scene's bottom-right corner, where the
    aligned superset window extends furthest past the scene — match the XLA
    scatter-add (interpreter mode; the same case is chip-verified)."""
    from resdepth_tpu.ops.pallas_stitch import (crop_scene, pad_scene,
                                                stitch_tiles,
                                                stitch_tiles_pallas_fused,
                                                stitch_tiles_xla)

    rng = np.random.default_rng(7)
    rows, cols, t, b = 320, 320, 64, 6
    scene = rng.normal(400.0, 5.0, (rows, cols)).astype(np.float32)
    positions = np.stack([rng.integers(0, rows - t, b),
                          rng.integers(0, cols - t, b)], 1).astype(np.int32)
    positions[0] = [rows - t, ((cols - t) // 128) * 128]  # aligned, at edge
    positions[1] = [rows - t, cols - t]                   # edge-shifted
    tiles = rng.normal(size=(b, t, t)).astype(np.float32)
    wy = rng.random((b, t)).astype(np.float32)
    wx = rng.random((b, t)).astype(np.float32)
    means = rng.normal(400.0, 1.0, b).astype(np.float32)

    ref = stitch_tiles_xla(jnp.asarray(scene), jnp.asarray(tiles),
                           jnp.asarray(positions), jnp.asarray(wy),
                           jnp.asarray(wx), jnp.asarray(means), 5.0)
    if fused:
        out = crop_scene(stitch_tiles_pallas_fused(
            pad_scene(jnp.asarray(scene)), jnp.asarray(tiles),
            jnp.asarray(positions), jnp.asarray(wy), jnp.asarray(wx),
            jnp.asarray(means), 5.0, interpret=True))
    else:
        out = stitch_tiles(jnp.asarray(scene), jnp.asarray(tiles),
                           jnp.asarray(positions), jnp.asarray(wy),
                           jnp.asarray(wx), jnp.asarray(means), 5.0,
                           use_pallas=True, interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-6, atol=1e-4)


def test_augmentation_uniform_over_dihedral_group():
    """The augment distribution equals the reference's: uniform over the
    square's 8 symmetries (rot90^k x flips composition)."""
    from collections import Counter
    from resdepth_tpu.data.pipeline import _augment

    x = jnp.arange(4.0).reshape(1, 2, 2, 1)
    counts = Counter()
    for i in range(800):
        out = np.asarray(_augment(x, jax.random.PRNGKey(i)))[0, :, :, 0]
        counts[tuple(out.ravel().tolist())] += 1
    assert len(counts) == 8
    assert min(counts.values()) / 800 > 0.07


def test_two_d_mesh_inference_equivalence(make_geotiff):
    """Tile-sharded full-scene inference over a 2-D (dcn x ici) mesh ==
    single-device scene (partial canvases psum over both axes)."""
    import jax

    from resdepth_tpu.infer.tiled import predict_linear_blend
    from resdepth_tpu.models.unet import UNetConfig, init_unet
    from resdepth_tpu.parallel.mesh import data_mesh_2d

    paths, dsm, gt, images = _scene(make_geotiff)
    entry = {
        "raster_in": paths["raster_in"], "raster_gt": paths["raster_gt"],
        "image_list": paths["image_list"], "image_pairs": [(0, 1)],
        "area_defn": {"x_extent": [(0, 79)], "y_extent": [(0, 63)]},
    }
    ds = TileDataset(entry, input_channels="geom-stereo", tile_size=16,
                     sampling_strategy="test", dsm_std=5.0, ortho_mean=120.0,
                     ortho_std=25.0)
    config = UNetConfig(n_input_channels=3, start_kernel=4, max_filter_depth=8,
                        depth=2)
    params, bn = init_unet(jax.random.PRNGKey(0), config)

    single = predict_linear_blend(config, params, bn, ds, batch_size=2,
                                  mesh=None, use_pallas=False)
    sharded = predict_linear_blend(config, params, bn, ds, batch_size=2,
                                   mesh=data_mesh_2d(2, 8), use_pallas=False)
    np.testing.assert_allclose(sharded, single, rtol=0, atol=1e-3)


def test_tile_size_exceeding_region_raises_clearly(make_geotiff):
    """Unfittable tiles fail at dataset construction with an actionable
    message, not a raw sampling/gather error: training regions must contain
    the tile (the reference crashes in np.linspace there); val/test grids may
    clamp into neighbouring raster area, so they only fail when the clamped
    origin would leave the raster."""
    paths, dsm, gt, images = _scene(make_geotiff)
    entry = {
        "raster_in": paths["raster_in"], "raster_gt": paths["raster_gt"],
        "image_list": paths["image_list"], "image_pairs": [(0, 1)],
        "area_defn": {"x_extent": [(0, 79)], "y_extent": [(0, 63)]},
        "n_samples": 4,
    }
    with pytest.raises(ValueError, match="tile_size 256 cannot fit"):
        TileDataset(entry, input_channels="geom-stereo", tile_size=256,
                    sampling_strategy="test", dsm_std=5.0, ortho_mean=120.0,
                    ortho_std=25.0)
    with pytest.raises(ValueError, match="tile_size 32 exceeds a training"):
        TileDataset(dict(entry, area_defn={"x_extent": [(40, 59)],
                                           "y_extent": [(0, 63)]}),
                    input_channels="geom-stereo", tile_size=32,
                    sampling_strategy="train", dsm_std=5.0, ortho_mean=120.0,
                    ortho_std=25.0)


def test_missing_nodata_tag_raises_clearly(tmp_path):
    """A DSM GeoTIFF without a NODATA tag fails at construction naming the
    file (the reference crashes in np.array(None).astype on this,
    lib/DsmOrthoDataset.py:303-305)."""
    from resdepth_tpu.geo import tiff as tiff_mod

    path = str(tmp_path / "no_nodata.tif")
    tiff_mod.write(path, np.zeros((32, 32), np.float32),
                   geotransform=(0, 1, 0, 0, 0, -1))
    entry = {"raster_in": path,
             "area_defn": {"x_extent": [(0, 31)], "y_extent": [(0, 31)]}}
    with pytest.raises(ValueError, match="no_nodata.tif.*no NODATA tag"):
        TileDataset(entry, input_channels="geom", tile_size=16,
                    sampling_strategy="test", dsm_std=5.0)


def test_subtile_region_clamps_like_reference(make_geotiff):
    """A val/test region NARROWER than the tile is served by a single tile
    clamped inward so its trailing edge lands on the region border
    (lib/rasterutils.py:161-177) — in-region output must equal the model's
    prediction on that clamped tile (weight 1 across the whole region)."""
    from resdepth_tpu.models.unet import apply_unet, fold_serving

    paths, dsm, *_ = _scene(make_geotiff, rows=32, cols=80)
    # interior stripe of 20 px, tile 32: clamped origin x = 59 - 32 + 1 = 28
    entry = {"raster_in": paths["raster_in"],
             "area_defn": {"x_extent": [(40, 59)], "y_extent": [(0, 31)]}}
    ds = TileDataset(entry, input_channels="geom", tile_size=32,
                     sampling_strategy="test", dsm_std=5.0)
    assert [tuple(p) for p in ds.positions] == [(0, 28)]
    assert [tuple(b) for b in ds.valid_bounds] == [(0, 12, 31, 31)]

    config = UNetConfig(n_input_channels=1, start_kernel=4, max_filter_depth=8,
                        depth=2)
    params, bn = init_unet(jax.random.PRNGKey(0), config)
    scene = predict_linear_blend(config, params, bn, ds, batch_size=1,
                                 use_pallas=False)

    fc, fp, fb = fold_serving(config, params, bn)
    tile_in = dsm[0:32, 28:60]
    mean = float(tile_in[tile_in != -9999.0].mean())
    x = ((tile_in - mean) / 5.0)[None, ..., None]
    pred, _ = apply_unet(fc, fp, fb, jnp.asarray(x), train=False)
    expected = np.asarray(pred)[0, ..., 0] * 5.0 + mean

    np.testing.assert_allclose(scene[0:32, 40:60], expected[:, 12:32],
                               rtol=0, atol=1e-4)
    # nothing written right of the region; the clamp band left of it may
    # carry partial ramp weights (cropped by the CLI's region export)
    assert np.all(scene[:, 60:] == 0.0)


def test_predict_experimental_precision_modes(make_geotiff):
    """fast32/act2pass/balanced (string compute_dtype modes) run and agree
    with the f32 path within their documented deviation scale."""
    paths, dsm, *_ = _scene(make_geotiff, rows=48, cols=48)
    entry = {"raster_in": paths["raster_in"],
             "area_defn": {"x_extent": [(0, 47)], "y_extent": [(0, 47)]}}
    ds = TileDataset(entry, input_channels="geom", tile_size=16,
                     sampling_strategy="test", dsm_std=5.0)
    config = UNetConfig(n_input_channels=1, start_kernel=4, max_filter_depth=8,
                        depth=2)
    params, bn_state = init_unet(jax.random.PRNGKey(1), config)

    from resdepth_tpu.models.unet import SERVING_PRECISION_MODES, serving_precision

    ref = predict_linear_blend(config, params, bn_state, ds, batch_size=3)
    for mode in SERVING_PRECISION_MODES:
        out = predict_linear_blend(config, params, bn_state, ds, batch_size=3,
                                   compute_dtype=mode)
        assert np.isfinite(out).all()
        bf16_trunk = serving_precision(mode).mixed
        if bf16_trunk:
            # bf16 activation storage quantizes even on CPU; on a random-init
            # net a pre-activation near a ReLU boundary can flip at isolated
            # pixels, so assert at the distribution level.
            # Sanity bounds only — budget qualification happens on trained
            # weights in scripts/precision_study.py, not on this random net
            # (whose near-zero pre-activations can flip ReLU branches under
            # bf16, producing isolated meter-scale outlier pixels).
            d = np.abs(out - ref)
            assert d.mean() < 0.1 and np.percentile(d, 99) < 2.0
        else:
            # CPU executes every MXU precision as exact f32, so the
            # f32-storage modes agree tightly there; on TPU they deviate at
            # the documented cm scale.
            np.testing.assert_allclose(out, ref, rtol=0.05, atol=0.1)


def test_dihedral_helpers_group_properties():
    """TTA transform helpers: invert(apply(x, g), g) == x for every dihedral
    element, the 8 images of an asymmetric tile are pairwise distinct, and
    each supported TTA count indexes a set CLOSED under composition (a
    subgroup — what makes the averaged predictor exactly invariant)."""
    from resdepth_tpu.infer.tiled import (TTA_SUBGROUPS, _dihedral_apply,
                                          _dihedral_invert)
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(2, 8, 8, 3)).astype(np.float32))

    images = []
    for g in range(8):
        xg = _dihedral_apply(x, g)
        np.testing.assert_array_equal(np.asarray(_dihedral_invert(xg, g)),
                                      np.asarray(x), err_msg=f"g={g}")
        images.append(np.asarray(xg))
    for a in range(8):
        for b in range(a + 1, 8):
            assert not np.array_equal(images[a], images[b]), (a, b)

    # Closure: composing any two elements of a subgroup stays inside it.
    def compose(a, b):
        """Index of the element equal to apply(apply(., b), a)."""
        probe = jnp.asarray(rng.normal(size=(1, 4, 4, 1)).astype(np.float32))
        target = np.asarray(_dihedral_apply(_dihedral_apply(probe, b), a))
        matches = [g for g in range(8)
                   if np.array_equal(np.asarray(_dihedral_apply(probe, g)),
                                     target)]
        assert len(matches) == 1
        return matches[0]

    for count, members in TTA_SUBGROUPS.items():
        for a in members:
            for b in members:
                assert compose(a, b) in members, (count, a, b)


@pytest.mark.parametrize("merge", ["mean", "median"])
def test_predict_tta_matches_host_oracle(make_geotiff, merge):
    """predict_linear_blend(tta=8) == a host oracle that transforms each
    normalised input tile by every dihedral element with INDEPENDENT numpy
    rot90/flip, runs the model, inverse-transforms, merges (numpy mean or
    median, per general.tta_merge), denormalises, and blends — pinning the
    transform/invert/merge wiring end to end on multi-channel (geom-stereo)
    inputs."""
    import dataclasses as _dc

    from resdepth_tpu.models.unet import apply_unet

    paths, dsm, gt, images = _scene(make_geotiff, rows=48, cols=48)
    entry = {"raster_in": paths["raster_in"],
             "image_list": paths["image_list"], "image_pairs": [(0, 1)],
             "area_defn": {"x_extent": [(0, 47)], "y_extent": [(0, 47)]}}
    ds = TileDataset(entry, input_channels="geom-stereo", tile_size=16,
                     sampling_strategy="test", dsm_std=5.0, ortho_mean=120.0,
                     ortho_std=25.0)
    config = UNetConfig(n_input_channels=3, start_kernel=4, max_filter_depth=8,
                        depth=2)
    params, bn_state = init_unet(jax.random.PRNGKey(1), config)

    out = predict_linear_blend(config, params, bn_state, ds, batch_size=3,
                               tta=8, tta_merge=merge)

    # Host oracle. Reuse the fused gather/normalise stage for input assembly
    # (its parity has its own oracle above); the dihedral machinery under
    # test is reimplemented here with plain numpy.
    spec = _dc.replace(
        batch_spec_for(ds, transform_dsm=True, transform_orthos=True,
                       augment=False),
        use_bounds=False, has_target=False)
    rasters = device_put_dataset(ds)
    rasters = _dc.replace(rasters, dsm_target=None)
    n = len(ds)
    batch = build_batch(rasters, jnp.asarray(ds.positions),
                        jnp.asarray(ds.pair_indices),
                        jnp.zeros((n, 4), jnp.int32),
                        jax.random.PRNGKey(0), spec)
    x = np.asarray(batch["input"])
    means = np.asarray(batch["dsm_mean"])

    all_preds = []
    for g in range(8):
        xg = x.copy()
        if g >= 4:
            xg = np.flip(xg, axis=2)
        xg = np.rot90(xg, k=g % 4, axes=(1, 2))
        pg, _ = apply_unet(config, params, bn_state, jnp.asarray(xg),
                           train=False)
        pg = np.asarray(pg)[..., 0]
        pg = np.rot90(pg, k=-(g % 4), axes=(1, 2))
        if g >= 4:
            pg = np.flip(pg, axis=2)
        all_preds.append(pg)
    stacked = np.stack(all_preds)
    preds = (np.median(stacked, axis=0) if merge == "median"
             else stacked.mean(axis=0))

    expected = np.zeros_like(dsm)
    t = ds.tile_size
    for i in range(n):
        y, xc = ds.positions[i]
        denorm = preds[i] * ds.dsm_std + means[i]
        weights = blend.tile_weights(t, ds.stride, ds.valid_bounds[i])
        expected[y:y + t, xc:xc + t] += denorm * weights
    np.testing.assert_allclose(out, expected, rtol=1e-4, atol=1e-3)


def test_predict_tta_rejects_non_subgroup_counts(make_geotiff):
    paths, *_ = _scene(make_geotiff)
    entry = {"raster_in": paths["raster_in"],
             "area_defn": {"x_extent": [(0, 79)], "y_extent": [(0, 63)]}}
    ds = TileDataset(entry, input_channels="geom", tile_size=16,
                     sampling_strategy="test", dsm_std=5.0)
    config = UNetConfig(n_input_channels=1, start_kernel=4, max_filter_depth=8,
                        depth=2)
    params, bn_state = init_unet(jax.random.PRNGKey(0), config)
    with pytest.raises(ValueError, match="tta"):
        predict_linear_blend(config, params, bn_state, ds, tta=3)


def test_tta1_merge_mode_reuses_compiled_program(make_geotiff):
    """tta_merge is a no-op at tta=1 but keys the lru_cache'd jitted scene
    program — _predict_tiles must normalize it so tta=1 + 'median' reuses
    the tta=1 + 'mean' compilation instead of recompiling an identical
    program (ADVICE r3)."""
    from resdepth_tpu.infer import tiled as tiled_mod

    paths, dsm, gt, images = _scene(make_geotiff, rows=32, cols=32)
    entry = {"raster_in": paths["raster_in"],
             "image_list": paths["image_list"], "image_pairs": [(0, 1)],
             "area_defn": {"x_extent": [(0, 31)], "y_extent": [(0, 31)]}}
    ds = TileDataset(entry, input_channels="geom-stereo", tile_size=16,
                     sampling_strategy="test", dsm_std=5.0, ortho_mean=120.0,
                     ortho_std=25.0)
    config = UNetConfig(n_input_channels=3, start_kernel=4, max_filter_depth=8,
                        depth=2)
    params, bn_state = init_unet(jax.random.PRNGKey(1), config)

    out_mean = predict_linear_blend(config, params, bn_state, ds,
                                    batch_size=3, tta=1, tta_merge="mean")
    before = tiled_mod._make_scene_fn.cache_info()
    out_median = predict_linear_blend(config, params, bn_state, ds,
                                      batch_size=3, tta=1, tta_merge="median")
    after = tiled_mod._make_scene_fn.cache_info()
    assert after.misses == before.misses, \
        "tta=1 + median recompiled a program identical to tta=1 + mean"
    np.testing.assert_array_equal(out_mean, out_median)
