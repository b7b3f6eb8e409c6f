"""Geo layer: TIFF codec round-trips, extents, grids, allocation, masks."""

import numpy as np
import pytest
from scipy import ndimage

from resdepth_tpu.geo import allocation, grid, raster, tiff


# ------------------------------- TIFF codec ------------------------------- #

@pytest.mark.parametrize("compress", ["none", "deflate", "lzw"])
@pytest.mark.parametrize("dtype", [np.float32, np.uint8, np.int16, np.uint16, np.float64])
def test_tiff_roundtrip(tmp_path, compress, dtype):
    rng = np.random.default_rng(0)
    if np.issubdtype(dtype, np.floating):
        data = rng.normal(400.0, 30.0, (37, 53)).astype(dtype)
    else:
        data = rng.integers(0, np.iinfo(dtype).max, (37, 53)).astype(dtype)
    path = str(tmp_path / f"rt_{compress}_{np.dtype(dtype).name}.tif")
    gt = (465000.0, 0.25, 0.0, 5247000.0, 0.0, -0.25)
    tiff.write(path, data, geotransform=gt, nodata=-9999.0, compress=compress)

    out, info = tiff.read(path)
    np.testing.assert_array_equal(out, data)
    assert info.nodata == -9999.0
    np.testing.assert_allclose(info.geotransform, gt)


def test_tiff_multiband_roundtrip(tmp_path):
    data = np.random.default_rng(1).normal(size=(20, 30, 3)).astype(np.float32)
    path = str(tmp_path / "mb.tif")
    tiff.write(path, data, compress="deflate")
    out, info = tiff.read(path)
    assert out.shape == (20, 30, 3)
    np.testing.assert_array_equal(out, data)


def test_tiff_multistrip(tmp_path):
    # Force multiple strips: > 1 MiB of data
    data = np.arange(600 * 600, dtype=np.float32).reshape(600, 600)
    path = str(tmp_path / "big.tif")
    tiff.write(path, data, compress="deflate")
    out, _ = tiff.read(path)
    np.testing.assert_array_equal(out, data)


def test_lzw_codec_pure():
    rng = np.random.default_rng(2)
    payload = rng.integers(0, 8, 5000).astype(np.uint8).tobytes() + b"\x00" * 1000
    encoded = tiff._lzw_encode(payload)
    assert tiff._lzw_decode_py(encoded) == payload


def test_raster_extent_matches_reference_convention(make_geotiff):
    path = make_geotiff("dsm.tif", np.zeros((40, 60), np.float32),
                        gsd=0.25, origin=(1000.0, 2000.0))
    extent = raster.get_raster_extent(path)
    assert extent["cols"] == 60 and extent["rows"] == 40
    assert extent["minX"] == 1000.0
    assert extent["maxX"] == 1000.0 + 60 * 0.25
    assert extent["maxY"] == 2000.0
    assert extent["minY"] == 2000.0 - 40 * 0.25
    assert extent["gsdX"] == 0.25 and extent["gsdY"] == 0.25


def test_write_raster_offset_geotransform(make_geotiff, tmp_path):
    src = make_geotiff("src.tif", np.zeros((32, 32), np.float32),
                       gsd=0.5, origin=(100.0, 200.0))
    sub = np.ones((8, 8), np.float32)
    out_path = str(tmp_path / "sub.tif")
    raster.write_raster(out_path, sub, like=src, offset_x=4, offset_y=2, nodata=-1.0)
    loaded = raster.open_raster(out_path)
    assert loaded.geotransform[0] == 100.0 + 4 * 0.5
    assert loaded.geotransform[3] == 200.0 - 2 * 0.5
    assert loaded.nodata == -1.0


def test_load_mask_raster(make_geotiff):
    data = np.array([[1, 0, 1], [255, 1, 0]], dtype=np.uint8)
    path = make_geotiff("mask.tif", data, nodata=255)
    mask, nodata_mask = raster.load_mask_raster(path)
    np.testing.assert_array_equal(mask, [[True, False, True], [False, True, False]])
    np.testing.assert_array_equal(nodata_mask, [[False, False, False],
                                                [True, False, False]])


def test_dilate_mask_matches_scipy():
    rng = np.random.default_rng(3)
    mask = rng.random((25, 31)) > 0.9
    for iterations in (1, 2):
        ours = raster.dilate_mask(mask, iterations=iterations)
        scipys = ndimage.binary_dilation(mask, iterations=iterations)
        np.testing.assert_array_equal(ours, scipys)


# ------------------------------- Tile grids ------------------------------- #

def test_create_regular_grid_golden():
    """Hand-derived golden for a 16x16 region, tile 8, stride 4."""
    area = {"x_extent": [(0, 15)], "y_extent": [(0, 15)]}
    positions, borders = grid.create_regular_grid(area, tile_size=8, stride=4)
    assert positions == [(0, 0), (0, 4), (0, 8),
                         (4, 0), (4, 4), (4, 8),
                         (8, 0), (8, 4), (8, 8)]
    assert borders == [(0, 0, 3, 3), (0, 4, 3, 3), (0, 4, 3, 7),
                       (4, 0, 3, 3), (4, 4, 3, 3), (4, 4, 3, 7),
                       (4, 0, 7, 3), (4, 4, 7, 3), (4, 4, 7, 7)]


def test_create_regular_grid_nonoverlapping_partition():
    """stride == tile: exclusive regions partition the area exactly."""
    area = {"x_extent": [(0, 23)], "y_extent": [(0, 15)]}
    positions, borders = grid.create_regular_grid(area, tile_size=8, stride=8)
    cover = np.zeros((16, 24), np.int32)
    for (uly, ulx), (b_uly, b_ulx, b_lry, b_lrx) in zip(positions, borders):
        cover[uly + b_uly:uly + b_lry + 1, ulx + b_ulx:ulx + b_lrx + 1] += 1
    np.testing.assert_array_equal(cover, np.ones_like(cover))


def test_create_regular_grid_edge_shift():
    """Region not divisible by stride: edge tiles shift inward, still partition."""
    area = {"x_extent": [(0, 21)], "y_extent": [(0, 13)]}
    positions, borders = grid.create_regular_grid(area, tile_size=8, stride=8)
    for uly, ulx in positions:
        assert 0 <= uly <= 13 - 7 and 0 <= ulx <= 21 - 7
    cover = np.zeros((14, 22), np.int32)
    for (uly, ulx), (b_uly, b_ulx, b_lry, b_lrx) in zip(positions, borders):
        cover[uly + b_uly:uly + b_lry + 1, ulx + b_ulx:ulx + b_lrx + 1] += 1
    np.testing.assert_array_equal(cover, np.ones_like(cover))


def test_indices_from_area_defn():
    area = {"x_extent": [(0, 15), (20, 30)], "y_extent": [(0, 9), (5, 20)]}
    positions = grid.indices_from_area_defn(area, tile_size=8)
    # region 1: y in [0, 2], x in [0, 8] -> 3 * 9; region 2: y in [5, 13], x in [20, 23] -> 9 * 4
    assert len(positions) == 3 * 9 + 9 * 4
    assert positions[0] == (0, 0)
    assert (5, 20) in positions
    for y, x in positions:
        in_r1 = 0 <= x <= 8 and 0 <= y <= 2
        in_r2 = 20 <= x <= 23 and 5 <= y <= 13
        assert in_r1 or in_r2


# ------------------------------ Allocation -------------------------------- #

@pytest.mark.parametrize("strategy", ["5-crossval_vertical", "5-crossval_horizontal"])
@pytest.mark.parametrize("test_stripe", [0, 1, 2, 3, 4])
def test_allocate_data_partition(make_geotiff, strategy, test_stripe):
    path = make_geotiff("alloc.tif", np.zeros((50, 47), np.float32))
    train, val, test = allocation.allocate_data(path, strategy, test_stripe)

    axis = "x_extent" if strategy.endswith("vertical") else "y_extent"
    size = 47 if strategy.endswith("vertical") else 50
    width = int(round(size * 0.2))

    # val stripe is cyclically east/south of the test stripe
    val_stripe = (test_stripe + 1) % 5
    starts = [i * width for i in range(5)]
    ends = [s + width - 1 for s in starts[:-1]] + [size - 1]
    assert test[axis] == [(starts[test_stripe], ends[test_stripe])]
    assert val[axis] == [(starts[val_stripe], ends[val_stripe])]

    # train ∪ val ∪ test covers the axis exactly once
    covered = np.zeros(size, np.int32)
    for region in (train, val, test):
        for lo, hi in region[axis]:
            covered[lo:hi + 1] += 1
    np.testing.assert_array_equal(covered, np.ones(size, np.int32))

    # training regions are maximal merges: no two adjacent extents
    extents = sorted(train[axis])
    for (lo1, hi1), (lo2, hi2) in zip(extents, extents[1:]):
        assert lo2 > hi1 + 1


@pytest.mark.parametrize("test_stripe", [0, 1, 2, 3, 4])
def test_allocate_data_crossval(make_geotiff, test_stripe):
    path = make_geotiff("alloc2.tif", np.zeros((50, 50), np.float32))
    train, val, test = allocation.allocate_data(
        path, "5-crossval_vertical", test_stripe, crossval_training=True)
    assert test == {}
    width = int(round(50 * 0.2))
    assert val["x_extent"] == [(test_stripe * width,
                                test_stripe * width + width - 1 if test_stripe < 4 else 49)]
    covered = np.zeros(50, np.int32)
    for region in (train, val):
        for lo, hi in region["x_extent"]:
            covered[lo:hi + 1] += 1
    np.testing.assert_array_equal(covered, np.ones(50, np.int32))


def test_allocate_data_reference_goldens(make_geotiff):
    """Spot-check exact extents against the reference's unrolled tables
    (lib/data_allocation.py:129-203)."""
    path = make_geotiff("alloc3.tif", np.zeros((10, 100), np.float32))
    # width = 20; stripes: (0,19)(20,39)(40,59)(60,79)(80,99)
    train, val, test = allocation.allocate_data(path, "5-crossval_vertical", 1)
    assert train["x_extent"] == [(0, 19), (60, 99)]
    assert val["x_extent"] == [(40, 59)]
    assert test["x_extent"] == [(20, 39)]
    assert train["y_extent"] == [(0, 9), (0, 9)]

    train, val, test = allocation.allocate_data(path, "5-crossval_vertical", 4)
    assert train["x_extent"] == [(20, 79)]
    assert val["x_extent"] == [(0, 19)]
    assert test["x_extent"] == [(80, 99)]


def test_allocate_data_invalid_args(make_geotiff):
    path = make_geotiff("alloc4.tif", np.zeros((10, 10), np.float32))
    with pytest.raises(ValueError):
        allocation.allocate_data(path, "bogus", 0)
    with pytest.raises(ValueError):
        allocation.allocate_data(path, "5-crossval_vertical", 7)


# ----------------------------- native codec ------------------------------- #

def test_native_lzw_matches_python():
    """C++ LZW codec == pure-Python implementation, both directions."""
    pytest.importorskip("ctypes")
    from resdepth_tpu.geo import _native

    rng = np.random.default_rng(5)
    cases = [
        b"",
        b"\x00" * 10000,
        bytes(rng.integers(0, 256, 20000, dtype=np.uint8)),   # incompressible
        bytes(rng.integers(0, 4, 50000, dtype=np.uint8)),     # forces table resets
        np.arange(3000, dtype=np.float32).tobytes(),
    ]
    for payload in cases:
        enc_native = _native.lzw_encode(payload)
        enc_py = tiff._lzw_encode_py(payload)
        # Both encoders must round-trip through both decoders.
        assert _native.lzw_decode(enc_native) == payload
        assert tiff._lzw_decode_py(enc_native) == payload
        assert _native.lzw_decode(enc_py) == payload
        assert tiff._lzw_decode_py(enc_py) == payload


def test_native_packbits():
    from resdepth_tpu.geo import _native

    # literal run + repeat run + single byte
    encoded = bytes([2, 10, 20, 30]) + bytes([0x100 - 3, 7]) + bytes([0, 99])
    expected = bytes([10, 20, 30, 7, 7, 7, 7, 99])
    assert _native.packbits_decode(encoded) == expected
    assert tiff._packbits_decode_py(encoded) == expected


def test_lzw_tiff_roundtrip_uses_native(tmp_path):
    """Full-file LZW round trip exercises the native encode+decode path."""
    data = np.random.default_rng(9).normal(400, 20, (300, 257)).astype(np.float32)
    path = str(tmp_path / "lzw_native.tif")
    tiff.write(path, data, compress="lzw")
    out, _ = tiff.read(path)
    np.testing.assert_array_equal(out, data)


def test_undo_predictor_multiband():
    """Predictor-2 differencing is per sample component (TIFF 6.0 §14)."""
    rng = np.random.default_rng(4)
    original = rng.integers(0, 255, (5, 7, 3)).astype(np.uint8)
    # forward horizontal differencing per component
    diffed = original.copy()
    diffed[:, 1:, :] = original[:, 1:, :] - original[:, :-1, :]
    restored = tiff._undo_predictor(diffed.reshape(5, 7 * 3), 2, spp=3)
    np.testing.assert_array_equal(restored.reshape(5, 7, 3), original)
    # single band unchanged semantics
    single = rng.integers(0, 255, (4, 6)).astype(np.uint8)
    sdiff = single.copy()
    sdiff[:, 1:] = single[:, 1:] - single[:, :-1]
    np.testing.assert_array_equal(tiff._undo_predictor(sdiff, 2, spp=1), single)


def test_tiff_nan_nodata_roundtrip(tmp_path):
    data = np.ones((4, 4), np.float32)
    path = str(tmp_path / "nan.tif")
    tiff.write(path, data, nodata=float("nan"))
    _, info = tiff.read(path)
    assert np.isnan(info.nodata)


@pytest.mark.parametrize("seed", range(10))
def test_create_regular_grid_property(seed):
    """Random regions: full coverage, in-bounds tiles, exclusive partition."""
    rng = np.random.default_rng(seed)
    tile = int(rng.choice([8, 16]))
    # any tile/2 <= stride <= tile must blend to a partition of unity (the
    # CLI exposes general.tile_stride beyond the reference's fixed tile/2;
    # tile-1 exercises the degenerate 1-px overlap ramp)
    stride = int(rng.choice([tile, tile // 2, 3 * tile // 4,
                             tile // 2 + 1, tile - 1]))
    y0 = int(rng.integers(0, 5)); x0 = int(rng.integers(0, 5))
    y1 = y0 + tile + int(rng.integers(0, 40))
    x1 = x0 + tile + int(rng.integers(0, 40))
    area = {"x_extent": [(x0, x1)], "y_extent": [(y0, y1)]}
    positions, borders = grid.create_regular_grid(area, tile, stride)

    coverage = np.zeros((y1 + 1, x1 + 1), np.int32)
    exclusive = np.zeros_like(coverage)
    for (uly, ulx), (b_uly, b_ulx, b_lry, b_lrx) in zip(positions, borders):
        assert y0 <= uly and uly + tile - 1 <= y1
        assert x0 <= ulx and ulx + tile - 1 <= x1
        coverage[uly:uly + tile, ulx:ulx + tile] += 1
        if b_uly <= b_lry and b_ulx <= b_lrx:
            exclusive[uly + b_uly:uly + b_lry + 1,
                      ulx + b_ulx:ulx + b_lrx + 1] += 1
    region = np.s_[y0:y1 + 1, x0:x1 + 1]
    assert (coverage[region] >= 1).all()          # full coverage
    if stride == tile:
        np.testing.assert_array_equal(exclusive[region], 1)  # exact partition
    # blend weights are a partition of unity for any stride
    wy, wx = __import__("resdepth_tpu.ops.blend", fromlist=["blend"]).weight_table(
        tile, stride, borders)
    acc = np.zeros((y1 + 1, x1 + 1))
    for i, (uly, ulx) in enumerate(positions):
        acc[uly:uly + tile, ulx:ulx + tile] += np.outer(wy[i], wx[i])
    np.testing.assert_allclose(acc[region], 1.0, atol=1e-5)


def test_tiff_tiled_organization_read(tmp_path):
    """Tile-organised TIFFs (TileWidth/TileLength/TileOffsets — what GDAL
    writes with -co TILED=YES) decode correctly, including edge tiles whose
    padding must be cropped. The file is hand-assembled (our writer emits
    strips) and cross-validated with PIL."""
    import struct as st

    rows, cols, tw, tl = 48, 40, 32, 32
    rng = np.random.default_rng(5)
    img = rng.normal(0, 100, (rows, cols)).astype(np.float32)

    tiles_across = -(-cols // tw)
    tiles_down = -(-rows // tl)
    tile_blobs = []
    for ty in range(tiles_down):
        for tx in range(tiles_across):
            block = np.zeros((tl, tw), np.float32)
            ys, xs = ty * tl, tx * tw
            h, w = min(tl, rows - ys), min(tw, cols - xs)
            block[:h, :w] = img[ys:ys + h, xs:xs + w]
            tile_blobs.append(block.tobytes())

    tags = [
        (256, 4, [cols]), (257, 4, [rows]), (258, 3, [32]), (259, 3, [1]),
        (262, 3, [1]), (277, 3, [1]), (322, 4, [tw]), (323, 4, [tl]),
        (339, 3, [3]),
    ]
    n_tiles = len(tile_blobs)
    n_entries = len(tags) + 2  # + TileOffsets, TileByteCounts
    ifd_off = 8
    data_start = ifd_off + 2 + n_entries * 12 + 4
    # out-of-line arrays: tile offsets + counts (4 bytes each)
    arrays_off = data_start
    tiles_off = arrays_off + 2 * 4 * n_tiles
    offsets = []
    pos = tiles_off
    for blob in tile_blobs:
        offsets.append(pos)
        pos += len(blob)

    def entry(tag, ftype, values, value_offset=None):
        size = {3: 2, 4: 4}[ftype]
        count = len(values)
        if count * size <= 4:
            payload = st.pack(f"<{count}{'H' if ftype == 3 else 'I'}", *values)
            payload += b"\x00" * (4 - len(payload))
            return st.pack("<HHI", tag, ftype, count) + payload
        return st.pack("<HHII", tag, ftype, count, value_offset)

    blob = bytearray(st.pack("<2sHI", b"II", 42, ifd_off))
    blob += st.pack("<H", n_entries)
    all_tags = tags + [(324, 4, offsets), (325, 4, [len(b) for b in tile_blobs])]
    all_tags.sort(key=lambda t: t[0])
    arr_cursor = arrays_off
    for tag, ftype, values in all_tags:
        if len(values) * 4 > 4 and tag in (324, 325):
            blob += entry(tag, ftype, values, arr_cursor)
            arr_cursor += 4 * len(values)
        else:
            blob += entry(tag, ftype, values)
    blob += st.pack("<I", 0)  # next IFD
    for tag, ftype, values in all_tags:
        if len(values) * 4 > 4 and tag in (324, 325):
            blob += st.pack(f"<{len(values)}I", *values)
    for tile_blob in tile_blobs:
        blob += tile_blob

    path = str(tmp_path / "tiled.tif")
    open(path, "wb").write(bytes(blob))

    got, info = tiff.read(path)
    np.testing.assert_array_equal(got, img)

    from PIL import Image
    pil = np.asarray(Image.open(path))
    np.testing.assert_array_equal(pil, img)  # the handmade file is valid


def test_tiff_big_endian_read(tmp_path):
    """Motorola-order ('MM') classic TIFFs decode correctly: header, tag
    values and big-endian samples (PIL cross-validates the test file)."""
    import struct as st

    rows, cols = 6, 9
    rng = np.random.default_rng(11)
    img = rng.normal(100.0, 25.0, (rows, cols)).astype(np.float32)
    payload = img.astype(">f4").tobytes()

    tags = [(256, 4, cols), (257, 4, rows), (258, 3, 32), (259, 3, 1),
            (262, 3, 1), (273, 4, "DATA"), (277, 3, 1), (278, 4, rows),
            (279, 4, len(payload)), (339, 3, 3)]
    n = len(tags)
    ifd = 8
    data_off = ifd + 2 + n * 12 + 4
    blob = bytearray(st.pack(">2sHI", b"MM", 42, ifd))
    blob += st.pack(">H", n)
    for tag, ftype, value in tags:
        if value == "DATA":
            value = data_off
        if ftype == 3:
            blob += st.pack(">HHIHH", tag, ftype, 1, value, 0)
        else:
            blob += st.pack(">HHII", tag, ftype, 1, value)
    blob += st.pack(">I", 0)
    blob += payload
    path = str(tmp_path / "bigendian.tif")
    open(path, "wb").write(bytes(blob))

    got, info = tiff.read(path)
    np.testing.assert_array_equal(got, img)
    assert got.dtype.byteorder in ("=", "<")  # native layout out

    from PIL import Image
    np.testing.assert_array_equal(np.asarray(Image.open(path)), img)


def test_tiff_write_float_predictor_default(tmp_path):
    """Compressed float writes default to predictor 3: smaller files (GDAL's
    PREDICTOR=3 practice), bit-exact round-trip, PIL-readable."""
    rng = np.random.default_rng(2)
    yy, xx = np.mgrid[0:128, 0:128].astype(np.float32)
    dsm = (400 + 5 * np.sin(yy / 9) + 4 * np.cos(xx / 11)
           + rng.normal(0, 0.05, (128, 128))).astype(np.float32)

    plain = str(tmp_path / "plain.tif")
    pred = str(tmp_path / "pred.tif")
    tiff.write(plain, dsm, predictor=False)
    tiff.write(pred, dsm)  # float default: predictor on

    for path in (plain, pred):
        back, _ = tiff.read(path)
        np.testing.assert_array_equal(back, dsm)
    import os as _os
    assert _os.path.getsize(pred) < _os.path.getsize(plain)

    from PIL import Image
    np.testing.assert_array_equal(np.asarray(Image.open(pred)), dsm)

    # integer data never gets the float predictor
    ints = str(tmp_path / "ints.tif")
    tiff.write(ints, (dsm * 100).astype(np.int32))
    back, info = tiff.read(ints)
    np.testing.assert_array_equal(back, (dsm * 100).astype(np.int32))
    assert int(info.tags.get(317, 1)) == 1


def _fp_predictor_tiff(path, img, spp=1):
    """Hand-assemble a predictor-3 (floating-point differencing) deflate
    TIFF the way libtiff's fpDiff does: per row, shuffle sample bytes into
    MSB-first byte planes, then difference with stride spp."""
    import struct as st
    import zlib

    rows, cols = img.shape[:2]
    itemsize = img.dtype.itemsize
    n_samples = cols * spp

    def fp_diff_row(row_bytes):
        arr = np.frombuffer(row_bytes, np.uint8).reshape(n_samples, itemsize)
        planes = arr[:, ::-1].T.copy()          # plane 0 = MSB
        flat = planes.reshape(-1).astype(np.int16)
        diff = flat.copy()
        diff[spp:] = flat[spp:] - flat[:-spp]
        return (diff % 256).astype(np.uint8).tobytes()

    payload = b"".join(fp_diff_row(img[r].tobytes()) for r in range(rows))
    comp = zlib.compress(payload)
    bits = itemsize * 8

    tags = [(256, 4, [cols]), (257, 4, [rows]), (258, 3, [bits] * spp),
            (259, 3, [8]), (262, 3, [1]), (273, 4, "DATA"), (277, 3, [spp]),
            (278, 4, [rows]), (279, 4, [len(comp)]), (317, 3, [3]),
            (339, 3, [3] * spp)]
    n = len(tags)
    ifd = 8
    extra_off = ifd + 2 + n * 12 + 4
    extra = bytearray()
    entries = bytearray()
    for tag, ftype, vals in tags:
        size = {3: 2, 4: 4}[ftype]
        if vals == "DATA":
            entries += st.pack("<HHII", tag, ftype, 1, 0)  # patched below
            data_entry_pos = len(entries) - 4
            continue
        count = len(vals)
        fmt = "H" if ftype == 3 else "I"
        packed = st.pack(f"<{count}{fmt}", *vals)
        if len(packed) <= 4:
            entries += st.pack("<HHI", tag, ftype, count) + \
                packed + b"\x00" * (4 - len(packed))
        else:
            entries += st.pack("<HHII", tag, ftype, count,
                               extra_off + len(extra))
            extra += packed
    data_off = extra_off + len(extra)
    st.pack_into("<I", entries, data_entry_pos, data_off)
    blob = st.pack("<2sHI", b"II", 42, ifd) + st.pack("<H", n) + \
        bytes(entries) + st.pack("<I", 0) + bytes(extra) + comp
    open(path, "wb").write(blob)


@pytest.mark.parametrize("spp,dt", [(1, np.float32), (2, np.float32),
                                    (1, np.float64)])
def test_tiff_float_predictor_read(tmp_path, spp, dt):
    """Predictor 3 (floating-point horizontal differencing — GDAL's
    PREDICTOR=3 for float DSMs) decodes correctly for single- and
    multi-band float32/float64; PIL (libtiff) validates the test files."""
    rows, cols = 20, 17
    rng = np.random.default_rng(9)
    shape = (rows, cols) if spp == 1 else (rows, cols, spp)
    img = rng.normal(400.0, 50.0, shape).astype(dt)

    path = str(tmp_path / f"p3_{spp}_{np.dtype(dt).name}.tif")
    _fp_predictor_tiff(path, img, spp=spp)

    got, info = tiff.read(path)
    np.testing.assert_array_equal(got, img)

    if spp == 1 and dt is np.float32:  # PIL reads mode-F single-band floats
        from PIL import Image
        np.testing.assert_array_equal(np.asarray(Image.open(path)), img)
    """EOI must be written at the width the decoder reads it with: the
    decoder adds a table entry for the FINAL data code and applies the
    early-change bump before reading EOI (libtiff LZWPostEncode semantics).
    Inputs whose final code lands exactly on a width boundary round-trip."""
    from resdepth_tpu.geo import _native

    def distinct_pair_seq(n):
        seq, a = [], 0
        while len(seq) < n:
            for k in range(1, 256):
                seq += [a, k]
                if len(seq) >= n:
                    break
            a += 1
        return bytes(seq[:n])

    # 9->10-bit boundary and the 12-bit table-full CLEAR region, both under
    # 1-code-per-byte input
    for n in list(range(760, 775)) + list(range(3834, 3846)):
        payload = distinct_pair_seq(n)
        assert tiff._lzw_decode_py(tiff._lzw_encode_py(payload)) == payload, n
        assert _native.lzw_decode(_native.lzw_encode(payload)) == payload, n
        # cross-implementation agreement
        assert _native.lzw_decode(tiff._lzw_encode_py(payload)) == payload, n
        assert tiff._lzw_decode_py(_native.lzw_encode(payload)) == payload, n


def test_tiff_corrupt_headers_fail_fast(tmp_path):
    """Corrupt tag counts / dimensions raise clean ValueErrors instead of
    preallocating gigabytes (fuzzing found f.read(total) hangs on 1-core
    hosts when a mutated count claimed multi-GB tag payloads)."""
    import struct

    good = str(tmp_path / "good.tif")
    tiff.write(good, np.ones((32, 32), np.float32),
               geotransform=(0, 1, 0, 0, 0, -1), nodata=0.0)
    blob = bytearray(open(good, "rb").read())

    # find a multi-valued out-of-line tag entry and blow up its count
    (ifd_off,) = struct.unpack("<I", blob[4:8])
    (n_entries,) = struct.unpack("<H", blob[ifd_off:ifd_off + 2])
    corrupted = None
    for k in range(n_entries):
        base = ifd_off + 2 + k * 12
        tag, ftype, count = struct.unpack_from("<HHI", blob, base)
        if count > 2:  # out-of-line payload
            corrupted = bytearray(blob)
            struct.pack_into("<I", corrupted, base + 4, 0x7FFFFFFF)
            break
    assert corrupted is not None
    bad = str(tmp_path / "bad_count.tif")
    open(bad, "wb").write(bytes(corrupted))
    with pytest.raises(ValueError, match="exceeds the file size"):
        tiff.read(bad)

    # blow up ImageLength (tag 257): allocation guard must trip
    corrupted = bytearray(blob)
    for k in range(n_entries):
        base = ifd_off + 2 + k * 12
        tag, ftype, count = struct.unpack_from("<HHI", blob, base)
        if tag == 257:
            struct.pack_into("<I", corrupted, base + 8, 0xFFFFFFF0)
    bad2 = str(tmp_path / "bad_rows.tif")
    open(bad2, "wb").write(bytes(corrupted))
    with pytest.raises(ValueError, match="sanity limit"):
        tiff.read(bad2)


def test_write_raster_fills_masked_arrays(make_geotiff, tmp_path):
    """A np.ma.MaskedArray export fills masked cells with nodata — the mask
    must be honoured BEFORE any np.asarray call strips it (else the raw
    under-mask values leak into the GeoTIFF)."""
    from resdepth_tpu.geo import raster as raster_mod

    base = make_geotiff("base.tif", np.full((6, 8), 5.0, np.float32))
    data = np.ma.masked_array(np.arange(48, dtype=np.float32).reshape(6, 8),
                              mask=np.zeros((6, 8), bool))
    data[2, 3] = np.ma.masked
    data[5, 0] = np.ma.masked

    out = str(tmp_path / "masked.tif")
    raster_mod.write_raster(out, data, like=base, nodata=-9999.0,
                            dtype=np.float32)
    back = raster_mod.open_raster(out).band()
    assert back[2, 3] == -9999.0
    assert back[5, 0] == -9999.0
    np.testing.assert_array_equal(back[0], np.arange(8, dtype=np.float32))


@pytest.mark.parametrize("seed", range(12))
def test_blend_partition_subtile_regions(seed):
    """Regions NARROWER than the tile (served by a single inward-clamped tile
    per axis — lib/rasterutils.py:161-177) still blend to a partition of
    unity over the region for every supported stride. The reference's own
    blend-weight code crashes on stride < span < tile
    (lib/evaluation.py:541-545); ops/blend.py generalises it."""
    rng = np.random.default_rng(seed)
    tile = int(rng.choice([8, 16, 32]))
    stride = int(rng.choice([tile, tile // 2, 3 * tile // 4,
                             tile // 2 + 1, tile - 1]))

    def axis_range(span):
        # trailing edge must leave room for the clamped origin (>= 0)
        lo = max(span - 1, tile - 1)
        trailing = lo + int(rng.integers(0, 8))
        return trailing - span + 1, trailing

    span_y = int(rng.integers(2, tile + 1))       # sub-tile or exactly tile
    span_x = int(rng.integers(2, 3 * tile))       # mixes sub- and multi-tile
    y0, y1 = axis_range(span_y)
    x0, x1 = axis_range(span_x)
    area = {"x_extent": [(x0, x1)], "y_extent": [(y0, y1)]}
    positions, borders = grid.create_regular_grid(area, tile, stride)
    assert positions, area

    from resdepth_tpu.ops import blend
    wy, wx = blend.weight_table(tile, stride, borders)
    acc = np.zeros((y1 + tile, x1 + tile))
    for i, (uly, ulx) in enumerate(positions):
        assert 0 <= uly and uly + tile - 1 <= y1    # clamped into the raster
        assert 0 <= ulx and ulx + tile - 1 <= x1
        acc[uly:uly + tile, ulx:ulx + tile] += np.outer(wy[i], wx[i])
    np.testing.assert_allclose(acc[y0:y1 + 1, x0:x1 + 1], 1.0, atol=1e-5)


def test_tiff_interop_with_pillow(tmp_path):
    """Cross-library validation: Pillow reads our files, we read Pillow's."""
    PIL_Image = pytest.importorskip("PIL.Image")

    # ours -> Pillow (float32, deflate)
    data = np.random.default_rng(11).normal(400, 20, (30, 41)).astype(np.float32)
    ours_path = str(tmp_path / "ours.tif")
    tiff.write(ours_path, data, compress="deflate", nodata=-9999.0)
    with PIL_Image.open(ours_path) as img:
        pil_view = np.asarray(img)
    np.testing.assert_array_equal(pil_view, data)

    # Pillow -> ours (uint8 and float32, multiple compressions)
    for mode_data, mode in ((np.random.default_rng(12).integers(
            0, 255, (25, 33)).astype(np.uint8), None),
            (data, "F")):
        for compression in (None, "tiff_lzw", "tiff_adobe_deflate"):
            pil_path = str(tmp_path / f"pil_{mode}_{compression}.tif")
            PIL_Image.fromarray(mode_data, mode=mode).save(
                pil_path, compression=compression)
            out, _ = tiff.read(pil_path)
            np.testing.assert_array_equal(out, mode_data)


@pytest.mark.parametrize("compress", ["none", "deflate"])
def test_bigtiff_roundtrip(tmp_path, compress):
    """BigTIFF (magic 43, 8-byte offsets) write + read."""
    rng = np.random.default_rng(13)
    data = rng.normal(400.0, 20.0, (50, 70)).astype(np.float32)
    path = str(tmp_path / f"big_{compress}.tif")
    gt = (465000.0, 0.25, 0.0, 5247000.0, 0.0, -0.25)
    tiff.write(path, data, geotransform=gt, nodata=-9999.0, compress=compress,
               bigtiff=True)
    with open(path, "rb") as f:
        assert f.read(4) == b"II+\x00"  # BigTIFF magic
    out, info = tiff.read(path)
    np.testing.assert_array_equal(out, data)
    assert info.nodata == -9999.0
    np.testing.assert_allclose(info.geotransform, gt)


def test_bigtiff_interop_with_pillow(tmp_path):
    PIL_Image = pytest.importorskip("PIL.Image")
    data = np.random.default_rng(14).integers(0, 255, (20, 30)).astype(np.uint8)
    path = str(tmp_path / "big_pil.tif")
    tiff.write(path, data, compress="none", bigtiff=True)
    with PIL_Image.open(path) as img:
        np.testing.assert_array_equal(np.asarray(img), data)


def test_tiff_rejects_malformed(tmp_path):
    """Truncated or corrupt files fail fast with clear errors, never hang."""
    not_tiff = tmp_path / "not.tif"
    not_tiff.write_bytes(b"PNG garbage here")
    with pytest.raises(ValueError, match="Not a TIFF"):
        tiff.read(str(not_tiff))

    bad_magic = tmp_path / "magic.tif"
    bad_magic.write_bytes(b"II\x2a\x01" + b"\x00" * 16)
    with pytest.raises(ValueError, match="Unsupported TIFF magic"):
        tiff.read(str(bad_magic))

    # Valid file truncated mid-data: read raises (struct/decompress error)
    good = tmp_path / "good.tif"
    tiff.write(str(good), np.ones((20, 20), np.float32), compress="deflate")
    payload = good.read_bytes()
    truncated = tmp_path / "trunc.tif"
    truncated.write_bytes(payload[: len(payload) // 2])
    with pytest.raises(Exception):
        tiff.read(str(truncated))
