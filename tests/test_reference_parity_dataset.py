"""Per-sample data-path parity against the ACTUAL reference dataset + loss.

The reference's ``DsmOrthoDataset.__getitem__`` (/root/reference/lib/
DsmOrthoDataset.py:161-291) is the most intricate per-sample transformation
in the codebase: patch slicing, nodata/bounds loss masks (incl. the ``!= 0``
quirk at :462), per-patch masked mean centring, joint-view ortho
normalisation, and channel assembly per input mode. Our device-side
``build_batch`` (resdepth_tpu/data/pipeline.py) re-derives all of it from
SURVEY.md; these tests close the self-oracle loophole by instantiating the
REAL reference dataset (GDAL replaced by in-memory fakes, torchvision's
``ToTensor``/``Normalize`` by a faithful float-array stub — torchvision is
not installed here) and asserting sample-for-sample agreement on every
strategy x channel-mode combination that is RNG-free (augmentation off,
in-pair permutation off; for 'train' the reference's sampled positions are
read back and fed to both sides, so only the per-sample math is compared —
sampling-distribution parity is covered by the grid/allocation parity tests).

Also parity-tests the training loss against the real
``Trainer._compute_denormalized_loss`` (/root/reference/lib/Trainer.py:87-100)
including its denormalise -> zero-invalid -> numel/sum(mask) rescale dance.

Skipped automatically when /root/reference is absent.
"""

import os
import types

import numpy as np
import pytest

from tests.test_reference_parity_numerics import _EDict, _load_with_stubs

REFERENCE = "/root/reference"

pytestmark = pytest.mark.skipif(not os.path.isdir(REFERENCE),
                                reason="reference implementation not available")


# --------------------------- fake GDAL layer --------------------------- #

class _FakeBand:
    def __init__(self, arr, nodata):
        self._arr = arr
        self._nodata = nodata

    def ReadAsArray(self):
        return self._arr

    def GetNoDataValue(self):
        return self._nodata


class _FakeGdalDataset:
    """Just enough of gdal.Dataset for DsmOrthoDataset + rasterutils."""

    def __init__(self, arr, nodata=-9999.0, gsd=0.25, origin=(1000.0, 2000.0)):
        self._arr = arr
        self._band = _FakeBand(arr, nodata)
        self._gt = (origin[0], gsd, 0.0, origin[1], 0.0, -gsd)

    def GetRasterBand(self, _i):
        return self._band

    def GetGeoTransform(self):
        return self._gt

    def ReadAsArray(self):
        return self._arr

    @property
    def RasterXSize(self):
        return self._arr.shape[1]

    @property
    def RasterYSize(self):
        return self._arr.shape[0]


def _gdal_stub(registry):
    def apply_geotransform(gt, col, row):
        return [gt[0] + gt[1] * col + gt[2] * row,
                gt[3] + gt[4] * col + gt[5] * row]

    g = types.SimpleNamespace(
        Dataset=_FakeGdalDataset,
        GA_ReadOnly=0,
        Open=lambda fn, mode=0: registry.get(fn),
        ApplyGeoTransform=apply_geotransform,
    )
    return {"osgeo": types.SimpleNamespace(gdal=g), "osgeo.gdal": g}


# ------------------------ faithful torchvision stub ------------------------ #

def _torchvision_stub():
    """ToTensor/Normalize/Compose for float HxW numpy arrays, replicating the
    documented torchvision semantics the reference relies on: ToTensor maps an
    HxW float ndarray to a 1xHxW tensor unscaled (255-scaling applies to uint8
    only), Normalize subtracts/divides per channel."""
    import torch

    class ToTensor:
        def __call__(self, pic):
            arr = pic[:, :, None] if pic.ndim == 2 else pic
            arr = np.ascontiguousarray(arr.transpose(2, 0, 1))
            t = torch.from_numpy(arr)
            if arr.dtype == np.uint8:
                t = t.float().div(255)
            return t

    class Normalize:
        def __init__(self, mean, std):
            self.mean = mean
            self.std = std

        def __call__(self, t):
            mean = torch.as_tensor(self.mean, dtype=t.dtype)[:, None, None]
            std = torch.as_tensor(self.std, dtype=t.dtype)[:, None, None]
            return (t - mean) / std

    class Compose:
        def __init__(self, transforms_list):
            self.transforms = transforms_list

        def __call__(self, x):
            for t in self.transforms:
                x = t(x)
            return x

    tf = types.SimpleNamespace(ToTensor=ToTensor, Normalize=Normalize,
                               Compose=Compose)
    return {"torchvision": types.SimpleNamespace(transforms=tf),
            "torchvision.transforms": tf}


# ------------------------------ scene fixture ------------------------------ #

NODATA = -9999.0


def _scene():
    rng = np.random.default_rng(3)
    rows, cols = 40, 48
    dsm_in = rng.normal(400.0, 5.0, (rows, cols)).astype(np.float32)
    dsm_gt = (dsm_in + rng.normal(0.0, 1.5, (rows, cols))).astype(np.float32)
    dsm_in[4:7, 9:14] = NODATA
    dsm_gt[5:9, 11:17] = NODATA
    dsm_gt[20, 30] = 0.0          # exercises the `valid != 0` quirk (:462)
    dsm_gt[33, 5] = 0.0
    orthos = [rng.uniform(50.0, 900.0, (rows, cols)).astype(np.float32)
              for _ in range(3)]
    return dsm_in, dsm_gt, orthos


def _registry(dsm_in, dsm_gt, orthos):
    reg = {"/dsm_in.tif": _FakeGdalDataset(dsm_in, NODATA),
           "/dsm_gt.tif": _FakeGdalDataset(dsm_gt, NODATA)}
    for i, o in enumerate(orthos):
        reg[f"/ortho_{i}.tif"] = _FakeGdalDataset(o, None)
    return reg


@pytest.fixture(scope="module")
def ref_modules():
    """The real reference dataset module wired to real sibling modules
    (rasterutils/data_allocation/data_normalization/torch_transforms/
    validate_arguments), GDAL + torchvision stubbed."""
    dsm_in, dsm_gt, orthos = _scene()
    registry = _registry(dsm_in, dsm_gt, orthos)
    gdal = _gdal_stub(registry)
    tv = _torchvision_stub()

    ru = _load_with_stubs("lib/rasterutils.py", "ref_ru", extra_stubs=gdal)
    args = _load_with_stubs("lib/arguments.py", "ref_args")
    va = _load_with_stubs("lib/validate_arguments.py", "ref_va",
                          extra_stubs={"lib.arguments": args})
    da = _load_with_stubs("lib/data_allocation.py", "ref_da",
                          extra_stubs={"lib.rasterutils": ru})
    dn = _load_with_stubs("lib/data_normalization.py", "ref_dn", extra_stubs=tv)
    tt = _load_with_stubs("lib/torch_transforms.py", "ref_tt", extra_stubs=tv)
    dod = _load_with_stubs(
        "lib/DsmOrthoDataset.py", "ref_dod",
        extra_stubs={**gdal, **tv,
                     "lib.rasterutils": ru, "lib.arguments": args,
                     "lib.validate_arguments": va, "lib.data_allocation": da,
                     "lib.data_normalization": dn, "lib.torch_transforms": tt})
    return types.SimpleNamespace(
        DsmOrthoDataset=dod.DsmOrthoDataset, data_normalization=dn,
        scene=(dsm_in, dsm_gt, orthos))


AREA = _EDict(x_extent=[(0, 23), (24, 47)], y_extent=[(0, 39), (0, 39)])


def _ref_dataset(ref_modules, *, input_channels, strategy, pairs, stride=None,
                 with_gt=True, n_samples=None, **kw):
    d = _EDict(raster_in="/dsm_in.tif", area_defn=AREA)
    if with_gt:
        d.raster_gt = "/dsm_gt.tif"
    if input_channels != "geom":
        d.image_list = [f"/ortho_{i}.tif" for i in range(3)]
        d.image_pairs = pairs
    if n_samples is not None:
        d.n_samples = n_samples
    return ref_modules.DsmOrthoDataset(
        d, input_channels=input_channels, tile_size=16,
        sampling_strategy=strategy, stride=stride, **kw)


def _our_batch(ref_modules, ref_ds, *, input_channels, spec_overrides=None,
               transform_dsm=True, transform_orthos=True):
    """Run our device pipeline over the reference dataset's own positions."""
    import jax
    import jax.numpy as jnp

    from resdepth_tpu.data.pipeline import BatchSpec, DeviceRasters, build_batch

    dsm_in, dsm_gt, orthos = ref_modules.scene
    has_gt = ref_ds.raster_gt is not None
    if input_channels != "geom":
        pairs = np.asarray(ref_ds.image_pairs, np.int32)
        ortho_stack = jnp.asarray(np.stack(orthos))
    else:
        pairs = np.zeros((1, 0), np.int32)
        ortho_stack = None
    rasters = DeviceRasters(
        dsm_input=jnp.asarray(dsm_in),
        dsm_target=jnp.asarray(dsm_gt) if has_gt else None,
        orthos=ortho_stack,
        pairs=jnp.asarray(pairs),
        nodata=jnp.asarray(NODATA, jnp.float32))

    positions = np.asarray(ref_ds.patch_position, np.int32)
    pair_indices = np.asarray(ref_ds.image_pair_indices, np.int32)
    use_bounds = ref_ds.sampling_strategy != "train"
    if use_bounds:
        bounds = np.asarray(ref_ds.patch_valid_pixels, np.int32).reshape(-1, 4)
    else:
        bounds = np.zeros((len(positions), 4), np.int32)

    spec_kw = dict(
        input_channels=input_channels, tile_size=16,
        dsm_std=float(ref_ds.dsm_std) if transform_dsm else 1.0,
        dsm_mean=None if transform_dsm else 0.0,
        ortho_std=float(ref_ds.ortho_std) if transform_orthos else 1.0,
        ortho_mean=None if transform_orthos else 0.0,
        permute_images_within_pair=False, augment=False,
        strict_zero_mask=True, transform_dsm=transform_dsm,
        transform_orthos=transform_orthos, has_target=has_gt,
        use_bounds=use_bounds)
    spec_kw.update(spec_overrides or {})
    batch = build_batch(rasters, jnp.asarray(positions),
                        jnp.asarray(pair_indices), jnp.asarray(bounds),
                        jax.random.PRNGKey(0), BatchSpec(**spec_kw))
    return jax.tree.map(np.asarray, batch)


def _assert_samples_match(ref_ds, ours, *, has_gt=True, atol=5e-4):
    for i in range(len(ref_ds)):
        item = ref_ds[i]
        ref_input = item["input"].numpy()                      # (C, T, T)
        got_input = np.moveaxis(ours["input"][i], -1, 0)       # (C, T, T)
        np.testing.assert_allclose(got_input, ref_input, atol=atol,
                                   err_msg=f"input, sample {i}")
        if has_gt:
            ref_target = item["target"].numpy()[0]
            np.testing.assert_allclose(ours["target"][i, :, :, 0], ref_target,
                                       atol=atol, err_msg=f"target, sample {i}")
            ref_mask = item["loss_mask"].numpy()[0].astype(bool)
            got_mask = ours["loss_mask"][i, :, :, 0] > 0.5
            np.testing.assert_array_equal(got_mask, ref_mask,
                                          err_msg=f"loss mask, sample {i}")
            np.testing.assert_allclose(
                ours["dsm_mean"][i], float(item["dsm_mean"]),
                rtol=1e-6, atol=1e-3, err_msg=f"dsm_mean, sample {i}")


def test_test_strategy_geom_stereo(ref_modules):
    """Overlapping test grid, DSM + stereo views, bounds + nodata + !=0 mask."""
    ref_ds = _ref_dataset(ref_modules, input_channels="geom-stereo",
                          strategy="test", pairs=[(0, 2)], stride=8,
                          dsm_std=5.0, ortho_std=300.0)
    ours = _our_batch(ref_modules, ref_ds, input_channels="geom-stereo")
    assert len(ref_ds) > 4
    _assert_samples_match(ref_ds, ours)


def test_val_strategy_geom_mono_pair_expansion(ref_modules):
    """Non-overlapping val grid x 2 mono 'pairs': ordering and per-pair
    channel content both match the reference expansion (:380-396)."""
    ref_ds = _ref_dataset(ref_modules, input_channels="geom-mono",
                          strategy="val", pairs=[(1,), (2,)],
                          dsm_std=4.0, ortho_std=250.0)
    assert len(ref_ds) == 2 * ref_ds.total_dsm_samples
    ours = _our_batch(ref_modules, ref_ds, input_channels="geom-mono")
    _assert_samples_match(ref_ds, ours)


def test_val_strategy_geom_only(ref_modules):
    ref_ds = _ref_dataset(ref_modules, input_channels="geom", strategy="val",
                          pairs=None, dsm_std=3.0)
    ours = _our_batch(ref_modules, ref_ds, input_channels="geom")
    _assert_samples_match(ref_ds, ours)


def test_train_strategy_cross_product(ref_modules):
    """'train' x geom-stereo x use_all_stereo_pairs: the reference's sampled
    positions/pair assignment are fed to our pipeline; masks are
    nodata+quirk only (no bounds, :177-179)."""
    np.random.seed(123)
    ref_ds = _ref_dataset(ref_modules, input_channels="geom-stereo",
                          strategy="train", pairs=[(0, 1), (1, 2)],
                          n_samples=6, use_all_stereo_pairs=True,
                          dsm_std=5.0, ortho_std=300.0)
    assert len(ref_ds) == 12
    ours = _our_batch(ref_modules, ref_ds, input_channels="geom-stereo")
    _assert_samples_match(ref_ds, ours)


def test_stereo_views_only_mode(ref_modules):
    """'stereo' mode: network input is the views alone (:251-252), but the
    target/mask/normalisation still come from the DSMs."""
    ref_ds = _ref_dataset(ref_modules, input_channels="stereo",
                          strategy="val", pairs=[(0, 1)],
                          dsm_std=5.0, ortho_std=300.0)
    ours = _our_batch(ref_modules, ref_ds, input_channels="stereo")
    assert ours["input"].shape[-1] == 2
    _assert_samples_match(ref_ds, ours)


def test_transforms_off(ref_modules):
    """transform_dsm=False / transform_orthos=False: raw heights/radiances
    pass through untouched and dsm_mean reports 0 (:204-210)."""
    ref_ds = _ref_dataset(ref_modules, input_channels="geom-stereo",
                          strategy="test", pairs=[(0, 1)], stride=8,
                          transform_dsm=False, transform_orthos=False)
    ours = _our_batch(ref_modules, ref_ds, input_channels="geom-stereo",
                      transform_dsm=False, transform_orthos=False)
    _assert_samples_match(ref_ds, ours, atol=1e-5)
    assert np.all(ours["dsm_mean"] == 0.0)


def test_fixed_normalization_means(ref_modules):
    """User-specified dsm_mean/ortho_mean take the fixed-mean path (:196-197,
    :235-236) instead of per-patch centring."""
    ref_ds = _ref_dataset(ref_modules, input_channels="geom-stereo",
                          strategy="test", pairs=[(0, 2)], stride=8,
                          dsm_mean=400.0, dsm_std=5.0,
                          ortho_mean=475.0, ortho_std=300.0)
    ours = _our_batch(ref_modules, ref_ds, input_channels="geom-stereo",
                      spec_overrides={"dsm_mean": 400.0, "ortho_mean": 475.0})
    _assert_samples_match(ref_ds, ours)
    assert np.all(ours["dsm_mean"] == 400.0)


def test_host_sampler_layout_matches_reference(ref_modules, make_geotiff):
    """Our TileDataset's host-side sample layout (positions, pair expansion,
    exclusive bounds) equals the reference's for the deterministic
    strategies (:373-431)."""
    from resdepth_tpu.data.dataset import TileDataset

    dsm_in, dsm_gt, orthos = ref_modules.scene
    paths = {"raster_in": make_geotiff("in.tif", dsm_in, nodata=NODATA),
             "raster_gt": make_geotiff("gt.tif", dsm_gt, nodata=NODATA),
             "image_list": [make_geotiff(f"o{i}.tif", o)
                            for i, o in enumerate(orthos)]}

    for strategy, mode, pairs, stride in [
            ("test", "geom-stereo", [(0, 2)], 8),
            ("val", "geom-mono", [(1,), (2,)], None),
            ("val", "geom", None, None)]:
        ref_ds = _ref_dataset(ref_modules, input_channels=mode,
                              strategy=strategy, pairs=pairs, stride=stride)
        spec = {"raster_in": paths["raster_in"],
                "raster_gt": paths["raster_gt"],
                "area_defn": {"x_extent": AREA.x_extent,
                              "y_extent": AREA.y_extent}}
        if mode != "geom":
            spec["image_list"] = paths["image_list"]
            spec["image_pairs"] = pairs
        ours = TileDataset(spec, input_channels=mode, tile_size=16,
                           sampling_strategy=strategy, stride=stride)
        np.testing.assert_array_equal(
            ours.positions, np.asarray(ref_ds.patch_position, np.int32))
        np.testing.assert_array_equal(
            ours.pair_indices, np.asarray(ref_ds.image_pair_indices, np.int32))
        np.testing.assert_array_equal(
            ours.valid_bounds,
            np.asarray(ref_ds.patch_valid_pixels, np.int32).reshape(-1, 4))


# ------------------------------ loss parity ------------------------------ #

def test_denormalized_masked_loss_matches_reference(ref_modules):
    """Our weighted masked L1 == the real Trainer._compute_denormalized_loss
    (denormalise both, zero invalid pixels, rescale by numel/sum(mask))."""
    import torch

    from resdepth_tpu.train.loss import denormalized_masked_l1

    trainer_mod = _load_with_stubs(
        "lib/Trainer.py", "ref_trainer",
        extra_stubs={
            "lib.data_normalization": ref_modules.data_normalization,
            "lib.AverageMeter": _load_with_stubs("lib/AverageMeter.py",
                                                 "ref_avg"),
        })

    rng = np.random.default_rng(5)
    b, t = 4, 16
    pred = rng.normal(0.0, 1.0, (b, 1, t, t)).astype(np.float32)
    target = rng.normal(0.0, 1.0, (b, 1, t, t)).astype(np.float32)
    mask = (rng.uniform(size=(b, 1, t, t)) > 0.3)
    mean = rng.normal(400.0, 10.0, (b,)).astype(np.float32)
    std = np.full((b,), 5.0, np.float32)

    fake_self = types.SimpleNamespace(criterion=torch.nn.L1Loss())
    ref_loss = trainer_mod.Trainer._compute_denormalized_loss(
        fake_self,
        torch.from_numpy(pred.copy()), torch.from_numpy(target.copy()),
        torch.from_numpy(mask.copy()),
        torch.from_numpy(mean), torch.from_numpy(std))

    loss, _ = denormalized_masked_l1(
        np.transpose(pred, (0, 2, 3, 1)), np.transpose(target, (0, 2, 3, 1)),
        np.transpose(mask, (0, 2, 3, 1)).astype(np.float32),
        mean, 5.0)
    np.testing.assert_allclose(float(loss), float(ref_loss), rtol=1e-5)
