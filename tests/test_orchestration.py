"""Orchestration: area allocation plumbing, phase configs, sharded inference,
multi-dataset training epochs."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from resdepth_tpu import orchestration
from resdepth_tpu.data.dataset import TileDataset
from resdepth_tpu.infer import predict_linear_blend
from resdepth_tpu.models.unet import UNetConfig, init_unet
from resdepth_tpu.parallel.mesh import data_mesh
from resdepth_tpu.utils.attrdict import AttrDict


def _cfg_with_datasets(make_geotiff, n=1, area_type="train+val",
                       crossval=False, channels="geom"):
    datasets = []
    for i in range(n):
        raster = make_geotiff(f"dsm{i}.tif", np.zeros((50, 50), np.float32))
        gt = make_geotiff(f"gt{i}.tif", np.zeros((50, 50), np.float32))
        datasets.append(AttrDict(
            name=f"region_{i}", raster_in=raster, raster_gt=gt,
            area_type=area_type, allocation_strategy="5-crossval_vertical",
            test_stripe=1, n_training_samples=8, crossval_training=crossval))
    return AttrDict(datasets=datasets,
                    model=AttrDict(input_channels=channels))


def test_allocate_area_phases(make_geotiff):
    cfg = _cfg_with_datasets(make_geotiff)
    orchestration.allocate_area(cfg)
    ds = cfg.datasets[0]
    assert "area_defn_train" in ds and "area_defn_val" in ds
    assert "area_defn" not in ds  # no test area requested
    # width 10 stripes; test stripe 1 -> val stripe 2
    assert ds.area_defn_val["x_extent"] == [(20, 29)]
    assert ds.area_defn_train["x_extent"] == [(0, 9), (30, 49)]


def test_allocate_area_crossval(make_geotiff):
    cfg = _cfg_with_datasets(make_geotiff, crossval=True)
    orchestration.allocate_area(cfg)
    ds = cfg.datasets[0]
    # crossval: chosen stripe is VALIDATION, remaining four are training
    assert ds.area_defn_val["x_extent"] == [(10, 19)]
    assert ds.area_defn_train["x_extent"] == [(0, 9), (20, 49)]


def test_allocate_area_crossval_test_area_rejected(make_geotiff):
    """crossval_training allocates no test stripe (the chosen stripe is the
    VAL area); requesting a test area must fail with the cause at allocation
    time, not a downstream KeyError on 'x_extent'."""
    cfg = _cfg_with_datasets(make_geotiff, area_type="test", crossval=True)
    with pytest.raises(ValueError, match="no test stripe"):
        orchestration.allocate_area(cfg)


def test_allocate_area_entire(make_geotiff):
    cfg = _cfg_with_datasets(make_geotiff)
    cfg.datasets[0].allocation_strategy = "entire"
    orchestration.allocate_area(cfg)
    assert cfg.datasets[0].area_defn["x_extent"] == [(0, 49)]


def test_prepare_dataset_configuration_phases(make_geotiff):
    cfg = _cfg_with_datasets(make_geotiff, n=2)
    cfg.datasets[1].area_type = "train"  # second region: training only
    orchestration.allocate_area(cfg)

    train_cfgs = orchestration.prepare_dataset_configuration(cfg, "train")
    val_cfgs = orchestration.prepare_dataset_configuration(cfg, "val")
    assert len(train_cfgs) == 2 and len(val_cfgs) == 1
    assert train_cfgs[0].n_samples == 8
    assert "area_defn" in train_cfgs[0]


def test_prepare_test_configuration_on_val_area(make_geotiff):
    """Inference over the validation stripe (area_type='val' in eval cfg)."""
    cfg = _cfg_with_datasets(make_geotiff, area_type="val")
    orchestration.allocate_area(cfg)
    test_cfgs = orchestration.prepare_dataset_configuration(cfg, "test")
    assert len(test_cfgs) == 1
    # val stripe of test_stripe=1 -> stripe 2
    assert test_cfgs[0].area_defn["x_extent"] == [(20, 29)]
    assert test_cfgs[0].mask_building is None


def test_read_image_pairs_roles(make_geotiff, tmp_path):
    imgs = [make_geotiff(f"o{i}.tif", np.zeros((50, 50), np.float32))
            for i in range(3)]
    imagelist = tmp_path / "imagelist.txt"
    imagelist.write_text("\n".join(imgs) + "\n")
    pairlist = tmp_path / "pairs.txt"
    pairlist.write_text("o0, o1\no1, o2\n")

    cfg = _cfg_with_datasets(make_geotiff, channels="geom-stereo")
    ds = cfg.datasets[0]
    ds.path_image_list = str(imagelist)
    ds.path_pairlist_training = str(pairlist)
    ds.path_pairlist_validation = str(pairlist)
    assert orchestration.read_image_pairs(cfg) is True
    assert ds.image_pairs_train == [(0, 1), (1, 2)]
    assert ds.image_pairs_val == [(0, 1), (1, 2)]

    # arity violation: mono pairs for a stereo model
    bad = tmp_path / "bad.txt"
    bad.write_text("o0\n")
    ds.path_pairlist_training = str(bad)
    assert orchestration.read_image_pairs(cfg) is False


def test_sharded_inference_matches_single_device(make_geotiff):
    rng = np.random.default_rng(0)
    dsm = rng.normal(400.0, 5.0, (64, 64)).astype(np.float32)
    path = make_geotiff("dsm.tif", dsm)
    entry = {"raster_in": path,
             "area_defn": {"x_extent": [(0, 63)], "y_extent": [(0, 63)]}}
    ds = TileDataset(entry, input_channels="geom", tile_size=16,
                     sampling_strategy="test", dsm_std=5.0)
    config = UNetConfig(n_input_channels=1, start_kernel=4, max_filter_depth=8,
                        depth=2)
    params, bn = init_unet(jax.random.PRNGKey(0), config)

    single = predict_linear_blend(config, params, bn, ds, batch_size=4)
    sharded = predict_linear_blend(config, params, bn, ds, batch_size=2,
                                   mesh=data_mesh(4))
    np.testing.assert_allclose(sharded, single, rtol=1e-4, atol=1e-3)


def test_collect_model_args_payload():
    cfg = AttrDict(model=AttrDict(
        name="UNet", input_channels="geom-multiview", depth=4, start_kernel=32,
        act_fn_encoder="relu", act_fn_decoder="lrelu", act_fn_bottleneck="relu",
        up_mode="bilinear", do_BN=True, outer_skip=True, outer_skip_BN=False,
        bias_conv_layer=True, max_filter_depth=256),
        multiview=AttrDict(config="4-view"))
    args = orchestration.collect_model_args(cfg)
    assert args.settings.n_input_channels == 5
    assert args.settings.up_mode == "bilinear"
    assert args.settings.max_filter_depth == 256
