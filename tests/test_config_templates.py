"""The shipped config templates are structurally valid and trainable.

Mirrors the reference's four runnable templates (configs/*.json —
/root/reference/configs): placeholder paths are substituted with a
synthetic scene and the size knobs (tile/depth/epochs/samples) downscaled,
leaving every structural element — sections, key names, channel modes,
pairlist roles, allocation, scheduler settings — exactly as shipped; each
must then pass validation and train end-to-end through the real CLI.
"""

import json
import os
import sys

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _scene(make_geotiff, tmp_path, name, n_images=3):
    rng = np.random.default_rng(hash(name) % 2**31)
    rows, cols = 80, 100
    yy, xx = np.mgrid[0:rows, 0:cols].astype(np.float32)
    gt = (400.0 + 5.0 * np.sin(yy / 9.0)).astype(np.float32)
    dsm = (gt + rng.normal(0.0, 0.8, (rows, cols))).astype(np.float32)
    paths = {
        "raster_in": make_geotiff(f"{name}_dsm.tif", dsm),
        "raster_gt": make_geotiff(f"{name}_gt.tif", gt),
    }
    imgs = [make_geotiff(f"{name}_ortho_{j}.tif",
                         rng.normal(120, 25, (rows, cols)).astype(np.float32))
            for j in range(n_images)]
    il = tmp_path / f"{name}_images.txt"
    il.write_text("\n".join(imgs) + "\n")
    stereo = tmp_path / f"{name}_pairs_stereo.txt"
    stereo.write_text(f"{name}_ortho_0, {name}_ortho_1\n")
    mono = tmp_path / f"{name}_pairs_mono.txt"
    # geom-mono demands exactly ONE single-image line (lib/utils.py:815-823)
    mono.write_text(f"{name}_ortho_0\n")
    paths.update(image_list=str(il), pairs_stereo=str(stereo),
                 pairs_mono=str(mono))
    return paths


def _downsize(cfg, datasets_paths, out_dir, mono=False):
    for ds, paths in zip(cfg["datasets"], datasets_paths):
        ds["raster_in"] = paths["raster_in"]
        ds["raster_gt"] = paths["raster_gt"]
        if "path_image_list" in ds:
            ds["path_image_list"] = paths["image_list"]
            key = "pairs_mono" if mono else "pairs_stereo"
            for role in ("path_pairlist_training", "path_pairlist_validation"):
                if role in ds:
                    ds[role] = paths[key]
        ds["n_training_samples"] = 8
    cfg["model"].update(depth=2, start_kernel=4, max_filter_depth=8)
    cfg["training_settings"].update(tile_size=16, batch_size=4, n_epochs=1)
    cfg["output"]["output_directory"] = out_dir
    return cfg


@pytest.mark.parametrize("template,mono", [
    ("config_ResDepth-0.json", False),
    ("config_ResDepth-mono.json", True),
    ("config_ResDepth-stereo.json", False),
    ("config_ResDepth-stereo_generalized.json", False),
])
def test_shipped_template_trains(make_geotiff, tmp_path, monkeypatch,
                                 template, mono):
    cfg = json.load(open(os.path.join(REPO, "configs", template)))
    n_datasets = len(cfg["datasets"])
    datasets_paths = [_scene(make_geotiff, tmp_path, f"ds{i}")
                      for i in range(n_datasets)]
    out_dir = str(tmp_path / "runs")
    cfg = _downsize(cfg, datasets_paths, out_dir, mono=mono)
    cfg_path = tmp_path / "cfg.json"
    cfg_path.write_text(json.dumps(cfg))

    import train as train_cli
    monkeypatch.setattr(sys, "argv", ["train.py", str(cfg_path)])
    train_cli.main()

    run_dir = os.path.join(out_dir, sorted(os.listdir(out_dir))[0])
    assert os.path.exists(os.path.join(run_dir, "checkpoints", "Model_last.npz"))
    model_cfg = json.load(open(os.path.join(run_dir, "model_config.json")))
    assert model_cfg["input_channels"] == cfg["model"]["input_channels"]
