#!/usr/bin/env python
"""Generate a self-contained demo scene + ready-to-run configs.

The reference ships download scripts for a 256x256 Zurich demo patch with
pretrained weights (/root/reference/scripts/download_demo.sh). This
environment has no network egress, so the demo is synthetic: a procedurally
generated "city" ground-truth DSM (terrain + building blocks), a noisy
initial DSM, three pseudo ortho views derived from hillshading, building /
water masks, imagelist/pairlist control files, and train + inference JSON
configs wired to the generated files.

Usage:
    python scripts/make_demo_data.py [output_dir]       # default ./demo
Then:
    python train.py <output_dir>/config_train.json
    python test.py  <output_dir>/config_test.json       # after editing the
                                                        # run-dir paths inside
"""

from __future__ import annotations

import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from resdepth_tpu.geo import tiff  # noqa: E402

GSD = 0.25
NODATA = -9999.0


def synth_city(rows: int, cols: int, seed: int = 0):
    """Ground-truth DSM with terrain + buildings, plus masks."""
    rng = np.random.default_rng(seed)
    yy, xx = np.mgrid[0:rows, 0:cols].astype(np.float32)
    terrain = (420.0 + 6.0 * np.sin(yy / 60.0) + 5.0 * np.cos(xx / 45.0)
               + 2.0 * np.sin((xx + yy) / 90.0))
    gt = terrain.copy()
    building_mask = np.zeros((rows, cols), np.uint8)
    for _ in range(rows * cols // 4000):
        h = rng.uniform(6.0, 25.0)
        by = int(rng.integers(0, rows - 24))
        bx = int(rng.integers(0, cols - 24))
        bh = int(rng.integers(8, 24))
        bw = int(rng.integers(8, 24))
        gt[by:by + bh, bx:bx + bw] = terrain[by:by + bh, bx:bx + bw].mean() + h
        building_mask[by:by + bh, bx:bx + bw] = 1

    water_mask = np.zeros((rows, cols), np.uint8)
    cy = rows // 2
    water_mask[cy - 6:cy + 6, :] = 1
    gt[water_mask == 1] = terrain[water_mask == 1].min() - 1.0
    building_mask[water_mask == 1] = 0

    # Initial DSM: ground truth + stereo-matching-like noise, worse at walls.
    noise = rng.normal(0.0, 0.7, (rows, cols)).astype(np.float32)
    from scipy import ndimage
    wall = ndimage.binary_dilation(building_mask.astype(bool), iterations=2) \
        ^ building_mask.astype(bool)
    noise[wall] += rng.normal(0.0, 3.0, int(wall.sum())).astype(np.float32)
    dsm = (gt + noise).astype(np.float32)
    return gt.astype(np.float32), dsm, building_mask, water_mask


def hillshade(dsm: np.ndarray, azimuth_deg: float) -> np.ndarray:
    """Pseudo ortho view: Lambertian hillshade of the surface."""
    gy, gx = np.gradient(dsm.astype(np.float64), GSD)
    azimuth = np.deg2rad(azimuth_deg)
    altitude = np.deg2rad(45.0)
    slope = np.arctan(np.hypot(gx, gy))
    aspect = np.arctan2(-gx, gy)
    shade = (np.sin(altitude) * np.cos(slope)
             + np.cos(altitude) * np.sin(slope) * np.cos(azimuth - aspect))
    radiance = 80.0 + 120.0 * np.clip(shade, 0, 1)
    return radiance.astype(np.float32)


def write_golden_scene(out_dir: str) -> dict:
    """Small deterministic scene + configs for the committed-goldens flow.

    The reference ships expected demo outputs (demo/results_expected,
    README.md:535-539) for regression comparison; this is the equivalent:
    a seeded 160x160 scene and a fast train config (depth-3 UNet, 32 px
    tiles, 4 epochs) whose refined-DSM output is committed under
    tests/goldens/ and re-checked by tests/test_demo_goldens.py.
    Returns {"train": <train cfg path>, "test": <test cfg path>}.
    """
    os.makedirs(out_dir, exist_ok=True)
    geotransform = (465000.0, GSD, 0.0, 5247000.0, 0.0, -GSD)
    rows, cols = 160, 160
    gt, dsm, building, water = synth_city(rows, cols, seed=11)

    def write(name, data, nodata=NODATA):
        path = os.path.join(out_dir, name)
        tiff.write(path, data, geotransform=geotransform, nodata=nodata)
        return os.path.abspath(path)

    paths = {
        "gt": write("ground_truth_DSM.tif", gt),
        "dsm": write("initial_DSM.tif", dsm),
        "building": write("mask_building.tif", building, nodata=255),
        "water": write("mask_water.tif", water, nodata=255),
    }
    image_paths = [write(f"ortho_{az}.tif", hillshade(gt, az))
                   for az in (315, 135)]
    out_abs = os.path.abspath(out_dir)
    with open(os.path.join(out_dir, "imagelist.txt"), "w") as f:
        f.write("\n".join(image_paths) + "\n")
    with open(os.path.join(out_dir, "pairlist.txt"), "w") as f:
        f.write("ortho_315, ortho_135\n")

    train_cfg = {
        "datasets": [{
            "name": "golden_city",
            "raster_gt": paths["gt"],
            "raster_in": paths["dsm"],
            "path_image_list": os.path.join(out_abs, "imagelist.txt"),
            "path_pairlist_training": os.path.join(out_abs, "pairlist.txt"),
            "path_pairlist_validation": os.path.join(out_abs, "pairlist.txt"),
            "area_type": "train+val",
            "allocation_strategy": "5-crossval_vertical",
            "test_stripe": 1,
            "n_training_samples": 64,
        }],
        "model": {"input_channels": "geom-stereo", "depth": 3,
                  "start_kernel": 8, "max_filter_depth": 32},
        "stereopair_settings": {"use_all_stereo_pairs": False,
                                "permute_images_within_pair": False},
        "training_settings": {"tile_size": 32, "batch_size": 8, "n_epochs": 4,
                              "augment": True, "loss": "L1"},
        "optimizer": {"name": "Adam", "learning_rate": 0.0005},
        "scheduler": {"enabled": True, "name": "StepLR",
                      "settings": {"step_size": 2}},
        "general": {"save_model_rate": 10, "evaluate_rate": 1,
                    "random_seed": 0},
        "output": {"output_directory": os.path.join(out_abs, "runs")},
    }
    train_path = os.path.join(out_dir, "config_train.json")
    with open(train_path, "w") as f:
        json.dump(train_cfg, f, indent=2)

    test_cfg = {
        "datasets": [{
            "name": "golden_city",
            "raster_gt": paths["gt"],
            "raster_in": paths["dsm"],
            "path_image_list": os.path.join(out_abs, "imagelist.txt"),
            "path_pairlist": os.path.join(out_abs, "pairlist.txt"),
            "mask_building": paths["building"],
            "mask_water": paths["water"],
            "allocation_strategy": "5-crossval_vertical",
            "test_stripe": 1,
            "area_type": "test",
        }],
        # model artifact paths are filled in after training (run dir is
        # timestamped) — see fill_golden_test_config().
        "model": {},
        "general": {"tile_size": 32},
        "output": {"directory": os.path.join(out_abs, "eval")},
    }
    test_path = os.path.join(out_dir, "config_test.json")
    with open(test_path, "w") as f:
        json.dump(test_cfg, f, indent=2)
    return {"train": train_path, "test": test_path, "out": out_abs}


def fill_golden_test_config(test_cfg_path: str, run_dir: str) -> None:
    with open(test_cfg_path) as f:
        cfg = json.load(f)
    cfg["model"] = {
        "weights": os.path.join(run_dir, "checkpoints", "Model_best.npz"),
        "architecture": os.path.join(run_dir, "model_config.json"),
        "normalization_geom": os.path.join(
            run_dir, "DSM_normalization_parameters.p"),
        "normalization_image": os.path.join(
            run_dir, "Image_normalization_parameters.p"),
    }
    with open(test_cfg_path, "w") as f:
        json.dump(cfg, f, indent=2)


def main() -> None:
    out_dir = sys.argv[1] if len(sys.argv) > 1 else "demo"
    os.makedirs(out_dir, exist_ok=True)
    geotransform = (465000.0, GSD, 0.0, 5247000.0, 0.0, -GSD)

    rows, cols = 448, 640
    gt, dsm, building, water = synth_city(rows, cols)

    def write(name, data, nodata=NODATA):
        path = os.path.join(out_dir, name)
        tiff.write(path, data, geotransform=geotransform, nodata=nodata)
        return path

    paths = {
        "gt": write("ground_truth_DSM.tif", gt),
        "dsm": write("initial_DSM.tif", dsm),
        "building": write("mask_building.tif", building, nodata=255),
        "water": write("mask_water.tif", water, nodata=255),
    }
    image_paths = [write(f"ortho_{az}.tif", hillshade(gt, az))
                   for az in (315, 135, 45)]

    with open(os.path.join(out_dir, "imagelist.txt"), "w") as f:
        f.write("\n".join(os.path.abspath(p) for p in image_paths) + "\n")
    with open(os.path.join(out_dir, "pairlist_stereo.txt"), "w") as f:
        f.write("ortho_315, ortho_135\northo_315, ortho_45\n")
    with open(os.path.join(out_dir, "pairlist_test.txt"), "w") as f:
        f.write("ortho_315, ortho_135\n")

    absolute = {k: os.path.abspath(v) for k, v in paths.items()}
    out_abs = os.path.abspath(out_dir)

    train_cfg = {
        "datasets": [{
            "name": "demo_city",
            "raster_gt": absolute["gt"],
            "raster_in": absolute["dsm"],
            "path_image_list": os.path.join(out_abs, "imagelist.txt"),
            "path_pairlist_training": os.path.join(out_abs, "pairlist_stereo.txt"),
            "path_pairlist_validation": os.path.join(out_abs, "pairlist_stereo.txt"),
            "area_type": "train+val",
            "allocation_strategy": "5-crossval_vertical",
            "test_stripe": 1,
            "n_training_samples": 512,
        }],
        "model": {"input_channels": "geom-stereo", "depth": 5},
        "stereopair_settings": {"use_all_stereo_pairs": True,
                                "permute_images_within_pair": False},
        "training_settings": {"tile_size": 128, "batch_size": 8, "n_epochs": 20,
                              "augment": True, "loss": "L1"},
        "optimizer": {"name": "Adam", "learning_rate": 0.0002},
        "scheduler": {"enabled": True, "name": "StepLR",
                      "settings": {"step_size": 10}},
        "general": {"save_model_rate": 10, "evaluate_rate": 1, "random_seed": 0},
        # Round-2 measured recommendations: balanced16 training (bf16
        # activation trunk with f32-HIGH first/last convs — 2.05x the f32
        # parity mode, demo-identical convergence: val MAE 0.124 m,
        # refined 0.079 m on the v5e) and multi-step dispatch (BASELINE.md).
        "tpu": {"train_precision": "balanced16", "steps_per_call": 8},
        "output": {"output_directory": os.path.join(out_abs, "runs"),
                   "suffix": "demo"},
    }
    with open(os.path.join(out_dir, "config_train.json"), "w") as f:
        json.dump(train_cfg, f, indent=2)

    test_cfg = {
        "datasets": [{
            "name": "demo_city",
            "raster_gt": absolute["gt"],
            "raster_in": absolute["dsm"],
            "path_image_list": os.path.join(out_abs, "imagelist.txt"),
            "path_pairlist": os.path.join(out_abs, "pairlist_test.txt"),
            "mask_building": absolute["building"],
            "mask_water": absolute["water"],
            "allocation_strategy": "5-crossval_vertical",
            "test_stripe": 1,
            "area_type": "test",
        }],
        "model": {
            "weights": "EDIT: <run_dir>/checkpoints/Model_best.npz",
            "architecture": "EDIT: <run_dir>/model_config.json",
            "normalization_geom": "EDIT: <run_dir>/DSM_normalization_parameters.p",
            "normalization_image": "EDIT: <run_dir>/Image_normalization_parameters.p",
        },
        # 'balanced16' serving (the bench headline): bf16 trunk with
        # full-fidelity first+last convs — 0.36-0.37 cm scene-independent
        # trained-weights deviation at ~92% of bf16 speed (BASELINE.md).
        # Remove the key for exact f32-HIGH parity serving (3e-5 deviation);
        # 'mixed'/'bfloat16' remain opt-in at the 1 cm budget boundary.
        "general": {"tile_size": 128, "compute_dtype": "balanced16"},
        "output": {"directory": os.path.join(out_abs, "eval")},
    }
    with open(os.path.join(out_dir, "config_test.json"), "w") as f:
        json.dump(test_cfg, f, indent=2)

    print(f"Demo scene written to {out_abs}")
    print(f"Train:  python train.py {os.path.join(out_abs, 'config_train.json')}")
    print("Then edit the four EDIT: paths in config_test.json to the run dir and:")
    print(f"Test:   python test.py {os.path.join(out_abs, 'config_test.json')}")


if __name__ == "__main__":
    main()
