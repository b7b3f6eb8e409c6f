#!/usr/bin/env python
"""Dihedral test-time-augmentation (general.tta) accuracy/cost study.

The reference augments with the full dihedral group at TRAIN time only
(/root/reference/lib/DsmOrthoDataset.py:169-201) and predicts each tile once.
``general.tta`` (infer/tiled.py) averages each tile's prediction over a
dihedral SUBGROUP of spatial symmetries at eval time — tta x model compute
for a potential accuracy gain on the reference's own headline metric
(refined-DSM MAE). This script measures that trade, adopt-or-kill style:

Mode A (default) — well-trained checkpoints, held-out stripe:
  re-evaluates the 300-epoch convergence-study runs (docs/CONVERGENCE.md)
  through the REAL eval CLI with tta in {1,2,4,8} and reports the
  test-stripe MAE per seed, alongside the reference torch stack's score on
  the identical scene/protocol (from the stored study results).

  python scripts/tta_study.py --conv-dir /root/studies/conv --out /root/studies/tta

Mode B (--state-cache) — flagship scale, cost on the real chip:
  the precision-study flagship weights refine a synthetic 2048^2 city at
  every tta count; reports refined MAE + device s/scene (mirrors
  scripts/stride_study.py).

  python scripts/tta_study.py --state-cache /tmp/study_state_s3.npz
"""

from __future__ import annotations

import argparse
import glob
import json
import os
import subprocess
import sys
import tempfile
import time

import numpy as np

_HERE = os.path.dirname(os.path.abspath(__file__))
REPO = os.path.dirname(_HERE)
sys.path.insert(0, REPO)
sys.path.insert(0, _HERE)

TTA_COUNTS = (1, 2, 4, 8)


# ------------------------- Mode A: conv checkpoints ------------------------ #

def run_conv_mode(conv_dir: str, out_dir: str, tags: list[str],
                  merge: str = "mean") -> None:
    import convergence_study as cs
    from resdepth_tpu.geo import raster as geo_raster

    scene = json.load(open(os.path.join(conv_dir, "scene.json")))
    gt_r = geo_raster.open_raster(scene["paths"]["gt"])
    gt = np.asarray(gt_r.data)
    cols = scene["cols"]
    test_x0 = cs.TEST_STRIPE * (cols // 5)
    test_x = (test_x0, test_x0 + cols // 5 - 1)
    initial = cs.refined_test_mae(
        np.asarray(geo_raster.open_raster(scene["paths"]["dsm"]).data),
        0, gt, test_x)

    os.makedirs(out_dir, exist_ok=True)
    table: dict[str, dict[int, float]] = {}
    for tag in tags:
        run_root = os.path.join(conv_dir, "runs_jax", tag)
        base_cfg_path = os.path.join(run_root, "config_test.json")
        base_cfg = json.load(open(base_cfg_path))
        table[tag] = {}
        for tta in TTA_COUNTS:
            cfg = json.loads(json.dumps(base_cfg))
            cfg["general"]["tta"] = tta
            if merge != "mean":
                cfg["general"]["tta_merge"] = merge
            mtag = f"{tag}_tta{tta}" + ("" if merge == "mean" else f"_{merge}")
            eval_dir = os.path.join(out_dir, mtag)
            cfg["output"]["directory"] = eval_dir
            cfg_path = os.path.join(out_dir, f"config_{mtag}.json")
            with open(cfg_path, "w") as f:
                json.dump(cfg, f, indent=1)
            proc = subprocess.run(
                [sys.executable, os.path.join(REPO, "test.py"), cfg_path],
                cwd=REPO, capture_output=True, text=True)
            if proc.returncode != 0:
                sys.stderr.write(proc.stdout[-3000:] + proc.stderr[-3000:])
                raise RuntimeError(f"test.py failed: {tag} tta={tta}")
            pred_path = None
            for root, _dirs, files in os.walk(eval_dir):
                for name in files:
                    if name.endswith("prediction_test_area.tif"):
                        pred_path = os.path.join(root, name)
            if pred_path is None:
                raise RuntimeError(
                    f"no *prediction_test_area.tif under {eval_dir} "
                    f"({tag}, tta={tta}): test.py output layout changed?")
            pred_r = geo_raster.open_raster(pred_path)
            origin_col = int(round(
                (pred_r.geotransform[0] - gt_r.geotransform[0]) / cs.GSD))
            mae = cs.refined_test_mae(np.asarray(pred_r.data), origin_col,
                                      gt, test_x)
            table[tag][tta] = mae
            print(f"[{tag}] tta={tta}: refined test MAE {mae:.4f} m",
                  flush=True)

    # Reference scores on the identical scene/protocol, for context.
    torch_maes = []
    for path in sorted(glob.glob(os.path.join(conv_dir, "results",
                                              "torch_seed*_steplr.json"))):
        torch_maes.append(json.load(open(path))["refined_test_mae"])

    print(f"\nscene {scene['rows']}x{cols} (seed {scene['scene_seed']}), "
          f"held-out stripe {cs.TEST_STRIPE}; initial MAE {initial:.4f} m")
    header = f"{'run':>28s}" + "".join(f"{'tta=' + str(t):>10s}"
                                       for t in TTA_COUNTS) + f"{'d8(cm)':>9s}"
    print(header)
    for tag, row in table.items():
        cells = "".join(f"{row[t]:10.4f}" for t in TTA_COUNTS)
        print(f"{tag:>28s}{cells}{(row[8] - row[1]) * 100:+9.2f}")
    if torch_maes:
        mean = np.mean(torch_maes)
        print(f"{'torch reference (mean of ' + str(len(torch_maes)) + ')':>28s}"
              f"{mean:10.4f}")
    results_name = ("tta_conv_results.json" if merge == "mean"
                    else f"tta_conv_results_{merge}.json")
    with open(os.path.join(out_dir, results_name), "w") as f:
        json.dump({"initial_mae": initial, "merge": merge, "table": table,
                   "torch_refined_maes": torch_maes}, f, indent=1)


# ------------------------ Mode B: flagship scale --------------------------- #

def run_flagship_mode(state_cache: str, rows: int, cols: int, scene_seed: int,
                      mode: str) -> None:
    import jax
    import jax.numpy as jnp

    from make_demo_data import hillshade, synth_city
    from resdepth_tpu.data.dataset import TileDataset
    from resdepth_tpu.data.pipeline import device_put_dataset
    from resdepth_tpu.geo import tiff
    from resdepth_tpu.geo.allocation import entire_area_defn
    from resdepth_tpu.infer.tiled import predict_linear_blend
    from resdepth_tpu.models.unet import (flagship_config, fold_serving,
                                          init_unet)
    from resdepth_tpu.train import checkpoint as ckpt_io
    from resdepth_tpu.utils import compilation_cache

    compilation_cache.enable()
    gt, dsm_in, *_ = synth_city(rows, cols, seed=scene_seed)
    views = np.stack([hillshade(gt, az) for az in (315.0, 135.0, 45.0)], -1)
    tmp = tempfile.mkdtemp(prefix="tta_study_")
    geotransform = (1000.0, 0.25, 0.0, 2000.0, 0.0, -0.25)

    def write(name, data):
        path = os.path.join(tmp, name)
        tiff.write(path, data, geotransform=geotransform, nodata=-9999.0)
        return path

    p_in = write("dsm.tif", dsm_in)
    view_paths = [write(f"ortho_{j}.tif", views[..., j]) for j in range(3)]
    dataset = {"name": "tta", "raster_in": p_in, "image_list": view_paths,
               "image_pairs": [(0, 1)], "area_defn": entire_area_defn(p_in)}
    sigma = float(np.std(dsm_in - dsm_in.mean()))

    config = flagship_config("geom-stereo")
    params, bn = init_unet(jax.random.PRNGKey(0), config)
    meta, params, bn, _ = ckpt_io.load_checkpoint(
        state_cache, params_template=params, bn_template=bn)
    cached_seed = (meta.get("study_key") or {}).get("scene_seed")
    if cached_seed is not None and cached_seed != scene_seed:
        sys.exit(f"ERROR: --state-cache was trained on scene seed "
                 f"{cached_seed}, not --scene-seed {scene_seed}.")
    print(f"[weights] {state_cache} (trained: {meta.get('study_key')})",
          flush=True)
    config, params, bn = fold_serving(config, params, bn)
    params = jax.device_put(params)
    bn = jax.device_put(bn)
    dtype = {"float32": jnp.float32, "bfloat16": jnp.bfloat16}.get(mode, mode)

    ds = TileDataset(dataset, "geom-stereo", 256, "test", dsm_std=sigma,
                     ortho_mean=float(views.mean()),
                     ortho_std=float(views.std()), seed=0)
    rasters = device_put_dataset(ds)
    valid = gt != -9999.0
    mae_in = float(np.abs(dsm_in - gt)[valid].mean())

    results = {}
    for tta in TTA_COUNTS:
        dev_times = []
        pred = None
        for it in range(4):
            t0 = time.perf_counter()
            pred = predict_linear_blend(config, params, bn, ds,
                                        batch_size=128, compute_dtype=dtype,
                                        rasters=rasters, as_numpy=False,
                                        fold_bn=False, tta=tta)
            float(jnp.sum(pred))  # relay-safe completion sync
            if it:
                dev_times.append(time.perf_counter() - t0)
        pred = np.asarray(pred)
        mae = float(np.abs(pred - gt)[valid].mean())
        results[tta] = (mae, min(dev_times), pred)
        print(f"[tta {tta}] device {min(dev_times):6.2f} s/scene, "
              f"MAE {mae:.4f} m", flush=True)

    base_mae, base_t, base_pred = results[1]
    print(f"\nscene {rows}x{cols} (seed {scene_seed}), mode {mode}, "
          f"{len(ds)} tiles; input MAE {mae_in:.3f} m")
    print(f"{'tta':>4s} {'dev s':>7s} {'cost':>6s} {'MAE(m)':>8s} "
          f"{'dMAE(cm)':>9s} {'dev-vs-1(cm)':>13s}")
    for tta in TTA_COUNTS:
        mae, t, pred = results[tta]
        dev = float(np.abs(pred - base_pred)[valid].mean()) * 100
        print(f"{tta:4d} {t:7.2f} {t / base_t:5.2f}x {mae:8.4f} "
              f"{(mae - base_mae) * 100:+9.3f} {dev:13.3f}")


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--conv-dir", default="/root/studies/conv")
    ap.add_argument("--out", default="/root/studies/tta")
    ap.add_argument("--tags", nargs="+",
                    default=["seed0_steplr_balanced16",
                             "seed1_steplr_balanced16",
                             "seed2_steplr_balanced16"])
    ap.add_argument("--state-cache", default=None,
                    help="flagship mode: checkpoint from precision_study.py")
    ap.add_argument("--rows", type=int, default=2048)
    ap.add_argument("--cols", type=int, default=2048)
    ap.add_argument("--scene-seed", type=int, default=3)
    ap.add_argument("--mode", default="balanced16")
    ap.add_argument("--merge", default="mean", choices=("mean", "median"),
                    help="general.tta_merge for the conv-checkpoint mode")
    args = ap.parse_args()

    if args.state_cache:
        run_flagship_mode(args.state_cache, args.rows, args.cols,
                          args.scene_seed, args.mode)
    else:
        run_conv_mode(args.conv_dir, args.out, args.tags, args.merge)


if __name__ == "__main__":
    main()
