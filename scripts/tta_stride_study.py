#!/usr/bin/env python
"""Joint TTA x tile-stride grid: accuracy/cost cells, not extrapolation.

VERDICT r3 item 4: round 3 measured ``general.tile_stride`` and
``general.tta`` in SEPARATE studies (scripts/stride_study.py,
scripts/tta_study.py) and BASELINE.md extrapolated their composition
("stride 3*tile/4 + TTA-4 ~= 2x parity compute for the full accuracy
gain"). This script measures the joint cells directly on the flagship
weights: every (stride, tta) combination refines the same synthetic city
scene; reported per cell are refined MAE vs ground truth, device s/scene,
and compute relative to the parity single-pass (stride=128, tta=1).

Usage (chip):
  python scripts/tta_stride_study.py --state-cache /tmp/study_state_s3.npz \
      [--rows 2048] [--cols 2048] [--scene-seed 3] [--mode balanced16] \
      [--strides 128 192] [--ttas 1 4 8] [--json OUT.json]

The state cache is a flagship checkpoint from scripts/precision_study.py
(the same artifact stride_study.py and tta_study.py mode B consume).
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import tempfile
import time

import numpy as np

_HERE = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, os.path.dirname(_HERE))
sys.path.insert(0, _HERE)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--state-cache", required=True)
    ap.add_argument("--rows", type=int, default=2048)
    ap.add_argument("--cols", type=int, default=2048)
    ap.add_argument("--scene-seed", type=int, default=3)
    ap.add_argument("--mode", default="balanced16")
    ap.add_argument("--strides", type=int, nargs="+", default=[128, 192])
    ap.add_argument("--ttas", type=int, nargs="+", default=[1, 4, 8])
    ap.add_argument("--merge", default="mean", choices=["mean", "median"])
    ap.add_argument("--json", default=None, help="also dump cells as JSON")
    args = ap.parse_args()

    import jax.numpy as jnp

    from resdepth_tpu.data.dataset import TileDataset
    from resdepth_tpu.data.pipeline import device_put_dataset
    from resdepth_tpu.geo import tiff
    from resdepth_tpu.geo.allocation import entire_area_defn
    from resdepth_tpu.infer.tiled import predict_linear_blend
    from resdepth_tpu.models.unet import flagship_config, fold_serving, init_unet
    from resdepth_tpu.train import checkpoint as ckpt_io
    from resdepth_tpu.utils import compilation_cache
    from make_demo_data import hillshade, synth_city

    compilation_cache.enable()
    import jax

    rows, cols = args.rows, args.cols
    gt, dsm_in, *_ = synth_city(rows, cols, seed=args.scene_seed)
    views = np.stack([hillshade(gt, az) for az in (315.0, 135.0, 45.0)], -1)

    tmp = tempfile.mkdtemp(prefix="tta_stride_")
    geotransform = (1000.0, 0.25, 0.0, 2000.0, 0.0, -0.25)

    def write(name, data):
        path = os.path.join(tmp, name)
        tiff.write(path, data, geotransform=geotransform, nodata=-9999.0)
        return path

    p_in = write("dsm.tif", dsm_in)
    view_paths = [write(f"ortho_{j}.tif", views[..., j]) for j in range(3)]
    dataset = {"name": "grid", "raster_in": p_in, "image_list": view_paths,
               "image_pairs": [(0, 1)], "area_defn": entire_area_defn(p_in)}
    sigma = float(np.std(dsm_in - dsm_in.mean()))

    config = flagship_config("geom-stereo")
    params, bn = init_unet(jax.random.PRNGKey(0), config)
    meta, params, bn, _ = ckpt_io.load_checkpoint(
        args.state_cache, params_template=params, bn_template=bn)
    cached_seed = (meta.get("study_key") or {}).get("scene_seed")
    if cached_seed is not None and cached_seed != args.scene_seed:
        sys.exit(f"ERROR: --state-cache was trained on scene seed "
                 f"{cached_seed}, not --scene-seed {args.scene_seed}.")
    print(f"[weights] {args.state_cache} "
          f"(trained: {meta.get('study_key')})", flush=True)

    config, params, bn = fold_serving(config, params, bn)
    params = jax.device_put(params)
    bn = jax.device_put(bn)
    dtype = {"float32": jnp.float32, "bfloat16": jnp.bfloat16}.get(
        args.mode, args.mode)

    valid = gt != -9999.0
    mae_in = float(np.abs(dsm_in - gt)[valid].mean())

    cells = {}
    for stride in args.strides:
        ds = TileDataset(dataset, "geom-stereo", 256, "test", stride=stride,
                         dsm_std=sigma, ortho_mean=float(views.mean()),
                         ortho_std=float(views.std()), seed=0)
        rasters = device_put_dataset(ds)
        for tta in args.ttas:
            dev_times = []
            pred = None
            for it in range(4):
                t0 = time.perf_counter()
                pred = predict_linear_blend(
                    config, params, bn, ds, batch_size=128,
                    compute_dtype=dtype, rasters=rasters, as_numpy=False,
                    fold_bn=False, tta=tta, tta_merge=args.merge)
                float(jnp.sum(pred))  # relay-safe completion sync
                if it:
                    dev_times.append(time.perf_counter() - t0)
            pred = np.asarray(pred)
            mae = float(np.abs(pred - gt)[valid].mean())
            cells[(stride, tta)] = {
                "stride": stride, "tta": tta, "tiles": len(ds),
                "model_passes": len(ds) * tta,
                "device_s": min(dev_times), "mae_m": mae,
            }
            print(f"[stride {stride:3d} tta {tta}] {len(ds):4d} tiles x "
                  f"{tta} passes, device {min(dev_times):6.2f} s/scene, "
                  f"MAE {mae:.4f} m", flush=True)

    # Parity reference = (stride 128, tta 1) when measured; on a custom
    # grid that omits it, fall back to the cheapest measured cell and SAY
    # so — a KeyError here would discard the chip measurements above.
    base_key = (128, 1) if (128, 1) in cells \
        else (min(args.strides), min(args.ttas))
    base = cells[base_key]
    print(f"\nscene {rows}x{cols}, mode {args.mode}, merge {args.merge}; "
          f"input MAE {mae_in:.3f} m; rel-compute/rel-time base cell = "
          f"stride {base_key[0]}, tta {base_key[1]}"
          + ("" if base_key == (128, 1) else
             " (NOT the stride-128/tta-1 parity point — it was not in "
             "this grid)"))
    print(f"{'stride':>6s} {'tta':>4s} {'passes':>7s} {'rel compute':>12s} "
          f"{'dev s':>7s} {'rel time':>9s} {'MAE(m)':>8s} {'dMAE(cm)':>9s}")
    for (stride, tta), c in sorted(cells.items()):
        print(f"{stride:6d} {tta:4d} {c['model_passes']:7d} "
              f"{c['model_passes'] / base['model_passes']:11.2f}x "
              f"{c['device_s']:7.2f} {c['device_s'] / base['device_s']:8.2f}x "
              f"{c['mae_m']:8.4f} {(c['mae_m'] - base['mae_m']) * 100:+9.3f}")
    if args.json:
        with open(args.json, "w") as f:
            json.dump({"mode": args.mode, "merge": args.merge,
                       "rows": rows, "cols": cols, "input_mae": mae_in,
                       "cells": list(cells.values())}, f, indent=1)
        print(f"\ncells -> {args.json}")


if __name__ == "__main__":
    main()
