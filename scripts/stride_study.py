#!/usr/bin/env python
"""Tile-stride study: e2e scene refinement time vs accuracy per stride.

The reference evaluates at a fixed stride = tile/2 (overlapping tiles,
~4x model compute per scene pixel — /root/reference/lib/DsmOrthoDataset.py:99).
The eval CLI's opt-in ``general.tile_stride`` admits any stride in
[tile/2, tile]; this study quantifies the trade on a trained flagship model:
full-scene wall time, refined MAE vs ground truth, and deviation vs the
parity (stride = tile/2) output, per stride.

Usage:
  python scripts/stride_study.py --state-cache /tmp/study_state_s3.npz \
      [--rows 2048] [--cols 2048] [--scene-seed 3] [--mode balanced16]

The state cache is a checkpoint produced by scripts/precision_study.py
(flagship geom-stereo weights trained on a synthetic city of the same seed).
"""

from __future__ import annotations

import argparse
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
    ap.add_argument("--state-cache", required=True,
                    help="trained checkpoint from scripts/precision_study.py")
    ap.add_argument("--rows", type=int, default=2048)
    ap.add_argument("--cols", type=int, default=2048)
    ap.add_argument("--scene-seed", type=int, default=3)
    ap.add_argument("--mode", default="balanced16",
                    help="serving compute_dtype for the timed runs")
    ap.add_argument("--strides", type=int, nargs="+",
                    default=[128, 160, 192, 224, 256])
    args = ap.parse_args()

    import jax.numpy as jnp

    from resdepth_tpu.data.dataset import TileDataset
    from resdepth_tpu.geo import tiff
    from resdepth_tpu.geo.allocation import entire_area_defn
    from resdepth_tpu.infer.tiled import predict_linear_blend
    from resdepth_tpu.models.unet import flagship_config, init_unet
    from resdepth_tpu.train import checkpoint as ckpt_io
    from resdepth_tpu.utils import compilation_cache
    from make_demo_data import hillshade, synth_city

    compilation_cache.enable()
    import jax

    rows, cols = args.rows, args.cols
    gt, dsm_in, *_ = synth_city(rows, cols, seed=args.scene_seed)
    views = np.stack([hillshade(gt, az) for az in (315.0, 135.0, 45.0)], -1)

    tmp = tempfile.mkdtemp(prefix="stride_study_")
    geotransform = (1000.0, 0.25, 0.0, 2000.0, 0.0, -0.25)

    def write(name, data):
        path = os.path.join(tmp, name)
        tiff.write(path, data, geotransform=geotransform, nodata=-9999.0)
        return path

    p_in = write("dsm.tif", dsm_in)
    view_paths = [write(f"ortho_{j}.tif", views[..., j]) for j in range(3)]
    dataset = {"name": "stride", "raster_in": p_in, "image_list": view_paths,
               "image_pairs": [(0, 1)], "area_defn": entire_area_defn(p_in)}
    sigma = float(np.std(dsm_in - dsm_in.mean()))

    config = flagship_config("geom-stereo")
    params, bn = init_unet(jax.random.PRNGKey(0), config)
    meta, params, bn, _ = ckpt_io.load_checkpoint(
        args.state_cache, params_template=params, bn_template=bn)
    # Scene-seed mismatch silently changes the training distribution (and
    # normalization sigma) under the weights — refuse like precision_study.
    cached_seed = (meta.get("study_key") or {}).get("scene_seed")
    if cached_seed is not None and cached_seed != args.scene_seed:
        sys.exit(f"ERROR: --state-cache was trained on scene seed "
                 f"{cached_seed}, not --scene-seed {args.scene_seed}.")
    print(f"[weights] {args.state_cache} "
          f"(trained: {meta.get('study_key')})", flush=True)

    # Fold BN + the composed top ONCE: folding inside predict would rebuild
    # (and re-upload) the folded weights inside every timed call.
    from resdepth_tpu.models.unet import fold_serving
    config, params, bn = fold_serving(config, params, bn)
    params = jax.device_put(params)
    bn = jax.device_put(bn)

    dtype = {"float32": jnp.float32, "bfloat16": jnp.bfloat16}.get(
        args.mode, args.mode)

    from resdepth_tpu.data.pipeline import device_put_dataset

    results = {}
    for stride in args.strides:
        ds = TileDataset(dataset, "geom-stereo", 256, "test", stride=stride,
                         dsm_std=sigma, ortho_mean=float(views.mean()),
                         ortho_std=float(views.std()), seed=0)
        # e2e wall time (upload + compute + full-scene fetch) is dominated by
        # host<->device transfer on relayed chips and noisy; the
        # stride-sensitive part is the DEVICE path (gather + model + stitch),
        # which the CLI amortizes by re-using uploaded rasters across image
        # pairs. Time both: device-only (pre-uploaded, scalar-synced,
        # best-of-3) and one e2e pass.
        rasters = device_put_dataset(ds)
        dev_times = []
        pred = None
        for it in range(4):
            t0 = time.perf_counter()
            pred = predict_linear_blend(config, params, bn, ds,
                                        batch_size=128, compute_dtype=dtype,
                                        rasters=rasters, as_numpy=False,
                                        fold_bn=False)
            float(jnp.sum(pred))  # relay-safe completion sync
            if it:
                dev_times.append(time.perf_counter() - t0)
        pred = np.asarray(pred)
        t0 = time.perf_counter()
        e2e = np.asarray(predict_linear_blend(config, params, bn,
                                              ds, batch_size=128,
                                              compute_dtype=dtype,
                                              fold_bn=False))
        e2e_t = time.perf_counter() - t0
        np.testing.assert_allclose(e2e, pred, atol=1e-5)
        results[stride] = (pred, min(dev_times), len(ds), e2e_t)
        print(f"[stride {stride:3d}] {len(ds):4d} tiles, "
              f"device {min(dev_times):6.2f} s/scene, e2e {e2e_t:6.2f} s",
              flush=True)

    base_stride = min(args.strides)
    base = results[base_stride][0]
    valid = gt != -9999.0
    mae_in = float(np.abs(dsm_in - gt)[valid].mean())
    print(f"\nscene {rows}x{cols}, mode {args.mode}; input MAE {mae_in:.3f} m")
    print(f"{'stride':>6s} {'tiles':>6s} {'dev s':>7s} {'speedup':>8s} "
          f"{'e2e s':>7s} {'MAE(m)':>8s} {'dMAE(cm)':>9s} "
          f"{'dev-vs-' + str(base_stride):>12s}")
    base_t = results[base_stride][1]
    base_mae = float(np.abs(base - gt)[valid].mean())
    for stride in args.strides:
        pred, t, n, e2e_t = results[stride]
        mae = float(np.abs(pred - gt)[valid].mean())
        dev = float(np.abs(pred - base)[valid].mean()) * 100
        print(f"{stride:6d} {n:6d} {t:7.2f} {base_t / t:7.2f}x {e2e_t:7.2f} "
              f"{mae:8.3f} {(mae - base_mae) * 100:+9.3f} {dev:9.3f}cm")


if __name__ == "__main__":
    main()
