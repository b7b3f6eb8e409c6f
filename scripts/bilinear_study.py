#!/usr/bin/env python
"""Bilinear up-mode serving bench: tiles/s + trained-weights deviation.

VERDICT r3 item 6: ``up_mode='bilinear'`` (/root/reference/lib/UNet.py:17-24:
Upsample + conv1x1; ours models/unet.py:248,433) is a first-class reference
mode that had no measurement — ``fold_top_decoder`` is a correct no-op for
it (models/unet.py:748-750), so bilinear configs serve the unfolded graph
and all BENCH/BASELINE serving numbers are transpose-only. This script
closes that: it trains a bilinear flagship briefly (the precision-study
protocol), then measures

  1. serving throughput (the bench.py chained-forward protocol: BN folded,
     fori_loop on device, best-of-3 windows) for bilinear AND transpose in
     the same session, f32 + balanced16;
  2. trained-weights deviation of balanced16 vs exact f32 on a full-scene
     refinement with the bilinear weights (the SERVING_MODES.md metric).

Usage (chip):
  python scripts/bilinear_study.py [--steps 400] [--scene-seed 3]
      [--state-cache /tmp/study_state_bilinear_s3.npz] [--json OUT.json]
"""

from __future__ import annotations

import argparse
import dataclasses
import json
import os
import sys
import tempfile
import time

import numpy as np

_HERE = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, os.path.dirname(_HERE))
sys.path.insert(0, _HERE)

TILE, BATCH, TIMED_ITERS = 256, 128, 16


def _bench_forward(config, params, bn_state, mode_name):
    """bench.py's chained-forward protocol on an already-folded graph."""
    import jax
    import jax.numpy as jnp

    from resdepth_tpu.models.unet import (SERVING_PRECISION_MODES, apply_unet,
                                          serving_precision)

    sm = (serving_precision(mode_name)
          if mode_name in SERVING_PRECISION_MODES else None)
    dtype = jnp.bfloat16 if mode_name == "bfloat16" else jnp.float32

    @jax.jit
    def chain(params, bn_state, x):
        def body(i, carry):
            if sm is not None:
                y, _ = apply_unet(config, params, bn_state, carry,
                                  train=False, **sm.apply_kwargs())
            else:
                y, _ = apply_unet(config, params, bn_state,
                                  carry.astype(dtype), train=False)
            return carry.at[..., 0:1].add(y.astype(jnp.float32) * 1e-9)
        return jax.lax.fori_loop(0, TIMED_ITERS, body, x).sum()

    x = jnp.asarray(np.random.default_rng(0).normal(
        size=(BATCH, TILE, TILE, 3)).astype(np.float32))
    value = float(chain(params, bn_state, x))
    assert np.isfinite(value)

    def window():
        t0 = time.perf_counter()
        float(chain(params, bn_state, x))
        return time.perf_counter() - t0

    elapsed = min(window() for _ in range(3))
    return BATCH * TIMED_ITERS / elapsed


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=400)
    ap.add_argument("--rows", type=int, default=512)
    ap.add_argument("--cols", type=int, default=768)
    ap.add_argument("--scene-seed", type=int, default=3)
    ap.add_argument("--batch", type=int, default=20)
    ap.add_argument("--state-cache",
                    default="/tmp/study_state_bilinear_s3.npz")
    ap.add_argument("--dev-rows", type=int, default=1024,
                    help="deviation-scene size (refined f32 vs balanced16)")
    ap.add_argument("--json", default=None)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from resdepth_tpu.data.dataset import TileDataset
    from resdepth_tpu.data.pipeline import batch_spec_for, device_put_dataset
    from resdepth_tpu.geo import tiff
    from resdepth_tpu.geo.allocation import entire_area_defn
    from resdepth_tpu.infer.tiled import predict_linear_blend
    from resdepth_tpu.models.unet import (flagship_config, fold_serving,
                                          init_unet)
    from resdepth_tpu.train import checkpoint as ckpt_io
    from resdepth_tpu.train.optim import build_optimizer
    from resdepth_tpu.train.step import init_train_state, make_train_step
    from resdepth_tpu.utils import compilation_cache
    from make_demo_data import hillshade, synth_city

    compilation_cache.enable()

    rows, cols = args.rows, args.cols
    gt, dsm_in, *_ = synth_city(rows, cols, seed=args.scene_seed)
    views = np.stack([hillshade(gt, az) for az in (315.0, 135.0, 45.0)], -1)
    rng = np.random.default_rng(args.scene_seed)

    tmp = tempfile.mkdtemp(prefix="bilinear_study_")
    geotransform = (1000.0, 0.25, 0.0, 2000.0, 0.0, -0.25)

    def write(name, data):
        path = os.path.join(tmp, name)
        tiff.write(path, data, geotransform=geotransform, nodata=-9999.0)
        return path

    p_in = write("dsm.tif", dsm_in)
    p_gt = write("gt.tif", gt)
    view_paths = [write(f"ortho_{j}.tif", views[..., j]) for j in range(3)]
    dataset = {"name": "bilinear", "raster_in": p_in, "raster_gt": p_gt,
               "image_list": view_paths, "image_pairs": [(0, 1), (1, 2)],
               "area_defn": entire_area_defn(p_in), "n_samples": 4000}
    sigma = float(np.std(dsm_in - dsm_in.mean()))

    config = dataclasses.replace(flagship_config("geom-stereo"),
                                 up_mode="bilinear")
    params, bn = init_unet(jax.random.PRNGKey(0), config)
    tx = build_optimizer("Adam", 1e-5)
    state = init_train_state(params, bn, tx, 2e-4)

    cache_key = {"scene_seed": args.scene_seed, "steps": args.steps,
                 "rows": rows, "cols": cols, "batch": args.batch,
                 "up_mode": "bilinear"}
    if args.state_cache and os.path.exists(args.state_cache):
        meta, p_loaded, bn_loaded, _ = ckpt_io.load_checkpoint(
            args.state_cache, params_template=state.params,
            bn_template=state.bn_state)
        if meta.get("study_key") != cache_key:
            sys.exit(f"ERROR: cache {args.state_cache} trained with "
                     f"{meta.get('study_key')}, not {cache_key}.")
        state = state.replace(params=p_loaded, bn_state=bn_loaded)
        print(f"[train] loaded cached bilinear state: {args.state_cache}",
              flush=True)
    else:
        train_ds = TileDataset(dataset, "geom-stereo", 256, "train",
                               dsm_std=sigma, ortho_mean=float(views.mean()),
                               ortho_std=float(views.std()),
                               use_all_stereo_pairs=True, augment=True, seed=0)
        spec = batch_spec_for(train_ds)
        K = 8
        step = make_train_step(config, spec, tx, mesh=None, donate=True,
                               steps_per_call=K,
                               precision=jax.lax.Precision.DEFAULT)
        rasters = device_put_dataset(train_ds)
        key = jax.random.PRNGKey(0)
        B = args.batch
        n_calls = max(1, args.steps // K)
        print(f"[train] bilinear flagship: {n_calls * K} steps, batch {B}",
              flush=True)
        t0 = time.perf_counter()
        first = last = None
        for c in range(n_calls):
            pos = np.stack([rng.integers(0, rows - 256, (K, B)),
                            rng.integers(0, cols - 256, (K, B))],
                           -1).astype(np.int32)
            pidx = rng.integers(0, 2, (K, B)).astype(np.int32)
            state, m = step(state, rasters, pos, pidx,
                            np.zeros((K, B, 4), np.int32),
                            np.ones((K, B), np.float32), key)
            m = np.asarray(m)
            first = float(m[0]) if first is None else first
            last = float(m[-1])
        print(f"[train] MAE {first:.3f} -> {last:.3f} m "
              f"({time.perf_counter() - t0:.0f}s)", flush=True)
        if args.state_cache:
            ckpt_io.save_checkpoint(args.state_cache, epoch=0,
                                    params=state.params,
                                    bn_state=state.bn_state,
                                    extra={"study_key": cache_key})

    # ------------------------ serving throughput ------------------------- #
    results = {}
    fold_bi = fold_serving(config, state.params, state.bn_state)
    t_config = flagship_config("geom-stereo")
    t_params, t_bn = init_unet(jax.random.PRNGKey(0), t_config)
    fold_tr = fold_serving(t_config, t_params, t_bn)
    for mode in ("float32", "balanced16"):
        tag = "f32" if mode == "float32" else mode
        bi = _bench_forward(*fold_bi, mode)
        tr = _bench_forward(*fold_tr, mode)
        results[f"bilinear_{tag}_tiles_s"] = bi
        results[f"transpose_{tag}_tiles_s"] = tr
        print(f"[serve/{tag}] bilinear {bi:7.1f} tiles/s | "
              f"transpose {tr:7.1f} tiles/s (same session) | "
              f"ratio {bi / tr:.2f}x", flush=True)

    # --------------------- trained-weights deviation --------------------- #
    d_rows = d_cols = args.dev_rows
    d_gt, d_in, *_ = synth_city(d_rows, d_cols, seed=args.scene_seed + 7)
    d_views = np.stack([hillshade(d_gt, az) for az in (315.0, 135.0)], -1)
    p2_in = write("dev_dsm.tif", d_in)
    dev_paths = [write(f"dev_ortho_{j}.tif", d_views[..., j])
                 for j in range(2)]
    dev_entry = {"name": "dev", "raster_in": p2_in, "image_list": dev_paths,
                 "image_pairs": [(0, 1)],
                 "area_defn": entire_area_defn(p2_in)}
    ds = TileDataset(dev_entry, "geom-stereo", 256, "test", dsm_std=sigma,
                     ortho_mean=float(views.mean()),
                     ortho_std=float(views.std()), seed=0)
    c_f, p_f, b_f = fold_bi
    exact = np.asarray(predict_linear_blend(
        c_f, p_f, b_f, ds, batch_size=128, compute_dtype=jnp.float32,
        fold_bn=False))
    valid = d_gt != -9999.0
    for mode in ("balanced16", "bfloat16"):
        dtype = jnp.bfloat16 if mode == "bfloat16" else mode
        pred = np.asarray(predict_linear_blend(
            c_f, p_f, b_f, ds, batch_size=128, compute_dtype=dtype,
            fold_bn=False))
        dev_cm = float(np.abs(pred - exact)[valid].mean()) * 100
        results[f"bilinear_{mode}_dev_cm"] = dev_cm
        print(f"[deviation/{mode}] mean |delta| vs exact f32: "
              f"{dev_cm:.3f} cm", flush=True)
    mae_in = float(np.abs(d_in - d_gt)[valid].mean())
    mae_ref = float(np.abs(exact - d_gt)[valid].mean())
    results["dev_scene_input_mae"] = mae_in
    results["dev_scene_refined_mae_f32"] = mae_ref
    print(f"[deviation scene] input MAE {mae_in:.3f} m -> refined "
          f"{mae_ref:.3f} m (bilinear f32)", flush=True)

    if args.json:
        with open(args.json, "w") as f:
            json.dump(results, f, indent=1)
        print(f"results -> {args.json}")


if __name__ == "__main__":
    main()
