#!/usr/bin/env python
"""Input-channel-mode serving bench: tiles/s + balanced16 deviation per mode.

VERDICT r4 weak item 4: every serving/training number in BENCH/BASELINE is
`geom-stereo` (3 input channels); `geom`, `geom-mono`, `stereo` and
`geom-multiview` (/root/reference/lib/config.py:13-23, first-conv widths
1-6) are implemented and parity-tested but were never measured — and the
hifi-endpoints first-conv precision policy (models/unet.py serving modes)
is explicitly input-magnitude-dependent, so the balanced16 deviation
budget cannot be assumed to transfer across modes. This script closes
that with the bilinear-study protocol per mode:

  1. train a flagship UNet for --steps optimizer steps (batch 20, K=8
     fused program) on a synthetic scene with the mode's channel stack;
  2. serving throughput on the folded graph (bench.py chained-forward
     protocol: BN folded, fori_loop on device, best-of-3) in exact f32
     and balanced16;
  3. trained-weights deviation of balanced16 (and bfloat16) vs exact f32
     on a full-scene refinement (the SERVING_MODES.md metric), plus the
     scene's input->refined MAE as a sanity check that the 400-step
     weights do real work.

geom-stereo runs as the in-session control row (its numbers cross-check
BENCH/BASELINE). Results -> docs/SERVING_MODES.md input-modes table.

Usage (chip):
  python scripts/channel_modes_study.py [--steps 400] [--scene-seed 3]
      [--modes geom,geom-mono,stereo,geom-stereo,geom-multiview]
      [--state-cache-dir /tmp/study_state_chmodes] [--json OUT.json]
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

TILE, BATCH, TIMED_ITERS = 256, 128, 16   # overridable (--tile/--bench-batch/--iters) for CPU smoke runs

# Per-mode image wiring (3 hillshade views from azimuths 315/135/45):
# training pairs follow the reference's arity rules (lib/config.py:13-23,
# dataset ctor validation) — mono = single-image "pairs", stereo modes =
# 2-image pairs, multiview 3-view = one 3-image tuple.
MODE_PAIRS = {
    "geom": None,
    "geom-mono": [(0,), (1,)],
    "stereo": [(0, 1), (1, 2)],
    "geom-stereo": [(0, 1), (1, 2)],
    "geom-multiview": [(0, 1, 2)],
}
DEV_PAIRS = {  # deviation scene: one pair of the mode's arity
    "geom": None,
    "geom-mono": [(0,)],
    "stereo": [(0, 1)],
    "geom-stereo": [(0, 1)],
    "geom-multiview": [(0, 1, 2)],
}


def _bench_forward(config, params, bn_state, mode_name):
    """bench.py's chained-forward protocol on an already-folded graph."""
    import jax
    import jax.numpy as jnp

    from resdepth_tpu.models.unet import (SERVING_PRECISION_MODES, apply_unet,
                                          serving_precision)

    sm = (serving_precision(mode_name)
          if mode_name in SERVING_PRECISION_MODES else None)

    @jax.jit
    def chain(params, bn_state, x):
        def body(i, carry):
            if sm is not None:
                y, _ = apply_unet(config, params, bn_state, carry,
                                  train=False, **sm.apply_kwargs())
            else:
                y, _ = apply_unet(config, params, bn_state, carry,
                                  train=False)
            return carry.at[..., 0:1].add(y.astype(jnp.float32) * 1e-9)
        return jax.lax.fori_loop(0, TIMED_ITERS, body, x).sum()

    x = jnp.asarray(np.random.default_rng(0).normal(
        size=(BATCH, TILE, TILE, config.n_input_channels)).astype(np.float32))
    value = float(chain(params, bn_state, x))
    if not np.isfinite(value):
        raise RuntimeError(f"non-finite chain output: {value}")

    def window():
        t0 = time.perf_counter()
        out = float(chain(params, bn_state, x))
        dt = time.perf_counter() - t0
        # bench.py's per-window finiteness check: a NaN during a TIMED
        # window (e.g. a precision overflow on an untested channel mode —
        # the exact risk this study measures) must not be timed as valid.
        if not np.isfinite(out):
            raise RuntimeError(f"non-finite chain output in timed window: "
                               f"{out}")
        return dt

    elapsed = min(window() for _ in range(3))
    return BATCH * TIMED_ITERS / elapsed


def run_mode(mode, args, scene, results):
    import jax
    import jax.numpy as jnp

    from resdepth_tpu.data.dataset import TileDataset
    from resdepth_tpu.data.pipeline import batch_spec_for, device_put_dataset
    from resdepth_tpu.infer.tiled import predict_linear_blend
    from resdepth_tpu.models.unet import (analytic_flops, flagship_config,
                                          fold_serving, init_unet)
    from resdepth_tpu.train import checkpoint as ckpt_io
    from resdepth_tpu.train.optim import build_optimizer
    from resdepth_tpu.train.step import init_train_state, make_train_step

    import dataclasses

    rows, cols = scene["rows"], scene["cols"]
    rng = np.random.default_rng(args.scene_seed + 1)
    config = flagship_config(mode)
    if args.smoke_model:
        # CPU smoke runs: keep the mode wiring, shrink the network.
        config = dataclasses.replace(config, depth=2, start_kernel=4,
                                     max_filter_depth=8)
    params, bn = init_unet(jax.random.PRNGKey(0), config)
    tx = build_optimizer("Adam", 1e-5)
    state = init_train_state(params, bn, tx, 2e-4)

    dataset = {"name": mode, "raster_in": scene["p_in"],
               "raster_gt": scene["p_gt"],
               "area_defn": scene["area"], "n_samples": 4000}
    if MODE_PAIRS[mode] is not None:
        dataset.update(image_list=scene["view_paths"],
                       image_pairs=MODE_PAIRS[mode])

    cache_key = {"scene_seed": args.scene_seed, "steps": args.steps,
                 "rows": rows, "cols": cols, "batch": args.train_batch,
                 "tile": TILE, "mode": mode, "smoke": args.smoke_model}
    cache = (os.path.join(args.state_cache_dir, f"{mode}.npz")
             if args.state_cache_dir else None)
    if cache and os.path.exists(cache):
        # Check provenance BEFORE restoring: a cache written under different
        # model-shape settings must produce this message, not a template
        # shape error from load_checkpoint.
        meta = ckpt_io.load_meta(cache)
        if meta.get("study_key") != cache_key:
            sys.exit(f"ERROR: cache {cache} trained with "
                     f"{meta.get('study_key')}, not {cache_key}.")
        _meta, p_loaded, bn_loaded, _ = ckpt_io.load_checkpoint(
            cache, params_template=state.params, bn_template=state.bn_state)
        state = state.replace(params=p_loaded, bn_state=bn_loaded)
        print(f"[{mode}/train] loaded cached state: {cache}", flush=True)
    else:
        train_ds = TileDataset(
            dataset, mode, TILE, "train", dsm_std=scene["sigma"],
            ortho_mean=scene["view_mean"], ortho_std=scene["view_std"],
            use_all_stereo_pairs=True, augment=True, seed=0)
        spec = batch_spec_for(train_ds)
        K, B = 8, args.train_batch
        step = make_train_step(config, spec, tx, mesh=None, donate=True,
                               steps_per_call=K,
                               precision=jax.lax.Precision.DEFAULT)
        rasters = device_put_dataset(train_ds)
        key = jax.random.PRNGKey(0)
        n_pairs = len(MODE_PAIRS[mode] or [()])
        n_calls = max(1, args.steps // K)
        print(f"[{mode}/train] flagship: {n_calls * K} steps, batch {B}",
              flush=True)
        t0 = time.perf_counter()
        first = last = None
        for _c in range(n_calls):
            pos = np.stack([rng.integers(0, rows - TILE, (K, B)),
                            rng.integers(0, cols - TILE, (K, B))],
                           -1).astype(np.int32)
            pidx = rng.integers(0, n_pairs, (K, B)).astype(np.int32)
            state, m = step(state, rasters, pos, pidx,
                            np.zeros((K, B, 4), np.int32),
                            np.ones((K, B), np.float32), key)
            m = np.asarray(m)
            first = float(m[0]) if first is None else first
            last = float(m[-1])
        print(f"[{mode}/train] MAE {first:.3f} -> {last:.3f} m "
              f"({time.perf_counter() - t0:.0f}s)", flush=True)
        if cache:
            ckpt_io.save_checkpoint(cache, epoch=0, params=state.params,
                                    bn_state=state.bn_state,
                                    extra={"study_key": cache_key})

    # ------------------------ serving throughput ------------------------- #
    folded = fold_serving(config, state.params, state.bn_state)
    gflops = analytic_flops(config, TILE, composed_top=True) / 1e9
    for prec in ("float32", "balanced16"):
        tag = "f32" if prec == "float32" else prec
        tps = _bench_forward(*folded, prec)
        results[f"{mode}_{tag}_tiles_s"] = round(tps, 1)
        mfu = 100 * tps * gflops / 1e3 / 197.0
        print(f"[{mode}/serve/{tag}] {tps:7.1f} tiles/s "
              f"({tps * gflops / 1e3:.1f} TFLOP/s = {mfu:.1f}% bf16 peak)",
              flush=True)

    # --------------------- trained-weights deviation --------------------- #
    dev_entry = {"name": f"dev_{mode}", "raster_in": scene["dev_in"],
                 "area_defn": scene["dev_area"]}
    if DEV_PAIRS[mode] is not None:
        dev_entry.update(image_list=scene["dev_paths"],
                         image_pairs=DEV_PAIRS[mode])
    ds = TileDataset(dev_entry, mode, TILE, "test", dsm_std=scene["sigma"],
                     ortho_mean=scene["view_mean"],
                     ortho_std=scene["view_std"], seed=0)
    c_f, p_f, b_f = folded
    exact = np.asarray(predict_linear_blend(
        c_f, p_f, b_f, ds, batch_size=128, compute_dtype=jnp.float32,
        fold_bn=False))
    valid = scene["dev_gt"] != -9999.0
    for prec in ("balanced16", "bfloat16"):
        dtype = jnp.bfloat16 if prec == "bfloat16" else prec
        pred = np.asarray(predict_linear_blend(
            c_f, p_f, b_f, ds, batch_size=128, compute_dtype=dtype,
            fold_bn=False))
        dev_cm = float(np.abs(pred - exact)[valid].mean()) * 100
        results[f"{mode}_{prec}_dev_cm"] = round(dev_cm, 3)
        print(f"[{mode}/deviation/{prec}] mean |delta| vs exact f32: "
              f"{dev_cm:.3f} cm", flush=True)
    mae_in = float(np.abs(scene["dev_in_arr"] - scene["dev_gt"])[valid].mean())
    mae_ref = float(np.abs(exact - scene["dev_gt"])[valid].mean())
    results[f"{mode}_dev_scene_mae"] = {"input": round(mae_in, 4),
                                        "refined_f32": round(mae_ref, 4)}
    print(f"[{mode}/deviation scene] input MAE {mae_in:.3f} m -> refined "
          f"{mae_ref:.3f} m (f32)", flush=True)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=400)
    ap.add_argument("--rows", type=int, default=512)
    ap.add_argument("--cols", type=int, default=768)
    ap.add_argument("--scene-seed", type=int, default=3)
    ap.add_argument("--dev-rows", type=int, default=1024)
    ap.add_argument("--modes",
                    default="geom,geom-mono,stereo,geom-stereo,geom-multiview")
    ap.add_argument("--state-cache-dir", default="/tmp/study_state_chmodes")
    ap.add_argument("--json", default=None)
    ap.add_argument("--tile", type=int, default=None,
                    help="override the 256-px protocol (CPU smoke runs)")
    ap.add_argument("--bench-batch", type=int, default=None)
    ap.add_argument("--iters", type=int, default=None)
    ap.add_argument("--train-batch", type=int, default=20)
    ap.add_argument("--smoke-model", action="store_true",
                    help="depth-2/start-4 model: CPU wiring smoke only")
    args = ap.parse_args()

    global TILE, BATCH, TIMED_ITERS
    if args.tile:
        TILE = args.tile
    if args.bench_batch:
        BATCH = args.bench_batch
    if args.iters:
        TIMED_ITERS = args.iters

    from resdepth_tpu.geo import tiff
    from resdepth_tpu.geo.allocation import entire_area_defn
    from resdepth_tpu.utils import compilation_cache
    from make_demo_data import hillshade, synth_city

    compilation_cache.enable()
    if args.state_cache_dir:
        os.makedirs(args.state_cache_dir, exist_ok=True)

    rows, cols = args.rows, args.cols
    gt, dsm_in, *_ = synth_city(rows, cols, seed=args.scene_seed)
    views = np.stack([hillshade(gt, az) for az in (315.0, 135.0, 45.0)], -1)
    tmp = tempfile.mkdtemp(prefix="chmodes_study_")
    geotransform = (1000.0, 0.25, 0.0, 2000.0, 0.0, -0.25)

    def write(name, data):
        path = os.path.join(tmp, name)
        tiff.write(path, data, geotransform=geotransform, nodata=-9999.0)
        return path

    d_rows = d_cols = args.dev_rows
    d_gt, d_in, *_ = synth_city(d_rows, d_cols, seed=args.scene_seed + 7)
    d_views = np.stack([hillshade(d_gt, az) for az in (315.0, 135.0, 45.0)],
                       -1)
    p_in = write("dsm.tif", dsm_in)
    scene = {
        "rows": rows, "cols": cols,
        "p_in": p_in, "p_gt": write("gt.tif", gt),
        "view_paths": [write(f"ortho_{j}.tif", views[..., j])
                       for j in range(3)],
        "area": entire_area_defn(p_in),
        "sigma": float(np.std(dsm_in - dsm_in.mean())),
        "view_mean": float(views.mean()), "view_std": float(views.std()),
        "dev_in": write("dev_dsm.tif", d_in),
        "dev_paths": [write(f"dev_ortho_{j}.tif", d_views[..., j])
                      for j in range(3)],
        "dev_gt": d_gt, "dev_in_arr": d_in,
    }
    scene["dev_area"] = entire_area_defn(scene["dev_in"])

    modes = [m.strip() for m in args.modes.split(",") if m.strip()]
    unknown = [m for m in modes if m not in MODE_PAIRS]
    if unknown:
        sys.exit(f"ERROR: unknown --modes {unknown}; valid: "
                 f"{sorted(MODE_PAIRS)}")

    results = {"steps": args.steps, "scene_seed": args.scene_seed}
    for mode in modes:
        run_mode(mode, args, scene, results)
    if args.json:
        with open(args.json, "w") as f:
            json.dump(results, f, indent=1)
        print(f"results -> {args.json}")


if __name__ == "__main__":
    main()
