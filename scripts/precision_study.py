#!/usr/bin/env python
"""Serving-precision deviation study on TRAINED weights.

Trains the flagship geom-stereo UNet briefly on a synthetic city scene, then
refines the full scene at every serving precision (f32-HIGH parity path,
bfloat16, mixed) and reports each mode's deviation from f32 plus its
measured batch-128 tile throughput. This is the reproducible form of the
BASELINE.md "mixed-precision serving study": the qualifying rule is mean
deviation <= 1 cm (the BASELINE.json accuracy budget) for a mode to be
eligible as the bench headline.

Usage:  python scripts/precision_study.py [--steps 400] [--rows 512] [--cols 768]
"""

from __future__ import annotations

import argparse
import os
import sys
import tempfile
import time

import numpy as np

_HERE = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, os.path.dirname(_HERE))   # repo root: resdepth_tpu package
sys.path.insert(0, _HERE)                    # sibling demo-scene helpers


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=400)
    ap.add_argument("--rows", type=int, default=512)
    ap.add_argument("--cols", type=int, default=768)
    ap.add_argument("--batch", type=int, default=20)
    ap.add_argument("--scene-seed", type=int, default=3,
                    help="synthetic-city seed; vary to check deviation-margin "
                         "robustness across scenes")
    ap.add_argument("--state-cache", default=None,
                    help="checkpoint path: reuse trained weights if present, "
                         "else train and save (same training is deterministic "
                         "per scene seed)")
    ap.add_argument("--attrib", action="store_true",
                    help="per-layer precision attribution instead of the mode "
                         "table: each conv solo-demoted to 1-pass DEFAULT "
                         "(others 3-pass HIGH) and its deviation contribution "
                         "reported — the measurement behind the 'balanced' "
                         "serving mode (BASELINE.md)")
    args = ap.parse_args()
    if args.rows <= 256 or args.cols <= 256:
        ap.error("--rows/--cols must exceed the 256 px tile size")

    import jax
    import jax.numpy as jnp

    from resdepth_tpu.data.dataset import TileDataset
    from resdepth_tpu.data.pipeline import batch_spec_for, device_put_dataset
    from resdepth_tpu.geo import tiff
    from resdepth_tpu.geo.allocation import entire_area_defn
    from resdepth_tpu.infer.tiled import predict_linear_blend
    from resdepth_tpu.models.unet import flagship_config, init_unet
    from resdepth_tpu.train.optim import build_optimizer
    from resdepth_tpu.train.step import init_train_state, make_train_step
    from make_demo_data import hillshade, synth_city

    rows, cols = args.rows, args.cols
    gt, dsm_in, building, water = synth_city(rows, cols, seed=args.scene_seed)
    views = np.stack([hillshade(gt, az) for az in (315.0, 135.0, 45.0)], -1)
    rng = np.random.default_rng(args.scene_seed)

    tmp = tempfile.mkdtemp(prefix="precision_study_")
    geotransform = (1000.0, 0.25, 0.0, 2000.0, 0.0, -0.25)

    def write(name, data):
        path = os.path.join(tmp, name)
        tiff.write(path, data, geotransform=geotransform, nodata=-9999.0)
        return path

    p_in = write("dsm.tif", dsm_in)
    write("gt.tif", gt)
    view_paths = [write(f"ortho_{j}.tif", views[..., j]) for j in range(3)]

    dataset = {
        "name": "study",
        "raster_in": p_in,
        "raster_gt": os.path.join(tmp, "gt.tif"),
        "image_list": view_paths,
        "image_pairs": [(0, 1), (1, 2)],
        "area_defn": entire_area_defn(p_in),
        "n_samples": 4000,
    }
    sigma = float(np.std(dsm_in - dsm_in.mean()))

    train_ds = TileDataset(dataset, "geom-stereo", 256, "train",
                           dsm_std=sigma, ortho_mean=float(views.mean()),
                           ortho_std=float(views.std()),
                           use_all_stereo_pairs=True, augment=True, seed=0)

    config = flagship_config("geom-stereo")
    params, bn = init_unet(jax.random.PRNGKey(0), config)
    tx = build_optimizer("Adam", 1e-5)
    state = init_train_state(params, bn, tx, 2e-4)
    spec = batch_spec_for(train_ds, transform_dsm=True, transform_orthos=True,
                          augment=True)
    K = 8
    step = make_train_step(config, spec, tx, mesh=None, donate=True,
                           steps_per_call=K,
                           precision=jax.lax.Precision.DEFAULT)
    rasters = device_put_dataset(train_ds)
    key = jax.random.PRNGKey(0)
    B = args.batch

    from resdepth_tpu.train import checkpoint as ckpt_io

    cache_key = {"scene_seed": args.scene_seed, "steps": args.steps,
                 "rows": args.rows, "cols": args.cols, "batch": args.batch}
    if args.state_cache and os.path.exists(args.state_cache):
        meta, p_loaded, bn_loaded, _ = ckpt_io.load_checkpoint(
            args.state_cache, params_template=state.params,
            bn_template=state.bn_state)
        cached_key = meta.get("study_key")
        if cached_key != cache_key:
            sys.exit(f"ERROR: --state-cache {args.state_cache} was trained "
                     f"with {cached_key}, not {cache_key} — refusing to mix "
                     "scenes/protocols; delete the file or use another path.")
        state = state.replace(params=p_loaded, bn_state=bn_loaded)
        print(f"[train] loaded cached trained state: {args.state_cache}",
              flush=True)
    else:
        n_calls = max(1, args.steps // K)
        print(f"[train] {n_calls * K} steps, batch {B}, DEFAULT precision",
              flush=True)
        t0 = time.perf_counter()
        first = last = None
        for c in range(n_calls):
            pos = np.stack([rng.integers(0, rows - 256, (K, B)),
                            rng.integers(0, cols - 256, (K, B))], -1).astype(np.int32)
            pidx = rng.integers(0, 2, (K, B)).astype(np.int32)
            state, m = step(state, rasters, pos, pidx,
                            np.zeros((K, B, 4), np.int32),
                            np.ones((K, B), np.float32), key)
            m = np.asarray(m)
            if first is None:
                first = float(m[0])
            last = float(m[-1])
        print(f"[train] MAE {first:.3f} -> {last:.3f} m "
              f"({time.perf_counter() - t0:.0f}s)", flush=True)
        if args.state_cache:
            ckpt_io.save_checkpoint(args.state_cache, epoch=0,
                                    params=state.params, bn_state=state.bn_state,
                                    extra={"study_key": cache_key})
            print(f"[train] cached trained state: {args.state_cache}", flush=True)

    test_ds = TileDataset(dict(dataset, image_pairs=[(0, 1)]), "geom-stereo",
                          256, "test",
                          dsm_std=sigma, ortho_mean=float(views.mean()),
                          ortho_std=float(views.std()), seed=0)

    if args.attrib:
        _run_attribution(config, state, test_ds, sigma)
        return

    outputs, rates = {}, {}
    modes = ("float32", "bfloat16", "mixed", "fast32", "act2pass",
             "balanced", "balanced16")
    for mode in modes:
        dtype = {"float32": jnp.float32, "bfloat16": jnp.bfloat16}.get(mode, mode)
        pred = predict_linear_blend(config, state.params, state.bn_state,
                                    test_ds, batch_size=128,
                                    compute_dtype=dtype)
        outputs[mode] = pred
        rates[mode] = _bench_mode(config, state, mode)

    valid = gt != -9999.0
    mae_in = float(np.abs(dsm_in - gt)[valid].mean())
    mae_f32 = float(np.abs(outputs["float32"] - gt)[valid].mean())
    print(f"\n[accuracy] input MAE {mae_in:.3f} m -> refined (f32) "
          f"{mae_f32:.3f} m over {rows}x{cols}")
    print(f"\n{'mode':10s} {'mean dev':>10s} {'p99':>10s} {'max':>10s} "
          f"{'tiles/s@128':>12s}  verdict")
    for mode in modes[1:]:
        d = np.abs(outputs[mode] - outputs["float32"])[valid]
        mean, p99, dmax = d.mean() * 100, np.percentile(d, 99) * 100, d.max() * 100
        verdict = "INSIDE <=1cm budget" if mean <= 1.0 else "outside budget"
        print(f"{mode:10s} {mean:9.3f}cm {p99:9.2f}cm {dmax:9.1f}cm "
              f"{rates[mode]:12.0f}  {verdict}")
    print(f"{'float32':10s} {'—':>10s} {'—':>10s} {'—':>10s} "
          f"{rates['float32']:12.0f}  parity path")


def _run_attribution(config, state, test_ds, sigma: float) -> None:
    """Per-layer solo-demotion study over every test tile of the scene.

    Reference forward: every conv at 3-pass f32-HIGH. For each conv layer,
    demote ONLY that layer to 1-pass bf16 DEFAULT and report the mean
    absolute output deviation in cm (denormalized by the scene sigma). The
    two dominant layers (encoder0, last) are what the 'balanced' serving
    mode re-promotes to HIGH."""
    import dataclasses

    import jax
    import jax.numpy as jnp

    from resdepth_tpu.data.pipeline import (batch_spec_for, build_batch,
                                            device_put_dataset)
    from resdepth_tpu.models.unet import apply_unet, fold_serving

    fcfg, fparams, fstate = fold_serving(config, state.params, state.bn_state)
    rasters = device_put_dataset(test_ds)
    spec = batch_spec_for(test_ds, transform_dsm=True, transform_orthos=True,
                          augment=False)
    spec = dataclasses.replace(spec, use_bounds=False, has_target=False)
    n = len(test_ds.positions)
    batch = build_batch(rasters,
                        jnp.asarray(np.asarray(test_ds.positions, np.int32)),
                        jnp.asarray(np.asarray(test_ds.pair_indices, np.int32)),
                        jnp.zeros((n, 4), jnp.int32), jax.random.PRNGKey(0),
                        spec)
    x = batch["input"]

    H, D = jax.lax.Precision.HIGH, jax.lax.Precision.DEFAULT
    layers = ([f"encoder{i}" for i in range(fcfg.depth)] + ["bottleneck"]
              + [f"up{i}" for i in range(fcfg.depth - 1)]
              + [f"decoder{i}" for i in range(fcfg.depth - 1)] + ["last"])

    def run(base, overrides):
        @jax.jit
        def f(p, s, xx):
            return apply_unet(fcfg, p, s, xx, train=False, precision=base,
                              layer_precisions=dict(overrides))[0]
        return np.asarray(f(fparams, fstate, x))

    y_ref = run(H, {})

    def dev_cm(y) -> float:
        return float(np.abs(y - y_ref).mean() * sigma * 100)

    print(f"\n[attrib] {n} tiles, sigma={sigma:.2f} m; reference = all-HIGH")
    print(f"all-DEFAULT          : {dev_cm(run(D, {})):.3f} cm")
    solo = {}
    for name in layers:
        solo[name] = dev_cm(run(H, {name: D}))
        print(f"solo-DEFAULT {name:10s}: {solo[name]:.3f} cm", flush=True)
    print("\nranked contributions (cm):")
    for name, d in sorted(solo.items(), key=lambda kv: -kv[1]):
        print(f"  {name:10s} {d:.3f}")


def _bench_mode(config, state, mode: str) -> float:
    """Batch-128 forward throughput for one serving mode (folded BN)."""
    import jax
    import jax.numpy as jnp

    from resdepth_tpu.models.unet import (SERVING_PRECISION_MODES, apply_unet,
                                          fold_serving, serving_precision)

    fcfg, fparams, fstate = fold_serving(config, state.params, state.bn_state)
    B, iters = 128, 8

    @jax.jit
    def chain(p, s, x):
        def body(i, carry):
            if mode in SERVING_PRECISION_MODES:
                sm = serving_precision(mode)
                y, _ = apply_unet(fcfg, p, s, carry, train=False,
                                  **sm.apply_kwargs())
            else:
                dt = jnp.bfloat16 if mode == "bfloat16" else jnp.float32
                y, _ = apply_unet(fcfg, p, s, carry.astype(dt), train=False)
            return carry.at[..., 0:1].add(y.astype(jnp.float32) * 1e-9)
        return jax.lax.fori_loop(0, iters, body, x).sum()

    def run_once() -> None:
        # Plain raise, not assert: must survive `python -O`.
        value = float(chain(fparams, fstate, x))
        if not np.isfinite(value):
            raise RuntimeError(f"non-finite benchmark output: {value}")

    x = jnp.asarray(np.random.default_rng(0).normal(
        size=(B, 256, 256, fcfg.n_input_channels)).astype(np.float32))
    run_once()
    best = 1e9
    for _ in range(3):
        t0 = time.perf_counter()
        run_once()
        best = min(best, time.perf_counter() - t0)
    return B * iters / best


if __name__ == "__main__":
    main()
