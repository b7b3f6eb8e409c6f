#!/usr/bin/env python
"""Train-step throughput matrix: precision mode x remat x per-chip batch.

Two VERDICT r2 studies share this harness:

1. Remat A/B (item 3): the f32-HIGH parity step is HBM-bound on BatchNorm
   elementwise traffic (~42% of the step, BASELINE.md perfetto profile).
   ``--remat both`` measures the jax.checkpoint'd step (recompute block
   activations in backward instead of storing them) against the stock step
   at otherwise identical settings — adopt-or-kill on the measured delta.

2. Slice-efficiency (item 5): the reference ships batch_size=20
   (/root/reference/lib/config.py:77). Data-parallel over an 8-chip mesh
   that becomes 3 samples/chip (24-sample padded global batch,
   data/pipeline.py), where per-chip MXU utilisation collapses.
   ``--batches 3,20,32`` measures single-chip throughput at each per-chip
   batch so slice efficiency is projected from data, not guessed
   (results -> docs/SCALING.md).

Protocol matches bench.py::bench_train_step: K-step fused program, scalar
fetch per window (relay-safe sync), best-of-N windows, flagship
geom-stereo model on synthetic rasters.

Usage:
  python scripts/train_throughput_study.py --modes high --remat both
  python scripts/train_throughput_study.py --modes high,default,balanced16 \
      --batches 3,20,32 --remat off
"""

from __future__ import annotations

import argparse
import os
import sys
import time

import numpy as np

_HERE = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, os.path.dirname(_HERE))

TILE = 256


def measure(mode: str, batch: int, remat: bool, k: int, windows: int) -> dict:
    import jax
    import jax.numpy as jnp

    from resdepth_tpu.data.pipeline import BatchSpec, DeviceRasters
    from resdepth_tpu.models.unet import flagship_config, init_unet
    from resdepth_tpu.train.optim import build_optimizer
    from resdepth_tpu.train.step import init_train_state, make_train_step

    rng = np.random.default_rng(0)
    rows = cols = 512
    gt = rng.normal(400.0, 5.0, (rows, cols)).astype(np.float32)
    rasters = DeviceRasters(
        dsm_input=jnp.asarray(gt + rng.normal(0, 1, (rows, cols)).astype(np.float32)),
        dsm_target=jnp.asarray(gt),
        orthos=jnp.asarray(rng.normal(120, 25, (3, rows, cols)).astype(np.float32)),
        pairs=jnp.asarray([[0, 1], [0, 2]], jnp.int32),
        nodata=jnp.asarray(-9999.0, jnp.float32))
    config = flagship_config("geom-stereo")
    spec = BatchSpec(input_channels="geom-stereo", tile_size=TILE, dsm_std=5.0,
                     augment=True)
    tx = build_optimizer("Adam", 1e-5)
    params, bn = init_unet(jax.random.PRNGKey(0), config)
    state = init_train_state(params, bn, tx, 2e-4)

    if mode in ("balanced", "balanced16"):
        from resdepth_tpu.models.unet import serving_precision
        mode_kwargs = serving_precision(mode).apply_kwargs()
        compute_dtype = jnp.float32
    elif mode == "bf16":
        mode_kwargs, compute_dtype = {}, jnp.bfloat16
    elif mode == "default":
        mode_kwargs = {"precision": jax.lax.Precision.DEFAULT}
        compute_dtype = jnp.float32
    else:  # 'high': dtype-adaptive 3-pass f32 policy (parity default)
        mode_kwargs, compute_dtype = {}, jnp.float32

    step = make_train_step(config, spec, tx, mesh=None, donate=True,
                           steps_per_call=k, compute_dtype=compute_dtype,
                           remat=remat, **mode_kwargs)
    key = jax.random.PRNGKey(0)

    def window(state):
        pos = np.stack([rng.integers(0, rows - TILE, (k, batch)),
                        rng.integers(0, cols - TILE, (k, batch))],
                       -1).astype(np.int32)
        pidx = rng.integers(0, 2, (k, batch)).astype(np.int32)
        t0 = time.perf_counter()
        state, m = step(state, rasters, pos, pidx,
                        np.zeros((k, batch, 4), np.int32),
                        np.ones((k, batch), np.float32), key)
        last = float(np.asarray(m)[-1])  # scalar fetch = relay-safe sync
        if not np.isfinite(last):
            raise RuntimeError(f"non-finite train metric: {last}")
        return state, time.perf_counter() - t0

    state, compile_t = window(state)
    times = []
    for _ in range(windows):
        state, dt = window(state)
        times.append(dt)
    sps = k * batch / min(times)
    return {"mode": mode, "batch": batch, "remat": remat,
            "samples_per_sec": round(sps, 1),
            "step_ms": round(1000 * min(times) / k, 2),
            "compile_s": round(compile_t, 1)}


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--modes", default="high",
                    help="comma list: high,default,balanced,balanced16,bf16")
    ap.add_argument("--batches", default="20", help="comma list of batch sizes")
    ap.add_argument("--remat", choices=["off", "on", "both"], default="off")
    ap.add_argument("-K", type=int, default=8, help="steps per jitted call")
    ap.add_argument("--windows", type=int, default=3, help="timed windows")
    args = ap.parse_args()

    modes = args.modes.split(",")
    batches = [int(b) for b in args.batches.split(",")]
    remats = {"off": [False], "on": [True], "both": [False, True]}[args.remat]

    results = []
    for mode in modes:
        for batch in batches:
            for remat in remats:
                r = measure(mode, batch, remat, args.K, args.windows)
                results.append(r)
                print(f"[{mode} B={batch} remat={'on' if remat else 'off'}] "
                      f"{r['samples_per_sec']:.0f} samples/s "
                      f"({r['step_ms']:.1f} ms/step, compile "
                      f"{r['compile_s']:.0f}s)", flush=True)

    print("\n| mode | batch | remat | samples/s/chip | ms/step |")
    print("|---|---|---|---|---|")
    for r in results:
        print(f"| {r['mode']} | {r['batch']} | "
              f"{'on' if r['remat'] else 'off'} | "
              f"{r['samples_per_sec']:.0f} | {r['step_ms']:.2f} |")


if __name__ == "__main__":
    main()
