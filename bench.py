#!/usr/bin/env python
"""Benchmark: flagship-model tile throughput, TPU vs the reference stack.

Headline metric (BASELINE.md north star): 256 px stereo-UNet inference
throughput in tiles/sec/chip on the TPU, versus the reference's
PyTorch-CPU throughput measured locally on this machine (the reference
publishes no numbers — BASELINE.md). Both sides run the identical topology
(depth-5 UNet, start 64, cap 512, 3 input channels) in eval mode at batch
size BATCH.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "tiles/sec/chip", "vs_baseline": N}
plus auxiliary measurements on stderr.
"""

from __future__ import annotations

import json
import sys
import time

import numpy as np

TILE = 256
BATCH = 128  # deep layers need large batch to fill the MXU (measured +35% vs 32)
TIMED_ITERS = 16
TORCH_TILES = 4


def log(msg: str) -> None:
    print(msg, file=sys.stderr, flush=True)


def bench_tpu(compute_dtype_name: str = "float32") -> float:
    """On-device throughput: K chained forwards inside ONE jitted program.

    The device relay adds tens of ms of dispatch latency per program and its
    block_until_ready under-reports across pipelined dispatches, so the
    benchmark runs the iteration loop ON DEVICE (lax.fori_loop with a data
    dependency between iterations) and fetches one scalar. Inference-mode
    BatchNorm is folded into the conv weights, as the production inference
    path does (models.unet.fold_batchnorm).
    """
    import jax
    import jax.numpy as jnp

    from resdepth_tpu.models.unet import (apply_unet, flagship_config,
                                          fold_batchnorm, init_unet)

    config = flagship_config("geom-stereo")
    params, bn_state = init_unet(jax.random.PRNGKey(0), config)
    config, params, bn_state = fold_batchnorm(config, params, bn_state)
    compute_dtype = jnp.bfloat16 if compute_dtype_name == "bfloat16" else jnp.float32

    @jax.jit
    def chain(params, bn_state, x):
        def body(i, carry):
            y, _ = apply_unet(config, params, bn_state,
                              carry.astype(compute_dtype), train=False)
            # data dependency between iterations prevents reordering/DCE
            return carry.at[..., 0:1].add(y.astype(jnp.float32) * 1e-9)
        return jax.lax.fori_loop(0, TIMED_ITERS, body, x).sum()

    x = jnp.asarray(np.random.default_rng(0).normal(
        size=(BATCH, TILE, TILE, 3)).astype(np.float32))

    t0 = time.perf_counter()
    assert np.isfinite(float(chain(params, bn_state, x)))
    log(f"[tpu/{compute_dtype_name}] compile+first-step: "
        f"{time.perf_counter() - t0:.1f}s on {jax.devices()[0].platform}")

    # Repeated windows, best-of: remote/tunneled devices exhibit sporadic
    # multi-second stalls; a single window can misreport by orders of
    # magnitude (BASELINE.md measurement hygiene).
    elapsed = min(_timed_window(chain, params, bn_state, x) for _ in range(3))
    tiles_per_sec = BATCH * TIMED_ITERS / elapsed
    log(f"[tpu/{compute_dtype_name}] {tiles_per_sec:.1f} tiles/sec "
        f"({elapsed / TIMED_ITERS * 1e3:.1f} ms/batch of {BATCH})")
    return tiles_per_sec


def _timed_window(chain, params, bn_state, x) -> float:
    t0 = time.perf_counter()
    assert np.isfinite(float(chain(params, bn_state, x)))
    return time.perf_counter() - t0


def bench_torch_cpu() -> float:
    """Reference-stack baseline: identical topology in PyTorch on the CPU.

    Reuses the torch oracle the parity tests validate against
    (tests/torch_unet.py — reference state_dict-compatible topology).
    """
    import torch

    from tests.torch_unet import TorchUNet

    model = TorchUNet(n_input_channels=3, start_kernel=64, max_filter_depth=512,
                      depth=5).eval()
    x = torch.randn(1, 3, TILE, TILE)
    windows = []
    with torch.no_grad():
        model(x)  # warmup
        for _ in range(3):  # best-of-3: the shared host is load-noisy
            t0 = time.perf_counter()
            for _ in range(TORCH_TILES):
                model(x)
            windows.append(time.perf_counter() - t0)
    elapsed = min(windows)
    tiles_per_sec = TORCH_TILES / elapsed
    log(f"[torch-cpu] {tiles_per_sec:.2f} tiles/sec "
        f"({elapsed / TORCH_TILES * 1e3:.0f} ms/tile, "
        f"{torch.get_num_threads()} threads)")
    return tiles_per_sec


def main() -> None:
    tpu_f32 = bench_tpu("float32")
    try:
        tpu_bf16 = bench_tpu("bfloat16")
    except Exception as exc:  # bf16 is auxiliary; never fail the bench on it
        log(f"[tpu/bfloat16] skipped: {exc}")
        tpu_bf16 = None
    torch_cpu = bench_torch_cpu()

    if tpu_bf16:
        log(f"[summary] bf16: {tpu_bf16:.0f} tiles/sec "
            f"({tpu_bf16 / torch_cpu:.0f}x torch-cpu); "
            f"f32 (parity path): {tpu_f32:.0f} tiles/sec "
            f"({tpu_f32 / torch_cpu:.0f}x torch-cpu)")
    # Headline: the f32 parity path. bf16 is ~1.7x faster but measured OUTSIDE
    # the <=1 cm parity budget on trained weights (mean 1.16 cm deviation —
    # BASELINE.md); it stays an opt-in serving mode, reported on stderr above.
    print(json.dumps({
        "metric": "tile_throughput_256px_stereo_unet_f32",
        "value": round(tpu_f32, 2),
        "unit": "tiles/sec/chip",
        "vs_baseline": round(tpu_f32 / torch_cpu, 2),
    }))


if __name__ == "__main__":
    main()
