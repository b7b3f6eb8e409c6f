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

# Peak dense bf16 matmul throughput of one TPU v5e chip (public spec:
# 197 TFLOP/s bf16). MFU is reported against this regardless of mode —
# the f32 multi-pass modes burn extra MXU passes per model FLOP, so their
# MFU reads low by design (it measures model work delivered, not silicon
# busyness). VERDICT r2 item 4.
PEAK_BF16_TFLOPS = 197.0


def _model_gflops() -> tuple[float, float]:
    """(serving GF/tile on the folded graph, train GF/sample fwd+bwd)."""
    from resdepth_tpu.models.unet import analytic_flops, flagship_config

    config = flagship_config("geom-stereo")
    serving = analytic_flops(config, TILE, composed_top=True) / 1e9
    train = 3 * analytic_flops(config, TILE) / 1e9
    return serving, train


def _mfu(rate_per_sec: float, gflops_per_item: float) -> tuple[float, float]:
    """(achieved TFLOP/s, % of bf16 peak) at ``rate_per_sec`` items/sec."""
    tflops = rate_per_sec * gflops_per_item / 1e3
    return tflops, 100.0 * tflops / PEAK_BF16_TFLOPS


def log(msg: str) -> None:
    print(msg, file=sys.stderr, flush=True)


def bench_tpu(compute_dtype_name: str = "float32") -> float:
    """On-device throughput: K chained forwards inside ONE jitted program.

    The device relay adds tens of ms of dispatch latency per program and its
    block_until_ready under-reports across pipelined dispatches, so the
    benchmark runs the iteration loop ON DEVICE (lax.fori_loop with a data
    dependency between iterations) and fetches one scalar. Inference-mode
    BatchNorm is folded into the conv weights, as the production inference
    path does; so is the top upconv (models.unet.fold_serving).
    """
    import jax
    import jax.numpy as jnp

    from resdepth_tpu.models.unet import (apply_unet, flagship_config,
                                          fold_serving, init_unet)

    config = flagship_config("geom-stereo")
    params, bn_state = init_unet(jax.random.PRNGKey(0), config)
    config, params, bn_state = fold_serving(config, params, bn_state)
    from resdepth_tpu.models.unet import (SERVING_PRECISION_MODES,
                                          serving_precision)

    # String serving modes; see models.unet.serving_precision.
    sm = (serving_precision(compute_dtype_name)
          if compute_dtype_name in SERVING_PRECISION_MODES else None)
    compute_dtype = jnp.bfloat16 if compute_dtype_name == "bfloat16" else jnp.float32

    @jax.jit
    def chain(params, bn_state, x):
        def body(i, carry):
            if sm is not None:
                y, _ = apply_unet(config, params, bn_state, carry,
                                  train=False, **sm.apply_kwargs())
            else:
                y, _ = apply_unet(config, params, bn_state,
                                  carry.astype(compute_dtype), train=False)
            # data dependency between iterations prevents reordering/DCE
            return carry.at[..., 0:1].add(y.astype(jnp.float32) * 1e-9)
        return jax.lax.fori_loop(0, TIMED_ITERS, body, x).sum()

    x = jnp.asarray(np.random.default_rng(0).normal(
        size=(BATCH, TILE, TILE, 3)).astype(np.float32))

    t0 = time.perf_counter()
    _check_finite(float(chain(params, bn_state, x)))
    log(f"[tpu/{compute_dtype_name}] compile+first-step: "
        f"{time.perf_counter() - t0:.1f}s on {jax.devices()[0].platform}")

    # Repeated windows, best-of: remote/tunneled devices exhibit sporadic
    # multi-second stalls; a single window can misreport by orders of
    # magnitude (BASELINE.md measurement hygiene).
    elapsed = min(_timed_window(chain, params, bn_state, x) for _ in range(3))
    tiles_per_sec = BATCH * TIMED_ITERS / elapsed
    tflops, mfu = _mfu(tiles_per_sec, _model_gflops()[0])
    log(f"[tpu/{compute_dtype_name}] {tiles_per_sec:.1f} tiles/sec "
        f"({elapsed / TIMED_ITERS * 1e3:.1f} ms/batch of {BATCH}; "
        f"{tflops:.1f} TFLOP/s = {mfu:.1f}% of bf16 peak)")
    return tiles_per_sec


def _check_finite(value: float) -> None:
    # Plain raise, not assert: the timed calls must survive `python -O`.
    if not np.isfinite(value):
        raise RuntimeError(f"non-finite benchmark output: {value}")


def _timed_window(chain, params, bn_state, x) -> float:
    t0 = time.perf_counter()
    _check_finite(float(chain(params, bn_state, x)))
    return time.perf_counter() - t0


def bench_torch_cpu(n_threads: int | None = None) -> float:
    """Reference-stack baseline: identical topology in PyTorch on the CPU.

    Reuses the torch oracle the parity tests validate against
    (tests/torch_unet.py — reference state_dict-compatible topology).
    Faithful to the reference's serving shape (batch 1, test.py:174). The
    default measures the environment's thread count; pass ``n_threads`` to
    pin (the summary reports both single- and all-core numbers so the
    headline ratio is not a thread-count artefact — VERDICT r1 item 6).
    """
    import torch

    from tests.torch_unet import TorchUNet

    if n_threads is not None:
        torch.set_num_threads(n_threads)
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


def bench_train_step(mode: str = "high") -> float | None:
    """Fused train-step throughput (samples/sec/chip) at the reference batch.

    ``mode``: 'high' (f32 parity default), 'balanced16'
    (tpu.train_precision balanced16 — bf16 activation trunk with
    full-fidelity endpoints, f32 master weights) or 'bf16'
    (tpu.compute_dtype bfloat16 — bf16 activation storage, fastest
    supported training mode). Round-over-round training regressions show
    up in BENCH_r* through these stderr lines (headline JSON metric
    unchanged)."""
    import jax

    from resdepth_tpu.data.pipeline import BatchSpec, DeviceRasters
    from resdepth_tpu.models.unet import flagship_config, init_unet
    from resdepth_tpu.train.optim import build_optimizer
    from resdepth_tpu.train.step import init_train_state, make_train_step
    import jax.numpy as jnp

    rng = np.random.default_rng(0)
    rows = cols = 512
    K, B = 8, 20
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
    if mode == "balanced16":
        from resdepth_tpu.models.unet import serving_precision
        mode_kwargs = serving_precision("balanced16").apply_kwargs()
    else:
        mode_kwargs = {}
    step = make_train_step(config, spec, tx, mesh=None, donate=True,
                           steps_per_call=K,
                           compute_dtype=(jnp.bfloat16 if mode == "bf16"
                                          else jnp.float32), **mode_kwargs)
    key = jax.random.PRNGKey(0)

    def window(state):
        pos = np.stack([rng.integers(0, rows - TILE, (K, B)),
                        rng.integers(0, cols - TILE, (K, B))], -1).astype(np.int32)
        pidx = rng.integers(0, 2, (K, B)).astype(np.int32)
        t0 = time.perf_counter()
        state, m = step(state, rasters, pos, pidx,
                        np.zeros((K, B, 4), np.int32),
                        np.ones((K, B), np.float32), key)
        # Fetch a scalar: through the device relay, block_until_ready
        # returns early and under-reports (BASELINE.md measurement hygiene).
        _check_finite(float(np.asarray(m)[-1]))
        return state, time.perf_counter() - t0

    state, compile_t = window(state)
    times = []
    for _ in range(3):
        state, dt = window(state)  # state is donated: thread it through
        times.append(dt)
    sps = K * B / min(times)
    label = {"high": "f32-HIGH", "bf16": "bf16 storage",
             "balanced16": "bf16 trunk, hifi endpoints"}[mode]
    tflops, mfu = _mfu(sps, _model_gflops()[1])
    log(f"[tpu/train/{mode}] {sps:.0f} samples/sec/chip "
        f"(batch {B}, {K}-step program, {label}; compile {compile_t:.0f}s; "
        f"{tflops:.1f} TFLOP/s = {mfu:.1f}% of bf16 peak)")
    return sps


def _probe_backend(timeout_s: float) -> None:
    """Fail fast (bounded) when the device backend cannot initialize.

    Shared probe (utils/backend_probe.py): a dead device tunnel makes
    ``jax.devices()`` hang indefinitely inside native init; probing in a
    subprocess turns that into a clear bounded error instead of a silent
    driver timeout. Tunnel outages are transient (observed mid-session),
    so a failed probe retries a few times before giving up
    (RESDEPTH_BENCH_PROBE_RETRIES, default 2, 60 s apart). Skippable via
    RESDEPTH_BENCH_SKIP_PROBE=1.
    """
    import os

    from resdepth_tpu.utils.backend_probe import BackendUnavailable, probe_backend

    if os.environ.get("RESDEPTH_BENCH_SKIP_PROBE"):
        return
    retries = int(os.environ.get("RESDEPTH_BENCH_PROBE_RETRIES", 2))
    for attempt in range(retries + 1):
        try:
            platform = probe_backend(timeout_s=timeout_s)
        except BackendUnavailable as exc:
            if attempt == retries:
                raise SystemExit(f"ERROR: {exc}")
            log(f"[probe] attempt {attempt + 1}/{retries + 1} failed "
                f"({exc}); retrying in 60 s")
            time.sleep(60)
            continue
        if platform:
            log(f"[probe] backend OK: {platform}")
        return


def main() -> None:
    import os

    from resdepth_tpu.utils import compilation_cache
    compilation_cache.enable()  # repeat driver runs skip the slow compiles
    _probe_backend(float(os.environ.get("RESDEPTH_BENCH_PROBE_TIMEOUT", 300)))

    # Soft deadline for the AUXILIARY measurements: on a fresh host the
    # persistent compile cache is cold (host-fingerprint-scoped) and each
    # mode can cost minutes of relay compile time; the headline, the f32
    # parity path and the train lines must never be starved by aux modes.
    t_start = time.perf_counter()
    aux_deadline_s = float(os.environ.get("RESDEPTH_BENCH_AUX_DEADLINE", 1500))

    def aux_time_left() -> bool:
        return time.perf_counter() - t_start < aux_deadline_s

    tpu_headline = bench_tpu("balanced16")
    tpu_f32 = bench_tpu("float32")
    tpu_aux = {}
    for mode in ("balanced", "bfloat16", "mixed"):
        if not aux_time_left():
            log(f"[tpu/{mode}] skipped: aux deadline "
                f"({aux_deadline_s:.0f}s) exceeded")
            continue
        try:
            tpu_aux[mode] = bench_tpu(mode)
        except Exception as exc:  # auxiliary modes never fail the bench
            log(f"[tpu/{mode}] skipped: {exc}")
    try:
        train_sps = bench_train_step("high")
    except Exception as exc:
        log(f"[tpu/train/high] skipped: {exc}")
        train_sps = None
    train_b16_sps = train_bf16_sps = None
    if aux_time_left():
        try:
            train_b16_sps = bench_train_step("balanced16")
        except Exception as exc:
            log(f"[tpu/train/balanced16] skipped: {exc}")
    else:
        log("[tpu/train/balanced16] skipped: aux deadline exceeded")
    if aux_time_left():
        try:
            train_bf16_sps = bench_train_step("bf16")
        except Exception as exc:
            log(f"[tpu/train/bf16] skipped: {exc}")
    else:
        log("[tpu/train/bf16] skipped: aux deadline exceeded")
    torch_cpu = bench_torch_cpu(1)  # explicit single-thread baseline
    n_cores = os.cpu_count() or 1
    if n_cores > 1:
        try:
            torch_cpu_mt = bench_torch_cpu(n_cores)
        except Exception:
            torch_cpu_mt = torch_cpu
    else:
        # This machine exposes a single core: the 1-thread baseline IS the
        # all-core baseline; the headline ratio is not a thread-count
        # artefact here (VERDICT r1 item 6).
        log(f"[torch-cpu] single-core machine; 1-thread == all-core baseline")
        torch_cpu_mt = torch_cpu

    ratio = f"({tpu_headline / torch_cpu:.0f}x torch-cpu-1t"
    if n_cores > 1:
        ratio += f", {tpu_headline / torch_cpu_mt:.0f}x torch-cpu-{n_cores}t"
    parts = [f"balanced16 (headline): {tpu_headline:.0f} tiles/sec {ratio})",
             f"f32 parity path: {tpu_f32:.0f} tiles/sec"]
    for mode, val in tpu_aux.items():
        parts.append(f"{mode}: {val:.0f} tiles/sec")
    if train_sps:
        parts.append(f"train: {train_sps:.0f} samples/sec")
    if train_b16_sps:
        parts.append(f"train-balanced16: {train_b16_sps:.0f} samples/sec")
    if train_bf16_sps:
        parts.append(f"train-bf16: {train_bf16_sps:.0f} samples/sec")
    log("[summary] " + "; ".join(parts))
    # Headline: the 'balanced16' serving mode — bf16 activation trunk with
    # the two measured error-source convs (first + last) run from f32
    # inputs with f32 kernels at 3-pass HIGH. The round-2 per-layer
    # attribution study (BASELINE.md) showed those two layers carry ~85% of
    # the single-pass deviation; measured across 3 scenes x trained
    # weights, balanced16 deviates 0.36-0.37 cm mean — ~2.7x inside the
    # <=1 cm budget where the single-pass modes (mixed/bf16, 0.83-1.24 cm)
    # straddle it — at ~92% of full-bf16 speed. 'balanced' (f32 storage,
    # 0.18-0.20 cm) and the exact f32-HIGH parity path (3e-5) stay
    # available and are reported above. vs_baseline uses the explicit
    # 1-thread torch number (all-core on stderr).
    serving_gf, train_gf = _model_gflops()
    headline_tflops, headline_mfu = _mfu(tpu_headline, serving_gf)
    payload = {
        "metric": "tile_throughput_256px_stereo_unet_balanced16",
        "value": round(tpu_headline, 2),
        "unit": "tiles/sec/chip",
        "vs_baseline": round(tpu_headline / torch_cpu, 2),
        # machine-readable utilization (VERDICT r2 item 4): analytic conv
        # FLOPs of the folded serving graph per tile, achieved TFLOP/s, and
        # %-of-peak against the v5e bf16 spec (197 TFLOP/s).
        "gflops_per_tile": round(serving_gf, 2),
        "tflops": round(headline_tflops, 2),
        "mfu_pct_bf16_peak": round(headline_mfu, 1),
        "f32_parity_tiles_per_sec": round(tpu_f32, 2),
        "f32_parity_mfu_pct": round(_mfu(tpu_f32, serving_gf)[1], 1),
    }
    if train_sps:
        payload["train_samples_per_sec_f32"] = round(train_sps, 1)
        payload["train_mfu_pct_f32"] = round(_mfu(train_sps, train_gf)[1], 1)
    if train_b16_sps:
        payload["train_samples_per_sec_balanced16"] = round(train_b16_sps, 1)
        payload["train_mfu_pct_balanced16"] = round(
            _mfu(train_b16_sps, train_gf)[1], 1)
    print(json.dumps(payload))


if __name__ == "__main__":
    main()
