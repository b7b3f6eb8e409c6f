"""Pallas TPU kernel: fused 3x3 conv + bias + activation (SURVEY.md §7 step 8).

The UNet's hot op is the 3x3 same-padding conv followed by (folded-BN) bias
and activation (lib/UNet.py:36-52; BN folds into the conv at inference —
models/unet.py::fold_batchnorm). XLA lowers this well already; this kernel
exists to MEASURE whether a hand-fused version wins (VERDICT r1 item 3:
"build and measure, or kill with data"); BASELINE.md records the per-shape
table and the adoption decision.

Shape strategy per (N, H, W, C_in) -> (N, H, W, C_out):

  * the input is spatially pre-padded once in XLA and exposed as THREE
    row-shifted views (rows dy..dy+H for dy in 0..2). Row-blocking each view
    with an ordinary non-overlapping BlockSpec hands every grid program its
    (bh, W+2, C_in) halo window without any manual HBM DMA — Pallas's block
    pipeline streams and double-buffers the windows itself. (Manual
    make_async_copy + MXU dots in one kernel crashes this TPU toolchain's
    remote Mosaic compiler — probed and recorded in BASELINE.md — and
    overlapping halos are not expressible as a single BlockSpec.)
  * compute = 9 tap matmuls (bh*W, C_in) @ (C_in, C_out) accumulated in f32
    on the MXU, then bias + activation on the VPU, written through the
    pipelined output block.

f32 inputs run the production 3-pass HIGH policy via an explicit bf16 hi/lo
split (Mosaic dots support only DEFAULT/HIGHEST); bf16 inputs use native
single-pass bf16.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _act(x, act_fn, act_param):
    if act_fn == "relu":
        return jnp.maximum(x, 0.0)
    if act_fn == "lrelu":
        return jnp.where(x >= 0, x, 0.01 * x)
    if act_fn == "prelu":
        return jnp.where(x >= 0, x, act_param * x)
    return x


def _conv_kernel(v0_ref, v1_ref, v2_ref, w_ref, b_ref, out_ref, *, act_fn):
    bh = out_ref.shape[1]
    width = out_ref.shape[2]
    c_in = v0_ref.shape[3]
    c_out = w_ref.shape[2]
    views = (v0_ref, v1_ref, v2_ref)

    acc = jnp.zeros((bh * width, c_out), jnp.float32)
    f32 = v0_ref.dtype == jnp.float32
    for dy in range(3):
        win = views[dy][0]                      # (bh, W+2, C_in)
        for dx in range(3):
            tap = win[:, dx:dx + width, :].reshape(bh * width, c_in)
            w_tap = w_ref[dy * 3 + dx]
            if f32:
                # Mosaic dots support only DEFAULT/HIGHEST; emulate the
                # production 3-pass HIGH policy (models/unet.py::_precision)
                # with an explicit bf16 hi/lo split — the same decomposition
                # HIGH uses on the MXU.
                hi_t = tap.astype(jnp.bfloat16)
                lo_t = (tap - hi_t.astype(jnp.float32)).astype(jnp.bfloat16)
                hi_w = w_tap.astype(jnp.bfloat16)
                lo_w = (w_tap - hi_w.astype(jnp.float32)).astype(jnp.bfloat16)
                for a, b in ((hi_t, hi_w), (hi_t, lo_w), (lo_t, hi_w)):
                    acc += jnp.dot(a, b, preferred_element_type=jnp.float32,
                                   precision=jax.lax.Precision.DEFAULT)
            else:
                acc += jnp.dot(tap, w_tap, preferred_element_type=jnp.float32,
                               precision=jax.lax.Precision.DEFAULT)
    acc += b_ref[0]
    acc = _act(acc, act_fn, b_ref[1] if act_fn == "prelu" else None)
    out_ref[0] = acc.reshape(bh, width, c_out).astype(out_ref.dtype)


def _pick_block_rows(h, w, c_in, c_out, dtype_bytes):
    """Largest row band whose working set fits a conservative VMEM budget
    (x2 for the pipeline's double buffering of every block)."""
    budget = 10 * 1024 * 1024
    weights = 9 * c_in * c_out * dtype_bytes + 2 * c_out * 4
    divisors = sorted((d for d in range(1, h + 1) if h % d == 0),
                      reverse=True)
    for bh in divisors:
        views = 3 * 2 * bh * (w + 2) * c_in * dtype_bytes
        out = 2 * bh * w * c_out * dtype_bytes
        acc = bh * w * c_out * 4
        if weights + views + out + acc <= budget:
            return bh
    return divisors[-1]  # 1 always divides


@functools.partial(jax.jit,
                   static_argnames=("act_fn", "block_rows", "interpret"))
def conv3x3_bias_act(x, kernel, bias, act_param=None, *, act_fn="relu",
                     block_rows=None, interpret=False):
    """Fused same-padding 3x3 conv + bias + activation.

    x: (N, H, W, C_in); kernel: (3, 3, C_in, C_out); bias: (C_out,);
    act_param: PReLU weight (C_out,) when act_fn == 'prelu'.
    Returns (N, H, W, C_out) in x.dtype.
    """
    n, h, w, c_in = x.shape
    c_out = kernel.shape[3]
    bh = block_rows or _pick_block_rows(h, w, c_in, c_out, x.dtype.itemsize)
    assert h % bh == 0, (h, bh)

    xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)))
    views = tuple(xp[:, dy:dy + h] for dy in range(3))
    w9 = kernel.astype(x.dtype).reshape(9, c_in, c_out)
    # bias row 0, prelu weight row 1 (always present to keep one signature)
    b2 = jnp.stack([
        bias.astype(jnp.float32) if bias is not None
        else jnp.zeros((c_out,), jnp.float32),
        act_param.astype(jnp.float32) if act_param is not None
        else jnp.zeros((c_out,), jnp.float32)])

    view_spec = pl.BlockSpec((1, bh, w + 2, c_in),
                             lambda ni, ri: (ni, ri, 0, 0),
                             memory_space=pltpu.VMEM)
    kernel_fn = functools.partial(_conv_kernel, act_fn=act_fn)
    return pl.pallas_call(
        kernel_fn,
        grid=(n, h // bh),
        in_specs=[view_spec, view_spec, view_spec,
                  pl.BlockSpec(memory_space=pltpu.VMEM),    # weights
                  pl.BlockSpec(memory_space=pltpu.VMEM)],   # bias/prelu
        out_specs=pl.BlockSpec((1, bh, w, c_out),
                               lambda ni, ri: (ni, ri, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n, h, w, c_out), x.dtype),
        interpret=interpret,
    )(*views, w9, b2)
