"""Pallas TPU kernel: fused 3x3 conv + bias + activation (SURVEY.md §7 step 8).

The UNet's hot op is the 3x3 same-padding conv followed by (folded-BN) bias
and activation (lib/UNet.py:36-52; BN folds into the conv at inference —
models/unet.py::fold_batchnorm). XLA lowers this well already; this kernel
exists to MEASURE whether a hand-fused version wins (VERDICT r1 item 3:
"build and measure, or kill with data") and is adopted behind
``tpu.use_pallas_conv`` only where the measurement says so (BASELINE.md
records the per-shape table).

Shape strategy per (N, H, W, C_in) -> (N, H, W, C_out):

  * the input is spatially pre-padded once in XLA (H+2, W+2);
  * grid = (N, H / BH) row-bands; each program DMAs its (BH+2, W+2, C_in)
    halo window HBM -> VMEM, DOUBLE-BUFFERED: program i starts the window
    DMA for program i+1 before computing, hiding load latency behind the
    matmuls;
  * compute = 9 tap matmuls (BH*W, C_in) @ (C_in, C_out) accumulated in
    f32 on the MXU, then bias + activation on the VPU, written back through
    the pipelined output block.

f32 inputs use 3-pass HIGH MXU precision (the production f32 conv policy,
models/unet.py::_precision); bf16 inputs use native single-pass bf16.
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


def _conv_kernel(xp_ref, w_ref, b_ref, out_ref, window, sem, *, block_rows,
                 act_fn, n_programs):
    n = pl.program_id(0)
    i = pl.program_id(1)
    n_row_blocks = pl.num_programs(1)
    bh = block_rows
    w_pad = xp_ref.shape[2]          # W + 2
    width = w_pad - 2
    c_in = xp_ref.shape[3]
    c_out = w_ref.shape[2]

    def window_dma(slot, prog_lin):
        n_i = prog_lin // n_row_blocks
        r_i = prog_lin % n_row_blocks
        return pltpu.make_async_copy(
            xp_ref.at[n_i, pl.ds(r_i * bh, bh + 2)],
            window.at[slot], sem.at[slot])

    lin = n * n_row_blocks + i
    slot = jax.lax.rem(lin, 2)

    # First program fills its own slot; everyone prefetches the successor.
    @pl.when(lin == 0)
    def _():
        window_dma(0, 0).start()

    @pl.when(lin + 1 < n_programs)
    def _():
        window_dma(1 - slot, lin + 1).start()

    window_dma(slot, lin).wait()
    win = window[slot]

    acc = jnp.zeros((bh * width, c_out), jnp.float32)
    f32 = win.dtype == jnp.float32
    for dy in range(3):
        for dx in range(3):
            tap = win[dy:dy + bh, dx:dx + width, :].reshape(bh * width, c_in)
            w_tap = w_ref[dy * 3 + dx]
            if f32:
                # Mosaic dots support only DEFAULT/HIGHEST; emulate the
                # production 3-pass HIGH policy (models/unet.py::_precision)
                # with an explicit bf16 hi/lo split: x@w ~= hi_x@hi_w +
                # hi_x@lo_w + lo_x@hi_w, each a single-pass bf16 MXU dot
                # with f32 accumulation — the same decomposition HIGH uses.
                hi_t = tap.astype(jnp.bfloat16)
                lo_t = (tap - hi_t.astype(jnp.float32)).astype(jnp.bfloat16)
                hi_w = w_tap.astype(jnp.bfloat16)
                lo_w = (w_tap - hi_w.astype(jnp.float32)).astype(jnp.bfloat16)
                for a, b in ((hi_t, hi_w), (hi_t, lo_w), (lo_t, hi_w)):
                    acc += jnp.dot(a, b,
                                   preferred_element_type=jnp.float32,
                                   precision=jax.lax.Precision.DEFAULT)
            else:
                acc += jnp.dot(tap, w_tap,
                               preferred_element_type=jnp.float32,
                               precision=jax.lax.Precision.DEFAULT)
    acc += b_ref[0]
    acc = _act(acc, act_fn, b_ref[1] if act_fn == "prelu" else None)
    out_ref[0] = acc.reshape(bh, width, c_out).astype(out_ref.dtype)


def _pick_block_rows(h, w, c_in, c_out, dtype_bytes):
    """Largest row band whose working set fits a conservative VMEM budget."""
    budget = 10 * 1024 * 1024
    weights = 9 * c_in * c_out * dtype_bytes + 2 * c_out * 4
    bh = h
    while bh > 8:
        window = 2 * (bh + 2) * (w + 2) * c_in * dtype_bytes   # double buffer
        out = 2 * bh * w * c_out * dtype_bytes                 # pipelined out
        acc = bh * w * c_out * 4
        if weights + window + out + acc <= budget:
            break
        bh //= 2
    return max(bh, min(8, h))


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
    w9 = kernel.astype(x.dtype).reshape(9, c_in, c_out)
    # bias row 0, prelu weight row 1 (always present to keep one signature)
    b2 = jnp.stack([
        bias.astype(jnp.float32) if bias is not None
        else jnp.zeros((c_out,), jnp.float32),
        act_param.astype(jnp.float32) if act_param is not None
        else jnp.zeros((c_out,), jnp.float32)])

    grid = (n, h // bh)
    n_programs = n * (h // bh)
    kernel_fn = functools.partial(_conv_kernel, block_rows=bh, act_fn=act_fn,
                                  n_programs=n_programs)
    return pl.pallas_call(
        kernel_fn,
        grid=grid,
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),                  # xp (HBM)
            pl.BlockSpec(memory_space=pltpu.VMEM),              # weights
            pl.BlockSpec(memory_space=pltpu.VMEM),              # bias/prelu
        ],
        out_specs=pl.BlockSpec((1, bh, w, c_out),
                               lambda ni, ri: (ni, ri, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n, h, w, c_out), x.dtype),
        scratch_shapes=[
            pltpu.VMEM((2, bh + 2, w + 2, c_in), x.dtype),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        interpret=interpret,
    )(xp, w9, b2)
