"""Fused Pallas conv3x3+bias+activation vs the XLA reference (interpret mode).

The TPU-compiled path is benchmarked separately (BASELINE.md per-shape
table); these tests pin the kernel's semantics on any backend.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from resdepth_tpu.ops.pallas_conv import conv3x3_bias_act


def _xla_ref(x, k, b, act, act_param=0.25):
    out = jax.lax.conv_general_dilated(
        x, k, (1, 1), ((1, 1), (1, 1)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    if b is not None:
        out = out + b
    if act == "relu":
        return jnp.maximum(out, 0)
    if act == "lrelu":
        return jnp.where(out >= 0, out, 0.01 * out)
    if act == "prelu":
        return jnp.where(out >= 0, out, act_param * out)
    return out


@pytest.mark.parametrize("shape,act", [
    ((2, 16, 16, 8, 16), "relu"),
    ((1, 32, 16, 4, 8), "lrelu"),
    ((2, 16, 32, 16, 8), "prelu"),
    ((1, 16, 16, 8, 8), "none"),
])
def test_conv_kernel_matches_xla(shape, act):
    n, h, w, ci, co = shape
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(n, h, w, ci)).astype(np.float32))
    k = jnp.asarray(rng.normal(size=(3, 3, ci, co)).astype(np.float32) * 0.1)
    b = jnp.asarray(rng.normal(size=(co,)).astype(np.float32))
    ap = jnp.full((co,), 0.25, jnp.float32) if act == "prelu" else None

    got = conv3x3_bias_act(x, k, b, ap, act_fn=act, block_rows=8,
                           interpret=True)
    want = _xla_ref(x, k, b, act)
    # f32 runs as an explicit bf16 hi/lo 3-pass split (the HIGH MXU policy);
    # vs CPU-exact f32 that carries ~1e-5 absolute error by construction.
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-3, atol=5e-5)


def test_conv_kernel_multi_row_blocks():
    """Double-buffered window DMA across several grid programs per image."""
    rng = np.random.default_rng(3)
    x = jnp.asarray(rng.normal(size=(2, 32, 16, 8)).astype(np.float32))
    k = jnp.asarray(rng.normal(size=(3, 3, 8, 8)).astype(np.float32) * 0.1)
    b = jnp.zeros((8,), jnp.float32)
    got = conv3x3_bias_act(x, k, b, act_fn="relu", block_rows=8,
                           interpret=True)  # 4 row programs x 2 images
    want = _xla_ref(x, k, b, "relu")
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-3, atol=5e-5)
