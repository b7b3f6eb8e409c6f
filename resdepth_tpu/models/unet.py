"""Residual-refinement UNet as a functional JAX model.

Re-implements the exact topology of the reference network
(/root/reference/lib/UNet.py:104-246) TPU-first:

  * layout is NHWC end-to-end (TPU-native; the reference uses NCHW),
  * parameters/state are explicit pytrees (no module objects), so the model
    composes directly with jit / grad / shard_map,
  * the 2x2-stride-2 transposed convolution is lowered as an input-dilated
    convolution of the spatially-flipped kernel — mathematically identical to
    ConvTranspose2d(k=2, s=2) (one kernel tap per output pixel) but taking
    XLA:TPU's native conv path, with no depth-to-space interleave copies,
  * BatchNorm supports cross-replica statistics via an optional mesh axis
    name (``jax.lax.pmean``) so data-parallel training matches single-device
    BatchNorm semantics.

Topology facts preserved for weight/output parity (SURVEY.md §3.3):
  * one conv per encoder level (not double-conv), additive skips (not concat),
  * decoder upconv happens BEFORE the skip-add; the deepest decoder level has
    no conv after the add (lib/UNet.py:222-224),
  * conv bias is disabled whenever BatchNorm follows (lib/UNet.py:44,65,85),
  * filter widths ``start_kernel * 2^i`` capped at ``max_filter_depth``
    (lib/UNet.py:152-155),
  * optional outer residual skip adds input channel 0 to the output,
    optionally through a BatchNorm (lib/UNet.py:229-244).
"""

from __future__ import annotations

import dataclasses
import functools
import math

import jax
import jax.numpy as jnp
import numpy as np

ACTIVATIONS = ("relu", "lrelu", "prelu")
UP_MODES = ("transpose", "bilinear")

BN_EPS = 1e-5
BN_MOMENTUM = 0.1
LRELU_SLOPE = 0.01
PRELU_INIT = 0.25


@dataclasses.dataclass(frozen=True)
class ServingMode:
    """How ``apply_unet`` should execute one string serving mode.

    ``mixed``: bf16 activation trunk (requires f32 input ``x``).
    ``precision`` / ``layer_precisions``: MXU operand-rounding overrides.
    ``hifi_endpoints``: full-fidelity endpoints on the bf16 trunk — the
    first conv consumes the RAW f32 input and the (composed) final conv
    runs from f32-upcast activations with f32 kernels.
    """
    mixed: bool = False
    precision: object = None
    layer_precisions: dict | None = None
    hifi_endpoints: bool = False

    def apply_kwargs(self) -> dict:
        """Kwargs for ``apply_unet`` / ``make_train_step`` / ``make_eval_step``.

        The single unpacking point — every consumer (train.py precision
        map, bench.py, scripts) must build its kwargs here so a new
        ServingMode field cannot silently go stale at one call site."""
        return dict(mixed_precision=self.mixed, precision=self.precision,
                    layer_precisions=self.layer_precisions,
                    hifi_endpoints=self.hifi_endpoints)


def serving_precision(mode: str) -> ServingMode:
    """The registry behind every string ``compute_dtype`` serving mode
    (BASELINE.md attribution studies):

    - ``mixed``: bf16 conv stack, f32-accumulated height path.
    - ``fast32``: f32 storage, single-pass bf16 multiplicands everywhere.
    - ``act2pass``: f32 storage, activation operand split hi/lo over 2 MXU
      passes, weights single-rounded, every layer.
    - ``balanced``: f32 storage, single-pass everywhere EXCEPT the two
      measured error sources — the first conv (raw ±2σ DSM multiplicands)
      and the final conv (absolute-height path) run 3-pass f32-HIGH.
      ≤0.2 cm mean trained-weights deviation across scenes.
    - ``balanced16``: the balanced recipe on a bf16 activation trunk:
      full-fidelity endpoints (``hifi_endpoints``) at 3-pass HIGH,
      everything between runs native bf16. The bench headline mode.

    Consumed by ``predict_linear_blend(compute_dtype=...)``, ``bench.py``
    and ``scripts/precision_study.py``.
    """
    H, D = jax.lax.Precision.HIGH, jax.lax.Precision.DEFAULT
    table = {
        "mixed": ServingMode(mixed=True),
        "fast32": ServingMode(precision=D),
        "act2pass": ServingMode(precision=(H, D)),
        "balanced": ServingMode(precision=D,
                                layer_precisions={"encoder0": H, "last": H}),
        "balanced16": ServingMode(mixed=True, hifi_endpoints=True,
                                  layer_precisions={"encoder0": H, "last": H}),
    }
    return table[mode]


SERVING_PRECISION_MODES = ("mixed", "fast32", "act2pass", "balanced",
                           "balanced16")


@dataclasses.dataclass(frozen=True)
class UNetConfig:
    n_input_channels: int = 1
    start_kernel: int = 64
    max_filter_depth: int = 512
    depth: int = 5
    act_fn_encoder: str = "relu"
    act_fn_decoder: str = "relu"
    act_fn_bottleneck: str = "relu"
    up_mode: str = "transpose"
    do_BN: bool = True
    bias_conv_layer: bool = False
    outer_skip: bool = True
    outer_skip_BN: bool = False

    def __post_init__(self):
        for act in (self.act_fn_encoder, self.act_fn_decoder, self.act_fn_bottleneck):
            if act not in ACTIVATIONS:
                raise ValueError(f"'{act}' is not a valid activation. Choose among {ACTIVATIONS}.")
        if self.up_mode not in UP_MODES:
            raise ValueError(f"'{self.up_mode}' is not a valid up_mode. Choose among {UP_MODES}.")

    @property
    def filter_depths(self) -> tuple[int, ...]:
        return tuple(min(self.start_kernel * (2 ** i), self.max_filter_depth)
                     for i in range(self.depth))


def unet_config_from_settings(settings: dict) -> UNetConfig:
    """Build a UNetConfig from the cfg.model.settings dict (model_config.json)."""
    fields = {f.name for f in dataclasses.fields(UNetConfig)}
    return UNetConfig(**{k: v for k, v in settings.items() if k in fields})


# ----------------------------- initialisation ----------------------------- #

def _conv_init(rng, kh, kw, in_ch, out_ch, use_bias):
    """Torch-default initialisation: kaiming-uniform(a=sqrt(5)) == U(+-1/sqrt(fan_in))."""
    k_rng, b_rng = jax.random.split(rng)
    fan_in = in_ch * kh * kw
    bound = 1.0 / math.sqrt(fan_in)
    layer = {"kernel": jax.random.uniform(k_rng, (kh, kw, in_ch, out_ch),
                                          jnp.float32, -bound, bound)}
    if use_bias:
        layer["bias"] = jax.random.uniform(b_rng, (out_ch,), jnp.float32, -bound, bound)
    return layer


def _bn_init(channels):
    return {"scale": jnp.ones((channels,), jnp.float32),
            "bias": jnp.zeros((channels,), jnp.float32)}


def _bn_state_init(channels):
    return {"mean": jnp.zeros((channels,), jnp.float32),
            "var": jnp.ones((channels,), jnp.float32)}


def _act_init(act_fn):
    if act_fn == "prelu":
        return {"alpha": jnp.full((1,), PRELU_INIT, jnp.float32)}
    return {}


def init_unet(rng, config: UNetConfig):
    """Initialise (params, state) pytrees for the UNet."""
    widths = config.filter_depths
    use_bias = not config.do_BN  # bias off whenever BN follows (lib/UNet.py:44)

    params: dict = {"encoder": [], "decoder": []}
    state: dict = {"encoder": [], "decoder": []}

    in_ch = config.n_input_channels
    for width in widths:
        rng, sub = jax.random.split(rng)
        block = {"conv": _conv_init(sub, 3, 3, in_ch, width, use_bias)}
        act = _act_init(config.act_fn_encoder)
        if act:
            block["act"] = act
        if config.do_BN:
            block["bn"] = _bn_init(width)
            state["encoder"].append({"bn": _bn_state_init(width)})
        else:
            state["encoder"].append({})
        params["encoder"].append(block)
        in_ch = width

    rng, sub = jax.random.split(rng)
    params["bottleneck"] = {"conv": _conv_init(sub, 3, 3, widths[-1], widths[-1], use_bias)}
    act = _act_init(config.act_fn_bottleneck)
    if act:
        params["bottleneck"]["act"] = act
    if config.do_BN:
        params["bottleneck"]["bn"] = _bn_init(widths[-1])
        state["bottleneck"] = {"bn": _bn_state_init(widths[-1])}
    else:
        state["bottleneck"] = {}

    widths_up = tuple(reversed(widths))
    for i in range(config.depth - 1):
        rng, up_rng, conv_rng = jax.random.split(rng, 3)
        block = {"up": _up_init(up_rng, config.up_mode, widths_up[i], widths_up[i]),
                 "conv": _conv_init(conv_rng, 3, 3, widths_up[i], widths_up[i + 1], use_bias)}
        act = _act_init(config.act_fn_decoder)
        if act:
            block["act"] = act
        if config.do_BN:
            block["bn"] = _bn_init(widths_up[i + 1])
            state["decoder"].append({"bn": _bn_state_init(widths_up[i + 1])})
        else:
            state["decoder"].append({})
        params["decoder"].append(block)

    rng, up_rng = jax.random.split(rng)
    params["decoder"].append({"up": _up_init(up_rng, config.up_mode,
                                             widths_up[-1], widths_up[-1])})
    state["decoder"].append({})

    rng, last_rng = jax.random.split(rng)
    params["last"] = _conv_init(last_rng, 3, 3, config.start_kernel, 1,
                                config.bias_conv_layer)

    if config.outer_skip and config.outer_skip_BN:
        params["outer_skip_bn"] = _bn_init(1)
        state["outer_skip_bn"] = {"bn": _bn_state_init(1)}

    return params, state


def _up_init(rng, up_mode, in_ch, out_ch):
    if up_mode == "transpose":
        # ConvTranspose2d(k=2, s=2): stored as (2, 2, in, out); torch fan_in for
        # transposed convs uses the OUT channel side of the weight tensor.
        k_rng, b_rng = jax.random.split(rng)
        fan_in = out_ch * 4
        bound = 1.0 / math.sqrt(fan_in)
        return {"kernel": jax.random.uniform(k_rng, (2, 2, in_ch, out_ch),
                                             jnp.float32, -bound, bound),
                "bias": jax.random.uniform(b_rng, (out_ch,), jnp.float32, -bound, bound)}
    # bilinear: Upsample + 1x1 conv (with bias — plain conv1x1, lib/UNet.py:8-9,20)
    return _conv_init(rng, 1, 1, in_ch, out_ch, True)


# -------------------------------- forward --------------------------------- #

def _activation(x, act_fn, act_params):
    if act_fn == "relu":
        return jnp.maximum(x, 0)
    if act_fn == "lrelu":
        return jnp.where(x >= 0, x, LRELU_SLOPE * x)
    alpha = act_params["alpha"].astype(x.dtype)
    return jnp.where(x >= 0, x, alpha * x)


def _precision(x):
    # MXU precision policy (measured on v5e, flagship forward):
    #   f32 + DEFAULT  = 1-pass bf16:  ~4e-3  output error — breaks the
    #                    <=1 cm parity budget;
    #   f32 + HIGH     = 3-pass bf16:  ~3e-5  output error (~0.15 mm in
    #                    meters) at 1.7x the speed of HIGHEST — the default;
    #   f32 + HIGHEST  = 6-pass: exact f32, available via compute_dtype
    #                    paths that cast to f32 and callers needing it.
    # bf16 inputs: DEFAULT is the native single-pass mode (HIGHEST would
    # force a slow multi-pass upcast). CPU executes all levels as exact f32.
    return (jax.lax.Precision.HIGH if x.dtype == jnp.float32
            else jax.lax.Precision.DEFAULT)


def _preferred(x):
    # f32 compute keeps f32 outputs. bf16 compute keeps bf16 outputs: the MXU
    # accumulates in f32 internally either way, and requesting f32 outputs
    # from bf16 inputs breaks autodiff (the conv transpose rule would pair a
    # f32 cotangent with bf16 activations).
    return jnp.float32 if x.dtype == jnp.float32 else x.dtype


def _conv(x, layer, padding, precision=None):
    kernel = layer["kernel"].astype(x.dtype)
    out = jax.lax.conv_general_dilated(
        x, kernel, window_strides=(1, 1), padding=padding,
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        precision=precision if precision is not None else _precision(x),
        preferred_element_type=_preferred(x))
    if "bias" in layer:
        out = out + layer["bias"].astype(out.dtype)
    return out


def _batch_norm(x, bn_params, bn_state, train, axis_name, sample_weights=None):
    """BatchNorm2d with torch semantics (eps 1e-5, momentum 0.1).

    In training, statistics are computed over (N, H, W) — cross-replica when
    ``axis_name`` is set — normalisation uses the biased variance, and running
    stats are updated with the unbiased variance (torch behaviour).

    ``sample_weights`` (shape (N,), typically 0/1) makes the batch statistics
    a weighted moment over samples: zero-weight padding samples (used to keep
    batch shapes static and to fill the device mesh regardless of the
    configured batch size) then contribute NOTHING to the statistics, so a
    padded batch is numerically equivalent to the unpadded one.
    """
    x32 = x.astype(jnp.float32)
    if train:
        if sample_weights is None:
            mean = jnp.mean(x32, axis=(0, 1, 2))
            mean_sq = jnp.mean(jnp.square(x32), axis=(0, 1, 2))
            count = x32.shape[0] * x32.shape[1] * x32.shape[2]
            if axis_name is not None:
                mean = jax.lax.pmean(mean, axis_name)
                mean_sq = jax.lax.pmean(mean_sq, axis_name)
                count = count * jax.lax.psum(1, axis_name)
            count = jnp.asarray(count, jnp.float32)
        else:
            w = sample_weights.astype(jnp.float32)
            count = w.sum() * (x32.shape[1] * x32.shape[2])
            if axis_name is not None:
                count = jax.lax.psum(count, axis_name)
            count = jnp.maximum(count, 1.0)
            # Normalise weights first so the reduction accumulates O(1/N)
            # terms (same conditioning as jnp.mean).
            wn = (w / count)[:, None, None, None]
            mean = (x32 * wn).sum(axis=(0, 1, 2))
            mean_sq = (jnp.square(x32) * wn).sum(axis=(0, 1, 2))
            if axis_name is not None:
                mean = jax.lax.psum(mean, axis_name)
                mean_sq = jax.lax.psum(mean_sq, axis_name)
        var = jnp.maximum(mean_sq - jnp.square(mean), 0.0)
        unbiased = var * (count / jnp.maximum(count - 1, 1))
        new_state = {
            "mean": (1 - BN_MOMENTUM) * bn_state["mean"] + BN_MOMENTUM * mean,
            "var": (1 - BN_MOMENTUM) * bn_state["var"] + BN_MOMENTUM * unbiased,
        }
    else:
        mean, var = bn_state["mean"], bn_state["var"]
        new_state = bn_state

    inv = jax.lax.rsqrt(var + BN_EPS) * bn_params["scale"]
    out = (x32 - mean) * inv + bn_params["bias"]
    return out.astype(x.dtype), new_state


def _conv_block(x, block, block_state, act_fn, do_bn, train, axis_name,
                sample_weights=None, precision=None):
    """conv3x3 (+BN) + activation (lib/UNet.py:36-52)."""
    out = _conv(x, block["conv"], ((1, 1), (1, 1)), precision)
    new_state = block_state
    if do_bn:
        out, new_bn = _batch_norm(out, block["bn"], block_state["bn"], train,
                                  axis_name, sample_weights)
        new_state = {"bn": new_bn}
    else:
        out = out.astype(x.dtype)
    out = _activation(out, act_fn, block.get("act"))
    return out, new_state


def _max_pool_2x2(x):
    return jax.lax.reduce_window(
        x, -jnp.inf, jax.lax.max, window_dimensions=(1, 2, 2, 1),
        window_strides=(1, 2, 2, 1), padding="VALID")


def _upconv2x2_fwd_impl(x, kernel, bias, precision):
    k = kernel.astype(x.dtype)
    out = jax.lax.conv_general_dilated(
        x, k[::-1, ::-1], window_strides=(1, 1), padding=((1, 1), (1, 1)),
        lhs_dilation=(2, 2), dimension_numbers=("NHWC", "HWIO", "NHWC"),
        precision=precision, preferred_element_type=_preferred(x))
    return (out + bias.astype(out.dtype)).astype(x.dtype)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3,))
def _upconv2x2(x, kernel, bias, precision):
    """ConvTranspose2d(k=2, s=2) with hand-written gradients.

    Forward: y[n, 2i+di, 2j+dj, o] = b[o] + sum_c x[n,i,j,c] * k[di,dj,c,o],
    lowered as an input-dilated convolution of the spatially-flipped kernel.
    With k=2, s=2 every output pixel receives exactly one kernel tap, so this
    is the exact transposed conv — but on XLA:TPU's native conv path, with
    no depth-to-space interleave copies (measured +20-26% whole-model
    inference vs the round-1 matmul+d2s formulation).

    The custom VJP exists because XLA's transpose of the lhs-dilated conv
    materialises full spatial ``reverse`` ops on the cotangent (~6% of the
    train step at the 256^2 level). Hand-written: dx is a plain stride-2
    VALID conv of g with the (c, o)-transposed kernel; dk contracts the
    batch axis via one conv (g as lhs with feature=N, x as rhs dilated by 2);
    db is a sum. Grad-exact vs autodiff (tests/test_models.py); measured
    +9% bf16 / +3% f32 train throughput on the v5e. Like any custom_vjp,
    this supports reverse-mode only — forward-mode (jvp/jacfwd) through a
    transpose-mode UNet is not used anywhere in the framework.
    """
    return _upconv2x2_fwd_impl(x, kernel, bias, precision)


def _upconv2x2_fwd(x, kernel, bias, precision):
    return _upconv2x2_fwd_impl(x, kernel, bias, precision), (x, kernel, bias)


def _upconv2x2_bwd(precision, res, g):
    x, kernel, bias = res
    k = kernel.astype(g.dtype)
    dx = jax.lax.conv_general_dilated(
        g, k.transpose(0, 1, 3, 2), window_strides=(2, 2), padding="VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"), precision=precision,
        preferred_element_type=_preferred(g)).astype(x.dtype)
    # lhs g (N,2H,2W,O): feature=N (contracted), batch=O; rhs x (N,H,W,C):
    # I=N, O=C, spatially dilated by 2; out (2,2,C,O) accumulated in f32.
    dk = jax.lax.conv_general_dilated(
        g, x.astype(g.dtype), window_strides=(1, 1), padding="VALID",
        rhs_dilation=(2, 2), dimension_numbers=("C01N", "I01O", "01CN"),
        precision=precision, preferred_element_type=jnp.float32)
    db = jnp.sum(g.astype(jnp.float32), axis=(0, 1, 2))
    return dx, dk.astype(kernel.dtype), db.astype(bias.dtype)


_upconv2x2.defvjp(_upconv2x2_fwd, _upconv2x2_bwd)


def _upconv(x, up_params, up_mode, precision=None):
    """2x upsampling (lib/UNet.py:17-24); see ``_upconv2x2``."""
    if up_mode == "transpose":
        return _upconv2x2(x, up_params["kernel"], up_params["bias"],
                          precision if precision is not None else _precision(x))
    # bilinear: half-pixel-centred 2x resize (torch align_corners=False) + conv1x1
    n, h, w, c = x.shape
    up = jax.image.resize(x, (n, 2 * h, 2 * w, c), method="linear")
    return _conv(up, up_params, ((0, 0), (0, 0)), precision).astype(x.dtype)


def _conv_same(x, kernel, precision, preferred):
    return jax.lax.conv_general_dilated(
        x, kernel, (1, 1), ((1, 1), (1, 1)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"), precision=precision,
        preferred_element_type=preferred)


def _depth_to_space4(y):
    """(N, H, W, 4) phase channels (2*a + b) -> (N, 2H, 2W, 1)."""
    n, h, w, _ = y.shape
    y = y.reshape(n, h, w, 2, 2, 1)
    return y.transpose(0, 1, 3, 2, 4, 5).reshape(n, 2 * h, 2 * w, 1)


def _composed_top(skip, d1, last, composed, mixed_precision, precision,
                  hifi_endpoints=False):
    """Top pyramid level after ``fold_top_decoder``: final conv applied to the
    skip at full res plus the upconv-composed conv on half-res ``d1``."""
    prec = precision if precision is not None else _precision(skip)

    if mixed_precision and hifi_endpoints:
        # bf16-trunk serving with a full-fidelity top ('balanced16'): the
        # bf16 trunk activations are upcast and BOTH top convs run with f32
        # kernels at the requested MXU precision (HIGH = 3-pass).
        ys = _conv_same(skip.astype(jnp.float32),
                        last["kernel"].astype(jnp.float32), prec, jnp.float32)
        yd = _conv_same(d1.astype(jnp.float32),
                        composed["ck"].astype(jnp.float32), prec, jnp.float32)
        acc = jnp.float32
    elif mixed_precision:
        # Mixed serving: bf16 kernels/activations on the wire, but the
        # absolute-height path accumulates in f32 — f32 conv outputs here,
        # f32 bias map, and the f32 outer skip in the caller. Trained-weights
        # A/B (BASELINE.md continuation-2 study) showed f32-weight fidelity
        # (hi/lo splits) on K3 and the composed kernel changes the deviation
        # by <0.001 cm — the residual ~0.96 cm is trunk-accumulated — so the
        # single-rounded bf16 kernels are used at full bf16 speed.
        ys = _conv_same(skip, last["kernel"].astype(jnp.bfloat16), prec,
                        jnp.float32)
        yd = _conv_same(d1, composed["ck"].astype(jnp.bfloat16), prec,
                        jnp.float32)
        acc = jnp.float32
    else:
        dt = skip.dtype
        pref = _preferred(skip)
        ys = _conv_same(skip, last["kernel"].astype(dt), prec, pref)
        yd = _conv_same(d1, composed["ck"].astype(dt), prec, pref)
        acc = ys.dtype

    n, h2, w2, _ = skip.shape
    ones = jnp.ones((1, h2, w2, 1), jnp.float32)
    bias_map = _conv_same(ones, composed["s_map"],
                          jax.lax.Precision.HIGHEST, jnp.float32)

    y = ys + _depth_to_space4(yd).astype(acc) + bias_map.astype(acc)
    if "bias" in last:
        y = y + last["bias"].astype(acc)
    return y


def apply_unet(config: UNetConfig, params, state, x, *, train: bool = False,
               axis_name: str | None = None, sample_weights=None,
               mixed_precision: bool = False, precision=None,
               layer_precisions: dict | None = None,
               hifi_endpoints: bool = False, remat: bool = False):
    """Forward pass. ``x``: (N, H, W, C) with the initial DSM as channel 0.

    Returns ``(y, new_state)`` where ``y`` is (N, H, W, 1) and ``new_state``
    carries updated BatchNorm running statistics (identical to ``state`` when
    ``train=False``). ``sample_weights`` (per-sample, typically 0/1) excludes
    zero-weight padding samples from training-mode BatchNorm statistics.

    ``precision`` overrides the MXU precision policy for every conv/matmul
    (e.g. ``jax.lax.Precision.DEFAULT`` — single-pass bf16 MXU with f32
    storage/accumulation: measured +38% train throughput with demo-identical
    convergence; f32-HIGH stays the parity default).

    ``mixed_precision`` (serving mode): the conv stack runs in bfloat16 but
    the ABSOLUTE height path stays float32 — the last conv and the outer
    residual skip (which adds the input DSM, lib/UNet.py:229-244) use the
    original f32 ``x``. Rationale: bf16's ~0.4% relative rounding on the
    outer-skip DSM channel (±2σ ≈ ±10 m after normalisation) alone costs
    O(cm) of output height; the UNet-computed *correction* is small, so
    bf16 error there is sub-mm. Requires f32 input ``x``.

    ``layer_precisions`` (diagnostic/tuning): per-conv precision overrides
    keyed by layer name — ``encoder{i}``, ``bottleneck``, ``up{i}``,
    ``decoder{i}``, ``last`` (the final conv; with a composed top, both its
    convs). Unlisted layers fall back to ``precision``. Used by the
    per-layer deviation-attribution study (BASELINE.md).

    ``hifi_endpoints`` (requires ``mixed_precision``): full-fidelity
    endpoints on the bf16 trunk — the FIRST conv consumes the raw f32
    input (its ±2σ DSM multiplicands are the measured dominant error
    source) with only its output joining the bf16 trunk, and the composed
    top runs from f32-upcast activations with f32 kernels. The
    'balanced16' serving mode (models.unet.serving_precision).

    ``remat`` (training only): wrap every conv(+BN+act) block in
    ``jax.checkpoint`` so the block's internal activations (pre-BN conv
    output, normalised values) are recomputed during the backward pass
    instead of being stored to and re-read from HBM — a FLOPs-for-bandwidth
    trade on the BN-traffic-bound f32 step (BASELINE.md profile). Gradients
    are mathematically identical to the non-remat step; numerically they
    differ only by XLA fusion reassociation in the recomputed backward
    (measured ~1e-4 relative on TPU — same class of noise as any compiler
    re-fusion). Forward-only calls ignore it.
    """
    def _prec(name):
        if layer_precisions is not None and name in layer_precisions:
            return layer_precisions[name]
        return precision

    def _block(inp, blk, bst, act, name):
        def fn(inp, blk, bst, sw):
            return _conv_block(inp, blk, bst, act, config.do_BN, train,
                               axis_name, sw, _prec(name))
        if remat and train:
            fn = jax.checkpoint(fn)
        return fn(inp, blk, bst, sample_weights)

    new_state: dict = {"encoder": [], "decoder": []}
    skips = []
    out = x.astype(jnp.bfloat16) if mixed_precision else x

    for i, (block, block_state) in enumerate(zip(params["encoder"],
                                                 state["encoder"])):
        if mixed_precision and hifi_endpoints and i == 0:
            out = x  # full-fidelity first conv: raw f32 multiplicands
        out, ns = _block(out, block, block_state, config.act_fn_encoder,
                         f"encoder{i}")
        if mixed_precision:
            out = out.astype(jnp.bfloat16)
        skips.append(out)
        out = _max_pool_2x2(out)
        new_state["encoder"].append(ns)

    out, ns = _block(out, params["bottleneck"], state["bottleneck"],
                     config.act_fn_bottleneck, "bottleneck")
    new_state["bottleneck"] = ns

    composed = params.get("top_composed")
    n_decoder = len(params["decoder"])
    for i, (block, block_state) in enumerate(zip(params["decoder"], state["decoder"])):
        if composed is not None and i == n_decoder - 1:
            new_state["decoder"].append(block_state)
            break  # top level handled by the composed final conv below
        up = _upconv(out, block["up"], config.up_mode, _prec(f"up{i}"))
        out = skips[-1 - i] + up  # additive skip (lib/UNet.py:96-101)
        if i < n_decoder - 1:
            out, ns = _block(out, block, block_state, config.act_fn_decoder,
                             f"decoder{i}")
        else:
            ns = block_state  # deepest decoder level: no conv after the add
        new_state["decoder"].append(ns)

    if composed is not None:
        out = _composed_top(skips[0], out, params["last"], composed,
                            mixed_precision, _prec("last"), hifi_endpoints)
        out = out.astype(jnp.float32 if mixed_precision else x.dtype)
    else:
        if mixed_precision:
            out = out.astype(jnp.float32)  # last conv + skip in f32 (see above)
        out = _conv(out, params["last"], ((1, 1), (1, 1)), _prec("last")).astype(
            jnp.float32 if mixed_precision else x.dtype)

    if config.outer_skip:
        x0 = x[..., 0:1]
        if config.outer_skip_BN:
            x0, ns = _batch_norm(x0, params["outer_skip_bn"],
                                 state["outer_skip_bn"]["bn"], train, axis_name,
                                 sample_weights)
            new_state["outer_skip_bn"] = {"bn": ns}
        out = out + x0

    return out, new_state


def param_count(params) -> int:
    return int(sum(np.prod(leaf.shape) for leaf in jax.tree_util.tree_leaves(params)))


def analytic_flops(config: UNetConfig, tile_size: int, *,
                   composed_top: bool = False) -> int:
    """Analytic conv/matmul FLOPs of one forward pass on a ``tile_size`` tile.

    Counts multiply-adds as 2 FLOPs over every conv (the MFU convention:
    elementwise BN/activation/pool traffic is bandwidth, not FLOPs, and is
    excluded). Mirrors the graph `apply_unet` executes for the topology of
    lib/UNet.py:196-246: per-level single conv3x3 encoder, conv3x3
    bottleneck, `depth` upsamplings (transposed k=2 s=2 and
    bilinear-resize + conv1x1 both cost exactly one input tap per output
    pixel), conv3x3 after each non-top additive skip, final conv3x3 to one
    channel. With ``composed_top`` (the serving graph after
    `fold_top_decoder`) the full-resolution top upconv disappears and the
    final conv splits into the skip conv at full res plus the composed
    3x3x4-phase conv at half res — only for ``up_mode='transpose'``:
    `fold_top_decoder` is a no-op for bilinear, so the flag is ignored
    there and the unfolded graph is counted (the graph actually served).

    Train-step FLOPs/sample are conventionally 3x this (backward ~= 2x
    forward for conv stacks).
    """
    widths = config.filter_depths
    t = tile_size
    flops = 0
    # encoder: conv3x3 at the level's input resolution, pool after
    in_ch = config.n_input_channels
    for i, w in enumerate(widths):
        r = t >> i
        flops += 2 * 9 * r * r * in_ch * w
        in_ch = w
    # bottleneck at t / 2^depth
    r = t >> config.depth
    flops += 2 * 9 * r * r * widths[-1] * widths[-1]
    # decoder: upconv (1 tap/output px in BOTH up modes — transposed k2s2
    # writes one tap per output pixel; bilinear is a MAC-free resize plus a
    # conv1x1 with the same tap count) + conv3x3, deepest-to-top
    composed = composed_top and config.up_mode == "transpose"
    widths_up = tuple(reversed(widths))
    for i in range(config.depth):
        r_out = t >> (config.depth - 1 - i)  # upconv output resolution
        top = i == config.depth - 1
        if top and composed:
            break  # the composed top has no materialised upconv
        flops += 2 * r_out * r_out * widths_up[i] * widths_up[i]
        if not top:
            flops += 2 * 9 * r_out * r_out * widths_up[i] * widths_up[i + 1]
    if composed:
        # last(skip) at full res -> 1 channel, plus CK on half-res d1 -> 4
        # phase channels (fold_top_decoder); the bias map is O(t^2) constant.
        flops += 2 * 9 * t * t * config.start_kernel * 1
        flops += 2 * 9 * (t // 2) * (t // 2) * config.start_kernel * 4
    else:
        flops += 2 * 9 * t * t * config.start_kernel * 1
    return flops


def fold_batchnorm(config: UNetConfig, params, state):
    """Fold eval-mode BatchNorm into conv weights for inference.

    In eval mode BN is the fixed affine ``y = (x - mean) * scale /
    sqrt(var + eps) + bias``; folding it into the preceding conv's kernel and
    bias is mathematically exact and removes ~2 elementwise HBM passes per
    conv from the inference hot path. Returns ``(folded_config,
    folded_params, folded_state)`` describing an equivalent BN-free network
    (``do_BN=False``). Networks with ``outer_skip_BN`` keep that single BN
    (it normalises an input, not a conv output) — only the per-block BNs
    fold.
    """
    if not config.do_BN:
        return config, params, state

    def fold_block(block, block_state):
        new_block = dict(block)
        if "bn" not in block:
            return new_block
        bn = new_block.pop("bn")
        mean = block_state["bn"]["mean"]
        var = block_state["bn"]["var"]
        factor = bn["scale"] * jax.lax.rsqrt(var + BN_EPS)      # (out,)
        conv = dict(new_block["conv"])
        conv["kernel"] = conv["kernel"] * factor                # HWIO: out last
        conv["bias"] = conv.get("bias", 0.0) + bn["bias"] - mean * factor
        new_block["conv"] = conv
        return new_block

    folded = {
        "encoder": [fold_block(b, s) for b, s in zip(params["encoder"],
                                                     state["encoder"])],
        "bottleneck": fold_block(params["bottleneck"], state["bottleneck"]),
        "decoder": [fold_block(b, s) for b, s in zip(params["decoder"],
                                                     state["decoder"])],
        "last": dict(params["last"]),
    }
    new_state = {"encoder": [{} for _ in folded["encoder"]], "bottleneck": {},
                 "decoder": [{} for _ in folded["decoder"]]}
    if config.outer_skip and config.outer_skip_BN:
        folded["outer_skip_bn"] = params["outer_skip_bn"]
        new_state["outer_skip_bn"] = state["outer_skip_bn"]

    folded_config = dataclasses.replace(config, do_BN=False)
    return folded_config, folded, new_state


def fold_top_decoder(config: UNetConfig, params, state):
    """Serving-time rewrite: compose the top upconv into the final conv.

    The top pyramid level is linear end-to-end — the deepest decoder step has
    no conv/activation after the additive skip (lib/UNet.py:181,222-224), so

        last(skip0 + upconv(d1))  =  last(skip0) + (last ∘ upconv)(d1) + bias

    The ``last ∘ upconv`` term collapses to ONE 3x3 conv on the half-res
    ``d1`` producing the four pixel phases of the full-res output (channels
    ordered ``2*a + b`` for output row 2i+a, col 2j+b), because the 2x2
    stride-2 transposed conv writes each output pixel from exactly one tap.
    The upconv bias contributes through the final conv's SAME padding as a
    border-dependent map, emitted by convolving ones with the 3x3 scalar
    kernel ``S[dy,dx] = sum_m K3[dy,dx,m] * b_up[m]``.

    Why: the full-res interleaved-write upconv is the single most
    roofline-inefficient op in the serving profile (2.3x off HBM
    speed-of-light from the stride-2 scatter writes); this rewrite deletes it
    and never materialises the full-res upconv output. Measured 2.2x (bf16
    weights) / 1.6x (hi/lo f32-fidelity weights) on the whole top-level block
    at batch 128 on the v5e.

    Exact up to float reassociation. Serving-only (the composed params are
    not a trainable parameterisation). No-op for ``up_mode='bilinear'`` (the
    bilinear resize is not a single-tap phase map) and when already folded.
    """
    if config.up_mode != "transpose" or "top_composed" in params:
        return config, params, state

    top = params["decoder"][-1]
    k_up = np.asarray(top["up"]["kernel"], np.float32)   # (2, 2, c_d1, c_skip)
    b_up = np.asarray(top["up"]["bias"], np.float32)     # (c_skip,)
    k3 = np.asarray(params["last"]["kernel"], np.float32)  # (3, 3, c_skip, 1)

    c_d1 = k_up.shape[2]
    ck = np.zeros((3, 3, c_d1, 4), np.float32)
    for a in (0, 1):
        for b in (0, 1):
            for dy in (-1, 0, 1):
                ap, r = (a + dy) % 2, (a + dy) // 2
                for dx in (-1, 0, 1):
                    bp, s = (b + dx) % 2, (b + dx) // 2
                    # y(2i+a, 2j+b) += K3[dy,dx,m] * u(2i+a+dy, 2j+b+dx, m)
                    # u(2(i+r)+ap, 2(j+s)+bp, m) = K2[ap,bp,c,m] . d1(i+r, j+s, c)
                    ck[r + 1, s + 1, :, 2 * a + b] += (
                        k_up[ap, bp] @ k3[dy + 1, dx + 1, :, 0])
    s_map = np.einsum("yxm,m->yx", k3[:, :, :, 0], b_up)[:, :, None, None]

    new_params = dict(params)
    new_params["decoder"] = list(params["decoder"][:-1]) + [{}]
    new_params["top_composed"] = {"ck": jnp.asarray(ck),
                                  "s_map": jnp.asarray(s_map)}
    return config, new_params, state


def fold_serving(config: UNetConfig, params, state):
    """All exact serving-time rewrites: BN fold + top-decoder composition."""
    config, params, state = fold_batchnorm(config, params, state)
    return fold_top_decoder(config, params, state)


def describe_unet(config: UNetConfig, params, tile_size: int | None = None) -> str:
    """Layer-by-layer architecture summary (plot_model_txt artifact,
    reference: lib/utils.py:711-729 via torchsummary)."""
    lines = [f"UNet architecture ({config.depth} levels, "
             f"{config.n_input_channels} input channels)", ""]
    lines.append(f"{'layer':<28}{'kernel':<22}{'params':>12}")
    lines.append("-" * 62)
    total = 0

    def row(name, layer):
        nonlocal total
        count = int(sum(np.prod(leaf.shape)
                        for leaf in jax.tree_util.tree_leaves(layer)))
        total += count
        kernel = tuple(layer["kernel"].shape) if "kernel" in layer else "-"
        lines.append(f"{name:<28}{str(kernel):<22}{count:>12,}")

    for i, block in enumerate(params["encoder"]):
        row(f"encoder.{i}.conv(+bn)", block)
        lines.append(f"{'encoder.' + str(i) + '.maxpool2x2':<28}{'-':<22}{0:>12,}")
    row("bottleneck.conv(+bn)", params["bottleneck"])
    for i, block in enumerate(params["decoder"]):
        label = f"decoder.{i}.up" + ("" if "conv" not in block else "+conv(+bn)")
        row(label, block)
    row("last.conv3x3", params["last"])
    if "outer_skip_bn" in params:
        row("outer_skip.bn", params["outer_skip_bn"])
    elif config.outer_skip:
        lines.append(f"{'outer_skip.add':<28}{'-':<22}{0:>12,}")

    lines.append("-" * 62)
    lines.append(f"{'total':<50}{total:>12,}")
    if tile_size:
        widths = config.filter_depths
        act_mb = sum((tile_size // 2 ** i) ** 2 * w * 4 / 2 ** 20
                     for i, w in enumerate(widths))
        lines.append(f"approx. activation footprint per sample @{tile_size}px "
                     f"(f32 encoder): {act_mb:.1f} MiB")
    return "\n".join(lines)


def flagship_config(input_channels: str = "geom-stereo") -> UNetConfig:
    """The paper's headline architecture: depth-5 UNet, start 64, cap 512."""
    from resdepth_tpu.config.schema import count_input_channels
    return UNetConfig(n_input_channels=count_input_channels(input_channels))
