"""Jitted, mesh-parallel train and eval steps.

One fused XLA program per step: device-side batch assembly (gather /
normalise / augment, ``data.pipeline.build_batch``) -> UNet forward (train
mode with cross-replica BatchNorm) -> denormalised masked L1 -> backward ->
cross-replica gradient ``psum`` -> optimizer update. The host contributes
only (B, 2) tile positions and scalars per step — there is no per-batch
host preprocessing and no parameter traffic (contrast with the reference's
worker-process DataLoader + ``.to(device)`` per batch,
/root/reference/lib/Trainer.py:159-199).

Data parallelism follows SURVEY.md §2b: batches shard over a 1-D mesh axis;
gradients and BatchNorm batch statistics reduce over ICI so the result is
bit-equivalent to single-device training at the same global batch size.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
from jax.sharding import PartitionSpec as P

from resdepth_tpu.data.pipeline import BatchSpec, DeviceRasters, build_batch
from resdepth_tpu.models.unet import UNetConfig, apply_unet
from resdepth_tpu.train.loss import denormalized_masked_l1
from resdepth_tpu.train.optim import apply_updates


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class TrainState:
    params: dict
    bn_state: dict
    opt_state: object
    lr: jax.Array       # () f32 — schedulable without recompilation
    step: jax.Array     # () i32
    # Exponential moving average of ``params`` (None = EMA disabled). The
    # EMA model is what validation/checkpoints/serving consume when enabled
    # (training_settings.ema_decay); ``params`` stays the raw optimizer
    # iterate. No reference analogue.
    ema_params: dict | None = None

    def replace(self, **kwargs) -> "TrainState":
        return dataclasses.replace(self, **kwargs)

    @property
    def serve_params(self):
        """The weights to evaluate/checkpoint/serve: EMA when enabled."""
        return self.params if self.ema_params is None else self.ema_params


def init_train_state(params, bn_state, tx, lr: float,
                     ema: bool = False) -> TrainState:
    return TrainState(params=params, bn_state=bn_state,
                      opt_state=tx.init(params),
                      lr=jnp.asarray(lr, jnp.float32),
                      step=jnp.asarray(0, jnp.int32),
                      # Seed the EMA at the initial weights (the standard
                      # bias-free initialisation; no warmup correction).
                      # COPIES, not aliases: the donated train state must
                      # not present the same buffer as two arguments.
                      ema_params=(jax.tree_util.tree_map(jnp.copy, params)
                                  if ema else None))


def _mesh_axes(mesh):
    """Collective axes of a mesh: every mesh axis (1-D ICI or 2-D DCN x ICI —
    a multi-slice mesh just adds an axis; the tuple form works uniformly in
    psum/pmean/axis_index and PartitionSpec)."""
    return tuple(mesh.axis_names)


def _check_mixed_precision_input(mixed_precision: bool, compute_dtype) -> None:
    """The bf16-trunk modes need the RAW f32 batch input: with
    ``compute_dtype`` bfloat16 the hifi first conv would consume an
    already-rounded input and the mode silently degrades to plain bf16.
    The train CLI rejects this at validation (validate_train.py); this
    guards programmatic callers (bench, scripts, notebooks)."""
    if mixed_precision and jnp.dtype(compute_dtype) != jnp.float32:
        raise ValueError(
            "mixed_precision (bf16 activation trunk) requires "
            f"compute_dtype float32, got {jnp.dtype(compute_dtype).name}; "
            "the trunk handles its own bf16 rounding.")


def _sharded(fn, mesh, batch_axis=0):
    """shard_map wrapper: replicated state/rasters, batch axis sharded over
    ALL mesh axes, replicated (state, metric) outputs — psums inside keep
    them consistent."""
    axes = _mesh_axes(mesh)
    batch_spec = P(axes) if batch_axis == 0 else P(None, axes)
    in_specs = (P(), P()) + (batch_spec,) * 4 + (P(),)
    return jax.shard_map(fn, mesh=mesh, in_specs=in_specs,
                         out_specs=(P(), P()), check_vma=False)


def make_train_step(config: UNetConfig, spec: BatchSpec, tx, mesh=None,
                    compute_dtype=jnp.float32,
                    donate: bool = True, steps_per_call: int = 1,
                    precision=None, weighted_bn: bool = True,
                    layer_precisions: dict | None = None,
                    mixed_precision: bool = False,
                    hifi_endpoints: bool = False, remat: bool = False,
                    ema_decay: float = 0.0):
    """Build the jitted train step.

    Signature: ``step(state, rasters, positions, pair_idx, bounds, weights,
    rng) -> (state, metric)`` where ``metric`` is the global denormalised
    masked MAE of the batch in meters.

    ``precision`` overrides the MXU precision for the model's convs/matmuls
    (``cfg.tpu.train_precision``: 'high' = 3-pass f32, the parity default;
    'default' = single-pass bf16 passes with f32 storage/accumulation —
    measured +38% throughput with demo-identical convergence; 'highest'
    available but pathological on v5e backward — BASELINE.md).

    ``layer_precisions`` / ``mixed_precision`` / ``hifi_endpoints`` mirror
    ``apply_unet`` and enable the balanced training modes: 'balanced' =
    ``precision=DEFAULT`` with 3-pass HIGH on the two measured error-source
    convs (first + last); 'balanced16' = bf16 activation trunk
    (``mixed_precision``) with full-fidelity endpoints — the forward/backward
    analogue of the serving modes of the same names. ``mixed_precision``
    requires f32 batch input (keep ``compute_dtype`` float32).

    ``weighted_bn=False`` skips folding the 0/1 sample weights into the
    BatchNorm batch statistics — valid ONLY when every batch is full
    (no zero-weight padding), where the two are numerically identical;
    it saves the extra weighted-moment elementwise passes.

    Under a mesh, batches shard over EVERY mesh axis and gradients/BN
    statistics reduce over all of them (the collective axis names derive
    from the mesh itself) — a 2-D (DCN x ICI) multi-slice mesh needs no
    step changes.

    ``remat`` wraps each conv(+BN+act) block in ``jax.checkpoint``
    (models/unet.py::apply_unet) — recompute block activations in the
    backward pass instead of storing them, targeting the measured ~42%
    BN-elementwise HBM share of the f32-HIGH step (BASELINE.md). Gradients
    are mathematically identical either way (numerics differ only by XLA
    re-fusion, ~1e-4 relative); adopt-or-kill by measurement.

    ``ema_decay > 0`` additionally tracks an exponential moving average of
    the weights inside the fused step (``state.ema_params``; requires a
    state built with ``init_train_state(..., ema=True)``). The EMA is the
    model validation/checkpoints serve; ``params`` remains the raw Adam/SGD
    iterate, so the PER-STEP update is unchanged (the EMA never feeds back
    into the gradient or optimizer). One deliberate exception at the epoch
    level: because Trainer.validate scores the SERVED weights, a
    ReduceLROnPlateau scheduler is driven by the EMA val loss when the EMA
    is on — LR reacts to the model actually being selected/served, so the
    LR (and hence raw-iterate) trajectory may differ from an EMA-off run
    under that scheduler (tested in test_train.py::
    test_ema_plateau_scheduler_follows_served_val_loss). StepLR/
    ExponentialLR are val-loss-independent and keep trajectories identical.

    ``steps_per_call > 1`` runs that many optimizer steps inside ONE jitted
    program via ``lax.scan`` (batch arrays gain a leading steps dimension and
    ``metric`` becomes a (steps,) vector). This amortises host dispatch
    latency — one dispatch per K steps instead of per step — which matters
    whenever per-step device time is small relative to host/interconnect
    round-trips.
    """
    axis = _mesh_axes(mesh) if mesh is not None else None
    _check_mixed_precision_input(mixed_precision, compute_dtype)

    def step_fn(state: TrainState, rasters: DeviceRasters, positions,
                pair_indices, bounds, weights, rng):
        rng = jax.random.fold_in(rng, state.step)
        if axis is not None:
            rng = jax.random.fold_in(rng, jax.lax.axis_index(axis))

        def loss_fn(params, bn_state):
            batch = build_batch(rasters, positions, pair_indices, bounds, rng, spec)
            x = batch["input"].astype(compute_dtype)
            pred, new_bn = apply_unet(config, params, bn_state, x,
                                      train=True, axis_name=axis,
                                      sample_weights=(weights if weighted_bn
                                                      else None),
                                      precision=precision,
                                      layer_precisions=layer_precisions,
                                      mixed_precision=mixed_precision,
                                      hifi_endpoints=hifi_endpoints,
                                      remat=remat)
            loss, (num, den) = denormalized_masked_l1(
                pred, batch["target"], batch["loss_mask"], batch["dsm_mean"],
                spec.dsm_std, weights, axis)
            return loss, (new_bn, num, den)

        (_, (new_bn, num, den)), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(state.params, state.bn_state)

        if axis is not None:
            grads = jax.lax.psum(grads, axis)
            num = jax.lax.psum(num, axis)
            den = jax.lax.psum(den, axis)

        updates, new_opt = tx.update(grads, state.opt_state, state.params)
        new_params = apply_updates(state.params, updates, state.lr)
        if ema_decay:
            # One fused elementwise pass over the weights — negligible next
            # to the Adam update already in the step. The decayed tracking
            # of the raw iterate IS the served model under ema_decay
            # (training_settings.ema_decay; Trainer.validate/_save).
            d = jnp.float32(ema_decay)
            new_ema = jax.tree_util.tree_map(
                lambda e, p: (e * d + p.astype(jnp.float32) * (1 - d))
                .astype(e.dtype), state.ema_params, new_params)
        else:
            new_ema = state.ema_params
        new_state = TrainState(params=new_params, bn_state=new_bn,
                               opt_state=new_opt, lr=state.lr,
                               step=state.step + 1, ema_params=new_ema)
        metric = num / jnp.maximum(den, 1.0)
        return new_state, metric

    if steps_per_call > 1:
        inner = step_fn

        def step_fn(state, rasters, positions, pair_indices, bounds, weights,
                    rng):
            def body(carry, xs):
                pos, pair, bd, w = xs
                carry, metric = inner(carry, rasters, pos, pair, bd, w, rng)
                return carry, metric
            return jax.lax.scan(body, state,
                                (positions, pair_indices, bounds, weights))

    if mesh is not None:
        step_fn = _sharded(step_fn, mesh,
                           batch_axis=1 if steps_per_call > 1 else 0)
    return jax.jit(step_fn, donate_argnums=(0,) if donate else ())


def make_eval_step(config: UNetConfig, spec: BatchSpec, mesh=None,
                   compute_dtype=jnp.float32,
                   precision=None, layer_precisions: dict | None = None,
                   mixed_precision: bool = False,
                   hifi_endpoints: bool = False):
    """Build the jitted eval step.

    Signature: ``eval_step(params, bn_state, rasters, positions, pair_idx,
    bounds, weights, rng) -> (num, den)`` — the masked |error| sum in meters
    and the valid-pixel count, for host-side per-batch averaging (parity with
    the reference's per-batch AverageMeter, lib/Trainer.py:224-226).
    """
    axis = _mesh_axes(mesh) if mesh is not None else None
    _check_mixed_precision_input(mixed_precision, compute_dtype)

    def eval_fn(params, bn_state, rasters, positions, pair_indices, bounds,
                weights, rng):
        batch = build_batch(rasters, positions, pair_indices, bounds, rng, spec)
        x = batch["input"].astype(compute_dtype)
        pred, _ = apply_unet(config, params, bn_state, x, train=False,
                             precision=precision,
                             layer_precisions=layer_precisions,
                             mixed_precision=mixed_precision,
                             hifi_endpoints=hifi_endpoints)
        _, (num, den) = denormalized_masked_l1(
            pred, batch["target"], batch["loss_mask"], batch["dsm_mean"],
            spec.dsm_std, weights, None)
        if axis is not None:
            num = jax.lax.psum(num, axis)
            den = jax.lax.psum(den, axis)
        return num, den

    if mesh is not None:
        axes = _mesh_axes(mesh)
        in_specs = (P(), P(), P()) + (P(axes),) * 4 + (P(),)
        eval_fn = jax.shard_map(eval_fn, mesh=mesh, in_specs=in_specs,
                                out_specs=(P(), P()), check_vma=False)
    return jax.jit(eval_fn)
