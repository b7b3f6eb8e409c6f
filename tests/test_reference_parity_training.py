"""Multi-step TRAINING-DYNAMICS parity against the actual reference stack.

The other reference-parity tests pin individual pieces: eval-mode model
outputs (test_reference_parity.py), the per-sample data path and the loss
function (test_reference_parity_dataset.py), schedulers vs torch
(test_train.py). What none of them pin is the composition over optimizer
steps: forward in TRAIN mode (batch-statistics BatchNorm), the denormalised
masked L1 backward, torch-coupled Adam (L2 decay folded into the gradient
BEFORE the moment updates, /root/reference/lib/utils.py:319-341), and the
BatchNorm running-statistics momentum updates.

These tests run K optimizer steps through the REAL reference training
machinery — the real ``lib/UNet.py`` model, the real
``Trainer._compute_denormalized_loss`` (/root/reference/lib/Trainer.py:87-100)
and ``torch.optim.Adam``, mirroring the reference step at
lib/Trainer.py:159-222 — and the same K steps through our fused jitted
train step (resdepth_tpu/train/step.py), starting from identical weights
and consuming identical batches. Asserted: per-step loss agreement and
final parameter/BN-running-stat agreement.

Batch-content parity is proven separately (test_reference_parity_dataset);
here both sides consume the SAME realized batches so that any disagreement
is attributable to the training dynamics alone.

Skipped automatically when /root/reference is absent.
"""

import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from resdepth_tpu.data.pipeline import BatchSpec, DeviceRasters, build_batch
from resdepth_tpu.models import torch_import
from resdepth_tpu.models.unet import UNetConfig, init_unet
from resdepth_tpu.train.optim import build_optimizer
from resdepth_tpu.train.step import init_train_state, make_train_step

from tests.test_reference_parity import (_load_reference_unet,
                                         _reference_kwargs)
from tests.test_reference_parity_numerics import _load_with_stubs

REFERENCE = "/root/reference"

pytestmark = pytest.mark.skipif(not os.path.isdir(REFERENCE),
                                reason="reference implementation not available")

LR = 2e-4
DSM_STD = 5.0
BATCH, TILE, STEPS = 4, 16, 6


def _scene(rng):
    rows = cols = 48
    gt = rng.normal(400.0, 5.0, (rows, cols)).astype(np.float32)
    dsm = gt + rng.normal(0.0, 1.0, (rows, cols)).astype(np.float32)
    orthos = rng.normal(120.0, 25.0, (3, rows, cols)).astype(np.float32)
    rasters = DeviceRasters(
        dsm_input=jnp.asarray(dsm), dsm_target=jnp.asarray(gt),
        orthos=jnp.asarray(orthos),
        pairs=jnp.asarray([[0, 1], [1, 2]], jnp.int32),
        nodata=jnp.asarray(-9999.0, jnp.float32))
    return rasters, rows, cols


def _batches(rasters, spec, positions, pair_idx):
    """Realize the device batches once; both sides consume these."""
    out = []
    bounds = jnp.zeros((positions.shape[1], 4), jnp.int32)
    for k in range(positions.shape[0]):
        b = build_batch(rasters, jnp.asarray(positions[k]),
                        jnp.asarray(pair_idx[k]), bounds,
                        jax.random.PRNGKey(0), spec)
        out.append({key: np.asarray(val) for key, val in b.items()})
    return out


def _ref_loss_fn():
    """The real Trainer._compute_denormalized_loss, bound to an L1 criterion
    (the reference's only loss, lib/utils.py:275-292)."""
    import types

    import torch

    dn = _load_with_stubs("lib/data_normalization.py", "ref_dn_train")
    trainer_mod = _load_with_stubs(
        "lib/Trainer.py", "ref_trainer_train",
        extra_stubs={
            "lib.data_normalization": dn,
            "lib.AverageMeter": _load_with_stubs("lib/AverageMeter.py",
                                                 "ref_avg_train"),
        })
    fake_self = types.SimpleNamespace(criterion=torch.nn.L1Loss())

    def loss_fn(pred, target, mask, mean):
        std = torch.full((pred.shape[0],), DSM_STD)
        return trainer_mod.Trainer._compute_denormalized_loss(
            fake_self, pred, target, mask, mean, std)

    return loss_fn


def _torch_training_run(config, params, bn_state, batches, weight_decay):
    """K steps through the real reference stack: real UNet (train mode),
    real denormalized loss, torch Adam — the reference training step
    (lib/Trainer.py:159-222)."""
    import torch

    model = _load_reference_unet()(**_reference_kwargs(config))
    sd = {k: torch.from_numpy(np.array(v)) if np.ndim(v) else torch.tensor(v)
          for k, v in torch_import.state_dict_from_params(
              params, bn_state, config).items()}
    model.load_state_dict(sd, strict=True)
    model.train()
    optimizer = torch.optim.Adam(model.parameters(), lr=LR,
                                 weight_decay=weight_decay)
    loss_fn = _ref_loss_fn()

    losses = []
    for batch in batches:
        x = torch.from_numpy(batch["input"].transpose(0, 3, 1, 2).copy())
        y = torch.from_numpy(batch["target"].transpose(0, 3, 1, 2).copy())
        mask = torch.from_numpy(
            batch["loss_mask"].transpose(0, 3, 1, 2).copy())
        mean = torch.from_numpy(batch["dsm_mean"].copy())
        optimizer.zero_grad()
        loss = loss_fn(model(x), y, mask, mean)
        loss.backward()
        optimizer.step()
        losses.append(float(loss.detach()))
    return model, np.asarray(losses)


def _our_training_run(config, params, bn_state, rasters, spec, positions,
                      pair_idx, weight_decay):
    tx = build_optimizer("Adam", weight_decay)
    state = init_train_state(params, bn_state, tx, LR)
    step = make_train_step(config, spec, tx, mesh=None, donate=False)
    bounds = jnp.zeros((BATCH, 4), jnp.int32)
    weights = jnp.ones(BATCH, jnp.float32)
    metrics = []
    for k in range(STEPS):
        state, metric = step(state, rasters, jnp.asarray(positions[k]),
                             jnp.asarray(pair_idx[k]), bounds, weights,
                             jax.random.PRNGKey(0))
        metrics.append(float(metric))
    return state, np.asarray(metrics)


@pytest.mark.parametrize("do_BN,weight_decay,up_mode", [
    (True, 1e-5, "transpose"),   # reference defaults: BN + coupled L2 decay
    (True, 0.0, "bilinear"),
    (False, 0.0, "transpose"),
])
def test_training_dynamics_match_reference(do_BN, weight_decay, up_mode):
    rng = np.random.default_rng(11)
    rasters, rows, cols = _scene(rng)
    config = UNetConfig(n_input_channels=3, start_kernel=8,
                        max_filter_depth=16, depth=2, do_BN=do_BN,
                        up_mode=up_mode)
    spec = BatchSpec(input_channels="geom-stereo", tile_size=TILE,
                     dsm_std=DSM_STD, permute_images_within_pair=False,
                     augment=False)
    params, bn_state = init_unet(jax.random.PRNGKey(3), config)

    positions = rng.integers(0, rows - TILE, (STEPS, BATCH, 2)).astype(np.int32)
    pair_idx = rng.integers(0, 2, (STEPS, BATCH)).astype(np.int32)
    batches = _batches(rasters, spec, positions, pair_idx)

    model, ref_losses = _torch_training_run(config, params, bn_state, batches,
                                            weight_decay)
    state, our_metrics = _our_training_run(config, params, bn_state, rasters,
                                           spec, positions, pair_idx,
                                           weight_decay)

    # Per-step loss: the reference loss IS the denormalised masked MAE our
    # step returns as its metric (identical rescale algebra, loss.py).
    np.testing.assert_allclose(our_metrics, ref_losses, rtol=2e-5)

    # Final weights + BN running statistics after K coupled Adam steps.
    ours = torch_import.state_dict_from_params(state.params, state.bn_state,
                                               config)
    theirs = {k: v.detach().numpy() for k, v in model.state_dict().items()}
    assert set(ours) == set(theirs)
    for key in sorted(theirs):
        if key.endswith("num_batches_tracked"):
            continue  # torch counts batches; our export writes 0
        np.testing.assert_allclose(
            ours[key], theirs[key], rtol=5e-4, atol=5e-6,
            err_msg=f"{key} diverged after {STEPS} steps")


def test_warm_start_from_reference_checkpoint_matches_reference(tmp_path):
    """Resuming from a REAL reference checkpoint (.pth written by the real
    lib.UNet + torch.optim.Adam, the Trainer._save_checkpoint payload —
    lib/Trainer.py:145-157) continues the exact torch trajectory: the Adam
    moment import is keyed by torch's param ORDER (integer state indices),
    which only the real reference model can pin (the other Adam-import test
    uses the self-written oracle)."""
    import torch

    rng = np.random.default_rng(13)
    rasters, rows, cols = _scene(rng)
    config = UNetConfig(n_input_channels=3, start_kernel=8,
                        max_filter_depth=16, depth=2)
    spec = BatchSpec(input_channels="geom-stereo", tile_size=TILE,
                     dsm_std=DSM_STD, permute_images_within_pair=False,
                     augment=False)
    params, bn_state = init_unet(jax.random.PRNGKey(7), config)

    positions = rng.integers(0, rows - TILE, (STEPS, BATCH, 2)).astype(np.int32)
    pair_idx = rng.integers(0, 2, (STEPS, BATCH)).astype(np.int32)
    batches = _batches(rasters, spec, positions, pair_idx)
    warm, cont = STEPS // 2, STEPS - STEPS // 2

    # ---- reference side: 3 steps, checkpoint, 3 more steps ---- #
    model = _load_reference_unet()(**_reference_kwargs(config))
    sd = {k: torch.from_numpy(np.array(v)) if np.ndim(v) else torch.tensor(v)
          for k, v in torch_import.state_dict_from_params(
              params, bn_state, config).items()}
    model.load_state_dict(sd, strict=True)
    model.train()
    optimizer = torch.optim.Adam(model.parameters(), lr=LR, weight_decay=1e-5)
    loss_fn = _ref_loss_fn()

    ref_losses = []
    ckpt_path = str(tmp_path / "Model_best.pth")
    for k, batch in enumerate(batches):
        if k == warm:
            torch.save({"epoch": warm - 1,
                        "model_state_dict": model.state_dict(),
                        "optimizer_state_dict": optimizer.state_dict()},
                       ckpt_path)
        x = torch.from_numpy(batch["input"].transpose(0, 3, 1, 2).copy())
        y = torch.from_numpy(batch["target"].transpose(0, 3, 1, 2).copy())
        mask = torch.from_numpy(batch["loss_mask"].transpose(0, 3, 1, 2).copy())
        mean = torch.from_numpy(batch["dsm_mean"].copy())
        optimizer.zero_grad()
        loss = loss_fn(model(x), y, mask, mean)
        loss.backward()
        optimizer.step()
        ref_losses.append(float(loss.detach()))

    # ---- our side: import the checkpoint, run the continuation steps ---- #
    r_params, r_bn = torch_import.import_checkpoint(ckpt_path, config)
    mu, nu, count = torch_import.import_adam_state(ckpt_path, config)
    assert count == warm
    tx = build_optimizer("Adam", 1e-5)
    state = init_train_state(r_params, r_bn, tx, LR)
    state = state.replace(opt_state=torch_import.graft_adam_state(
        state.opt_state, mu, nu, count))

    step = make_train_step(config, spec, tx, mesh=None, donate=False)
    bounds = jnp.zeros((BATCH, 4), jnp.int32)
    weights = jnp.ones(BATCH, jnp.float32)
    metrics = []
    for k in range(warm, STEPS):
        state, metric = step(state, rasters, jnp.asarray(positions[k]),
                             jnp.asarray(pair_idx[k]), bounds, weights,
                             jax.random.PRNGKey(0))
        metrics.append(float(metric))

    np.testing.assert_allclose(np.asarray(metrics),
                               np.asarray(ref_losses[warm:]), rtol=2e-5)
    ours = torch_import.state_dict_from_params(state.params, state.bn_state,
                                               config)
    theirs = {k: v.detach().numpy() for k, v in model.state_dict().items()}
    for key in sorted(theirs):
        if key.endswith("num_batches_tracked"):
            continue
        np.testing.assert_allclose(
            ours[key], theirs[key], rtol=5e-4, atol=5e-6,
            err_msg=f"{key} diverged after warm-start resume")


def test_training_dynamics_match_reference_multistep_scan():
    """The steps_per_call=K fused scan reproduces the same torch trajectory
    (same batches, one dispatch)."""
    rng = np.random.default_rng(12)
    rasters, rows, cols = _scene(rng)
    config = UNetConfig(n_input_channels=3, start_kernel=8,
                        max_filter_depth=16, depth=2)
    spec = BatchSpec(input_channels="geom-stereo", tile_size=TILE,
                     dsm_std=DSM_STD, permute_images_within_pair=False,
                     augment=False)
    params, bn_state = init_unet(jax.random.PRNGKey(5), config)

    positions = rng.integers(0, rows - TILE, (STEPS, BATCH, 2)).astype(np.int32)
    pair_idx = rng.integers(0, 2, (STEPS, BATCH)).astype(np.int32)
    batches = _batches(rasters, spec, positions, pair_idx)

    _, ref_losses = _torch_training_run(config, params, bn_state, batches,
                                        weight_decay=1e-5)

    tx = build_optimizer("Adam", 1e-5)
    state = init_train_state(params, bn_state, tx, LR)
    step = make_train_step(config, spec, tx, mesh=None, donate=False,
                           steps_per_call=STEPS)
    bounds = jnp.zeros((STEPS, BATCH, 4), jnp.int32)
    weights = jnp.ones((STEPS, BATCH), jnp.float32)
    _, metrics = step(state, rasters, jnp.asarray(positions),
                      jnp.asarray(pair_idx), bounds, weights,
                      jax.random.PRNGKey(0))
    np.testing.assert_allclose(np.asarray(metrics), ref_losses, rtol=2e-5)
