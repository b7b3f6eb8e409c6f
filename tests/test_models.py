"""UNet model: shapes, topology, and bit-level parity with the torch oracle."""

import dataclasses

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from resdepth_tpu.models import unet as junet
from resdepth_tpu.models import torch_import


def _small_config(**overrides):
    base = dict(n_input_channels=3, start_kernel=4, max_filter_depth=16, depth=3,
                act_fn_encoder="relu", act_fn_decoder="relu", act_fn_bottleneck="relu",
                up_mode="transpose", do_BN=True, bias_conv_layer=False,
                outer_skip=True, outer_skip_BN=False)
    base.update(overrides)
    return junet.UNetConfig(**base)


def test_filter_depth_cap():
    config = junet.UNetConfig(start_kernel=64, max_filter_depth=512, depth=5)
    assert config.filter_depths == (64, 128, 256, 512, 512)


@pytest.mark.parametrize("channels,n_in", [("geom", 1), ("geom-stereo", 3),
                                           ("stereo", 2), ("geom-mono", 2)])
def test_output_shape(channels, n_in):
    config = _small_config(n_input_channels=n_in, outer_skip=channels != "stereo")
    params, state = junet.init_unet(jax.random.PRNGKey(0), config)
    x = jnp.ones((2, 32, 32, n_in), jnp.float32)
    y, new_state = junet.apply_unet(config, params, state, x, train=False)
    assert y.shape == (2, 32, 32, 1)
    assert jax.tree_util.tree_structure(new_state) == jax.tree_util.tree_structure(state)


def test_outer_skip_identity_at_zero_weights():
    """With all-zero weights + outer skip, the network is the identity on ch 0."""
    config = _small_config(do_BN=False, bias_conv_layer=False)
    params, state = junet.init_unet(jax.random.PRNGKey(0), config)
    params = jax.tree_util.tree_map(jnp.zeros_like, params)
    x = jax.random.normal(jax.random.PRNGKey(1), (1, 32, 32, 3))
    y, _ = junet.apply_unet(config, params, state, x)
    np.testing.assert_allclose(np.asarray(y), np.asarray(x[..., 0:1]), atol=1e-6)


def _torch_kwargs(config):
    return dict(
        n_input_channels=config.n_input_channels, start_kernel=config.start_kernel,
        max_filter_depth=config.max_filter_depth, depth=config.depth,
        act_fn_encoder=config.act_fn_encoder, act_fn_decoder=config.act_fn_decoder,
        act_fn_bottleneck=config.act_fn_bottleneck, up_mode=config.up_mode,
        do_BN=config.do_BN, bias_conv_layer=config.bias_conv_layer,
        outer_skip=config.outer_skip, outer_skip_BN=config.outer_skip_BN)


def _parity_setup(config, seed=0):
    import torch
    from tests.torch_unet import TorchUNet

    torch.manual_seed(seed)
    model = TorchUNet(**_torch_kwargs(config))

    # Make BN running statistics non-trivial before comparing eval mode.
    model.train()
    with torch.no_grad():
        for _ in range(2):
            model(torch.randn(2, config.n_input_channels, 32, 32))
    model.eval()

    sd = {k: np.array(v.detach().numpy()) for k, v in model.state_dict().items()}
    params, state = torch_import.params_from_state_dict(sd, config)
    return model, params, state


@pytest.mark.parametrize("overrides", [
    dict(),
    dict(up_mode="bilinear"),
    dict(act_fn_encoder="lrelu", act_fn_decoder="prelu", act_fn_bottleneck="lrelu"),
    dict(do_BN=False, bias_conv_layer=True),
    dict(outer_skip_BN=True),
    dict(outer_skip=False),
])
def test_eval_parity_with_torch(overrides):
    import torch

    config = _small_config(**overrides)
    model, params, state = _parity_setup(config)

    x = np.random.default_rng(7).normal(size=(2, config.n_input_channels, 32, 32)) \
        .astype(np.float32)
    with torch.no_grad():
        ref = model(torch.from_numpy(x)).numpy()

    x_nhwc = jnp.asarray(x.transpose(0, 2, 3, 1))
    ours, _ = junet.apply_unet(config, params, state, x_nhwc, train=False)
    ours = np.asarray(ours).transpose(0, 3, 1, 2)

    np.testing.assert_allclose(ours, ref, rtol=1e-4, atol=1e-4)


def test_train_mode_parity_with_torch():
    """Training forward (batch statistics) and running-stat updates match torch."""
    import torch

    config = _small_config()
    model, params, state = _parity_setup(config)
    model.train()

    x = np.random.default_rng(11).normal(size=(4, config.n_input_channels, 32, 32)) \
        .astype(np.float32)
    with torch.no_grad():
        ref = model(torch.from_numpy(x)).numpy()

    x_nhwc = jnp.asarray(x.transpose(0, 2, 3, 1))
    ours, new_state = junet.apply_unet(config, params, state, x_nhwc, train=True)
    ours = np.asarray(ours).transpose(0, 3, 1, 2)
    np.testing.assert_allclose(ours, ref, rtol=1e-3, atol=1e-4)

    # Running stats after the step must match torch's updated buffers.
    sd = model.state_dict()
    np.testing.assert_allclose(
        np.asarray(new_state["encoder"][0]["bn"]["mean"]),
        sd["encoder.0.0.1.running_mean"].numpy(), rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(
        np.asarray(new_state["encoder"][0]["bn"]["var"]),
        sd["encoder.0.0.1.running_var"].numpy(), rtol=1e-4, atol=1e-5)


def test_import_checkpoint_roundtrip(tmp_path):
    """Full .pth round-trip through the reference checkpoint format."""
    import torch

    config = _small_config()
    model, params, state = _parity_setup(config)

    path = str(tmp_path / "Model_best.pth")
    torch.save({"epoch": 3, "model_state_dict": model.state_dict(),
                "loss_train": 0.5, "loss_val": 0.4}, path)

    params2, state2 = torch_import.import_checkpoint(path, config)
    for a, b in zip(jax.tree_util.tree_leaves(params), jax.tree_util.tree_leaves(params2)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    for a, b in zip(jax.tree_util.tree_leaves(state), jax.tree_util.tree_leaves(state2)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_param_count_flagship():
    """The flagship geom-stereo depth-5 UNet has the expected parameter count."""
    config = junet.flagship_config("geom-stereo")
    params, _ = junet.init_unet(jax.random.PRNGKey(0), config)

    import torch
    from tests.torch_unet import TorchUNet
    model = TorchUNet(**_torch_kwargs(config))
    torch_count = sum(p.numel() for p in model.parameters())
    assert junet.param_count(params) == torch_count


def test_fold_batchnorm_exact():
    """BN folding produces identical eval-mode outputs (exact affine fold)."""
    config = _small_config()
    model, params, state = _parity_setup(config)
    from resdepth_tpu.models.unet import fold_batchnorm

    folded_config, folded_params, folded_state = fold_batchnorm(config, params, state)
    assert folded_config.do_BN is False

    x = jnp.asarray(np.random.default_rng(3).normal(
        size=(2, 32, 32, config.n_input_channels)).astype(np.float32))
    ref, _ = junet.apply_unet(config, params, state, x, train=False)
    out, _ = junet.apply_unet(folded_config, folded_params, folded_state, x,
                              train=False)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-4, atol=1e-4)


def test_fold_batchnorm_keeps_outer_skip_bn():
    config = _small_config(outer_skip_BN=True)
    model, params, state = _parity_setup(config)
    from resdepth_tpu.models.unet import fold_batchnorm

    folded_config, folded_params, folded_state = fold_batchnorm(config, params, state)
    assert "outer_skip_bn" in folded_params

    x = jnp.asarray(np.random.default_rng(4).normal(
        size=(2, 32, 32, config.n_input_channels)).astype(np.float32))
    ref, _ = junet.apply_unet(config, params, state, x, train=False)
    out, _ = junet.apply_unet(folded_config, folded_params, folded_state, x,
                              train=False)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-4, atol=1e-4)


def test_load_reference_checkpoint_restores_metadata(tmp_path):
    """A .pth warm start restores everything the reference's _load_pretrain
    restores (lib/Trainer.py:113-143): epoch, best val loss, the optimizer's
    LR and the scheduler state — in one deserialization."""
    import torch

    config = _small_config()
    torch.manual_seed(1)
    from tests.torch_unet import TorchUNet
    model = TorchUNet(**_torch_kwargs(config))
    optimizer = torch.optim.Adam(model.parameters(), lr=2e-4, weight_decay=1e-5)
    scheduler = torch.optim.lr_scheduler.StepLR(optimizer, step_size=2, gamma=0.5)
    model.train()
    for _ in range(5):
        optimizer.zero_grad()
        model(torch.randn(2, config.n_input_channels, 32, 32)).mean().backward()
        optimizer.step()
        scheduler.step()
    # after 5 scheduler epochs with step 2/gamma 0.5: lr = 2e-4 * 0.5^2
    path = str(tmp_path / "ckpt.pth")
    torch.save({"epoch": 4, "model_state_dict": model.state_dict(),
                "optimizer_state_dict": optimizer.state_dict(),
                "scheduler_state_dict": scheduler.state_dict(),
                "loss_train": 0.4, "loss_val": 0.31}, path)

    params, bn_state, adam, meta = torch_import.load_reference_checkpoint(
        path, config)
    assert adam is not None and int(adam[2]) == 5
    assert meta["epoch"] == 4
    assert meta["loss_val"] == pytest.approx(0.31)
    assert meta["lr"] == pytest.approx(2e-4 * 0.25)

    from resdepth_tpu.train.schedulers import StepLR
    # deliberately a DIFFERENT config initial LR: the checkpoint's base_lrs
    # must win, or the first post-resume step would silently recompute from
    # the new config's LR
    ours = StepLR(1e-4, step_size=2, gamma=0.5)
    ours.load_state_dict(meta["scheduler_state"])
    assert ours.lr == pytest.approx(2e-4 * 0.25)
    assert ours.n_steps == 5
    assert ours.initial_lr == pytest.approx(2e-4)
    # the restored scheduler continues the torch trajectory
    scheduler.step()
    assert ours.step() == pytest.approx(scheduler.get_last_lr()[0])


def test_import_adam_state(tmp_path):
    """Adam moments from a reference checkpoint map onto our pytrees."""
    import torch

    config = _small_config()
    torch.manual_seed(0)
    from tests.torch_unet import TorchUNet
    model = TorchUNet(**_torch_kwargs(config))
    optimizer = torch.optim.Adam(model.parameters(), lr=1e-3, weight_decay=1e-5)
    model.train()
    for _ in range(3):
        optimizer.zero_grad()
        out = model(torch.randn(2, config.n_input_channels, 32, 32))
        out.mean().backward()
        optimizer.step()

    path = str(tmp_path / "ckpt.pth")
    torch.save({"epoch": 2, "model_state_dict": model.state_dict(),
                "optimizer_state_dict": optimizer.state_dict()}, path)

    mu, nu, count = torch_import.import_adam_state(path, config)
    assert count == 3
    # Moment layouts must mirror the weight layouts
    assert mu["encoder"][0]["conv"]["kernel"].shape == (3, 3, 3, 4)
    exp_avg = optimizer.state_dict()["state"][0]["exp_avg"].numpy()
    np.testing.assert_allclose(
        np.asarray(mu["encoder"][0]["conv"]["kernel"]),
        exp_avg.transpose(2, 3, 1, 0), rtol=1e-6)
    exp_avg_sq = optimizer.state_dict()["state"][0]["exp_avg_sq"].numpy()
    np.testing.assert_allclose(
        np.asarray(nu["encoder"][0]["conv"]["kernel"]),
        exp_avg_sq.transpose(2, 3, 1, 0), rtol=1e-6)

    # grafting into an optax opt_state
    from resdepth_tpu.train.optim import build_optimizer
    params, _ = torch_import.import_checkpoint(path, config)
    tx = build_optimizer("Adam", 1e-5)
    opt_state = torch_import.graft_adam_state(tx.init(params), mu, nu, count)
    import optax
    adam_states = [s for s in opt_state if isinstance(s, optax.ScaleByAdamState)]
    assert adam_states and int(adam_states[0].count) == 3


@pytest.mark.parametrize("overrides", [dict(), dict(up_mode="bilinear"),
                                       dict(outer_skip_BN=True)])
def test_export_checkpoint_roundtrip(tmp_path, overrides):
    """Our pytrees -> reference .pth -> torch model produces identical outputs."""
    import torch
    from tests.torch_unet import TorchUNet
    from resdepth_tpu.models.torch_import import export_checkpoint

    config = _small_config(**overrides)
    params, state = junet.init_unet(jax.random.PRNGKey(5), config)
    path = str(tmp_path / "exported.pth")
    export_checkpoint(path, params, state, config, epoch=4, loss_val=0.1)

    model = TorchUNet(**_torch_kwargs(config))
    blob = torch.load(path, weights_only=False)
    assert blob["epoch"] == 4
    model.load_state_dict(blob["model_state_dict"])
    model.eval()

    x = np.random.default_rng(8).normal(
        size=(2, config.n_input_channels, 32, 32)).astype(np.float32)
    with torch.no_grad():
        torch_out = model(torch.from_numpy(x)).numpy()
    ours, _ = junet.apply_unet(config, params, state,
                               jnp.asarray(x.transpose(0, 2, 3, 1)), train=False)
    np.testing.assert_allclose(np.asarray(ours).transpose(0, 3, 1, 2), torch_out,
                               rtol=1e-4, atol=1e-4)


def test_flagship_scale_parity_with_torch():
    """Full flagship architecture (depth 5, start 64, cap 512) at 128 px:
    the small-config parity tests don't exercise the 512-cap layers."""
    import torch

    config = junet.flagship_config("geom-stereo")
    torch.manual_seed(0)
    from tests.torch_unet import TorchUNet
    model = TorchUNet(**_torch_kwargs(config)).eval()
    sd = {k: np.array(v.detach().numpy()) for k, v in model.state_dict().items()}
    params, state = torch_import.params_from_state_dict(sd, config)

    x = np.random.default_rng(21).normal(size=(1, 3, 128, 128)).astype(np.float32)
    with torch.no_grad():
        ref = model(torch.from_numpy(x)).numpy()
    ours, _ = junet.apply_unet(config, params, state,
                               jnp.asarray(x.transpose(0, 2, 3, 1)), train=False)
    np.testing.assert_allclose(np.asarray(ours).transpose(0, 3, 1, 2), ref,
                               rtol=2e-4, atol=2e-4)


def test_mixed_precision_close_to_f32():
    """mixed mode (bf16 conv stack, f32 height path): output within mm-scale
    of full f32 for O(1) normalised inputs — the serving-mode contract."""
    config = _small_config()
    params, state = junet.init_unet(jax.random.PRNGKey(0), config)

    x = np.random.default_rng(9).normal(size=(2, 3, 32, 32)).astype(np.float32)
    x_nhwc = jnp.asarray(x.transpose(0, 2, 3, 1))
    y32, _ = junet.apply_unet(config, params, state, x_nhwc, train=False)
    ymx, _ = junet.apply_unet(config, params, state, x_nhwc, train=False,
                              mixed_precision=True)
    assert ymx.dtype == jnp.float32
    # bf16 trunk error is O(1e-2) per activation but the f32 outer skip
    # carries the absolute height; the residual deviation stays small.
    np.testing.assert_allclose(np.asarray(ymx), np.asarray(y32), atol=0.05)

    # The outer skip must be exactly the f32 input, not a bf16 round-trip:
    # at zero weights the network output is bias-only and mixed == f32.
    zero_params = jax.tree_util.tree_map(jnp.zeros_like, params)
    y0, _ = junet.apply_unet(config, zero_params, state, x_nhwc, train=False,
                             mixed_precision=True)
    np.testing.assert_allclose(np.asarray(y0[..., 0]), x[:, 0], atol=2e-6)


def test_upconv_dilated_lowering_matches_block_matmul():
    """The transposed-conv lowering (input-dilated conv of the flipped
    kernel) must equal the definitional per-pixel 2x2-block expansion:
    out[2i+di, 2j+dj, o] = sum_c x[i, j, c] * W[di, dj, c, o] + b[o]."""
    rng = jax.random.PRNGKey(42)
    k1, k2, k3 = jax.random.split(rng, 3)
    n, h, w, cin, cout = 2, 5, 7, 8, 6
    x = jax.random.normal(k1, (n, h, w, cin), jnp.float32)
    up = {"kernel": jax.random.normal(k2, (2, 2, cin, cout), jnp.float32),
          "bias": jax.random.normal(k3, (cout,), jnp.float32)}

    got = junet._upconv(x, up, "transpose")

    blocks = jnp.einsum("nhwc,dkco->nhwdko", x, up["kernel"])
    expected = (blocks.transpose(0, 1, 3, 2, 4, 5)
                .reshape(n, 2 * h, 2 * w, cout) + up["bias"])
    np.testing.assert_allclose(np.asarray(got), np.asarray(expected),
                               rtol=1e-5, atol=1e-5)


def test_upconv_custom_vjp_matches_autodiff():
    """_upconv2x2's hand-written gradients must equal autodiff of the same
    forward computation (dx/db exactly; dk up to f32 accumulation order)."""
    P = jax.lax.Precision.HIGHEST
    n, h, w, cin, cout = 3, 6, 5, 7, 4
    x = jax.random.normal(jax.random.PRNGKey(0), (n, h, w, cin), jnp.float32)
    k = jax.random.normal(jax.random.PRNGKey(1), (2, 2, cin, cout), jnp.float32)
    b = jax.random.normal(jax.random.PRNGKey(2), (cout,), jnp.float32)
    ct = jax.random.normal(jax.random.PRNGKey(3), (n, 2 * h, 2 * w, cout),
                           jnp.float32)

    y_ref, vjp_ref = jax.vjp(
        lambda x, k, b: junet._upconv2x2_fwd_impl(x, k, b, P), x, k, b)
    y_new, vjp_new = jax.vjp(
        lambda x, k, b: junet._upconv2x2(x, k, b, P), x, k, b)
    np.testing.assert_array_equal(np.asarray(y_ref), np.asarray(y_new))
    for name, a, c in zip(("dx", "dk", "db"), vjp_ref(ct), vjp_new(ct)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(c),
                                   rtol=1e-5, atol=1e-5, err_msg=name)


def _randomized_state(state, seed=7):
    rng = np.random.default_rng(seed)
    return jax.tree_util.tree_map(
        lambda v: v + np.abs(rng.normal(size=v.shape)).astype(np.float32) * 0.1,
        state)


@pytest.mark.parametrize("overrides", [
    {},
    {"bias_conv_layer": True},
    {"outer_skip": False},
    {"outer_skip_BN": True},
    {"do_BN": False, "bias_conv_layer": True},
    {"depth": 2, "n_input_channels": 1},
])
def test_fold_top_decoder_exact(overrides):
    """Composing the top upconv into the final conv is exact (reassociation
    tolerance) across the config matrix, including non-square inputs."""
    config = _small_config(**overrides)
    params, state = junet.init_unet(jax.random.PRNGKey(11), config)
    state = _randomized_state(state)
    from resdepth_tpu.models.unet import fold_serving

    fc, fp, fs = fold_serving(config, params, state)
    assert "top_composed" in fp
    assert fp["decoder"][-1] == {}

    x = jnp.asarray(np.random.default_rng(3).normal(
        size=(2, 32, 48, config.n_input_channels)).astype(np.float32))
    ref, _ = junet.apply_unet(config, params, state, x, train=False)
    out, _ = junet.apply_unet(fc, fp, fs, x, train=False)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)


def test_fold_top_decoder_bilinear_noop():
    """bilinear up_mode cannot be phase-composed: fold is a no-op."""
    config = _small_config(up_mode="bilinear")
    params, state = junet.init_unet(jax.random.PRNGKey(1), config)
    from resdepth_tpu.models.unet import fold_top_decoder

    fc, fp, fs = fold_top_decoder(config, params, state)
    assert "top_composed" not in fp
    assert "up" in fp["decoder"][-1]


def test_fold_top_decoder_idempotent():
    config = _small_config()
    params, state = junet.init_unet(jax.random.PRNGKey(1), config)
    from resdepth_tpu.models.unet import fold_serving, fold_top_decoder

    fc, fp, fs = fold_serving(config, params, state)
    fc2, fp2, fs2 = fold_top_decoder(fc, fp, fs)
    assert fp2 is fp


def test_fold_top_decoder_mixed_fidelity():
    """Folded mixed-precision serving deviates from exact f32 no more than
    the unfolded mixed path (f32 ACCUMULATION in the composed top convs plus
    the f32 bias map/outer skip; kernels are single-rounded bf16 — the
    BASELINE.md A/B showed weight-fidelity splits change nothing)."""
    config = _small_config()
    params, state = junet.init_unet(jax.random.PRNGKey(5), config)
    state = _randomized_state(state)
    from resdepth_tpu.models.unet import fold_serving

    x = jnp.asarray(np.random.default_rng(9).normal(
        size=(2, 32, 32, config.n_input_channels)).astype(np.float32))
    exact, _ = junet.apply_unet(config, params, state, x, train=False)
    mixed_ref, _ = junet.apply_unet(config, params, state, x, train=False,
                                    mixed_precision=True)
    fc, fp, fs = fold_serving(config, params, state)
    mixed_fold, _ = junet.apply_unet(fc, fp, fs, x, train=False,
                                     mixed_precision=True)
    assert mixed_fold.dtype == jnp.float32
    dev_ref = float(jnp.abs(mixed_ref - exact).max())
    dev_fold = float(jnp.abs(mixed_fold - exact).max())
    assert dev_fold <= dev_ref * 1.5 + 1e-4, (dev_fold, dev_ref)


def test_analytic_flops_flagship():
    """Pin the analytic FLOPs model (bench.py MFU denominators).

    The flagship (depth-5, start 64, cap 512, 3-channel) forward at 256 px
    is ~19.8 GF (hand-derived layer by layer; also the number VERDICT r2
    used for the MFU estimate); the composed-top serving graph drops the
    full-resolution upconv (0.537 GF) and adds the half-res 4-phase conv
    (+0.076 GF vs the plain last conv).
    """
    config = junet.flagship_config("geom-stereo")
    fwd = junet.analytic_flops(config, 256)
    folded = junet.analytic_flops(config, 256, composed_top=True)
    assert fwd == 19_797_114_880
    assert folded == 19_335_741_440
    # conv FLOPs scale ~4x with tile area (boundary-free: exact here)
    assert junet.analytic_flops(config, 512) == 4 * fwd
    # bilinear up: fold_top_decoder is a no-op (unet.py), so composed_top
    # must count the unfolded graph — the one actually served.
    bilin = dataclasses.replace(config, up_mode="bilinear")
    assert (junet.analytic_flops(bilin, 256, composed_top=True)
            == junet.analytic_flops(bilin, 256))


def test_analytic_flops_counts_real_graph():
    """Cross-check the analytic count against the conv shapes the params
    actually carry: every conv kernel's MACs at its true feature-map
    resolution must reproduce the analytic total (catches topology drift
    between init_unet/apply_unet and the formula)."""
    config = junet.UNetConfig(n_input_channels=3, start_kernel=8,
                              max_filter_depth=32, depth=3)
    params, _ = junet.init_unet(jax.random.PRNGKey(0), config)
    tile = 32
    total = 0
    res = tile
    for block in params["encoder"]:
        kh, kw, cin, cout = block["conv"]["kernel"].shape
        total += 2 * kh * kw * res * res * cin * cout
        res //= 2
    kh, kw, cin, cout = params["bottleneck"]["conv"]["kernel"].shape
    total += 2 * kh * kw * res * res * cin * cout
    for block in params["decoder"]:
        res *= 2
        kh, kw, cin, cout = block["up"]["kernel"].shape
        # transposed conv k=2 s=2: one tap per output pixel
        total += 2 * res * res * cin * cout
        if "conv" in block:
            kh, kw, cin, cout = block["conv"]["kernel"].shape
            total += 2 * kh * kw * res * res * cin * cout
    kh, kw, cin, cout = params["last"]["kernel"].shape
    total += 2 * kh * kw * tile * tile * cin * cout
    assert junet.analytic_flops(config, tile) == total
