"""Import reference PyTorch checkpoints into the JAX UNet pytree.

The reference stores checkpoints as ``torch.save({'epoch', 'model_state_dict',
'optimizer_state_dict', ...})`` (/root/reference/lib/Trainer.py:145-157) and
inference loads ``['model_state_dict']`` only (test.py:95). This module maps
that state_dict onto ``resdepth_tpu.models.unet`` parameter/state pytrees so
reference-trained weights run unchanged on TPU (weight-parity path used by the
golden tests and BASELINE.md's <=1 cm MAE budget).

Layout conversions (torch -> NHWC/HWIO):
  * Conv2d weight (O, I, kH, kW)        -> kernel (kH, kW, I, O)
  * ConvTranspose2d weight (I, O, 2, 2) -> kernel (2, 2, I, O)
  * BatchNorm2d weight/bias             -> bn scale/bias
  * BatchNorm2d running_mean/var        -> bn state mean/var
"""

from __future__ import annotations

import numpy as np

from resdepth_tpu.models.unet import UNetConfig


def _load_blob(path: str):
    import torch

    return torch.load(path, map_location="cpu", weights_only=False)


def _state_dict_arrays(blob) -> dict:
    state_dict = blob.get("model_state_dict", blob) if isinstance(blob, dict) else blob
    # Copy: torch buffers (BN running stats) mutate in place, and jax's CPU
    # backend can zero-copy numpy views — the import must snapshot.
    return {k: np.array(v.detach().cpu().numpy()) for k, v in state_dict.items()
            if hasattr(v, "detach")}


def load_state_dict(path: str) -> dict:
    """Load a .pth checkpoint's model state_dict as numpy arrays."""
    return _state_dict_arrays(_load_blob(path))


def _conv_from(sd, prefix, use_bias):
    layer = {"kernel": sd[f"{prefix}.weight"].transpose(2, 3, 1, 0)}
    if use_bias:
        layer["bias"] = sd[f"{prefix}.bias"]
    return layer


def _bn_from(sd, prefix):
    params = {"scale": sd[f"{prefix}.weight"], "bias": sd[f"{prefix}.bias"]}
    state = {"mean": sd[f"{prefix}.running_mean"], "var": sd[f"{prefix}.running_var"]}
    return params, state


def _up_from(sd, prefix, up_mode):
    if up_mode == "transpose":
        return {"kernel": sd[f"{prefix}.weight"].transpose(2, 3, 0, 1),
                "bias": sd[f"{prefix}.bias"]}
    # bilinear: Sequential(Upsample, conv1x1) -> conv at sub-index 1
    return _conv_from(sd, f"{prefix}.1", True)


def params_from_state_dict(state_dict: dict, config: UNetConfig):
    """Convert a reference UNet state_dict into (params, state) pytrees."""
    sd = state_dict
    use_bias = not config.do_BN
    act_index = 2 if config.do_BN else 1

    params: dict = {"encoder": [], "decoder": []}
    state: dict = {"encoder": [], "decoder": []}

    def conv_block(prefix, act_fn):
        block = {"conv": _conv_from(sd, f"{prefix}.0", use_bias)}
        block_state = {}
        if config.do_BN:
            block["bn"], block_state["bn"] = _bn_from(sd, f"{prefix}.1")
        if act_fn == "prelu":
            block["act"] = {"alpha": sd[f"{prefix}.{act_index}.weight"]}
        return block, block_state

    for i in range(config.depth):
        # encoder.{i} = Sequential(conv_block, maxpool); conv_block at .0
        block, block_state = conv_block(f"encoder.{i}.0", config.act_fn_encoder)
        params["encoder"].append(block)
        state["encoder"].append(block_state)

    params["bottleneck"], state["bottleneck"] = conv_block(
        "bottleneck", config.act_fn_bottleneck)

    for i in range(config.depth - 1):
        # decoder.{i} = Sequential(upconv, Sequential(conv, bn, act))
        block, block_state = conv_block(f"decoder.{i}.1", config.act_fn_decoder)
        block["up"] = _up_from(sd, f"decoder.{i}.0", config.up_mode)
        params["decoder"].append(block)
        state["decoder"].append(block_state)

    # Deepest decoder level: bare upconv module (lib/UNet.py:181)
    last_up_prefix = f"decoder.{config.depth - 1}"
    params["decoder"].append({"up": _up_from(sd, last_up_prefix, config.up_mode)})
    state["decoder"].append({})

    params["last"] = _conv_from(sd, "last_layer", config.bias_conv_layer)

    if config.outer_skip and config.outer_skip_BN:
        params["outer_skip_bn"], bn_state = _bn_from(sd, "layer_outer_skip.0")
        state["outer_skip_bn"] = {"bn": bn_state}

    import jax.numpy as jnp
    import jax

    to_jnp = lambda leaf: jnp.asarray(leaf, jnp.float32)
    return jax.tree_util.tree_map(to_jnp, params), jax.tree_util.tree_map(to_jnp, state)


def import_checkpoint(path: str, config: UNetConfig):
    """Load a reference .pth checkpoint into (params, state) pytrees."""
    return params_from_state_dict(load_state_dict(path), config)


_BUFFER_SUFFIXES = ("running_mean", "running_var", "num_batches_tracked")


def state_dict_from_params(params, state, config: UNetConfig) -> dict:
    """Convert (params, state) pytrees into a reference-layout state_dict.

    Inverse of ``params_from_state_dict`` — lets models trained on TPU be
    loaded by the reference PyTorch implementation (export interop).
    """
    sd: dict = {}

    def put_conv(prefix, layer):
        sd[f"{prefix}.weight"] = np.asarray(layer["kernel"]).transpose(3, 2, 0, 1)
        if "bias" in layer:
            sd[f"{prefix}.bias"] = np.asarray(layer["bias"])

    def put_bn(prefix, bn_params, bn_state):
        sd[f"{prefix}.weight"] = np.asarray(bn_params["scale"])
        sd[f"{prefix}.bias"] = np.asarray(bn_params["bias"])
        sd[f"{prefix}.running_mean"] = np.asarray(bn_state["mean"])
        sd[f"{prefix}.running_var"] = np.asarray(bn_state["var"])
        sd[f"{prefix}.num_batches_tracked"] = np.asarray(0, np.int64)

    def put_up(prefix, layer):
        if config.up_mode == "transpose":
            sd[f"{prefix}.weight"] = np.asarray(layer["kernel"]).transpose(2, 3, 0, 1)
            sd[f"{prefix}.bias"] = np.asarray(layer["bias"])
        else:
            put_conv(f"{prefix}.1", layer)

    act_index = 2 if config.do_BN else 1

    def put_block(prefix, block, block_state, act_fn):
        put_conv(f"{prefix}.0", block["conv"])
        if config.do_BN:
            put_bn(f"{prefix}.1", block["bn"], block_state["bn"])
        if act_fn == "prelu":
            sd[f"{prefix}.{act_index}.weight"] = np.asarray(block["act"]["alpha"])

    for i, (block, block_state) in enumerate(zip(params["encoder"],
                                                 state["encoder"])):
        put_block(f"encoder.{i}.0", block, block_state, config.act_fn_encoder)
    put_block("bottleneck", params["bottleneck"], state["bottleneck"],
              config.act_fn_bottleneck)
    for i in range(config.depth - 1):
        put_up(f"decoder.{i}.0", params["decoder"][i]["up"])
        put_block(f"decoder.{i}.1", params["decoder"][i],
                  state["decoder"][i], config.act_fn_decoder)
    put_up(f"decoder.{config.depth - 1}", params["decoder"][-1]["up"])
    put_conv("last_layer", params["last"])
    if config.outer_skip and config.outer_skip_BN:
        put_bn("layer_outer_skip.0", params["outer_skip_bn"],
               state["outer_skip_bn"]["bn"])
    return sd


def export_checkpoint(path: str, params, state, config: UNetConfig, *,
                      epoch: int = 0, loss_train=None, loss_val=None) -> None:
    """Write a reference-compatible .pth checkpoint (lib/Trainer.py:145-157
    payload shape, minus optimizer state)."""
    import torch

    sd = {k: torch.from_numpy(np.ascontiguousarray(v)) if np.ndim(v) else
          torch.tensor(v) for k, v in state_dict_from_params(params, state,
                                                             config).items()}
    torch.save({"epoch": epoch, "model_state_dict": sd,
                "loss_train": loss_train, "loss_val": loss_val}, path)


def import_adam_state(path: str, config: UNetConfig):
    """Import a reference checkpoint's Adam optimizer state.

    The reference restores the optimizer on warm start
    (lib/Trainer.py:113-126). Torch keys Adam state by parameter POSITION
    (registration order == state_dict order minus buffers); this maps each
    position back to its name and reuses the weight-layout conversion by
    substituting moments into a shadow state_dict.

    Returns ``(mu, nu, count)`` — first/second-moment pytrees with the params
    structure and the shared step count — or None when the checkpoint has no
    optimizer state.
    """
    return _adam_from_blob(_load_blob(path), config)


def _adam_from_blob(blob, config: UNetConfig):
    import torch

    if not isinstance(blob, dict) or "optimizer_state_dict" not in blob:
        return None
    sd = blob["model_state_dict"]
    opt = blob["optimizer_state_dict"]

    param_names = [k for k in sd if not k.endswith(_BUFFER_SUFFIXES)]
    mu_sd, nu_sd = dict(sd), dict(sd)
    count = 0
    for index, name in enumerate(param_names):
        entry = opt["state"].get(index)
        if entry is None:  # param never updated (possible with zero grads)
            mu_sd[name] = torch.zeros_like(sd[name])
            nu_sd[name] = torch.zeros_like(sd[name])
            continue
        mu_sd[name] = entry["exp_avg"]
        nu_sd[name] = entry["exp_avg_sq"]
        count = max(count, int(entry["step"]))

    def numpyify(d):
        return {k: np.array(v.detach().cpu().numpy()) for k, v in d.items()
                if hasattr(v, "detach")}

    mu, _ = params_from_state_dict(numpyify(mu_sd), config)
    nu, _ = params_from_state_dict(numpyify(nu_sd), config)
    return mu, nu, count


def graft_adam_state(opt_state, mu, nu, count):
    """Replace the ScaleByAdamState inside an optax opt_state tuple."""
    import jax.numpy as jnp
    import optax

    new_adam = optax.ScaleByAdamState(
        count=jnp.asarray(count, jnp.int32), mu=mu, nu=nu)

    def replace(entry):
        return new_adam if isinstance(entry, optax.ScaleByAdamState) else entry

    if isinstance(opt_state, tuple):
        return tuple(replace(s) for s in opt_state)
    return replace(opt_state)


def load_epoch(path: str) -> int:
    """Epoch recorded in a reference checkpoint (-1 for bare state_dicts)."""
    blob = _load_blob(path)
    if isinstance(blob, dict) and "epoch" in blob:
        return int(blob["epoch"])
    return -1


def scheduler_state_from_torch(sched_sd: dict, lr: float | None = None) -> dict:
    """Translate a torch LR-scheduler state_dict into our scheduler state.

    Covers the reference's three schedulers (lib/utils.py:344-377): StepLR /
    ExponentialLR carry ``last_epoch`` + ``_last_lr``; ReduceLROnPlateau
    carries best/num_bad_epochs/cooldown bookkeeping and stores NO lr of its
    own (torch keeps it in the optimizer's param_groups — pass it as ``lr``).
    Only keys present in the source appear in the result, so it loads into
    whichever of our schedulers the config built.
    """
    out: dict = {}
    if "last_epoch" in sched_sd:
        out["n_steps"] = int(sched_sd["last_epoch"])
    if sched_sd.get("_last_lr"):
        out["lr"] = float(sched_sd["_last_lr"][0])
    if sched_sd.get("base_lrs"):
        # StepLR/ExponentialLR recompute lr from the BASE LR on every step;
        # without it the restored lr would survive only until the first
        # post-resume step, which would silently recompute from the new
        # config's initial LR instead of the checkpoint's.
        out["initial_lr"] = float(sched_sd["base_lrs"][0])
    for src, dst in (("step_size", "step_size"), ("gamma", "gamma"),
                     ("factor", "factor"), ("patience", "patience"),
                     ("threshold", "threshold"),
                     ("threshold_mode", "threshold_mode"),
                     ("cooldown", "cooldown"),
                     ("cooldown_counter", "cooldown_counter"),
                     ("best", "best"), ("num_bad_epochs", "num_bad"),
                     ("eps", "eps")):
        if src in sched_sd:
            out[dst] = sched_sd[src]
    if sched_sd.get("min_lrs"):
        out["min_lr"] = float(sched_sd["min_lrs"][0])
    if "lr" not in out and lr is not None:
        out["lr"] = float(lr)
    return out


def load_reference_checkpoint(path: str, config: UNetConfig,
                              want_adam: bool = True):
    """One-pass import of a reference .pth: weights, Adam moments, metadata.

    Deserializes the checkpoint ONCE (a reference checkpoint carries weights
    + both Adam moments — hundreds of MB for the flagship) and returns
    ``(params, bn_state, adam, meta)`` where ``adam`` is the
    :func:`import_adam_state` triple or None, and ``meta`` mirrors our native
    checkpoint metadata: epoch, loss_val, lr (from the optimizer's
    param_groups) and a translated ``scheduler_state``. The reference
    restores all of these on warm start (lib/Trainer.py:113-143).
    """
    blob = _load_blob(path)
    params, bn_state = params_from_state_dict(_state_dict_arrays(blob), config)
    adam = _adam_from_blob(blob, config) if want_adam else None

    meta = {"epoch": -1, "loss_val": None, "lr": None, "scheduler_state": None}
    if isinstance(blob, dict):
        if "epoch" in blob:
            meta["epoch"] = int(blob["epoch"])
        if blob.get("loss_val") is not None:
            meta["loss_val"] = float(blob["loss_val"])
        groups = blob.get("optimizer_state_dict", {}).get("param_groups") \
            if isinstance(blob.get("optimizer_state_dict"), dict) else None
        if groups and groups[0].get("lr") is not None:
            meta["lr"] = float(groups[0]["lr"])
        if isinstance(blob.get("scheduler_state_dict"), dict):
            meta["scheduler_state"] = scheduler_state_from_torch(
                blob["scheduler_state_dict"], lr=meta["lr"])
    return params, bn_state, adam, meta
