#!/usr/bin/env python
"""ResDepth-TPU training entry point: ``python train.py config.json``.

JSON-config contract and artifact layout preserved from the reference
(/root/reference/train.py:34-220): a timestamped run directory containing
run.log / training.log, config.json + config.json.orig, model_config.json,
DSM/Image normalization parameter files, TensorBoard events, and a
checkpoints/ directory with best/periodic/last roles.

TPU-native execution: rasters live in HBM, batch assembly + forward/backward
+ optimizer run as one jitted program, batches shard over a data-parallel
mesh (gradients and BatchNorm statistics psum over ICI).
"""

from __future__ import annotations

import logging
import os
import shutil
import sys
from argparse import ArgumentParser
from pathlib import Path

import numpy as np

from resdepth_tpu import orchestration
from resdepth_tpu.config import io as cfg_io
from resdepth_tpu.config import validate_train
from resdepth_tpu.config.defaults import default_cfg
from resdepth_tpu.data import control_files, normalization
from resdepth_tpu.data.dataset import TileDataset
from resdepth_tpu.data.pipeline import (BatchIndexIterator, batch_spec_for,
                                        device_put_dataset)
from resdepth_tpu.models import torch_import
from resdepth_tpu.models.unet import init_unet, param_count, unet_config_from_settings
from resdepth_tpu.train import checkpoint as ckpt_io
from resdepth_tpu.train.optim import build_optimizer
from resdepth_tpu.train.schedulers import build_scheduler
from resdepth_tpu.train.step import init_train_state, make_eval_step, make_train_step
from resdepth_tpu.train.trainer import Trainer
from resdepth_tpu.utils import fs
from resdepth_tpu.utils.logging import setup_logger

FREQ_AVERAGE_TRAIN_LOSS = 20  # reference constant (lib/utils.py:406)

parser = ArgumentParser(description="ResDepth-TPU: train a residual DSM "
                                    "refinement UNet from a JSON configuration.")
parser.add_argument("config_file", type=str, help="JSON configuration file")


def _choose_mesh(batch_size: int, want_parallel: bool, axis_name: str,
                 dcn_slices: int = 1):
    """Mesh over ALL available devices, plus the emitted (padded) batch size.

    Batches whose size does not divide the device count are padded to the
    next multiple with zero-weight samples (excluded from loss, gradients
    and BatchNorm statistics — data/pipeline.py::BatchIndexIterator), so the
    whole slice is always used and the optimisation trajectory is
    numerically that of the configured batch size.

    ``dcn_slices > 1`` arranges the devices as a 2-D (dcn, ici) mesh; the
    steps shard and reduce over both axes (multi-slice = this config knob).
    """
    import jax
    from resdepth_tpu.parallel.mesh import (data_mesh, data_mesh_2d,
                                            pad_to_multiple)

    n_use = len(jax.devices()) if want_parallel else 1
    emit_size = pad_to_multiple(batch_size, n_use)
    if dcn_slices > 1:
        return data_mesh_2d(dcn_slices, n_use, axis_name), emit_size
    return data_mesh(n_use, axis_name), emit_size


def _build_datasets(cfg_data, cfg, strategy, dsm_std, images_mean, images_std,
                    seed, use_all_stereo_pairs, permute, augment):
    datasets = []
    for i, entry in enumerate(cfg_data):
        datasets.append(TileDataset(
            entry,
            input_channels=cfg.model.input_channels,
            tile_size=cfg.training_settings.tile_size,
            sampling_strategy=strategy,
            dsm_mean=None,
            dsm_std=dsm_std,
            ortho_mean=images_mean,
            ortho_std=images_std,
            use_all_stereo_pairs=use_all_stereo_pairs,
            permute_images_within_pair=permute,
            augment=augment,
            seed=seed + i,
        ))
    return datasets


def _warm_start_artifacts(pretrained_path, output_dir, checkpoint_dir,
                          tboard_log_dir, logger):
    """Copy prior-run artifacts into the new run dir (lib/utils.py:415-436)."""
    experiment_dir = Path(pretrained_path).parent.parent
    # Events live under <run_dir>/logs/<run_name> with the default layout, or
    # under the user-supplied tboard root beside the runs directory.
    for prior_tboard in (experiment_dir / "logs" / experiment_dir.name,
                         experiment_dir.parent / "logs" / experiment_dir.name):
        if prior_tboard.is_dir():
            for tb_file in prior_tboard.glob("events.*"):
                shutil.copy(tb_file, Path(tboard_log_dir) / tb_file.name)
            break
    prior_log = experiment_dir / "training.log"
    if prior_log.exists():
        shutil.copy(prior_log, os.path.join(output_dir, "training.log"))
    for name in ("Model_best.npz", "Model_best.pth"):
        prior_best = Path(pretrained_path).parent / name
        if prior_best.exists():
            shutil.copy(prior_best, Path(checkpoint_dir) / name)
            break


def main() -> None:
    args = parser.parse_args()
    cfg_file = args.config_file

    title = "Running ResDepth-TPU: Training"
    print("\n{}\n{}\n".format(title, "=" * len(title)))

    # Multi-process bootstrap (env-triggered form) must run before the
    # first backend access; the config-triggered form re-checks after the
    # merge below (idempotent).
    from resdepth_tpu.parallel.bootstrap import maybe_initialize_distributed
    maybe_initialize_distributed()

    if not fs.file_exists(cfg_file):
        print(f"ERROR: Cannot find the configuration file: {cfg_file}")
        sys.exit(1)
    cfg_user = cfg_io.read_json(cfg_file)
    if not cfg_user:
        sys.exit(1)

    output_directory = orchestration.create_output_directory(cfg_user)
    log_file = os.path.join(output_directory, "run.log") if output_directory else None
    logger = setup_logger("root_logger", level=logging.INFO,
                          log_to_console=True, log_file=log_file)

    logger.info(f"Validate the configuration file:\t{cfg_file}\n\n")
    if validate_train.validate_cfg_file(cfg_user, logger) is False:
        sys.exit(1)
    validate_train.augment_dataset_args(cfg_user)

    cfg = cfg_io.merge(default_cfg(), cfg_user)
    cfg_io.remove_obsolete_keys(cfg)
    cfg.output.output_directory = output_directory
    tboard_root = cfg.output.get("tboard_log_dir",
                                 os.path.join(output_directory, "logs"))
    cfg.output.tboard_log_dir = os.path.join(tboard_root,
                                             os.path.basename(output_directory))

    logger.info("\n\nSettings\n--------\n")
    cfg_io.print_json(cfg, logger=logger)

    seed = cfg.general.random_seed if cfg.general.random_seed is not None else 0
    np.random.seed(seed)

    maybe_initialize_distributed(cfg.get("tpu"), logger)

    from resdepth_tpu.utils.backend_probe import BackendUnavailable, probe_backend
    try:
        probe_backend(logger=logger)
    except BackendUnavailable as exc:
        logger.error(str(exc))
        sys.exit(1)

    from resdepth_tpu.utils import compilation_cache
    cache_dir = compilation_cache.enable()
    if cache_dir:
        logger.info(f"XLA compilation cache: {cache_dir}")

    # --------------------- data allocation & pair lists --------------------- #
    logger.info("\n\n\nData initialization\n-------------------\n")
    if cfg.model.input_channels != "geom":
        logger.info("Read image pairs...\n")
        if orchestration.read_image_pairs(cfg, logger) is False:
            sys.exit(1)
    logger.info("Perform data allocation...\n")
    orchestration.allocate_area(cfg)

    cfg_traindata = orchestration.prepare_dataset_configuration(cfg, "train")
    cfg_valdata = orchestration.prepare_dataset_configuration(cfg, "val")

    # --------------------------- normalization ---------------------------- #
    logger.info("\n\nData normalization\n-------------------\n")
    logger.info("Compute standard deviation over all centered DSM training patches...\n")
    # The sigma pass reads only the DSM band — build geom-mode datasets so the
    # ortho stacks are not decoded and held in RAM twice.
    norm_entries = [
        {k: entry[k] for k in ("name", "raster_gt", "raster_in", "area_defn",
                               "n_samples") if k in entry}
        for entry in cfg_traindata]
    norm_cfg = cfg.copy()
    norm_cfg.model.input_channels = "geom"
    norm_datasets = _build_datasets(norm_entries, norm_cfg, "train", 1.0, None,
                                    None, seed, False, False, False)
    all_stds = np.concatenate([
        normalization.patch_stds_from_positions(
            ds.dsm_input, ds.nodata, ds.positions, ds.tile_size)
        for ds in norm_datasets])
    dsm_std = normalization.robust_mean_std(all_stds)
    logger.info("Standard deviation:\t{:.3f} m\n".format(dsm_std))
    del norm_datasets

    if cfg.model.input_channels != "geom":
        logger.info("\nCompute satellite image normalization parameters...\n")
        images_mean, images_std = normalization.compute_satellite_image_normalization(
            cfg_traindata)
        logger.info("Mean:\t\t\t{:.3f}".format(images_mean))
        logger.info("Standard deviation:\t{:.3f}\n".format(images_std))
    else:
        images_mean, images_std = None, None

    # ------------------------------ datasets ------------------------------- #
    logger.info("\nInitialize data pipelines...\n")
    train_datasets = _build_datasets(
        cfg_traindata, cfg, "train", dsm_std, images_mean, images_std, seed,
        cfg.stereopair_settings.use_all_stereo_pairs,
        cfg.stereopair_settings.permute_images_within_pair,
        cfg.training_settings.augment)
    val_datasets = _build_datasets(
        cfg_valdata, cfg, "val", dsm_std, images_mean, images_std, seed,
        True, False, False)

    # ----------------------- run artifacts / control files ----------------- #
    logger.info("\nPrepare output folders and files\n--------------------------------\n")
    cfg.output.checkpoint_dir = os.path.join(output_directory, "checkpoints")
    fs.make_dir(cfg.output.checkpoint_dir)
    fs.make_dir(cfg.output.tboard_log_dir)
    logger.info(f"\nModel weights will be stored in:\n{cfg.output.checkpoint_dir}\n")

    cfg.output.dsm_normalization = os.path.join(
        output_directory, "DSM_normalization_parameters.p")
    control_files.write_normalization_params_to_file(
        cfg.output.dsm_normalization, None, dsm_std)
    logger.info(f"Writing DSM normalization parameters to file:\n"
                f"{cfg.output.dsm_normalization}\n")

    if cfg.model.input_channels != "geom":
        cfg.output.satellite_image_normalization = os.path.join(
            output_directory, "Image_normalization_parameters.p")
        control_files.write_normalization_params_to_file(
            cfg.output.satellite_image_normalization, images_mean, images_std)
        logger.info(f"Writing satellite image normalization parameters to file:\n"
                    f"{cfg.output.satellite_image_normalization}\n")

    cfg_io.write_json(cfg, os.path.join(output_directory, "config.json"))
    cfg_io.write_json(cfg_user, os.path.join(output_directory, "config.json.orig"))

    # -------------------------------- model -------------------------------- #
    logger.info("\nPrepare training\n----------------\n")
    import jax

    args_model = orchestration.collect_model_args(cfg)
    cfg_io.write_json(args_model, os.path.join(output_directory, "model_config.json"))
    model_config = unet_config_from_settings(args_model.settings)

    params, bn_state = init_unet(jax.random.PRNGKey(seed), model_config)
    logger.info(f"UNet parameters: {param_count(params):,}")

    if cfg.output.get("plot_model_txt"):
        from resdepth_tpu.models.unet import describe_unet
        path = os.path.join(output_directory, "model_parameters.txt")
        with open(path, "w") as f:
            f.write(describe_unet(model_config, params,
                                  cfg.training_settings.tile_size) + "\n\n")
            f.write(f"UNetConfig: {model_config}\n")
        logger.info(f"Writing model architecture to file: {path}\n")

    tx = build_optimizer(cfg.optimizer.name, cfg.optimizer.weight_decay)
    scheduler = build_scheduler(cfg.scheduler, cfg.optimizer.learning_rate)
    # Opt-in weight EMA (training_settings.ema_decay, 0/absent = off):
    # validation/checkpoints/serving consume the EMA model; the raw iterate
    # keeps training dynamics untouched (train/step.py).
    ema_decay = float(cfg.training_settings.get("ema_decay", 0) or 0)
    if ema_decay:
        logger.info(f"Weight EMA enabled: decay {ema_decay}")
    state = init_train_state(params, bn_state, tx, cfg.optimizer.learning_rate,
                             ema=ema_decay > 0)

    # ------------------------------ warm start ----------------------------- #
    pretrained_path = cfg.model.get("pretrained_path")
    if not pretrained_path and cfg.general.get("auto_resume"):
        # Failure-recovery: resume from the newest prior run's last checkpoint
        # under the same output root (idiomatic replacement for the
        # reference's manual warm-start-only story — SURVEY.md §5).
        import glob
        candidates = sorted(
            glob.glob(os.path.join(cfg_user.output.output_directory,
                                   "*", "checkpoints", "Model_last.npz")),
            key=os.path.getmtime)
        if candidates:
            pretrained_path = candidates[-1]
            logger.info(f"auto_resume: continuing from {pretrained_path}")
    resume_meta = None
    if pretrained_path:
        if pretrained_path.endswith(".pth"):
            logger.info(f"Importing reference checkpoint: {pretrained_path}")
            params, bn_state, adam, resume_meta = \
                torch_import.load_reference_checkpoint(
                    pretrained_path, model_config,
                    want_adam=cfg.optimizer.name == "Adam")
            state = init_train_state(params, bn_state, tx,
                                     cfg.optimizer.learning_rate,
                                     ema=ema_decay > 0)
            if adam is not None:
                mu, nu, count = adam
                state = state.replace(opt_state=torch_import.graft_adam_state(
                    state.opt_state, mu, nu, count))
                logger.info("Restored Adam optimizer moments from the "
                            "reference checkpoint.")
        else:
            logger.info(f"Restoring checkpoint: {pretrained_path}")
            resume_meta, params, bn_state, opt_state, raw_params = \
                ckpt_io.load_checkpoint(
                    pretrained_path, params_template=state.params,
                    bn_template=state.bn_state, opt_template=state.opt_state,
                    raw_template=state.params)
            # EMA checkpoints store the served (EMA) weights as 'params'
            # and the true optimizer iterate as 'raw_params'; training
            # continues from the iterate in either case, and an enabled
            # EMA re-seeds from the served weights.
            iterate = raw_params if raw_params is not None else params
            # Copy the EMA seed: when the checkpoint has no raw_params the
            # iterate aliases 'params', and the donated train state must
            # not carry the same buffer twice.
            state = state.replace(
                params=iterate, bn_state=bn_state, opt_state=opt_state,
                ema_params=(jax.tree_util.tree_map(np.copy, params)
                            if ema_decay else None))
        _warm_start_artifacts(pretrained_path, output_directory,
                              cfg.output.checkpoint_dir,
                              cfg.output.tboard_log_dir, logger)

    # -------------------------------- steps -------------------------------- #
    batch_size = cfg.training_settings.batch_size
    mesh, emit_size = _choose_mesh(batch_size, cfg.tpu.data_parallel,
                                   cfg.tpu.mesh_axis,
                                   cfg.tpu.get("dcn_slices", 1))
    logger.info(f"Data-parallel mesh: {mesh.shape}"
                + (f" (batch {batch_size} zero-weight-padded to {emit_size})"
                   if emit_size != batch_size else ""))

    import jax.numpy as jnp
    compute_dtype = jnp.bfloat16 if cfg.tpu.compute_dtype == "bfloat16" else jnp.float32

    train_spec = batch_spec_for(train_datasets[0])
    val_spec = batch_spec_for(val_datasets[0])
    import jax as _jax
    # 'high' keeps the dtype-adaptive policy (models/unet.py::_precision:
    # 3-pass HIGH for f32, native single-pass for bf16 compute) rather than
    # forcing HIGH onto bf16 inputs, which would trigger a slow multi-pass
    # upcast. 'balanced'/'balanced16' are the training analogues of the
    # serving modes of the same names (BASELINE.md per-layer attribution):
    # 1-pass bf16 MXU trunk with full-fidelity first + last convs;
    # 'balanced16' additionally keeps trunk ACTIVATIONS in bf16
    # (mixed_precision), so it needs the f32 batch input and is rejected
    # alongside compute_dtype 'bfloat16' at validation.
    train_precision = cfg.tpu.get("train_precision", "high")
    if train_precision in ("balanced", "balanced16"):
        # Reuse the serving registry entry of the same name — the training
        # mode IS that recipe applied to the forward/backward pass.
        from resdepth_tpu.models.unet import serving_precision
        precision_kwargs = serving_precision(train_precision).apply_kwargs()
    else:
        precision_kwargs = {
            "high": dict(precision=None),
            "default": dict(precision=_jax.lax.Precision.DEFAULT),
            "highest": dict(precision=_jax.lax.Precision.HIGHEST),
        }[train_precision]
    # ---------------------- device raster residency ------------------------ #
    # The resident pipeline replicates each region's FULL rasters into every
    # device's HBM. tpu.max_device_pixels bounds that residency: regions over
    # the budget train via banded residency (data/banded.py — host-RAM
    # rasters, one band window resident at a time), matching the reference's
    # host-RAM capability (lib/DsmOrthoDataset.py:293-314) on HBM-sized
    # budgets. docs/SCALING.md has the sizing guidance.
    from resdepth_tpu.data import banded
    max_device_pixels = int(cfg.tpu.get("max_device_pixels", 0) or 0)
    resident_px = sum(banded.resident_pixels(ds)
                      for ds in train_datasets + val_datasets)
    logger.info(f"Device-resident raster estimate: {resident_px:,} px "
                f"({resident_px * 4 / 2**30:.2f} GiB f32) per device")
    if max_device_pixels:
        logger.info(f"tpu.max_device_pixels: {max_device_pixels:,} "
                    f"({max_device_pixels * 4 / 2**30:.2f} GiB f32) — regions "
                    "over the budget use banded residency")
    else:
        try:
            stats = jax.local_devices()[0].memory_stats() or {}
            hbm = stats.get("bytes_limit", 0)
        except Exception:
            hbm = 0
        if hbm and resident_px * 4 > hbm // 2:
            logger.warning(
                f"Resident rasters ({resident_px * 4 / 2**30:.2f} GiB) exceed "
                f"half of device memory ({hbm / 2**30:.2f} GiB); set "
                "tpu.max_device_pixels to train with banded residency "
                "(docs/SCALING.md) if the run OOMs.")
    banded_train = [max_device_pixels and
                    banded.resident_pixels(ds) > max_device_pixels
                    for ds in train_datasets]
    banded_val = [max_device_pixels and
                  banded.resident_pixels(ds) > max_device_pixels
                  for ds in val_datasets]

    # Weighted BN statistics are only needed when zero-weight padding can
    # occur; with full batches the unweighted path is numerically identical
    # and skips the weighted-moment passes (train/step.py). Band tails are
    # zero-weight-padded too, so banding always takes the weighted path.
    weighted_bn = (emit_size != batch_size or
                   any(len(ds) % batch_size != 0 for ds in train_datasets) or
                   any(banded_train))
    remat = cfg.tpu.get("remat", False)
    train_step = make_train_step(model_config, train_spec, tx, mesh=mesh,
                                 compute_dtype=compute_dtype,
                                 donate=cfg.tpu.donate_state,
                                 weighted_bn=weighted_bn, remat=remat,
                                 ema_decay=ema_decay, **precision_kwargs)
    steps_per_call = cfg.tpu.get("steps_per_call", 1)
    train_step_multi = None
    if steps_per_call > 1:
        train_step_multi = make_train_step(
            model_config, train_spec, tx, mesh=mesh,
            compute_dtype=compute_dtype,
            donate=cfg.tpu.donate_state, steps_per_call=steps_per_call,
            weighted_bn=weighted_bn, remat=remat, ema_decay=ema_decay,
            **precision_kwargs)
    # Validation always runs the f32 parity policy (dtype-adaptive HIGH),
    # independent of train_precision: val MAE stays comparable across
    # training modes and best-checkpoint selection is precision-stable.
    # (Serving-precision deviation is studied separately — BASELINE.md.)
    eval_step = make_eval_step(model_config, val_spec, mesh=mesh,
                               compute_dtype=compute_dtype)

    def _make_loaders(datasets, banding, shuffle, seed_base, label):
        loaders = []
        for i, ds in enumerate(datasets):
            if banding[i]:
                try:
                    sub = banded.make_banded_loaders(
                        ds, batch_size,
                        max_device_pixels=max_device_pixels,
                        seed=seed_base + i, emit_size=emit_size,
                        shuffle=shuffle)
                except ValueError as exc:
                    logger.error(f"{label} region {i}: {exc}\n")
                    sys.exit(1)
                logger.info(
                    f"{label} region {i}: {banded.resident_pixels(ds):,} px "
                    f"> budget — banded residency, {len(sub)} bands")
                loaders.extend(sub)
            else:
                loaders.append((device_put_dataset(ds),
                                BatchIndexIterator(ds, batch_size,
                                                   shuffle=shuffle,
                                                   seed=seed_base + i,
                                                   emit_size=emit_size)))
        return loaders

    train_loaders = _make_loaders(train_datasets, banded_train, True,
                                  seed + 1000, "train")
    val_loaders = _make_loaders(val_datasets, banded_val, False, 0, "val")

    hparams = {
        "batch_size": batch_size,
        "lr_initial": cfg.optimizer.learning_rate,
        "optimizer": cfg.optimizer.name,
        "scheduler": cfg.scheduler.name if cfg.scheduler.enabled else "None",
        "patience": cfg.scheduler.settings.get("patience", -1),
        "step_size": cfg.scheduler.settings.get("step_size", -1),
    }

    trainer = Trainer(
        state=state, train_step=train_step, eval_step=eval_step,
        train_step_multi=train_step_multi, steps_per_call=steps_per_call,
        train_loaders=train_loaders, val_loaders=val_loaders,
        scheduler=scheduler, n_epochs=cfg.training_settings.n_epochs,
        evaluate_rate=cfg.general.evaluate_rate,
        save_model_rate=cfg.general.save_model_rate,
        freq_average_train_loss=FREQ_AVERAGE_TRAIN_LOSS,
        checkpoint_dir=cfg.output.checkpoint_dir,
        log_file=os.path.join(output_directory, "training.log"),
        tboard_log_dir=cfg.output.tboard_log_dir,
        metrics_jsonl=os.path.join(output_directory, "metrics.jsonl"),
        hparams=hparams, rng_seed=seed,
        profile_dir=cfg.tpu.profile_dir or None,
        # Band windows must be visited contiguously (one swap per band per
        # epoch); a no-op regrouping for fully-resident loader sets.
        group_chunks_by_loader=any(banded_train))

    if resume_meta is not None:
        trainer.resume_from(resume_meta)
    else:
        trainer.logger.info("\nStart training from scratch.\n")

    trainer.train()


if __name__ == "__main__":
    if len(sys.argv) < 2:
        parser.print_help()
    else:
        main()
