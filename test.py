#!/usr/bin/env python
"""ResDepth-TPU inference + evaluation entry point: ``python test.py config.json``.

JSON-config contract preserved from the reference (/root/reference/test.py:
27-359): the inference config references training artifacts (weights,
model_config.json, normalization parameter files); each dataset x image-pair
combination refines the full scene once; refined DSMs and residual maps are
exported as GeoTIFFs per region; masked statistics are reported per pixel
class before/after refinement, plus cross-pair aggregate statistics.

TPU-native execution: the whole overlapping tile grid runs as one jitted
scan with on-device blending (see infer/tiled.py) — no per-tile host round
trips.
"""

from __future__ import annotations

import dataclasses
import logging
import os
import sys
from argparse import ArgumentParser

import numpy as np

from resdepth_tpu import orchestration
from resdepth_tpu.config import io as cfg_io
from resdepth_tpu.config import validate_infer
from resdepth_tpu.data import control_files
from resdepth_tpu.data.dataset import TileDataset
from resdepth_tpu.data.pipeline import device_put_dataset
from resdepth_tpu.evaluation import (CLASS_TITLES, evaluate_performance,
                                     get_statistics, print_statistics)
from resdepth_tpu.geo import raster as raster_mod
from resdepth_tpu.infer import (predict_linear_blend,
                                predict_linear_blend_scene_sharded,
                                predict_linear_blend_streaming)
from resdepth_tpu.models import torch_import
from resdepth_tpu.models.unet import init_unet, unet_config_from_settings
from resdepth_tpu.train import checkpoint as ckpt_io
from resdepth_tpu.utils import fs
from resdepth_tpu.utils.logging import add_console_logger, add_file_logger, setup_logger

RESIDUAL_THRESHOLD = None

# Scenes whose rasters exceed this many device pixels (DSM + ortho views)
# stream through row bands instead of residing in HBM whole.
MAX_DEVICE_PIXELS = 1 << 30  # 4 GiB of f32

parser = ArgumentParser(description="ResDepth-TPU: refine full DSM scenes with a "
                                    "trained model and evaluate against ground truth.")
parser.add_argument("config_file", type=str, help="JSON configuration file")


def load_weights(cfg, model_config):
    """Load weights from a native .npz checkpoint or a reference .pth file."""
    import jax
    path = cfg.model.weights
    if path.endswith(".pth"):
        return torch_import.import_checkpoint(path, model_config)
    params, bn_state = init_unet(jax.random.PRNGKey(0), model_config)
    _, params, bn_state, _ = ckpt_io.load_checkpoint(
        path, params_template=params, bn_template=bn_state)
    return params, bn_state


def main() -> None:
    args = parser.parse_args()
    cfg_file = args.config_file

    title = "Running ResDepth-TPU: Prediction"
    print("\n{}\n{}\n".format(title, "=" * len(title)))

    # Multi-process bootstrap (env-triggered) before any backend access.
    from resdepth_tpu.parallel.bootstrap import (is_chief,
                                                 maybe_initialize_distributed)
    maybe_initialize_distributed()
    # Under a multi-process launch every process runs the full inference
    # loops (the mesh collectives need all participants) and fetches the
    # identical psum'd scene canvas, but only process 0 evaluates and
    # writes artifacts — non-chief writes would be redundant races on
    # shared storage (same policy as the Trainer's checkpoint/metrics
    # gating, train/trainer.py).
    chief = is_chief()

    if not fs.file_exists(cfg_file):
        print(f"ERROR: Cannot find the configuration file: {cfg_file}")
        sys.exit(1)

    logger = setup_logger("root_logger", level=logging.INFO,
                          log_to_console=True, log_file=None)
    print(f"Validate the configuration file:\t{cfg_file}\n\n")
    eval_cfg = validate_infer.validate_and_update_cfg_file(cfg_file, logger)
    if eval_cfg.status is False:
        sys.exit(1)
    cfg = eval_cfg.cfg
    cfg_orig = cfg_io.read_json(cfg_file)
    if chief:
        add_file_logger(logger, log_file=os.path.join(cfg.output.directory,
                                                      "run.log"))

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

    # ----------------------- data allocation & inputs ---------------------- #
    logger.info("Perform data allocation...")
    orchestration.allocate_area(cfg)

    logger.info("\nData initialization\n-------------------\n")
    if cfg.model.input_channels != "geom":
        logger.info("Read image pairs...\n")
        if orchestration.read_image_pairs(cfg, logger) is False:
            sys.exit(1)

    logger.info("Read normalization parameters...")
    params_dsm = control_files.read_normalization_params_from_file(
        cfg.model.normalization_geom)
    if cfg.model.input_channels != "geom":
        params_images = control_files.read_normalization_params_from_file(
            cfg.model.normalization_image)
    else:
        params_images = {"mean": None, "std": 1.0}

    cfg_data = orchestration.prepare_dataset_configuration(cfg, "test")

    # ------------------------------- model --------------------------------- #
    logger.info("\n\nDefine model\n------------\n")
    model_config = unet_config_from_settings(cfg.model.settings)
    logger.info(f"Load model weights: {cfg.model.weights}")
    params, bn_state = load_weights(cfg, model_config)

    import jax
    import jax.numpy as jnp
    from resdepth_tpu.models.unet import SERVING_PRECISION_MODES
    _dtype_name = cfg.general.get("compute_dtype")
    if _dtype_name in SERVING_PRECISION_MODES:
        compute_dtype = _dtype_name           # string serving mode
    elif _dtype_name == "bfloat16":
        compute_dtype = jnp.bfloat16
    else:
        compute_dtype = jnp.float32
    # 128 is the measured throughput knee on the v5e (BASELINE.md: +1.7%
    # only at 256); small scenes are capped to their per-device tile share.
    batch_size = cfg.general.get("batch_size", 128)
    # None -> TileDataset's 'test' default, tile_size/2 (reference parity).
    tile_stride = cfg.general.get("tile_stride")
    use_pallas = cfg.general.get("use_pallas")  # None = auto by platform
    # Opt-in dihedral test-time augmentation (1 = off, reference parity).
    tta = int(cfg.general.get("tta", 1))
    tta_merge = cfg.general.get("tta_merge", "mean")
    # Named knob bundles from the measured round-4 TTA x stride grid
    # (BASELINE.md): 'accuracy' = stride 3*tile/4 + TTA-4 mean (full TTA-4
    # gain at 1.43x parity wall); 'throughput' = stride 3*tile/4, tta off
    # (0.61x parity wall at +0.08 cm). Explicit tile_stride/tta keys
    # override preset members (validator logs the override); 'parity'
    # (default) changes nothing.
    preset = cfg.general.get("serving_preset", "parity")
    if preset in ("accuracy", "throughput"):
        if tile_stride is None:
            tile_stride = (cfg.general.tile_size * 3) // 4
        if preset == "accuracy" and "tta" not in cfg.general:
            tta = 4
        logger.info(f"serving_preset {preset!r}: tile_stride={tile_stride}, "
                    f"tta={tta}, tta_merge={tta_merge}")
    # Tile batches shard over every available chip; each device accumulates a
    # partial scene and one psum over ICI merges them (infer/tiled.py).
    mesh = None
    if cfg.general.get("data_parallel", True) and len(jax.devices()) > 1:
        from resdepth_tpu.parallel.mesh import data_mesh
        mesh = data_mesh()
        logger.info(f"Inference mesh: {mesh.shape}")

    # ------------------------------ inference ------------------------------ #
    logger.info("\n\nInference\n---------\n")
    logger_index = -1

    for index, dataset in enumerate(cfg_data):
        orchestration.print_dataset_name_to_console(dataset, index, logger)

        area_suffix = f"_{cfg.datasets[index].area_type}_area" \
            if "area_type" in cfg.datasets[index] else ""
        name = dataset.get("name") or f"dataset_{index}"
        output_parent = os.path.join(cfg.output.directory, name)
        if chief:
            fs.make_dir(output_parent)
            cfg_io.write_json(cfg_orig,
                              os.path.join(output_parent, "config.json.orig"))
            cfg_io.write_json(cfg, os.path.join(output_parent, "config.json"))

        image_pairs = dataset.get("image_pairs") or [None]
        basename = fs.filename_wo_ext(dataset.raster_in)
        raster_in = raster_mod.open_raster(dataset.raster_in)

        residual_pool: dict[str, list] = {}
        device_rasters = None  # scene rasters upload once, reused per pair

        # 1-deep pipeline over image pairs: each pair's scene program is
        # dispatched asynchronously (as_numpy=False), and the PREVIOUS
        # pair's fetch + host-side evaluation/export run while it computes.
        # The reference loops tiles at batch 1 and evaluates synchronously
        # (test.py:136-258); here the host never idles between pairs.
        _SENTINEL = object()
        pending = None

        for image_pair in list(image_pairs) + [_SENTINEL]:
            job = None
            if image_pair is not _SENTINEL:
                if image_pair is not None:
                    kind = {1: "Image", 2: "Stereopair"}.get(len(image_pair),
                                                             "Imagepair")
                    folder = "_".join([kind] + [str(i) for i in image_pair])
                    output_directory = os.path.join(output_parent, folder)
                    if chief:
                        fs.make_dir(output_directory)
                    logger.info(f"\nInference using image pair: {tuple(image_pair)}")
                    for image_index in image_pair:
                        logger.info(f"Image {image_index}:\t"
                                    f"{fs.filename(dataset.image_list[image_index])}")
                    ds_entry = dict(dataset)
                    ds_entry["image_pairs"] = [tuple(image_pair)]
                else:
                    logger.info("Inference without image guidance.\n")
                    output_directory = output_parent
                    ds_entry = dict(dataset)

                tile_ds = TileDataset(
                    ds_entry, input_channels=cfg.model.input_channels,
                    tile_size=cfg.general.tile_size, sampling_strategy="test",
                    stride=tile_stride,
                    dsm_mean=None, dsm_std=params_dsm["std"],
                    ortho_mean=params_images["mean"],
                    ortho_std=params_images["std"])

                logger.info("Predict...")
                n_views = 0 if tile_ds.orthos is None else tile_ds.orthos.shape[2]
                scene_pixels = tile_ds.dsm_input.size * (1 + n_views)
                if scene_pixels > MAX_DEVICE_PIXELS:
                    sharded = (cfg.general.get("data_parallel", True)
                               and len(jax.devices()) > 1)
                    logger.info(
                        f"Scene of {scene_pixels / 2**20:.0f} Mpx exceeds "
                        "device budget; "
                        + (f"sharding row bands over {len(jax.devices())} "
                           "devices." if sharded else "streaming row bands."))
                    if sharded:
                        # Bands distribute across the slice: aggregate-HBM
                        # capacity, all chips concurrent (infer/tiled.py).
                        prediction = predict_linear_blend_scene_sharded(
                            model_config, params, bn_state, tile_ds,
                            max_device_pixels=MAX_DEVICE_PIXELS,
                            batch_size=batch_size, compute_dtype=compute_dtype,
                            use_pallas=use_pallas, tta=tta,
                            tta_merge=tta_merge)
                    else:
                        prediction = predict_linear_blend_streaming(
                            model_config, params, bn_state, tile_ds,
                            max_device_pixels=MAX_DEVICE_PIXELS,
                            batch_size=batch_size, compute_dtype=compute_dtype,
                            use_pallas=use_pallas, mesh=mesh, tta=tta,
                            tta_merge=tta_merge)
                else:
                    if device_rasters is None:
                        # inference never reads the ground truth: evaluation
                        # runs on the host, so don't hold the GT in HBM
                        device_rasters = device_put_dataset(
                            tile_ds, include_target=False)
                    pair_rasters = dataclasses.replace(
                        device_rasters, pairs=jnp.asarray(tile_ds.pairs_array))
                    # Pipelining keeps the PREVIOUS pair's scene canvas on
                    # device while THIS pair's canvas accumulates: both
                    # canvases are resident during the overlap, so budget two.
                    overlap = (scene_pixels + 2 * tile_ds.dsm_input.size
                               <= MAX_DEVICE_PIXELS)
                    prediction = predict_linear_blend(
                        model_config, params, bn_state, tile_ds,
                        batch_size=batch_size, compute_dtype=compute_dtype,
                        rasters=pair_rasters, use_pallas=use_pallas, mesh=mesh,
                        as_numpy=not overlap, tta=tta, tta_merge=tta_merge)
                pair_tag = (f" ({folder})" if image_pair is not None else "")
                job = (prediction, tile_ds, output_directory, pair_tag)

            if pending is None:
                pending = job
                continue
            prediction, tile_ds, output_directory, pair_tag = pending
            prediction = np.asarray(prediction)  # fetch; overlaps job's compute
            pending = job

            area_defn = dataset.area_defn
            if not chief:
                # Non-chief processes fetch (keeping the pair pipeline paced
                # identically across the cluster) but never evaluate/export.
                continue
            if dataset.get("raster_gt"):
                logger.info(f"Evaluate{pair_tag}...")
                stats_file = os.path.join(
                    output_directory,
                    f"{basename}_prediction{area_suffix}_statistics.txt")
                logger_index += 1
                logger_stats = setup_logger(f"stats_logger{logger_index}",
                                            level=logging.INFO,
                                            log_to_console=False,
                                            log_file=stats_file)
                logger_stats.info(f"Model name:\t{cfg.model.name}")
                logger_stats.info(f"Model weights:\t{cfg.model.weights}\n\n\n")
                add_console_logger(logger_stats)

                residuals = evaluate_performance(
                    prediction, raster_in, dataset.raster_gt, logger,
                    area_defn, dataset.mask_ground_truth, dataset.mask_building,
                    dataset.mask_water, dataset.mask_forest, logger_stats,
                    RESIDUAL_THRESHOLD)

                logger.info(f"\n\nSave prediction{pair_tag}...")
                num_regions = len(area_defn["x_extent"])
                for i, (x_ext, y_ext) in enumerate(zip(area_defn["x_extent"],
                                                       area_defn["y_extent"])):
                    region_tag = f"_{i}" if num_regions > 1 else ""
                    file_prediction = os.path.join(
                        output_directory,
                        f"{basename}_prediction{area_suffix}{region_tag}.tif")
                    file_residuals = os.path.join(
                        output_directory,
                        f"{basename}_residuals{area_suffix}{region_tag}.tif")

                    pred_i = prediction[y_ext[0]:y_ext[1] + 1, x_ext[0]:x_ext[1] + 1]
                    res_i = residuals.all[y_ext[0]:y_ext[1] + 1,
                                          x_ext[0]:x_ext[1] + 1]

                    for key in residuals:
                        residual_pool.setdefault(key, []).append(
                            residuals[key][y_ext[0]:y_ext[1] + 1,
                                           x_ext[0]:x_ext[1] + 1].compressed())

                    logger.info(f"Write file: {file_prediction}")
                    raster_mod.write_raster(file_prediction, pred_i, like=raster_in,
                                            offset_x=x_ext[0], offset_y=y_ext[0],
                                            nodata=-9999, dtype=np.float32)
                    logger.info(f"Write file: {file_residuals}")
                    raster_mod.write_raster(file_residuals,
                                            res_i.filled(-9999), like=raster_in,
                                            offset_x=x_ext[0], offset_y=y_ext[0],
                                            nodata=-9999, dtype=np.float32)
                logger.info(f"Write file: {stats_file}\n\n")
            else:
                logger.info(f"\n\nSave prediction{pair_tag}...")
                num_regions = len(area_defn["x_extent"])
                for i, (x_ext, y_ext) in enumerate(zip(area_defn["x_extent"],
                                                       area_defn["y_extent"])):
                    region_tag = f"_{i}" if num_regions > 1 else ""
                    file_prediction = os.path.join(
                        output_directory,
                        f"{basename}_prediction{area_suffix}{region_tag}.tif")
                    pred_i = prediction[y_ext[0]:y_ext[1] + 1,
                                        x_ext[0]:x_ext[1] + 1].copy()
                    pred_i[pred_i == tile_ds.nodata] = -9999
                    logger.info(f"Write file: {file_prediction}\n\n")
                    raster_mod.write_raster(file_prediction, pred_i, like=raster_in,
                                            offset_x=x_ext[0], offset_y=y_ext[0],
                                            nodata=-9999, dtype=np.float32)

        # --------------------- aggregate over image pairs ------------------- #
        if chief and len(image_pairs) > 1 and dataset.get("raster_gt"):
            logger.info("\nCompute residual errors averaged over all predictions...")
            outfile = os.path.join(
                output_parent,
                f"{basename}_prediction{area_suffix}_performance_statistics_"
                f"mean_over_all_stereopairs.txt")
            # Unique per dataset: the reference reuses one logger name here
            # (test.py:319), so with 2+ evaluated datasets its handlers
            # accumulate — dataset 2's aggregate lines are appended into
            # dataset 1's statistics file and console lines print N times.
            logger_overall = setup_logger(f"stats_logger_overall_{index}",
                                          level=logging.INFO,
                                          log_to_console=False, log_file=outfile)
            logger_overall.info(f"Model name:\t{cfg.model.name}")
            logger_overall.info(f"Model weights:\t{cfg.model.weights}\n\n\n")
            add_console_logger(logger_overall)
            logger_overall.info("\nPerformance Evaluation: Statistics over all "
                                "predictions\n"
                                "-------------------------------------------------------\n")
            for key in CLASS_TITLES:
                if key not in residual_pool:
                    continue
                pooled = np.ma.masked_invalid(np.concatenate(residual_pool[key]))
                stats = get_statistics(pooled, RESIDUAL_THRESHOLD)
                header = f"STATISTICS, {CLASS_TITLES[key]}: REFINED DSM"
                logger_overall.info("\n{}\n{}\n".format(header, "-" * len(header)))
                print_statistics(stats, logger_overall)

    logger.info("\nDone!")


if __name__ == "__main__":
    if len(sys.argv) < 2:
        parser.print_help()
    else:
        main()
