"""ResDepth-TPU: a TPU-native framework for deep residual DSM refinement.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of
prs-eth/ResDepth (ISPRS 2022): a UNet that regresses per-pixel height
corrections to stereo-derived digital surface models (DSMs), optionally
guided by ortho-rectified satellite views, plus the full surrounding
framework — JSON-config training/inference CLIs, GeoTIFF data layer,
geographic data allocation, tiled full-scene inference with linear
blending, and a masked geospatial evaluation suite.

Package map (each module cites the reference behaviour it re-implements):
  config/      JSON config schema, defaults, recursive merge, validators
  geo/         GeoTIFF codec (first-party), extents, tile grids, allocation
  data/        datasets, sampling strategies, normalization, host pipeline
  models/      functional UNet (NHWC pytrees), torch-checkpoint import
  ops/         blend/stitch, masked stats, morphology, Pallas kernels
  parallel/    device mesh, shard_map train/infer steps, collectives
  train/       train step, optimizers, LR schedules, checkpoints, Trainer
  infer/       batched tiled inference with on-device stitching
  evaluation/  masked residual statistics (MAE/RMSE/MedAE/NMAD) per class
  utils/       logging, fs helpers, profiler hooks, AttrDict
"""

__version__ = "0.1.0"
