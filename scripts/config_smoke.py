"""Combinatorial CLI smoke: random valid train+eval configs on tiny scenes.

Usage: python scripts/config_smoke.py [seed] [n_cases] [--tpu]

Samples configurations across the supported option space (channel modes x
allocations x crossval x schedulers x optimizers x train precisions x
steps_per_call x augment/permute x serving dtypes x tile sizes 16/32 x
eval tile strides x weight EMA x dihedral TTA) and drives each through
the REAL train.py / test.py CLIs on the hermetic 8-virtual-device CPU mesh
— or, with ``--tpu``, on the inherited backend (the real chip): shape/
alignment constraints only the hardware compiler enforces (e.g. the Mosaic
lane-alignment rejection of sub-128 stitch tiles, fixed after a chip sweep
caught it) never surface on the CPU mesh. A maintenance sweep, not a pytest
(minutes per case on small hosts); exits non-zero on any unexpected CLI
failure. Validation history: 16/16 sampled cases at introduction (one was
a correct clean validator rejection before the harness respected the
tile/depth constraint); 6/6 cases on the real chip (--tpu) BEFORE the
round-2 widening of the sampled space (tile 32 / depth 3,
balanced/balanced16 train precisions, eval tile_stride). The round-3
widening (weight EMA, dihedral TTA) was validated with a 12/12 CPU-mesh
sweep (EMA sampled, TTA left at 1 by the draw), an 8/8 CPU-mesh sweep at
seed 11 exercising TTA 2/4 and EMA, and a 4/4 chip sweep (--tpu, seed 23)
exercising ema=0.99 with tta=4 and tta=2 on the hardware (TTA 8 is pinned
separately by the unit suite and the chip-side TTA study in BASELINE.md).
"""
import json
import os
import shutil
import subprocess
import sys

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
from resdepth_tpu.geo import tiff

ROOT = os.environ.get("SMOKE_DIR", "/tmp/config_smoke")
shutil.rmtree(ROOT, ignore_errors=True)
os.makedirs(ROOT)
ON_TPU = "--tpu" in sys.argv
ARGS = [a for a in sys.argv[1:] if a != "--tpu"]
if ON_TPU:
    ENV = dict(os.environ)  # inherited backend: the tunneled chip
    CASE_TIMEOUT = 1200     # relay compiles add minutes per program
else:
    ENV = dict(os.environ, PYTHONPATH="", JAX_PLATFORMS="cpu",
               XLA_FLAGS="--xla_force_host_platform_device_count=8")
    ENV.pop("PALLAS_AXON_POOL_IPS", None)
    CASE_TIMEOUT = 600

rng = np.random.default_rng(int(ARGS[0]) if len(ARGS) > 0 else 0)


def scene(dirname, rows=80, cols=100, n_images=4):
    d = os.path.join(ROOT, dirname)
    os.makedirs(d, exist_ok=True)
    yy, xx = np.mgrid[0:rows, 0:cols].astype(np.float32)
    gt = 400.0 + 5.0 * np.sin(yy / 9.0) + 4.0 * np.cos(xx / 11.0)
    dsm = (gt + rng.normal(0.0, 0.8, (rows, cols))).astype(np.float32)
    paths = {}
    for name, data in (("dsm", dsm), ("gt", gt.astype(np.float32))):
        p = os.path.join(d, f"{name}.tif")
        tiff.write(p, data, geotransform=(1000.0, 0.25, 0, 2000.0, 0, -0.25),
                   nodata=-9999.0)
        paths[name] = p
    imgs = []
    for j in range(n_images):
        p = os.path.join(d, f"ortho_{j}.tif")
        tiff.write(p, rng.normal(120, 25, (rows, cols)).astype(np.float32),
                   geotransform=(1000.0, 0.25, 0, 2000.0, 0, -0.25),
                   nodata=-9999.0)
        imgs.append(p)
    il = os.path.join(d, "imagelist.txt")
    open(il, "w").write("\n".join(imgs) + "\n")
    return d, paths, il


def sample_config(i):
    channels = rng.choice(["geom", "geom-mono", "geom-stereo",
                           "geom-multiview", "stereo"])
    alloc = rng.choice(["5-crossval_vertical", "5-crossval_horizontal"])
    crossval = bool(rng.integers(0, 2))
    # tile 16 on the 80x100 scene (5-stripe splits give 16/20-px stripes,
    # the smallest of which exactly admits a 16-px clamped tile) forces
    # depth 2; tile 32 doubles the scene so the narrowest stripe (32 px)
    # admits the tile, and allows depth 3 (tile >= 2^(depth+2)). Both tile
    # sizes are sub-lane (< 128) on the chip — the Mosaic alignment space
    # where the round-2 stitch bug lived.
    if rng.integers(0, 2):
        depth, tile = 2, 16
        d, paths, il = scene(f"case{i}")
    else:
        depth, tile = 3, 32
        d, paths, il = scene(f"case{i}", rows=160, cols=200)
    sched = rng.choice(["none", "StepLR", "ExponentialLR", "ReduceLROnPlateau"])
    opt = rng.choice(["Adam", "SGD"])

    if channels == "geom-mono":
        # arity rule (orchestration._pairs_valid, parity lib/utils.py:782-826):
        # mono takes exactly ONE pairlist line with ONE image
        pair_lines = ["ortho_0"]
    elif channels == "geom-multiview":
        pair_lines = ["ortho_0, ortho_1, ortho_2"]
    else:
        pair_lines = ["ortho_0, ortho_1", "ortho_1, ortho_2"]
    pl = os.path.join(d, "pairs.txt")
    open(pl, "w").write("\n".join(pair_lines) + "\n")

    ds = {
        "name": f"case{i}", "raster_in": paths["dsm"], "raster_gt": paths["gt"],
        "area_type": "train+val",
        "allocation_strategy": alloc, "test_stripe": int(rng.integers(0, 5)),
        "n_training_samples": 16, "crossval_training": crossval,
    }
    if channels != "geom":
        ds.update(path_image_list=il, path_pairlist_training=pl,
                  path_pairlist_validation=pl)
    cfg = {
        "datasets": [ds],
        "model": {"input_channels": str(channels), "depth": depth,
                  "outer_skip": channels != "stereo",
                  "start_kernel": 4, "max_filter_depth": 8,
                  "up_mode": str(rng.choice(["transpose", "bilinear"])),
                  "do_BN": bool(rng.integers(0, 2)),
                  "act_fn_encoder": str(rng.choice(["relu", "lrelu", "prelu"]))},
        "stereopair_settings": {
            "use_all_stereo_pairs": bool(rng.integers(0, 2)),
            "permute_images_within_pair": bool(rng.integers(0, 2))},
        "training_settings": {"tile_size": tile, "batch_size": int(rng.choice([3, 4])),
                              "n_epochs": 2, "augment": bool(rng.integers(0, 2)),
                              "loss": "L1"},
        "optimizer": {"name": str(opt), "learning_rate": 0.001,
                      "weight_decay": 1e-5},
        "general": {"save_model_rate": 2, "evaluate_rate": 1, "random_seed": i,
                    "auto_resume": False},
        "tpu": {"steps_per_call": int(rng.choice([1, 4])),
                "train_precision": str(rng.choice(
                    ["high", "default", "balanced", "balanced16"]))},
        "output": {"output_directory": os.path.join(d, "runs")},
    }
    # Opt-in weight EMA half the time (round-3 knob): exercises the
    # EMA-carrying checkpoint format through the eval CLI below.
    if rng.integers(0, 2):
        cfg["training_settings"]["ema_decay"] = 0.99
    if channels == "geom-multiview":
        cfg["multiview"] = {"config": "3-view"}
    if sched == "none":
        cfg["scheduler"] = {"enabled": False}
    elif sched == "StepLR":
        cfg["scheduler"] = {"enabled": True, "name": "StepLR",
                            "settings": {"step_size": 1, "gamma": 0.7}}
    elif sched == "ExponentialLR":
        cfg["scheduler"] = {"enabled": True, "name": "ExponentialLR",
                            "settings": {"gamma": 0.9}}
    else:
        cfg["scheduler"] = {"enabled": True, "name": "ReduceLROnPlateau",
                            "settings": {"factor": 0.5, "patience": 1}}
    return d, cfg, channels, crossval, pl, il


n_cases = int(ARGS[1]) if len(ARGS) > 1 else 8
fails = 0
for i in range(n_cases):
    d, cfg, channels, crossval, pl, il = sample_config(i)
    cfg_path = os.path.join(d, "train.json")
    json.dump(cfg, open(cfg_path, "w"))
    r = subprocess.run([sys.executable, "train.py", cfg_path], env=ENV,
                       cwd=REPO, capture_output=True, text=True,
                       timeout=CASE_TIMEOUT)
    tag = (f"case{i} ch={channels} alloc={cfg['datasets'][0]['allocation_strategy'][-8:]} "
           f"cv={crossval} sched={cfg['scheduler'].get('name', 'off')} "
           f"opt={cfg['optimizer']['name']} K={cfg['tpu']['steps_per_call']} "
           f"prec={cfg['tpu']['train_precision']} depth={cfg['model']['depth']} "
           f"tile={cfg['training_settings']['tile_size']} "
           f"ema={cfg['training_settings'].get('ema_decay', 'off')}")
    if r.returncode != 0:
        fails += 1
        print("TRAIN FAIL", tag)
        print((r.stdout + r.stderr)[-1200:])
        continue

    run_dir = sorted(os.listdir(os.path.join(d, "runs")))[0]
    run_dir = os.path.join(d, "runs", run_dir)
    if crossval:
        print("ok (train-only, crossval)", tag)
        continue
    eval_ds = {
        "name": f"case{i}", "raster_in": cfg["datasets"][0]["raster_in"],
        "raster_gt": cfg["datasets"][0]["raster_gt"],
        "allocation_strategy": cfg["datasets"][0]["allocation_strategy"],
        "test_stripe": cfg["datasets"][0]["test_stripe"], "area_type": "test",
    }
    if channels != "geom":
        single = open(pl).readline().strip()
        pl_test = os.path.join(d, "pairs_test.txt")
        open(pl_test, "w").write(single + "\n")
        eval_ds.update(path_image_list=il, path_pairlist=pl_test)
    eval_cfg = {
        "datasets": [eval_ds],
        "model": {
            "weights": os.path.join(run_dir, "checkpoints", "Model_best.npz"),
            "architecture": os.path.join(run_dir, "model_config.json"),
            "normalization_geom": os.path.join(
                run_dir, "DSM_normalization_parameters.p"),
        },
        "general": {"tile_size": cfg["training_settings"]["tile_size"],
                    "compute_dtype": str(rng.choice(
                        ["float32", "bfloat16", "mixed", "balanced",
                         "balanced16"]))},
        "output": {"directory": os.path.join(d, "eval")},
    }
    # Opt-in stride knob half the time (validator domain [tile/2, tile]):
    # non-default strides reshape the blend ramps and the Pallas stitch
    # alignment windows — chip-only constraint space.
    tile = cfg["training_settings"]["tile_size"]
    if rng.integers(0, 2):
        eval_cfg["general"]["tile_stride"] = int(rng.choice(
            [3 * tile // 4, tile]))
    # Opt-in dihedral TTA half the time (round-3 knob): the transformed
    # replicas change the predictor's batch geometry — chip-relevant space.
    if rng.integers(0, 2):
        eval_cfg["general"]["tta"] = int(rng.choice([2, 4, 8]))
    if channels != "geom":
        eval_cfg["model"]["normalization_image"] = os.path.join(
            run_dir, "Image_normalization_parameters.p")
    ev_path = os.path.join(d, "eval.json")
    json.dump(eval_cfg, open(ev_path, "w"))
    r = subprocess.run([sys.executable, "test.py", ev_path], env=ENV,
                       cwd=REPO, capture_output=True, text=True,
                       timeout=CASE_TIMEOUT)
    if r.returncode != 0:
        fails += 1
        print("EVAL FAIL", tag, "dtype:", eval_cfg["general"]["compute_dtype"],
              "stride:", eval_cfg["general"].get("tile_stride", "default"),
              "tta:", eval_cfg["general"].get("tta", 1))
        print((r.stdout + r.stderr)[-1200:])
        continue
    print("ok", tag, "dtype:", eval_cfg["general"]["compute_dtype"],
          "stride:", eval_cfg["general"].get("tile_stride", "default"),
          "tta:", eval_cfg["general"].get("tta", 1))

print(f"combo smoke: {n_cases - fails}/{n_cases} passed")
sys.exit(1 if fails else 0)
