"""Differential config-validator parity against the ACTUAL reference.

Loads the real ``lib/validate_cfg_training.py`` and
``lib/validate_cfg_inference.py`` (/root/reference) with only their
framework-external imports stubbed (easydict, gdal; fdutil/cfg_utils/
io_control_file/config/validate_arguments are the real modules), then runs a
catalogue of valid and mutated configurations — real raster/list/artifact
files on disk — through BOTH validators and asserts the accept/reject
verdicts agree on the reference key space.

Deliberate divergences (each is a conscious relaxation or extension recorded
in docs/PARITY.md) are pinned with their expected per-side verdicts so any
drift in either direction fails the test.

Skipped automatically when /root/reference is absent.
"""

import copy
import json
import logging
import multiprocessing
import os
import types

import numpy as np
import pytest

from tests.test_reference_parity_numerics import _load_with_stubs

REFERENCE = "/root/reference"

pytestmark = pytest.mark.skipif(not os.path.isdir(REFERENCE),
                                reason="reference implementation not available")


@pytest.fixture(scope="module")
def ref_validators():
    ns = types.SimpleNamespace
    args = _load_with_stubs("lib/arguments.py", "refv_args")
    fdutil = _load_with_stubs("lib/fdutil.py", "refv_fdutil")
    cfg_utils = _load_with_stubs("lib/cfg_utils.py", "refv_cfg_utils")
    config = _load_with_stubs("lib/config.py", "refv_config")
    va = _load_with_stubs("lib/validate_arguments.py", "refv_va",
                          extra_stubs={"lib.arguments": args})
    utils_stub = ns(print_dataset_name_to_console=lambda *a, **k: None)
    iocf = _load_with_stubs("lib/io_control_file.py", "refv_iocf",
                            extra_stubs={"lib.fdutil": fdutil,
                                         "lib.utils": utils_stub})
    common = {"lib.arguments": args, "lib.cfg_utils": cfg_utils,
              "lib.fdutil": fdutil, "lib.io_control_file": iocf,
              "lib.utils": utils_stub, "lib.config": config,
              "lib.validate_arguments": va}
    vt = _load_with_stubs("lib/validate_cfg_training.py", "refv_vt",
                          extra_stubs=common)
    vi = _load_with_stubs("lib/validate_cfg_inference.py", "refv_vi",
                          extra_stubs=common)
    return ns(training=vt, inference=vi)


def _quiet_logger(name):
    logger = logging.Logger(name)
    logger.addHandler(logging.NullHandler())
    return logger


# ------------------------------ training ------------------------------ #

@pytest.fixture()
def train_base(make_geotiff, tmp_path):
    raster = make_geotiff("dsm.tif", np.zeros((64, 64), np.float32))
    gt = make_geotiff("gt.tif", np.zeros((64, 64), np.float32))
    images = [make_geotiff(f"ortho_{i}.tif", np.zeros((64, 64), np.float32))
              for i in range(2)]
    imagelist = tmp_path / "images.txt"
    imagelist.write_text("\n".join(images) + "\n")
    pairs_train = tmp_path / "pairs_train.txt"
    pairs_train.write_text("ortho_0.tif, ortho_1.tif\n")
    pairs_val = tmp_path / "pairs_val.txt"
    pairs_val.write_text("ortho_0.tif, ortho_1.tif\n")

    return {
        "datasets": [{
            "raster_in": raster, "raster_gt": gt, "area_type": "train+val",
            "path_image_list": str(imagelist),
            "path_pairlist_training": str(pairs_train),
            "path_pairlist_validation": str(pairs_val),
        }],
        "model": {"input_channels": "geom-stereo", "depth": 3},
        "training_settings": {"tile_size": 64, "batch_size": 2, "n_epochs": 1},
        "optimizer": {"name": "Adam", "learning_rate": 2e-4,
                      "weight_decay": 1e-5},
        "scheduler": {"enabled": True, "name": "StepLR",
                      "settings": {"step_size": 10}},
        "general": {"allocation_strategy": "5-crossval_vertical",
                    "test_stripe": 1, "workers": 0, "random_seed": 0},
        "output": {"output_directory": str(tmp_path / "out"),
                   "tboard_log_dir": str(tmp_path / "tb")},
    }


def _set(path, value):
    """Mutation: assign ``value`` at dotted ``path`` ('datasets.0.key' ok)."""
    def mutate(cfg):
        keys = path.split(".")
        node = cfg
        for k in keys[:-1]:
            node = node[int(k)] if k.isdigit() else node[k]
        node[keys[-1]] = value
    return mutate


def _drop(path):
    def mutate(cfg):
        keys = path.split(".")
        node = cfg
        for k in keys[:-1]:
            node = node[int(k)] if k.isdigit() else node[k]
        node.pop(keys[-1], None)
    return mutate


def _many(*mutations):
    def mutate(cfg):
        for m in mutations:
            m(cfg)
    return mutate


# (name, mutation, expected) — expected None means "both sides must agree";
# a (ref, ours) tuple pins a deliberate divergence documented in PARITY.md.
TRAIN_CASES = [
    ("base_valid", _many(), None),
    ("unknown_primary_key", _set("frobnicate", 1), None),
    ("unknown_model_key", _set("model.frobnicate", 1), None),
    ("missing_datasets", _drop("datasets"), None),
    ("missing_output", _drop("output"), None),
    ("empty_datasets", _set("datasets", []), None),
    ("missing_raster_in", _drop("datasets.0.raster_in"), None),
    ("missing_raster_gt", _drop("datasets.0.raster_gt"), None),
    ("raster_in_not_a_file", _set("datasets.0.raster_in", "/no/such.tif"), None),
    ("raster_in_not_a_string", _set("datasets.0.raster_in", 7), None),
    ("missing_image_list", _drop("datasets.0.path_image_list"), None),
    ("image_list_bad_extension",
     _set("datasets.0.path_image_list", "/no/such.dat"), None),
    ("missing_pairlist_training",
     _drop("datasets.0.path_pairlist_training"), None),
    ("missing_pairlist_validation",
     _drop("datasets.0.path_pairlist_validation"), None),
    ("pairlist_missing_file",
     _set("datasets.0.path_pairlist_training", "/no/such.txt"), None),
    ("bad_area_type", _set("datasets.0.area_type", "everything"), None),
    ("missing_area_type", _drop("datasets.0.area_type"), None),
    ("area_type_not_string", _set("datasets.0.area_type", 3), None),
    ("negative_n_training_samples",
     _set("datasets.0.n_training_samples", -5), None),
    ("bad_dataset_allocation",
     _set("datasets.0.allocation_strategy", "6-fold"), None),
    ("dataset_test_stripe_out_of_range",
     _set("datasets.0.test_stripe", 7), None),
    ("general_test_stripe_out_of_range",
     _set("general.test_stripe", 9), None),
    ("entire_with_train_plus_val",
     _set("datasets.0.allocation_strategy", "entire"), None),
    ("entire_area_train_ok",
     _many(_set("datasets.0.allocation_strategy", "entire"),
           _set("datasets.0.area_type", "train")), None),  # still missing val
    ("crossval_with_entire",
     _many(_set("datasets.0.crossval_training", True),
           _set("datasets.0.allocation_strategy", "entire"),
           _set("datasets.0.area_type", "train")), None),
    ("crossval_valid",
     _set("datasets.0.crossval_training", True), None),
    ("no_val_dataset", _set("datasets.0.area_type", "train"), None),
    ("no_train_dataset", _set("datasets.0.area_type", "val"), None),
    ("bad_input_channels", _set("model.input_channels", "rgb"), None),
    ("bad_architecture_name", _set("model.name", "ResNet"), None),
    ("zero_depth", _set("model.depth", 0), None),
    ("bad_act_fn", _set("model.act_fn_encoder", "gelu"), None),
    ("bad_up_mode", _set("model.up_mode", "nearest"), None),
    ("do_BN_not_boolean", _set("model.do_BN", "yes"), None),
    ("stereo_with_default_outer_skip",
     _set("model.input_channels", "stereo"), None),
    ("stereo_with_outer_skip_off",
     _many(_set("model.input_channels", "stereo"),
           _set("model.outer_skip", False)), None),
    ("pretrained_path_missing_file",
     _set("model.pretrained_path", "/no/such.pth"), None),
    ("multiview_ignored_when_stereo",
     _set("multiview", {"config": "7-view"}), None),  # warn+ignore both sides
    ("multiview_bad_config",
     _many(_set("model.input_channels", "geom-multiview"),
           _set("multiview", {"config": "7-view"})), None),
    ("stereopair_ignored_when_mono",
     _many(_set("model.input_channels", "geom-mono"),
           _drop("datasets.0.path_pairlist_training"),
           _drop("datasets.0.path_pairlist_validation"),
           _set("datasets.0.path_pairlist_training", "ignored"),
           _set("stereopair_settings", {"use_all_stereo_pairs": "noise"})),
     None),
    ("stereopair_not_boolean",
     _set("stereopair_settings", {"use_all_stereo_pairs": "noise"}), None),
    ("tile_size_not_power_of_two",
     _set("training_settings.tile_size", 100), None),
    ("tile_size_below_min_for_depth",
     _many(_set("model.depth", 5), _set("training_settings.tile_size", 64)),
     None),
    ("zero_batch_size", _set("training_settings.batch_size", 0), None),
    ("bad_loss", _set("training_settings.loss", "L2"), None),
    ("augment_not_boolean", _set("training_settings.augment", 1.5), None),
    ("optimizer_without_name", _drop("optimizer.name"), None),
    ("bad_optimizer", _set("optimizer.name", "Adagrad"), None),
    ("negative_learning_rate", _set("optimizer.learning_rate", -1e-4), None),
    ("scheduler_without_name", _drop("scheduler.name"), None),
    ("scheduler_without_enabled", _drop("scheduler.enabled"), None),
    ("bad_scheduler", _set("scheduler.name", "CosineAnnealing"), None),
    ("scheduler_enabled_not_boolean", _set("scheduler.enabled", "on"), None),
    ("negative_random_seed", _set("general.random_seed", -3), None),
    ("zero_save_model_rate", _set("general.save_model_rate", 0), None),
    ("zero_evaluate_rate", _set("general.evaluate_rate", 0), None),
    ("output_directory_not_string",
     _set("output.output_directory", 12), None),
    # fuzz-found round 3: a NON-DICT mode-ignored section is never inspected
    # by the reference (warn+ignore) and an EMPTY container is vacuously
    # valid under its key iteration — both now agreed (validate_train.py
    # _sections_well_typed carve-outs)
    ("multiview_scalar_ignored_when_stereo", _set("multiview", 1), None),
    ("stereopair_empty_list_vacuous", _set("stereopair_settings", []), None),
    # ---- pinned divergences (documented in docs/PARITY.md) ----
    # vestigial worker pool: the reference rejects workers > cpu_count
    ("workers_over_cpu_count",
     _set("general.workers", multiprocessing.cpu_count() + 64), (False, True)),
    # wd=0 is legitimate (disables decay); the reference rejects wd <= 0
    ("zero_weight_decay", _set("optimizer.weight_decay", 0.0), (False, True)),
    # tboard_log_dir is defaulted by our train.py, mandatory in the reference
    ("missing_tboard_log_dir", _drop("output.tboard_log_dir"), (False, True)),
    # a disabled scheduler needs no name here; the reference demands one
    # whenever the section appears
    ("disabled_scheduler_without_name",
     _set("scheduler", {"enabled": False}), (False, True)),
]


@pytest.mark.parametrize("name,mutate,expected",
                         TRAIN_CASES, ids=[c[0] for c in TRAIN_CASES])
def test_training_validator_verdicts_match(ref_validators, train_base,
                                           name, mutate, expected):
    from resdepth_tpu.config import validate_train

    cfg = copy.deepcopy(train_base)
    mutate(cfg)
    ref_verdict = ref_validators.training.validate_cfg_file(
        copy.deepcopy(cfg), _quiet_logger(f"ref_{name}"))
    our_verdict = validate_train.validate_cfg_file(
        copy.deepcopy(cfg), _quiet_logger(f"our_{name}"))
    if expected is None:
        assert our_verdict == ref_verdict, (
            f"verdict divergence on '{name}': reference={ref_verdict}, "
            f"ours={our_verdict}")
        if name == "base_valid":
            assert ref_verdict is True
    else:
        assert (ref_verdict, our_verdict) == expected, (
            f"pinned divergence '{name}' drifted: "
            f"expected {expected}, got {(ref_verdict, our_verdict)}")


# ------------------------------ inference ------------------------------ #

@pytest.fixture()
def infer_base(make_geotiff, tmp_path):
    raster = make_geotiff("dsm.tif", np.zeros((64, 64), np.float32))
    gt = make_geotiff("gt.tif", np.zeros((64, 64), np.float32))
    mask = make_geotiff("mask.tif", np.ones((64, 64), np.float32))
    images = [make_geotiff(f"ortho_{i}.tif", np.zeros((64, 64), np.float32))
              for i in range(2)]
    imagelist = tmp_path / "images.txt"
    imagelist.write_text("\n".join(images) + "\n")
    pairlist = tmp_path / "pairs.txt"
    pairlist.write_text("ortho_0.tif, ortho_1.tif\n")

    weights = tmp_path / "weights.pth"
    weights.write_bytes(b"\x00")
    arch = tmp_path / "model_config.json"
    arch.write_text(json.dumps({
        "name": "UNet", "input_channels": "geom-stereo",
        "settings": {"n_input_channels": 3, "depth": 3, "start_kernel": 8}}))
    norm_geom = tmp_path / "DSM_normalization_parameters.p"
    norm_geom.write_bytes(b"\x00")
    norm_image = tmp_path / "Image_normalization_parameters.p"
    norm_image.write_bytes(b"\x00")

    return {
        "datasets": [{
            "raster_in": raster, "raster_gt": gt,
            "mask_ground_truth": mask,
            "path_image_list": str(imagelist), "path_pairlist": str(pairlist),
            "allocation_strategy": "5-crossval_vertical",
            "test_stripe": 2, "area_type": "test",
        }],
        "model": {"weights": str(weights), "architecture": str(arch),
                  "normalization_geom": str(norm_geom),
                  "normalization_image": str(norm_image)},
        "general": {"tile_size": 64, "workers": 0},
        "output": {"directory": str(tmp_path / "eval_out")},
    }


INFER_CASES = [
    ("base_valid", _many(), None),
    ("unknown_primary_key", _set("frobnicate", 1), None),
    ("missing_general", _drop("general"), None),
    ("missing_model", _drop("model"), None),
    ("missing_weights", _drop("model.weights"), None),
    ("weights_missing_file", _set("model.weights", "/no/such.pth"), None),
    ("missing_architecture", _drop("model.architecture"), None),
    ("architecture_bad_extension",
     _set("model.architecture", "/no/such.txt"), None),
    ("missing_normalization_geom",
     _drop("model.normalization_geom"), None),
    ("missing_normalization_image",
     _drop("model.normalization_image"), None),
    ("missing_raster_in", _drop("datasets.0.raster_in"), None),
    ("mask_missing_file",
     _set("datasets.0.mask_building", "/no/such.tif"), None),
    ("missing_pairlist", _drop("datasets.0.path_pairlist"), None),
    ("bad_allocation",
     _set("datasets.0.allocation_strategy", "6-fold"), None),
    ("crossval_missing_test_stripe", _drop("datasets.0.test_stripe"), None),
    ("crossval_test_stripe_out_of_range",
     _set("datasets.0.test_stripe", 5), None),
    ("crossval_missing_area_type", _drop("datasets.0.area_type"), None),
    ("bad_eval_area_type",
     _set("datasets.0.area_type", "train+val"), None),
    ("entire_allocation_valid",
     _many(_set("datasets.0.allocation_strategy", "entire"),
           _drop("datasets.0.test_stripe"), _drop("datasets.0.area_type")),
     None),
    ("tile_size_not_power_of_two", _set("general.tile_size", 100), None),
    ("tile_size_below_architecture_depth",
     _set("general.tile_size", 16), None),
    ("missing_output_directory", _drop("output.directory"), None),
    ("unknown_output_key", _set("output.extra", 1), None),
    # ---- pinned divergences (documented in docs/PARITY.md) ----
    # vestigial worker pool: the reference rejects workers > cpu_count
    ("workers_over_cpu_count",
     _set("general.workers", multiprocessing.cpu_count() + 64), (False, True)),
    # the reference's general section rejects 'allocation_strategy' as an
    # unknown key even though its own dataset check reads it as the global
    # fallback (lib/validate_cfg_inference.py:237 vs GENERAL_KEYS_eval) —
    # we accept it, making the documented fallback actually usable
    ("general_allocation_strategy",
     _many(_drop("datasets.0.allocation_strategy"),
           _set("general.allocation_strategy", "5-crossval_vertical")),
     (False, True)),
    # TPU extension: native checkpoint formats beyond .pth
    ("npz_weights_extension",
     _set("model.weights", "__NPZ_WEIGHTS__"), (False, True)),
]


@pytest.mark.parametrize("name,mutate,expected",
                         INFER_CASES, ids=[c[0] for c in INFER_CASES])
def test_inference_validator_verdicts_match(ref_validators, infer_base,
                                            tmp_path, name, mutate, expected):
    from resdepth_tpu.config import validate_infer

    cfg = copy.deepcopy(infer_base)
    mutate(cfg)
    if cfg.get("model", {}).get("weights") == "__NPZ_WEIGHTS__":
        npz = tmp_path / "weights.npz"
        np.savez(npz, dummy=np.zeros(1))
        cfg["model"]["weights"] = str(npz)

    ref_result = ref_validators.inference.validate_and_update_cfg_file(
        copy.deepcopy(cfg), _quiet_logger(f"refi_{name}"))
    our_result = validate_infer.validate_and_update_cfg_file(
        copy.deepcopy(cfg), _quiet_logger(f"ouri_{name}"))
    verdicts = (bool(ref_result.status), bool(our_result.status))
    if expected is None:
        assert verdicts[0] == verdicts[1], (
            f"verdict divergence on '{name}': reference={verdicts[0]}, "
            f"ours={verdicts[1]}")
        if name == "base_valid":
            assert verdicts == (True, True)
            # both sides merge the architecture artifact into cfg.model
            assert our_result.cfg.model.input_channels == \
                ref_result.cfg.model.input_channels == "geom-stereo"
    else:
        assert verdicts == expected, (
            f"pinned divergence '{name}' drifted: "
            f"expected {expected}, got {verdicts}")


# ------------------ seeded differential fuzz (CI-sized) ------------------ #

# Reference-space key paths the fuzz mutates. The divergence-prone paths
# whose deliberate (ref, ours) splits are pinned above — general.workers,
# optimizer.weight_decay, output.tboard_log_dir, scheduler.enabled — are
# EXCLUDED so every fuzz case must agree exactly.
FUZZ_PATHS = [
    "datasets.0.raster_in", "datasets.0.raster_gt",
    "datasets.0.path_image_list", "datasets.0.path_pairlist_training",
    "datasets.0.path_pairlist_validation", "datasets.0.area_type",
    "datasets.0.n_training_samples", "datasets.0.allocation_strategy",
    "datasets.0.test_stripe", "datasets.0.crossval_training",
    "model.input_channels", "model.name", "model.depth", "model.start_kernel",
    "model.act_fn_encoder", "model.act_fn_decoder", "model.up_mode",
    "model.do_BN", "model.outer_skip", "model.outer_skip_BN",
    "training_settings.tile_size", "training_settings.batch_size",
    "training_settings.n_epochs", "training_settings.n_training_samples",
    "training_settings.loss", "training_settings.augment",
    "optimizer.name", "optimizer.learning_rate",
    "scheduler.name", "scheduler.settings",
    "general.random_seed", "general.save_model_rate",
    "general.evaluate_rate", "general.test_stripe",
    "general.allocation_strategy",
    "output.output_directory",
    "multiview", "stereopair_settings",
]

FUZZ_VALUES = [None, True, False, 0, 1, -1, 7, 100, 0.5, -2e-4, "", "noise",
               "/no/such.file", [], [1, 2], {}, {"x": 1}]


def _apply_fuzz_ops(cfg, rng):
    """1-2 random set/drop ops over FUZZ_PATHS; ops whose parent was removed
    by an earlier op in the same case are skipped (deterministic either way
    under the fixed per-case seed)."""
    applied = []
    for _ in range(int(rng.integers(1, 3))):
        path = FUZZ_PATHS[int(rng.integers(len(FUZZ_PATHS)))]
        drop = rng.random() < 0.25
        value = copy.deepcopy(FUZZ_VALUES[int(rng.integers(len(FUZZ_VALUES)))])
        try:
            (_drop(path) if drop else _set(path, value))(cfg)
        except (KeyError, IndexError, TypeError):
            continue
        applied.append((path, "drop" if drop else f"set={value!r}"))
    return applied


@pytest.mark.parametrize("case", range(64))
def test_training_validator_fuzz_verdicts_match(ref_validators, train_base,
                                                case):
    """Seeded, CI-sized port of the round-2 1800-config differential fuzz
    sweep (docs/ROUND2.md): random mutations of the base training config
    over the reference key space must draw the same accept/reject verdict
    from both validators. Deterministic (fixed per-case seed). Mutations
    that CRASH the reference validator are skipped — the clean-ERROR
    contract is this framework's (our side must never raise; an exception
    from ours fails the test), the reference makes no such promise
    (/root/reference/lib/validate_cfg_training.py)."""
    from resdepth_tpu.config import validate_train

    rng = np.random.default_rng(20260819 + case)
    cfg = copy.deepcopy(train_base)
    applied = _apply_fuzz_ops(cfg, rng)

    ours = validate_train.validate_cfg_file(
        copy.deepcopy(cfg), _quiet_logger(f"our_fuzz{case}"))
    try:
        ref = ref_validators.training.validate_cfg_file(
            copy.deepcopy(cfg), _quiet_logger(f"ref_fuzz{case}"))
    except Exception:
        pytest.skip(f"reference validator crashed on {applied}")
    assert ours == ref, f"verdict divergence on mutations {applied}"


# Reference-space eval key paths (our TPU extension keys — tta, tta_merge,
# compute_dtype, … — are deliberately NOT fuzzed: the reference rejects any
# unknown key, so extension keys diverge by design and are covered by
# test_config.py instead). general.workers and general.allocation_strategy
# carry pinned divergences (above) and are excluded the same way.
INFER_FUZZ_PATHS = [
    "datasets.0.raster_in", "datasets.0.raster_gt",
    "datasets.0.mask_ground_truth", "datasets.0.mask_building",
    "datasets.0.path_image_list", "datasets.0.path_pairlist",
    "datasets.0.allocation_strategy", "datasets.0.test_stripe",
    "datasets.0.area_type",
    "model.architecture", "model.normalization_geom",
    "model.normalization_image",
    "general.tile_size",
    "output.directory",
]


@pytest.mark.parametrize("case", range(48))
def test_inference_validator_fuzz_verdicts_match(ref_validators, infer_base,
                                                 case):
    """Seeded differential fuzz over the inference validator (same contract
    as the training fuzz above): random mutations over the reference eval
    key space must draw the same verdict from both validators; mutations
    that crash the reference are skipped, ours must never raise."""
    from resdepth_tpu.config import validate_infer

    rng = np.random.default_rng(30260819 + case)
    cfg = copy.deepcopy(infer_base)
    applied = []
    for _ in range(int(rng.integers(1, 3))):
        path = INFER_FUZZ_PATHS[int(rng.integers(len(INFER_FUZZ_PATHS)))]
        drop = rng.random() < 0.25
        value = copy.deepcopy(FUZZ_VALUES[int(rng.integers(len(FUZZ_VALUES)))])
        try:
            (_drop(path) if drop else _set(path, value))(cfg)
        except (KeyError, IndexError, TypeError):
            continue
        applied.append((path, "drop" if drop else f"set={value!r}"))

    our_result = validate_infer.validate_and_update_cfg_file(
        copy.deepcopy(cfg), _quiet_logger(f"ouri_fuzz{case}"))
    try:
        ref_result = ref_validators.inference.validate_and_update_cfg_file(
            copy.deepcopy(cfg), _quiet_logger(f"refi_fuzz{case}"))
    except Exception:
        pytest.skip(f"reference validator crashed on {applied}")
    assert bool(our_result.status) == bool(ref_result.status), \
        f"verdict divergence on mutations {applied}"
