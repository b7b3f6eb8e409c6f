"""Config layer: defaults, merge, schema validation, dataset augmentation."""

import json
import logging
import os

import numpy as np
import pytest

from resdepth_tpu.config import default_cfg, io, schema
from resdepth_tpu.config import validate_train, validate_infer
from resdepth_tpu.utils.attrdict import AttrDict

logger = logging.getLogger("test_config")
logger.addHandler(logging.NullHandler())


def test_attrdict_access_and_nesting():
    d = AttrDict({"a": {"b": 1}, "c": [{"d": 2}]})
    assert d.a.b == 1
    assert d.c[0].d == 2
    d.a.e = {"f": 3}
    assert d["a"]["e"].f == 3
    copy = d.copy()
    copy.a.b = 99
    assert d.a.b == 1


def test_default_cfg_sections():
    cfg = default_cfg()
    for section in ("model", "multiview", "stereopair_settings", "training_settings",
                    "optimizer", "scheduler", "general", "output", "tpu"):
        assert section in cfg
    assert cfg.model.depth == 5
    assert cfg.model.start_kernel == 64
    assert cfg.training_settings.tile_size == 256
    assert cfg.training_settings.batch_size == 20
    assert cfg.optimizer.learning_rate == 2e-4
    assert cfg.general.test_stripe == 0


def test_merge_recursive_user_wins():
    base = {"a": {"x": 1, "y": 2}, "b": 3}
    user = {"a": {"y": 20, "z": 30}, "c": 4}
    merged = io.merge(base, user)
    assert merged.a.x == 1 and merged.a.y == 20 and merged.a.z == 30
    assert merged.b == 3 and merged.c == 4
    user["a"]["y"] = -1  # merge must deep-copy
    assert merged.a.y == 20


def test_remove_obsolete_keys():
    cfg = io.merge(default_cfg(), {"model": {"input_channels": "geom"}})
    io.remove_obsolete_keys(cfg)
    assert "multiview" not in cfg
    cfg = io.merge(default_cfg(), {"model": {"input_channels": "geom-multiview"}})
    io.remove_obsolete_keys(cfg)
    assert "multiview" in cfg


def _minimal_train_cfg(make_geotiff, tmp_path):
    raster = make_geotiff("dsm.tif", np.zeros((64, 64), np.float32))
    gt = make_geotiff("gt.tif", np.zeros((64, 64), np.float32))
    return AttrDict({
        "datasets": [{
            "raster_in": raster, "raster_gt": gt, "area_type": "train+val",
            "allocation_strategy": "5-crossval_vertical", "test_stripe": 1,
        }],
        "model": {"input_channels": "geom", "depth": 2},
        "training_settings": {"tile_size": 16, "batch_size": 2, "n_epochs": 1},
        "output": {"output_directory": str(tmp_path / "out")},
    })


def test_validate_train_accepts_minimal(make_geotiff, tmp_path):
    cfg = _minimal_train_cfg(make_geotiff, tmp_path)
    assert validate_train.validate_cfg_file(cfg, logger) is True


def test_validate_train_rejects_unknown_primary_key(make_geotiff, tmp_path):
    cfg = _minimal_train_cfg(make_geotiff, tmp_path)
    cfg["bogus_section"] = {}
    assert validate_train.validate_cfg_file(cfg, logger) is False


def test_validate_train_rejects_bad_enum(make_geotiff, tmp_path):
    cfg = _minimal_train_cfg(make_geotiff, tmp_path)
    cfg.optimizer = {"name": "AdamW"}
    assert validate_train.validate_cfg_file(cfg, logger) is False


def test_validate_train_balanced_precision_modes(make_geotiff, tmp_path):
    for mode in ("balanced", "balanced16"):
        cfg = _minimal_train_cfg(make_geotiff, tmp_path)
        cfg.tpu = {"train_precision": mode}
        assert validate_train.validate_cfg_file(cfg, logger) is True
        # the balanced modes need the f32 batch input: bf16 storage conflicts
        cfg = _minimal_train_cfg(make_geotiff, tmp_path)
        cfg.tpu = {"train_precision": mode, "compute_dtype": "bfloat16"}
        assert validate_train.validate_cfg_file(cfg, logger) is False


def test_validate_train_rejects_bad_tile_size(make_geotiff, tmp_path):
    cfg = _minimal_train_cfg(make_geotiff, tmp_path)
    cfg.training_settings.tile_size = 100
    assert validate_train.validate_cfg_file(cfg, logger) is False
    # tile must also satisfy 2^(depth+2): depth=5 default requires >= 128
    cfg = _minimal_train_cfg(make_geotiff, tmp_path)
    cfg.model.depth = 5
    cfg.training_settings.tile_size = 64
    assert validate_train.validate_cfg_file(cfg, logger) is False


def test_validate_train_rejects_missing_raster(make_geotiff, tmp_path):
    cfg = _minimal_train_cfg(make_geotiff, tmp_path)
    cfg.datasets[0].raster_in = str(tmp_path / "missing.tif")
    assert validate_train.validate_cfg_file(cfg, logger) is False


def test_validate_train_rejects_outer_skip_with_stereo_only(make_geotiff, tmp_path):
    cfg = _minimal_train_cfg(make_geotiff, tmp_path)
    cfg.model.input_channels = "stereo"
    cfg.model.outer_skip = True
    assert validate_train.validate_cfg_file(cfg, logger) is False


def test_augment_dataset_args(make_geotiff, tmp_path):
    cfg = _minimal_train_cfg(make_geotiff, tmp_path)
    del cfg.datasets[0]["test_stripe"]
    del cfg.datasets[0]["allocation_strategy"]
    cfg.general = AttrDict(test_stripe=3)
    validate_train.augment_dataset_args(cfg)
    ds = cfg.datasets[0]
    assert ds.test_stripe == 3                        # from user general section
    assert ds.allocation_strategy == "5-crossval_vertical"  # from defaults
    assert ds.n_training_samples == 20000             # from defaults

    # 'entire' datasets must not receive a test_stripe
    cfg2 = _minimal_train_cfg(make_geotiff, tmp_path)
    del cfg2.datasets[0]["test_stripe"]
    cfg2.datasets[0].allocation_strategy = "entire"
    validate_train.augment_dataset_args(cfg2)
    assert "test_stripe" not in cfg2.datasets[0]


def test_count_input_channels():
    assert schema.count_input_channels("geom") == 1
    assert schema.count_input_channels("stereo") == 2
    assert schema.count_input_channels("geom-mono") == 2
    assert schema.count_input_channels("geom-stereo") == 3
    assert schema.count_input_channels("geom-multiview", "4-view") == 5


def test_validate_infer_merges_architecture(make_geotiff, tmp_path):
    raster = make_geotiff("dsm.tif", np.zeros((64, 64), np.float32))
    arch = {"name": "UNet", "input_channels": "geom",
            "settings": {"n_input_channels": 1, "depth": 2, "start_kernel": 4}}
    arch_path = str(tmp_path / "model_config.json")
    io.write_json(arch, arch_path)
    weights_path = str(tmp_path / "weights.npz")
    np.savez(weights_path, dummy=np.zeros(1))
    norm_path = str(tmp_path / "norm.json")
    io.write_json({"mean": None, "std": 1.0}, norm_path)

    cfg = {
        "datasets": [{"raster_in": raster}],
        "model": {"weights": weights_path, "architecture": arch_path,
                  "normalization_geom": norm_path},
        "general": {"tile_size": 16},
        "output": {"directory": str(tmp_path / "eval_out")},
    }
    result = validate_infer.validate_and_update_cfg_file(cfg, logger)
    assert result.status is True
    assert result.cfg.model.input_channels == "geom"
    assert result.cfg.model.settings.depth == 2
    # allocation defaults to 'entire' when unspecified
    assert result.cfg.datasets[0].allocation_strategy == "entire"


def test_validate_infer_rejects_missing_weights(make_geotiff, tmp_path):
    raster = make_geotiff("dsm.tif", np.zeros((64, 64), np.float32))
    cfg = {
        "datasets": [{"raster_in": raster}],
        "model": {"weights": str(tmp_path / "nope.npz"),
                  "architecture": str(tmp_path / "nope.json")},
        "general": {},
        "output": {"directory": str(tmp_path / "eval_out")},
    }
    result = validate_infer.validate_and_update_cfg_file(cfg, logger)
    assert result.status is False


def test_attrdict_update_wraps_nested():
    d = AttrDict({"a": 1})
    d.update({"settings": {"n_input_channels": 4}})
    assert d.settings.n_input_channels == 4   # attribute access after update
    d.setdefault("general", {"tile_size": 16})
    assert d.general.tile_size == 16


def test_validate_infer_use_pallas_modes(make_geotiff, tmp_path):
    """general.use_pallas accepts booleans and the 'fused' kernel variant."""
    raster = make_geotiff("dsm.tif", np.zeros((64, 64), np.float32))
    arch = {"name": "UNet", "input_channels": "geom",
            "settings": {"n_input_channels": 1, "depth": 2, "start_kernel": 4}}
    arch_path = str(tmp_path / "model_config.json")
    io.write_json(arch, arch_path)
    weights_path = str(tmp_path / "weights.npz")
    np.savez(weights_path, dummy=np.zeros(1))
    norm_path = str(tmp_path / "norm.json")
    io.write_json({"mean": None, "std": 1.0}, norm_path)

    def check(value):
        cfg = {
            "datasets": [{"raster_in": raster}],
            "model": {"weights": weights_path, "architecture": arch_path,
                      "normalization_geom": norm_path},
            "general": {"tile_size": 16, "use_pallas": value},
            "output": {"directory": str(tmp_path / "eval_out")},
        }
        return validate_infer.validate_and_update_cfg_file(cfg, logger).status

    assert check(True) and check(False) and check("fused")
    assert check("sideways") is False


def test_validate_infer_tile_stride(make_geotiff, tmp_path):
    """general.tile_stride (opt-in eval knob) accepts [tile/2, tile] only:
    the linear blend is a partition of unity exactly on that domain
    (ops/blend.py); the reference has no stride knob (fixed tile/2)."""
    raster = make_geotiff("dsm.tif", np.zeros((64, 64), np.float32))
    arch = {"name": "UNet", "input_channels": "geom",
            "settings": {"n_input_channels": 1, "depth": 2, "start_kernel": 4}}
    arch_path = str(tmp_path / "model_config.json")
    io.write_json(arch, arch_path)
    weights_path = str(tmp_path / "weights.npz")
    np.savez(weights_path, dummy=np.zeros(1))
    norm_path = str(tmp_path / "norm.json")
    io.write_json({"mean": None, "std": 1.0}, norm_path)

    def check(value):
        cfg = {
            "datasets": [{"raster_in": raster}],
            "model": {"weights": weights_path, "architecture": arch_path,
                      "normalization_geom": norm_path},
            "general": {"tile_size": 16, "tile_stride": value},
            "output": {"directory": str(tmp_path / "eval_out")},
        }
        return validate_infer.validate_and_update_cfg_file(cfg, logger).status

    for good in (8, 12, 15, 16):
        assert check(good) is True, good
    for bad in (0, 7, 17, -4, "half", 8.5):
        assert check(bad) is False, bad

    def check_with_tile_size(tile_size, stride):
        cfg = {
            "datasets": [{"raster_in": raster}],
            "model": {"weights": weights_path, "architecture": arch_path,
                      "normalization_geom": norm_path},
            "general": {"tile_size": tile_size, "tile_stride": stride},
            "output": {"directory": str(tmp_path / "eval_out")},
        }
        return validate_infer.validate_and_update_cfg_file(cfg, logger).status

    # an INVALID tile_size must yield a clean rejection, not a TypeError
    # from the stride range arithmetic
    for bad_tile in ("256", 17, None):
        assert check_with_tile_size(bad_tile, 8) is False, bad_tile


def test_validators_reject_malformed_sections_cleanly(make_geotiff, tmp_path):
    """A scalar where a section object is expected (found by randomized
    differential fuzzing — both sides crashed; the reference still does)
    must produce a clean False verdict, not an AttributeError."""
    raster = make_geotiff("dsm.tif", np.zeros((64, 64), np.float32))
    gt = make_geotiff("gt.tif", np.zeros((64, 64), np.float32))
    base = {
        "datasets": [{"raster_in": raster, "raster_gt": gt,
                      "area_type": "train+val"}],
        "model": {"input_channels": "geom", "depth": 3},
        "training_settings": {"tile_size": 64, "batch_size": 2, "n_epochs": 1},
        "optimizer": {"name": "Adam", "learning_rate": 2e-4},
        "scheduler": {"enabled": False},
        "general": {"allocation_strategy": "5-crossval_vertical",
                    "test_stripe": 1},
        "output": {"output_directory": str(tmp_path / "out")},
    }
    assert validate_train.validate_cfg_file(dict(base), logger) is True

    for key, bad in (("general", 2), ("model", "geom"), ("datasets", 7),
                     ("datasets", [3]), ("output", [1, 2]),
                     ("scheduler", "entire")):
        cfg = json.loads(json.dumps(base))
        cfg[key] = bad
        assert validate_train.validate_cfg_file(cfg, logger) is False, (key, bad)

    # non-integer model.depth: rejected by the model check, and the
    # tile-size check must not crash in range() on the float
    for bad_depth in (1.5, -0.5, 1e9):
        cfg = json.loads(json.dumps(base))
        cfg["model"]["depth"] = bad_depth
        assert validate_train.validate_cfg_file(cfg, logger) is False, bad_depth

    # scheduler.settings must be an object (the reference accepts a scalar
    # and crashes later in the torch constructor)
    cfg = json.loads(json.dumps(base))
    cfg["scheduler"] = {"enabled": True, "name": "StepLR", "settings": "geom"}
    assert validate_train.validate_cfg_file(cfg, logger) is False

    # missing optional sections are fine: defaults fill in (the reference
    # validator crashes on an absent 'general')
    cfg = json.loads(json.dumps(base))
    del cfg["general"]
    del cfg["scheduler"]
    assert validate_train.validate_cfg_file(cfg, logger) is True

    # random_seed: null is a documented relaxation (train.py seeds with 0)
    cfg = json.loads(json.dumps(base))
    cfg["general"]["random_seed"] = None
    assert validate_train.validate_cfg_file(cfg, logger) is True

    # empty output_directory: clean rejection (the reference's check crashes
    # with a raw FileNotFoundError)
    cfg = json.loads(json.dumps(base))
    cfg["output"]["output_directory"] = ""
    assert validate_train.validate_cfg_file(cfg, logger) is False


def test_validate_infer_rejects_empty_output_directory(make_geotiff, tmp_path):
    """Empty eval output.directory: clean rejection, not a FileNotFoundError
    from the eager mkdir (fuzz-found; the reference crashes the same way)."""
    raster = make_geotiff("dsm.tif", np.zeros((64, 64), np.float32))
    arch = {"name": "UNet", "input_channels": "geom",
            "settings": {"n_input_channels": 1, "depth": 2, "start_kernel": 4}}
    arch_path = str(tmp_path / "model_config.json")
    io.write_json(arch, arch_path)
    weights_path = str(tmp_path / "weights.npz")
    np.savez(weights_path, dummy=np.zeros(1))
    norm_path = str(tmp_path / "norm.json")
    io.write_json({"mean": None, "std": 1.0}, norm_path)
    cfg = {
        "datasets": [{"raster_in": raster}],
        "model": {"weights": weights_path, "architecture": arch_path,
                  "normalization_geom": norm_path},
        "output": {"directory": ""},
    }
    assert validate_infer.validate_and_update_cfg_file(cfg, logger).status is False


def test_compute_dtype_serving_modes_are_eval_only(make_geotiff, tmp_path):
    """'mixed'/'balanced' are serving modes: the eval validator accepts them
    as general.compute_dtype; the train validator rejects them under tpu."""
    raster = make_geotiff("dsm.tif", np.zeros((64, 64), np.float32))
    arch = {"name": "UNet", "input_channels": "geom",
            "settings": {"n_input_channels": 1, "depth": 2, "start_kernel": 4}}
    arch_path = str(tmp_path / "model_config.json")
    io.write_json(arch, arch_path)
    weights_path = str(tmp_path / "weights.npz")
    np.savez(weights_path, dummy=np.zeros(1))
    norm_path = str(tmp_path / "norm.json")
    io.write_json({"mean": None, "std": 1.0}, norm_path)

    def eval_status(value):
        cfg = {
            "datasets": [{"raster_in": raster}],
            "model": {"weights": weights_path, "architecture": arch_path,
                      "normalization_geom": norm_path},
            "general": {"tile_size": 16, "compute_dtype": value},
            "output": {"directory": str(tmp_path / "eval_out")},
        }
        return validate_infer.validate_and_update_cfg_file(cfg, logger).status

    for mode in schema.COMPUTE_DTYPES:
        assert eval_status(mode) is True, mode
    assert eval_status("float64") is False

    for mode in ("mixed", "balanced", "balanced16"):
        cfg = _minimal_train_cfg(make_geotiff, tmp_path)
        cfg.tpu = AttrDict(compute_dtype=mode)
        assert validate_train.validate_cfg_file(cfg, logger) is False, mode


def test_compilation_cache_host_scoped(tmp_path):
    # Cache entries must never be shared across hosts with different CPU
    # features (XLA:CPU AOT results embed them; loading foreign entries can
    # SIGILL). enable() scopes the directory by a host fingerprint.
    from resdepth_tpu.utils import compilation_cache

    d1 = compilation_cache.enable(str(tmp_path / "cc"))
    d2 = compilation_cache.enable(str(tmp_path / "cc"))
    assert d1 == d2
    base, host = os.path.split(d1)
    assert base == str(tmp_path / "cc")
    assert host.startswith("host-") and len(host) == len("host-") + 10
    assert os.path.isdir(d1)
    assert compilation_cache.enable("off") is None


def test_compilation_cache_fingerprint_identity_sensitive():
    # LLVM derives AOT tuning from cpuid identity (family/model/stepping),
    # not just the flags line — two hosts sharing a flags line but differing
    # in model/stepping must get distinct cache directories (a colliding
    # fingerprint loaded a foreign AOT entry that crashed in ThunkExecutor).
    from resdepth_tpu.utils.compilation_cache import _fingerprint_from_cpuinfo

    base = ("processor\t: 0\nvendor_id\t: GenuineIntel\ncpu family\t: 6\n"
            "model\t\t: {model}\nmodel name\t: Intel Xeon\nstepping\t: {step}\n"
            "flags\t\t: fpu avx2 avx512f\n\nprocessor\t: 1\nmodel\t\t: 99\n")
    a = _fingerprint_from_cpuinfo(base.format(model=85, step=4))
    b = _fingerprint_from_cpuinfo(base.format(model=143, step=4))
    c = _fingerprint_from_cpuinfo(base.format(model=85, step=7))
    assert len({a, b, c}) == 3
    # identical first blocks fingerprint identically (second block ignored)
    assert a == _fingerprint_from_cpuinfo(
        base.format(model=85, step=4).replace("99", "123"))
    # aarch64-style identity lines are picked up too
    arm = ("processor\t: 0\nFeatures\t: fp asimd sve\nCPU implementer\t: 0x41\n"
           "CPU part\t: 0xd4f\nCPU revision\t: 1\n")
    assert _fingerprint_from_cpuinfo(arm) != _fingerprint_from_cpuinfo(
        arm.replace("0xd4f", "0xd40"))


def test_compilation_cache_fingerprint_uses_raw_cpuid():
    """Hypervisors can mask /proc/cpuinfo to IDENTICAL generic identities on
    different physical machines (observed: same 'Intel Xeon @ 2.10GHz'
    block, incompatible XLA:CPU AOT tuning features). The fingerprint must
    also hash raw CPUID — what LLVM's host detection reads — and numpy's
    runtime feature set, so such hosts cannot share a cache directory."""
    import platform as _platform

    from resdepth_tpu.utils import compilation_cache as cc

    if _platform.machine() == "x86_64":
        words = cc._cpuid_words()
        assert len(words) >= 6 * 6  # several (leaf, sub, eax..edx) groups
        assert words == cc._cpuid_words()  # deterministic
        # leaf 0 EBX/EDX/ECX carry the vendor string — never all zero
        assert any(words[3:6])
    # differing raw-cpuid extras must split otherwise-identical cpuinfo
    text = "processor\t: 0\nmodel name\t: Intel Xeon\nflags\t\t: fpu avx2\n"
    a = cc._fingerprint_from_cpuinfo(text, ["cpuid:1"])
    b = cc._fingerprint_from_cpuinfo(text, ["cpuid:2"])
    assert a != b
    # the full fingerprint is stable within one host/process
    assert cc._host_fingerprint() == cc._host_fingerprint()


def test_validate_infer_tta(make_geotiff, tmp_path):
    """general.tta (opt-in eval knob) accepts dihedral subgroup sizes only
    (infer/tiled.py: TTA_SUBGROUPS — the averaged predictor is exactly
    invariant only when the transform set is closed under composition)."""
    raster = make_geotiff("dsm.tif", np.zeros((64, 64), np.float32))
    arch = {"name": "UNet", "input_channels": "geom",
            "settings": {"n_input_channels": 1, "depth": 2, "start_kernel": 4}}
    arch_path = str(tmp_path / "model_config.json")
    io.write_json(arch, arch_path)
    weights_path = str(tmp_path / "weights.npz")
    np.savez(weights_path, dummy=np.zeros(1))
    norm_path = str(tmp_path / "norm.json")
    io.write_json({"mean": None, "std": 1.0}, norm_path)

    def check(value, merge=None):
        general = {"tile_size": 16, "tta": value}
        if merge is not None:
            general["tta_merge"] = merge
        cfg = {
            "datasets": [{"raster_in": raster}],
            "model": {"weights": weights_path, "architecture": arch_path,
                      "normalization_geom": norm_path},
            "general": general,
            "output": {"directory": str(tmp_path / "eval_out")},
        }
        return validate_infer.validate_and_update_cfg_file(cfg, logger).status

    for good in (1, 2, 4, 8):
        assert check(good) is True, good
    for bad in (0, 3, 5, 6, 7, 16, -1, "all", 2.0):
        assert check(bad) is False, bad
    # tta_merge: the per-tile merge of the tta predictions.
    for good_merge in ("mean", "median"):
        assert check(8, merge=good_merge) is True, good_merge
    for bad_merge in ("mode", "max", 1, True):
        assert check(8, merge=bad_merge) is False, bad_merge


def test_validate_train_ema_decay(make_geotiff, tmp_path):
    """training_settings.ema_decay (opt-in weight EMA) accepts numbers in
    [0, 1) only — 1.0 would freeze the EMA at initialisation forever."""
    raster = make_geotiff("dsm.tif", np.zeros((64, 64), np.float32))

    def check(value):
        cfg = {
            "datasets": [{"raster_in": raster, "raster_gt": raster,
                          "area_type": "train+val",
                          "allocation_strategy": "5-crossval_vertical",
                          "test_stripe": 0}],
            "model": {"input_channels": "geom", "depth": 2, "start_kernel": 4},
            "training_settings": {"tile_size": 16, "ema_decay": value},
            "output": {"output_directory": str(tmp_path / "runs")},
        }
        return validate_train.validate_cfg_file(cfg, logger)

    for good in (0, 0.5, 0.999, 0.0):
        assert check(good) is True, good
    for bad in (1.0, 1.5, -0.1, "high", True):
        assert check(bad) is False, bad
