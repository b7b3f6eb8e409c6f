#!/usr/bin/env python
"""Regenerate the committed demo goldens (tests/goldens/).

Runs the full CLI pipeline (train.py -> test.py) on the deterministic golden
scene under the SAME backend configuration the test suite uses (XLA host
platform, 8 virtual devices) and copies the refined-DSM GeoTIFF + statistics
report into tests/goldens/. tests/test_demo_goldens.py re-runs the pipeline
and asserts <=1e-4 m agreement — the rebuild's equivalent of the reference's
demo/results_expected regression artifacts (README.md:535-539).

Usage:  python scripts/make_demo_goldens.py
"""

from __future__ import annotations

import glob
import os
import shutil
import subprocess
import sys
import tempfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
GOLDEN_DIR = os.path.join(REPO, "tests", "goldens")


def hermetic_env(n_devices: int = 8) -> dict:
    sys.path.insert(0, REPO)
    from resdepth_tpu.utils.hermetic import host_cpu_env

    env = host_cpu_env(n_devices)
    env["PYTHONPATH"] = REPO
    return env


def run_golden_pipeline(work_dir: str, env: dict | None = None) -> dict:
    """Train + infer on the golden scene; returns output artifact paths."""
    sys.path.insert(0, os.path.join(REPO, "scripts"))
    from make_demo_data import fill_golden_test_config, write_golden_scene

    cfgs = write_golden_scene(work_dir)
    env = env or hermetic_env()

    subprocess.run([sys.executable, os.path.join(REPO, "train.py"),
                    cfgs["train"]], env=env, check=True,
                   stdout=subprocess.DEVNULL, stderr=subprocess.DEVNULL)
    run_dir = max(glob.glob(os.path.join(cfgs["out"], "runs", "*")),
                  key=os.path.getmtime)
    fill_golden_test_config(cfgs["test"], run_dir)
    subprocess.run([sys.executable, os.path.join(REPO, "test.py"),
                    cfgs["test"]], env=env, check=True,
                   stdout=subprocess.DEVNULL, stderr=subprocess.DEVNULL)

    pair_dir = os.path.join(cfgs["out"], "eval", "golden_city",
                            "Stereopair_0_1")
    return {
        "prediction": os.path.join(
            pair_dir, "initial_DSM_prediction_test_area.tif"),
        "statistics": os.path.join(
            pair_dir, "initial_DSM_prediction_test_area_statistics.txt"),
        "run_dir": run_dir,
    }


def main() -> None:
    os.makedirs(GOLDEN_DIR, exist_ok=True)
    with tempfile.TemporaryDirectory() as work:
        outputs = run_golden_pipeline(work)
        pred = outputs["prediction"]
        stats = outputs["statistics"]
        if not os.path.exists(pred):
            # artifact name derives from the input raster filename
            pair_dir = os.path.dirname(pred)
            candidates = glob.glob(os.path.join(
                pair_dir, "*_prediction_test_area.tif"))
            if not candidates:
                raise FileNotFoundError(
                    f"no refined-DSM artifact under {pair_dir}; contents: "
                    f"{sorted(os.listdir(pair_dir)) if os.path.isdir(pair_dir) else 'missing dir'}")
            pred = candidates[0]
            stats = pred.replace(".tif", "_statistics.txt")
        shutil.copy(pred, os.path.join(GOLDEN_DIR, "demo_refined_dsm.tif"))
        shutil.copy(stats, os.path.join(GOLDEN_DIR, "demo_statistics.txt"))
    print(f"Goldens written to {GOLDEN_DIR}")


if __name__ == "__main__":
    main()
