"""Committed-goldens regression: full CLI pipeline vs tests/goldens/.

The reference ships expected demo outputs for regression comparison
(demo/results_expected, README.md:535-539, scripts/download_demo.sh). Here
the golden scene is procedurally generated (seeded), the pipeline runs
train.py -> test.py end to end, and the refined-DSM GeoTIFF must agree with
the committed golden to 1e-4 m. Regenerate via scripts/make_demo_goldens.py
after an INTENTIONAL behaviour change.
"""

import os
import re
import sys

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
GOLDEN_DIR = os.path.join(REPO, "tests", "goldens")

sys.path.insert(0, os.path.join(REPO, "scripts"))


def _stat_numbers(text: str) -> list:
    """Numeric payload of a statistics report, skipping path header lines."""
    numbers = []
    for line in text.splitlines():
        if ":" not in line or "/" in line:
            continue
        numbers.extend(float(v) for v in re.findall(r"-?\d+\.\d+", line))
    return numbers


@pytest.mark.skipif(not os.path.exists(os.path.join(GOLDEN_DIR,
                                                    "demo_refined_dsm.tif")),
                    reason="goldens not generated")
def test_pipeline_matches_committed_goldens(tmp_path):
    from make_demo_goldens import run_golden_pipeline

    from resdepth_tpu.geo.raster import open_raster

    outputs = run_golden_pipeline(str(tmp_path))
    assert os.path.exists(outputs["prediction"]), outputs["prediction"]

    got = open_raster(outputs["prediction"])
    want = open_raster(os.path.join(GOLDEN_DIR, "demo_refined_dsm.tif"))
    np.testing.assert_allclose(got.band(1), want.band(1), rtol=0, atol=1e-4)
    assert got.geotransform == want.geotransform
    assert got.nodata == want.nodata

    got_stats = _stat_numbers(open(outputs["statistics"]).read())
    want_stats = _stat_numbers(
        open(os.path.join(GOLDEN_DIR, "demo_statistics.txt")).read())
    np.testing.assert_allclose(got_stats, want_stats, rtol=0, atol=5e-3)
