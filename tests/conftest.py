"""Test configuration: run JAX on a virtual 8-device CPU mesh.

Multi-chip hardware is not available in CI; sharding logic is validated on
XLA's host platform with 8 virtual devices (the same mechanism the driver's
dry-run uses).
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (_flags + " --xla_force_host_platform_device_count=8").strip()

import numpy as np
import pytest

from resdepth_tpu.geo import tiff


@pytest.fixture
def make_geotiff(tmp_path):
    """Factory fixture: write a synthetic GeoTIFF and return its path."""

    def _make(name, data, *, gsd=0.25, origin=(1000.0, 2000.0), nodata=-9999.0,
              compress="deflate"):
        path = str(tmp_path / name)
        geotransform = (origin[0], gsd, 0.0, origin[1], 0.0, -gsd)
        tiff.write(path, np.asarray(data), geotransform=geotransform,
                   nodata=nodata, compress=compress)
        return path

    return _make
