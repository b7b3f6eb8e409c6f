"""Test configuration: run JAX on a virtual 8-device CPU mesh.

The container's sitecustomize registers the axon TPU plugin at interpreter
startup and pins JAX to the tunneled TPU regardless of in-process env
changes. Tests must be hermetic and multi-device (sharding logic is
validated on XLA's host platform with 8 virtual devices — the same mechanism
the driver's dry-run uses), so the first conftest import re-execs pytest with
a scrubbed environment.
"""

import jax

# Must run before any backend initialisation: the sitecustomize pins
# jax_platforms to the axon TPU plugin; these config updates supersede it.
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 8)

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
