from resdepth_tpu.geo.raster import (
    Raster, dilate_mask, get_raster_extent, load_mask_raster, open_raster,
    write_raster,
)
from resdepth_tpu.geo.grid import create_regular_grid, indices_from_area_defn
from resdepth_tpu.geo.allocation import allocate_data
