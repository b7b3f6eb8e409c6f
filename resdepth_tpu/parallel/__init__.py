from resdepth_tpu.parallel.mesh import data_mesh, device_count
