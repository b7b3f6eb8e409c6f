"""Worker for tests/test_multiprocess.py — runs the fused TRAIN step (or
the sharded tiled INFERENCE) on a mesh over ALL (global) devices and dumps
comparison data to a file.

Invoked as a subprocess:
  python _multiprocess_worker.py <out.json>              # train, 1 process
  python _multiprocess_worker.py <out.json> dist         # train, RESDEPTH_DIST_*
  python _multiprocess_worker.py <out> infer [dist]      # sharded inference:
      WORKER_SCENE_DIR points at GeoTIFFs written by the test; EVERY process
      writes its fetched scene canvas to <out>.p<process_index>.npy (the
      psum'd canvas is replicated, so all must match the 1-process run).
In dist mode the process bootstrap goes through the REAL
``parallel.bootstrap.maybe_initialize_distributed`` env-triggered path.
"""

import json
import os
import sys

os.environ.setdefault("JAX_PLATFORMS", "cpu")
os.environ.pop("PALLAS_AXON_POOL_IPS", None)
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices",
                  int(os.environ.get("WORKER_LOCAL_DEVICES", "8")))

import numpy as np
import jax.numpy as jnp


def run_infer(out_path: str) -> None:
    """Mesh-sharded predict_linear_blend over the GLOBAL device mesh; every
    process dumps its canvas (tta=2 median also exercises the TTA merge
    under the psum — infer/tiled.py:157-167)."""
    from resdepth_tpu.data.dataset import TileDataset
    from resdepth_tpu.infer import predict_linear_blend
    from resdepth_tpu.models.unet import UNetConfig, init_unet
    from resdepth_tpu.parallel.mesh import data_mesh

    scene_dir = os.environ["WORKER_SCENE_DIR"]
    entry = {
        "raster_in": os.path.join(scene_dir, "dsm.tif"),
        "image_list": [os.path.join(scene_dir, f"img{j}.tif")
                       for j in range(3)],
        "image_pairs": [(0, 1)],
        "area_defn": {"x_extent": [(0, 63)], "y_extent": [(0, 47)]},
    }
    ds = TileDataset(entry, input_channels="geom-stereo", tile_size=16,
                     sampling_strategy="test", dsm_std=5.0, ortho_mean=120.0,
                     ortho_std=25.0)
    config = UNetConfig(n_input_channels=3, start_kernel=8,
                        max_filter_depth=16, depth=2)
    params, bn = init_unet(jax.random.PRNGKey(0), config)

    mesh = data_mesh()
    assert len(mesh.devices.flatten()) == 8
    out = predict_linear_blend(config, params, bn, ds, batch_size=2,
                               mesh=mesh, tta=2, tta_merge="median")
    np.save(f"{out_path}.p{jax.process_index()}.npy", np.asarray(out))


def main() -> None:
    out_path = sys.argv[1]
    modes = sys.argv[2:]
    distributed = "dist" in modes

    from resdepth_tpu.parallel.bootstrap import maybe_initialize_distributed

    initialized = maybe_initialize_distributed()
    assert initialized == distributed, (initialized, distributed)

    if "infer" in modes:
        run_infer(out_path)
        return

    from resdepth_tpu.data.pipeline import BatchSpec, DeviceRasters
    from resdepth_tpu.models.unet import UNetConfig, init_unet
    from resdepth_tpu.parallel.mesh import data_mesh
    from resdepth_tpu.train.optim import build_optimizer
    from resdepth_tpu.train.step import init_train_state, make_train_step

    rng = np.random.default_rng(0)
    rows = cols = 64
    gt = rng.normal(400.0, 5.0, (rows, cols)).astype(np.float32)
    rasters = DeviceRasters(
        dsm_input=jnp.asarray(
            gt + rng.normal(0, 1, (rows, cols)).astype(np.float32)),
        dsm_target=jnp.asarray(gt),
        orthos=jnp.asarray(
            rng.normal(120, 25, (3, rows, cols)).astype(np.float32)),
        pairs=jnp.asarray([[0, 1], [1, 2]], jnp.int32),
        nodata=jnp.asarray(-9999.0, jnp.float32))
    config = UNetConfig(n_input_channels=3, start_kernel=8,
                        max_filter_depth=16, depth=2)
    spec = BatchSpec(input_channels="geom-stereo", tile_size=16, dsm_std=5.0,
                     augment=True)
    tx = build_optimizer("Adam", 1e-5)
    params, bn = init_unet(jax.random.PRNGKey(0), config)
    state = init_train_state(params, bn, tx, 2e-4)

    mesh = data_mesh()  # every global device
    assert len(mesh.devices.flatten()) == 8
    step = make_train_step(config, spec, tx, mesh=mesh, donate=False)
    key = jax.random.PRNGKey(0)

    metrics = []
    B = 8
    for k in range(4):
        srng = np.random.default_rng(100 + k)
        pos = srng.integers(0, rows - 16, (B, 2)).astype(np.int32)
        pidx = srng.integers(0, 2, (B,)).astype(np.int32)
        state, m = step(state, rasters, pos, pidx,
                        np.zeros((B, 4), np.int32),
                        np.ones((B,), np.float32), key)
        metrics.append(float(np.asarray(m)))

    leaf_sums = [float(np.asarray(leaf, np.float64).sum())
                 for leaf in jax.tree_util.tree_leaves(state.params)]
    if jax.process_index() == 0:
        with open(out_path, "w") as f:
            json.dump({"metrics": metrics, "leaf_sums": leaf_sums,
                       "process_count": jax.process_count(),
                       "global_devices": jax.device_count()}, f)


if __name__ == "__main__":
    main()
