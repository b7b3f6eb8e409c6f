"""Convergence study: train 400 steps at {high, default, bf16} and compare
refined-scene quality (all evaluated at f32 inference)."""
import sys, os, time, tempfile
import numpy as np
import jax, jax.numpy as jnp
from resdepth_tpu.utils import compilation_cache
compilation_cache.enable()
from resdepth_tpu.data.dataset import TileDataset
from resdepth_tpu.data.pipeline import batch_spec_for, device_put_dataset
from resdepth_tpu.geo import tiff
from resdepth_tpu.geo.allocation import entire_area_defn
from resdepth_tpu.infer.tiled import predict_linear_blend
from resdepth_tpu.models.unet import flagship_config, init_unet
from resdepth_tpu.train.optim import build_optimizer
from resdepth_tpu.train.step import init_train_state, make_train_step
from scripts.make_demo_data import hillshade, synth_city

rows, cols = 512, 768
gt, dsm_in, building, water = synth_city(rows, cols, seed=3)
views = np.stack([hillshade(gt, az) for az in (315.0, 135.0, 45.0)], -1)

tmp = tempfile.mkdtemp(prefix="convstudy_")
geot = (1000.0, 0.25, 0.0, 2000.0, 0.0, -0.25)
def w(name, data):
    p = os.path.join(tmp, name); tiff.write(p, data, geotransform=geot, nodata=-9999.0); return p
p_in = w("dsm.tif", dsm_in); w("gt.tif", gt)
vp = [w(f"o{j}.tif", views[..., j]) for j in range(3)]
dataset = {"name": "s", "raster_in": p_in, "raster_gt": os.path.join(tmp, "gt.tif"),
           "image_list": vp, "image_pairs": [(0, 1), (1, 2)],
           "area_defn": entire_area_defn(p_in), "n_samples": 4000}
sigma = float(np.std(dsm_in - dsm_in.mean()))
train_ds = TileDataset(dataset, "geom-stereo", 256, "train", dsm_std=sigma,
                       ortho_mean=float(views.mean()), ortho_std=float(views.std()),
                       use_all_stereo_pairs=True, augment=True, seed=0)
config = flagship_config("geom-stereo")
spec = batch_spec_for(train_ds, transform_dsm=True, transform_orthos=True, augment=True)
rasters = device_put_dataset(train_ds)
test_ds = TileDataset(dict(dataset, image_pairs=[(0, 1)]), "geom-stereo", 256,
                      "test", dsm_std=sigma, ortho_mean=float(views.mean()),
                      ortho_std=float(views.std()), seed=0)
valid = gt != -9999.0
K, B = 8, 20

for mode in sys.argv[1:] or ("high", "default", "bf16"):
    kw = dict(mesh=None, donate=True, steps_per_call=K, weighted_bn=False)
    if mode == "default":
        kw["precision"] = jax.lax.Precision.DEFAULT
    elif mode == "bf16":
        kw["compute_dtype"] = jnp.bfloat16
    tx = build_optimizer("Adam", 1e-5)
    params, bn = init_unet(jax.random.PRNGKey(0), config)
    state = init_train_state(params, bn, tx, 2e-4)
    step = make_train_step(config, spec, tx, **kw)
    key = jax.random.PRNGKey(0)
    rng = np.random.default_rng(3)
    t0 = time.perf_counter(); last = None
    for c in range(50):
        pos = np.stack([rng.integers(0, rows - 256, (K, B)),
                        rng.integers(0, cols - 256, (K, B))], -1).astype(np.int32)
        pidx = rng.integers(0, 2, (K, B)).astype(np.int32)
        state, m = step(state, rasters, pos, pidx, np.zeros((K, B, 4), np.int32),
                        np.ones((K, B), np.float32), key)
        last = float(np.asarray(m)[-1])
    dt = time.perf_counter() - t0
    pred = predict_linear_blend(config, state.params, state.bn_state, test_ds,
                                batch_size=128, compute_dtype=jnp.float32)
    mae = float(np.abs(pred - gt)[valid].mean())
    print(f"[{mode:8s}] 400 steps in {dt:5.0f}s | final train MAE {last:.4f} m "
          f"| refined-scene MAE (f32 eval) {mae:.4f} m", flush=True)
