"""Profile the fused train step (DEFAULT precision) on the TPU."""
import time, glob
import numpy as np
import jax, jax.numpy as jnp
from resdepth_tpu.data.pipeline import BatchSpec, DeviceRasters
from resdepth_tpu.models.unet import flagship_config, init_unet
from resdepth_tpu.train.optim import build_optimizer
from resdepth_tpu.train.step import init_train_state, make_train_step

rng = np.random.default_rng(0)
rows = cols = 512
import os as _os
K, B, TILE = int(_os.environ.get('K', 8)), 20, 256
gt = rng.normal(400.0, 5.0, (rows, cols)).astype(np.float32)
rasters = DeviceRasters(
    dsm_input=jnp.asarray(gt + rng.normal(0, 1, (rows, cols)).astype(np.float32)),
    dsm_target=jnp.asarray(gt),
    orthos=jnp.asarray(rng.normal(120, 25, (3, rows, cols)).astype(np.float32)),
    pairs=jnp.asarray([[0, 1], [0, 2]], jnp.int32),
    nodata=jnp.asarray(-9999.0, jnp.float32))
config = flagship_config("geom-stereo")
spec = BatchSpec(input_channels="geom-stereo", tile_size=TILE, dsm_std=5.0,
                 augment=True)
tx = build_optimizer("Adam", 1e-5)
params, bn = init_unet(jax.random.PRNGKey(0), config)
state = init_train_state(params, bn, tx, 2e-4)
import sys
mode = sys.argv[1] if len(sys.argv) > 1 else "default"
kw = dict(mesh=None, donate=True, steps_per_call=K, weighted_bn=False)
if mode == "default":
    kw["precision"] = jax.lax.Precision.DEFAULT
elif mode == "bf16":
    kw["compute_dtype"] = jnp.bfloat16
elif mode == "high":
    pass
step = make_train_step(config, spec, tx, **kw)
key = jax.random.PRNGKey(0)

def window(state):
    pos = np.stack([rng.integers(0, rows - TILE, (K, B)),
                    rng.integers(0, cols - TILE, (K, B))], -1).astype(np.int32)
    pidx = rng.integers(0, 2, (K, B)).astype(np.int32)
    t0 = time.perf_counter()
    state, m = step(state, rasters, pos, pidx,
                    np.zeros((K, B, 4), np.int32),
                    np.ones((K, B), np.float32), key)
    assert np.isfinite(float(np.asarray(m)[-1]))
    return state, time.perf_counter() - t0

state, compile_t = window(state)
times = []
for _ in range(4):
    state, dt = window(state)
    times.append(dt)
print(f"{K*B/min(times):.0f} samples/sec ({mode}, K={K}, compile {compile_t:.0f}s)")

import os
if os.environ.get("TRACE"):
  with jax.profiler.trace("/tmp/trace_train"):
    for _ in range(2):
        state, dt = window(state)
  print(sorted(glob.glob("/tmp/trace_train/**/*.trace.json.gz", recursive=True)))
