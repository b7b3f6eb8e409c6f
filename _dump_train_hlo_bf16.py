import re
import numpy as np
import jax, jax.numpy as jnp
from resdepth_tpu.utils import compilation_cache
compilation_cache.enable()
from resdepth_tpu.data.pipeline import BatchSpec, DeviceRasters
from resdepth_tpu.models.unet import flagship_config, init_unet
from resdepth_tpu.train.optim import build_optimizer
from resdepth_tpu.train.step import init_train_state, make_train_step

rng = np.random.default_rng(0)
rows = cols = 512
K, B, TILE = 8, 20, 256
gt = rng.normal(400.0, 5.0, (rows, cols)).astype(np.float32)
rasters = DeviceRasters(
    dsm_input=jnp.asarray(gt),
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
step = make_train_step(config, spec, tx, mesh=None, donate=False,
                       steps_per_call=K, compute_dtype=jnp.bfloat16,
                       weighted_bn=False)
pos = np.zeros((K, B, 2), np.int32)
pidx = np.zeros((K, B), np.int32)
txt = step.lower(state, rasters, pos, pidx, np.zeros((K, B, 4), np.int32),
                 np.ones((K, B), np.float32),
                 jax.random.PRNGKey(0)).compile().as_text()
open("/tmp/train_hlo_bf16.txt", "w").write(txt)
print(len(txt))
for w in ["fusion.644 ", "fusion.634 ", "fusion.622 ", "add_add_fusion.36",
          "reverse.34", "select-and-scatter.44", "multiply_subtract_fusion.131",
          "convert_reduce_fusion.48", "fusion.607 ", "fusion.623 ", "fusion.643 ",
          "fusion.633 "]:
    m = re.search(r"^\s*%?" + re.escape(w.strip()) + r" = .*$", txt, re.M)
    print("\n---", w, "---")
    print(m.group(0)[:260] if m else "NOT FOUND")
