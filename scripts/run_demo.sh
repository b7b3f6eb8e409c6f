#!/usr/bin/env bash
# End-to-end demo: synthesize a scene, train briefly, run tiled inference +
# evaluation against the generated ground truth + masks.
#
# Usage: run_demo.sh [demo_dir] [--cpu]
#   --cpu  run on a hermetic 8-virtual-device host-CPU mesh (no TPU needed;
#          also useful when the device tunnel is down)
set -euo pipefail
cd "$(dirname "$0")/.."

DEMO_DIR="demo"
for arg in "$@"; do
  case "$arg" in
    --cpu)
      export JAX_PLATFORMS=cpu
      export XLA_FLAGS="--xla_force_host_platform_device_count=8"
      unset PALLAS_AXON_POOL_IPS || true
      ;;
    *) DEMO_DIR="$arg" ;;
  esac
done

python scripts/make_demo_data.py "$DEMO_DIR"
python train.py "$DEMO_DIR/config_train.json"

RUN_DIR=$(ls -dt "$DEMO_DIR"/runs/*/ | head -1)
python - "$DEMO_DIR" "$RUN_DIR" <<'EOF'
import json, sys, os
demo_dir, run_dir = sys.argv[1], sys.argv[2].rstrip("/")
cfg_path = os.path.join(demo_dir, "config_test.json")
cfg = json.load(open(cfg_path))
cfg["model"] = {
    "weights": os.path.join(run_dir, "checkpoints", "Model_best.npz"),
    "architecture": os.path.join(run_dir, "model_config.json"),
    "normalization_geom": os.path.join(run_dir, "DSM_normalization_parameters.p"),
    "normalization_image": os.path.join(run_dir, "Image_normalization_parameters.p"),
}
json.dump(cfg, open(cfg_path, "w"), indent=2)
print("wired inference config to", run_dir)
EOF

python test.py "$DEMO_DIR/config_test.json"
echo "Demo complete. Outputs in $DEMO_DIR/eval/"
