#!/usr/bin/env python
"""Export a ResDepth-TPU checkpoint as a reference-compatible .pth file.

Usage:
    python scripts/export_torch.py <checkpoint.npz> <model_config.json> <out.pth>

The resulting file loads directly into the reference PyTorch implementation
(``UNet(**model_config['settings']); load_state_dict(torch.load(out)['model_state_dict'])``).
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    if len(sys.argv) != 4:
        print(__doc__)
        sys.exit(1)
    ckpt_path, arch_path, out_path = sys.argv[1:4]

    import jax

    from resdepth_tpu.config import io as cfg_io
    from resdepth_tpu.models.torch_import import export_checkpoint
    from resdepth_tpu.models.unet import init_unet, unet_config_from_settings
    from resdepth_tpu.train import checkpoint as ckpt_io

    arch = cfg_io.read_json(arch_path)
    config = unet_config_from_settings(arch.settings)
    params, bn_state = init_unet(jax.random.PRNGKey(0), config)
    meta, params, bn_state, _ = ckpt_io.load_checkpoint(
        ckpt_path, params_template=params, bn_template=bn_state)
    export_checkpoint(out_path, params, bn_state, config,
                      epoch=meta.get("epoch", 0),
                      loss_train=meta.get("loss_train"),
                      loss_val=meta.get("loss_val"))
    print(f"Exported {ckpt_path} (epoch {meta.get('epoch')}) -> {out_path}")


if __name__ == "__main__":
    main()
