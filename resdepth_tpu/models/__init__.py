from resdepth_tpu.models.unet import UNetConfig, apply_unet, init_unet, unet_config_from_settings
