from resdepth_tpu.infer.tiled import (predict_linear_blend,
                                      predict_linear_blend_scene_sharded,
                                      predict_linear_blend_streaming)
