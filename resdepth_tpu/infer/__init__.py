from resdepth_tpu.infer.tiled import predict_linear_blend
