from gedepth_tpu.ops.resize import resize_bilinear, resize_nearest
