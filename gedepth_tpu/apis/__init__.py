from gedepth_tpu.apis.inference import init_depther, inference_depther
