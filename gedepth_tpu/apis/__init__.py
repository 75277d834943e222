from gedepth_tpu.apis.inference import init_depther, inference_depther
from gedepth_tpu.apis.export import (export_depther, save_exported,
                                     load_exported, ServingModel)
