from gedepth_tpu.utils.native import (
    native_lib, hough_forward_cpu, hough_backward_cpu, decode_depth_png16,
)
from gedepth_tpu.utils.color_depth import colorize_depth
from gedepth_tpu.utils.env import collect_env
