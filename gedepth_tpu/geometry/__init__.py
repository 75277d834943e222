from gedepth_tpu.geometry.plane import (
    plane_embedding_from_projection,
    kitti_plane_embedding,
    ddad_plane_embedding,
    slope_bin_gt,
    slope_to_pe_offset,
    sanitize_pe_raw,
    SLOPE_BIN_CENTERS_DEG,
    SLOPE_IGNORE_INDEX,
    NUM_SLOPE_BINS,
)
from gedepth_tpu.geometry.calib import (
    parse_kitti_calib,
    kitti_projection_matrix,
    KITTI_CAM_INTRINSICS_4COL,
    KITTI_CAM_INTRINSICS_3x3,
    KITTI_CAMERA_HEIGHT,
    DDAD_CAMERA_HEIGHTS,
)
