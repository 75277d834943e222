"""Ground-plane ("plane embedding", PE) geometry.

The ground-embedding subsystem precomputes, per camera, the analytic depth of
the flat ground plane at every pixel: assuming the world ground plane sits at
height ``camera_height`` below the sensor origin, each pixel ray intersects it
at a closed-form depth.  That per-pixel prior ("PE") is fed to the network as
an extra input channel and fused into the predicted depth.

The adaptive ("dynamic") variant discretises the residual ground *slope* into
11 one-degree bins spanning [-5°, +5°]; the network predicts a distribution
over those bins and the prior is re-derived from the expected slope via
``slope_to_pe_offset``.

Math parity targets (behavior verified against the reference implementation):
  * KITTI PE precompute: /root/reference/tools/preprocess_data_kitti.py:47-56
  * DDAD PE precompute:  /root/reference/tools/preprocess_data_ddad.py:35-44
  * slope-bin GT:        preprocess_data_kitti.py:59-93 (round) and
                         preprocess_data_ddad.py:47-84 (int truncation)
  * slope->offset:       depth/models/depther/encoder_decoder.py:79-102

All functions here are pure numpy (offline preprocessing) or pure jnp
(in-model math) with no framework state.
"""
from __future__ import annotations

import numpy as np

NUM_SLOPE_BINS = 11
SLOPE_IGNORE_INDEX = 255
# Bin centers in degrees: -5, -4, ..., +5.
SLOPE_BIN_CENTERS_DEG = np.linspace(-5.0, 5.0, NUM_SLOPE_BINS).astype(np.float32)


def plane_embedding_from_projection(A: np.ndarray,
                                    height: int,
                                    width: int,
                                    camera_height: float = 0.0) -> np.ndarray:
    """Analytic ground-plane depth for each pixel of an (height, width) image.

    Args:
      A: (3, 4) projection matrix mapping homogeneous *world/lidar* points to
        image coordinates (e.g. ``P2 @ R0_rect @ Tr_velo_to_cam`` for KITTI or
        ``K @ inv(cam_pose) @ lidar_pose`` for DDAD, top 3 rows).
      height, width: image size in pixels.
      camera_height: subtracted from the plane offset along the world z axis.
        KITTI uses 1.65 (the velodyne sits ~1.73m up but the reference uses
        1.65m as the camera height above ground); DDAD bakes the height into
        the lidar pose and passes 0.

    Returns:
      (height, width) float64 array of ground-plane depths. Values can be
      negative or huge above the horizon line; callers clip.

    Derivation: a lidar-frame point X on the ground plane has X_z = h' (the
    plane height in the lidar frame). Projecting x = A @ [X, 1] and solving
    for the camera-frame depth of the ray through pixel (u, v) that hits the
    plane yields depth = (RT_z - camera_height) / (R^-1[2] . [u, v, 1]) with
    R = A[:3,:3], T = A[:3,3], RT = R^-1 @ T.
    """
    A = np.asarray(A, dtype=np.float64)
    R_inv = np.linalg.inv(A[:3, :3])
    T = A[:3, 3]
    RT = R_inv @ T
    u, v = np.meshgrid(np.arange(width), np.arange(height), indexing="xy")
    denom = R_inv[2, 0] * u + R_inv[2, 1] * v + R_inv[2, 2]
    return (RT[2] - camera_height) / denom


def kitti_plane_embedding(A: np.ndarray,
                          height: int,
                          width: int,
                          camera_height: float = 1.65) -> np.ndarray:
    """KITTI PE: A = P2 @ R0_rect @ Tr_velo_to_cam, offset by camera height."""
    return plane_embedding_from_projection(A, height, width, camera_height)


def ddad_plane_embedding(K: np.ndarray,
                         cam_pose: np.ndarray,
                         lidar_pose: np.ndarray,
                         height: int,
                         width: int) -> np.ndarray:
    """DDAD PE: A = K4 @ inv(cam_pose) @ lidar_pose; no extra height offset.

    K is the 3x3 camera intrinsics; poses are 4x4 homogeneous transforms.
    """
    K4 = np.eye(4, dtype=np.float64)
    K4[:3, :3] = np.asarray(K, dtype=np.float64)
    A = K4 @ np.linalg.inv(np.asarray(cam_pose, dtype=np.float64)) @ np.asarray(
        lidar_pose, dtype=np.float64)
    return plane_embedding_from_projection(A[:3, :4], height, width, 0.0)


def slope_bin_gt(gt_depth: np.ndarray,
                 pe: np.ndarray,
                 camera_height: float = 1.65,
                 rounding: str = "round") -> np.ndarray:
    """Per-pixel ground-slope ground truth, in *signed degrees* [-5, 5].

    k(u,v) = angle such that tilting the ground plane by k degrees moves the
    plane prior from pe to gt: tan(k) = h/gt - h/pe.

    Args:
      gt_depth: (H, W) metric GT depth, 0 = no measurement.
      pe: (H, W) raw (unclipped) plane embedding from the precompute.
      camera_height: same h used for the PE precompute.
      rounding: 'round' (KITTI reference: np.around) or 'trunc' (DDAD
        reference: .astype(int64)).

    Returns:
      (H, W) float32, values in {-5..5} plus SLOPE_IGNORE_INDEX (255) where
      gt_depth == 0.
    """
    gt = np.asarray(gt_depth, dtype=np.float64)
    pe = np.asarray(pe, dtype=np.float64)
    invalid = gt == 0
    with np.errstate(divide="ignore", invalid="ignore"):
        k = camera_height / gt - camera_height / pe
    k = np.rad2deg(np.arctan(k))
    if rounding == "round":
        k = np.around(k)
    elif rounding == "trunc":
        # NaNs cannot be truncated to int; they only occur where gt == 0,
        # which is overwritten with the ignore index below.
        k = np.where(invalid, 0.0, k)
        k = k.astype(np.int64).astype(np.float64)
    else:
        raise ValueError(f"unknown rounding {rounding!r}")
    k = np.clip(k, -5, 5)
    k = np.where(invalid, float(SLOPE_IGNORE_INDEX), k)
    return k.astype(np.float32)


def slope_gt_to_class(k_img: np.ndarray) -> np.ndarray:
    """Shift signed-degree slope GT (-5..5, 255=ignore) to class ids 0..10.

    Mirrors the load-time shift (reference loading.py:146-150): +5, and the
    shifted ignore value 260 maps back to 255.
    """
    k = np.asarray(k_img, dtype=np.float32) + 5.0
    k = np.where(k == float(SLOPE_IGNORE_INDEX) + 5.0, float(SLOPE_IGNORE_INDEX), k)
    return k


def slope_to_pe_offset(pe_comput, slope_tan, camera_height, depth_scale):
    """Re-derive the plane prior from a (possibly soft) predicted slope.

    Works on numpy or jax arrays (uses only ufuncs). Matches the reference
    in-model math (encoder_decoder.py:95-100):

      a = -h / (pe + 1e-8)
      offset = -h / (a - tan_k + 1e-8)
      offset is zeroed outside (0, depth_scale].

    Args:
      pe_comput: raw plane embedding (any shape).
      slope_tan: tan(slope) in the same shape (broadcastable).
      camera_height: scalar or broadcastable array (per-sample for DDAD).
      depth_scale: upper clip bound (200 KITTI, 250 DDAD).

    Returns:
      (offset, valid) where offset is the re-derived prior with invalid
      regions zeroed and valid is the 0/1 mask.
    """
    a = -camera_height / (pe_comput + 1e-8)
    offset = -camera_height / ((a - slope_tan) + 1e-8)
    valid = (offset > 0) & (offset <= depth_scale)
    valid = valid.astype(offset.dtype)
    return offset * valid, valid


def sanitize_pe_raw(pe: np.ndarray, bound: float = 1e6) -> np.ndarray:
    """Make the raw plane embedding finite: the analytic plane depth diverges
    (+-inf) on the horizon line where the ray is parallel to the ground; any
    non-finite or out-of-bound value is far outside the (0, depth_scale]
    validity window anyway, so clamping to +-bound (and NaN -> 0) is exact
    for the downstream offset math while keeping the tensor NaN-free for
    interpolation."""
    pe = np.asarray(pe, dtype=np.float32)
    return np.nan_to_num(pe, nan=0.0, posinf=bound, neginf=-bound).clip(
        -bound, bound)


def clip_pe_for_input(pe: np.ndarray, max_value: float = 200.0) -> np.ndarray:
    """Input-channel PE: clip the raw plane embedding to [0, max_value].

    Values above max_value or below 0 are zeroed (reference loading.py:397-403).
    """
    pe = np.asarray(pe, dtype=np.float32).copy()
    pe[pe > max_value] = 0
    pe[pe < 0] = 0
    return pe
