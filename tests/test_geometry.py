"""Golden tests for the ground-plane geometry core.

The PE formulas are checked against small hand-computed cases and against an
independent ray-plane-intersection derivation, not against reference outputs
(no dataset is mounted); the algebra is identical to the reference scripts.
"""
import numpy as np
import pytest

from gedepth_tpu.geometry import (
    plane_embedding_from_projection,
    kitti_plane_embedding,
    ddad_plane_embedding,
    slope_bin_gt,
    slope_to_pe_offset,
    SLOPE_IGNORE_INDEX,
)
from gedepth_tpu.geometry.plane import slope_gt_to_class, clip_pe_for_input


def _pinhole_A(fx=700.0, fy=700.0, cx=16.0, cy=12.0):
    """Projection for a camera whose frame IS the world frame (R=I, T=0),
    with the world z axis pointing up and camera looking along +Z... For the
    test we instead emulate the KITTI layout: A maps lidar coords with z-up.
    Use a simple axis permutation lidar(x fwd, y left, z up) -> cam(z fwd,
    x right, y down)."""
    K = np.array([[fx, 0, cx], [0, fy, cy], [0, 0, 1.0]])
    # lidar->cam rotation: cam_x = -lidar_y, cam_y = -lidar_z, cam_z = lidar_x
    R = np.array([[0, -1, 0], [0, 0, -1], [1, 0, 0]], dtype=np.float64)
    Rt = np.concatenate([R, np.zeros((3, 1))], axis=1)  # no translation
    return K @ Rt


def test_plane_embedding_matches_ray_intersection():
    """PE(u,v) must equal the z-depth where the pixel ray meets the plane."""
    A = _pinhole_A()
    h = 1.65
    H, W = 24, 32
    pe = plane_embedding_from_projection(A, H, W, camera_height=h)

    # Independent check: ray through pixel (u, v) in cam frame is
    # d = K^-1 [u, v, 1]; in lidar frame dir = R^T d; plane lidar_z = -h
    # (ground is h below the sensor). Depth along cam z = lidar x component.
    K = np.array([[700.0, 0, 16.0], [0, 700.0, 12.0], [0, 0, 1.0]])
    R = np.array([[0, -1, 0], [0, 0, -1], [1, 0, 0]], dtype=np.float64)
    Kinv = np.linalg.inv(K)
    for (u, v) in [(0, 20), (31, 23), (16, 18)]:
        d_cam = Kinv @ np.array([u, v, 1.0])
        d_lidar = R.T @ d_cam
        if abs(d_lidar[2]) < 1e-9:
            continue
        t = -h / d_lidar[2]  # lidar_z(t) = t * d_lidar_z == -h
        depth = t * d_cam[2]  # camera z depth = t (d_cam z-comp is 1 scaled)
        assert pe[v, u] == pytest.approx(depth, rel=1e-9)


def test_plane_embedding_negative_above_horizon():
    A = _pinhole_A()
    pe = plane_embedding_from_projection(A, 24, 32, camera_height=1.65)
    # Pixels above the principal point look upward -> negative plane depth.
    assert pe[0, 16] < 0
    # Pixels near the bottom look down -> positive, closer than the horizon.
    assert pe[23, 16] > 0
    assert pe[23, 16] < pe[13, 16] or pe[13, 16] < 0


def test_kitti_vs_generic_offset():
    A = _pinhole_A()
    pe_k = kitti_plane_embedding(A, 8, 8, camera_height=1.65)
    pe_0 = plane_embedding_from_projection(A, 8, 8, camera_height=0.0)
    assert not np.allclose(pe_k, pe_0)


def test_ddad_plane_embedding_identity_poses():
    K = np.array([[500.0, 0, 8.0], [0, 500.0, 6.0], [0, 0, 1.0]])
    cam_pose = np.eye(4)
    lidar_pose = np.eye(4)
    lidar_pose[2, 3] = 1.5  # lidar sits 1.5 m above ground origin
    pe = ddad_plane_embedding(K, cam_pose, lidar_pose, 12, 16)
    assert pe.shape == (12, 16)
    assert np.isfinite(pe).all()


def test_slope_bin_gt_round_and_ignore():
    pe = np.full((2, 3), 10.0)
    gt = np.array([[10.0, 20.0, 0.0],
                   [5.0, 10.0, 10.0]])
    h = 1.65
    k = slope_bin_gt(gt, pe, camera_height=h, rounding="round")
    # gt == pe -> slope 0
    assert k[0, 0] == 0
    assert k[1, 1] == 0
    # gt == 0 -> ignore
    assert k[0, 2] == SLOPE_IGNORE_INDEX
    # hand value: arctan(h/5 - h/10) = arctan(0.165) = 9.37deg -> clips to 5
    assert k[1, 0] == 5
    # arctan(h/20 - h/10) = arctan(-0.0825) = -4.72deg -> rounds to -5
    assert k[0, 1] == -5


def test_slope_bin_gt_trunc_matches_int_cast():
    pe = np.full((1, 1), 30.0)
    gt = np.full((1, 1), 20.0)
    h = 1.56
    raw = np.rad2deg(np.arctan(h / 20.0 - h / 30.0))
    k = slope_bin_gt(gt, pe, camera_height=h, rounding="trunc")
    assert k[0, 0] == float(int(raw))


def test_slope_class_shift():
    k = np.array([[-5.0, 0.0, 5.0, 255.0]])
    cls = slope_gt_to_class(k)
    assert list(cls[0]) == [0.0, 5.0, 10.0, 255.0]


def test_slope_to_pe_offset_zero_slope_recovers_pe():
    pe = np.array([5.0, 20.0, 199.0, 300.0, -4.0])
    off, valid = slope_to_pe_offset(pe, np.zeros_like(pe), 1.65, 200.0)
    # zero slope -> offset == pe (within the 1e-8 regularisers)
    np.testing.assert_allclose(off[:3], pe[:3], rtol=1e-5)
    # out-of-range (>200) and negative PE are zeroed
    assert off[3] == 0 and valid[3] == 0
    assert off[4] == 0 and valid[4] == 0


def test_slope_to_pe_offset_positive_slope_decreases_depth():
    """k = h/gt - h/pe, so positive slope means ground closer than the prior:
    the re-derived offset must satisfy h/off = h/pe + tan_k (off < pe)."""
    pe = np.array([20.0])
    tan_k = np.array([np.tan(np.deg2rad(2.0))])
    off, _ = slope_to_pe_offset(pe, tan_k, 1.65, 200.0)
    assert off[0] < 20.0
    lhs = 1.65 / off[0]
    rhs = 1.65 / 20.0 + tan_k[0]
    np.testing.assert_allclose(lhs, rhs, rtol=1e-4)


def test_clip_pe_for_input():
    pe = np.array([-3.0, 5.0, 250.0])
    out = clip_pe_for_input(pe, 200.0)
    assert list(out) == [0.0, 5.0, 0.0]


def test_roundtrip_slope_gt_offset():
    """slope_bin_gt followed by slope_to_pe_offset approximately recovers gt
    depth (up to 1-degree quantisation)."""
    # Wide-angle toy camera so ground pixels land at sane depths.
    A = _pinhole_A(fx=40.0, fy=40.0, cx=32.0, cy=20.0)
    h = 1.65
    pe = plane_embedding_from_projection(A, 48, 64, camera_height=h)
    region = (pe > 1.0) & (pe < 80.0)
    gt = np.where(region, pe * 1.05, 0.0)  # ground 5% further than the prior
    k_img = slope_bin_gt(gt, pe, camera_height=h)
    valid = k_img != SLOPE_IGNORE_INDEX
    tan_k = np.tan(np.deg2rad(np.where(valid, k_img, 0.0)))
    off, ok = slope_to_pe_offset(pe, tan_k, h, 200.0)
    sel = valid & (ok > 0) & region
    assert sel.sum() > 10
    rel_err = np.abs(off[sel] - gt[sel]) / gt[sel]
    # 1-degree bins limit precision; typical error well under 20%.
    assert np.median(rel_err) < 0.2
