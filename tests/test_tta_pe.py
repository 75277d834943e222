"""Exact PE resampling for multi-scale TTA (VERDICT r3 missing #5).

The analytic ground-plane prior pe(u, v) = c / (a·u + b·v + d)
(geometry/plane.py plane_embedding_from_projection) has an AFFINE inverse,
so interpolating 1/pe is exact under any bilinear coordinate remap while
interpolating pe itself smears the horizon divergence. These tests pin:

  1. resize_pe_exact reproduces the analytic plane depth at the remapped
     coordinates (and beats the naive direct resize near the horizon);
  2. resize_img5_scaled recomputes the clipped/normalised PE input channel
     from the resampled raw PE with the load-time rule
     (clip_pe_for_input + Normalize, reference loading.py:397-403).
"""
import numpy as np
import jax.numpy as jnp

from gedepth_tpu.geometry.plane import sanitize_pe_raw
from gedepth_tpu.ops.resize import resize_bilinear
from gedepth_tpu.train.steps import resize_pe_exact, resize_img5_scaled

CAMERA_HEIGHT = 1.65


def _projection_with_horizon():
    """K @ [R | t] mapping a z-up (lidar-style) world frame to a camera
    (z-forward, y-down) with a slight pitch, so the horizon line (where the
    plane depth diverges, near v = cy) falls inside the test image."""
    K = np.array([[7.2e2, 0.0, 160.0],
                  [0.0, 7.2e2, 40.0],
                  [0.0, 0.0, 1.0]])
    # canonical lidar->camera axis swap (x-fwd/z-up -> z-fwd/y-down)
    R0 = np.array([[0.0, -1.0, 0.0],
                   [0.0, 0.0, -1.0],
                   [1.0, 0.0, 0.0]])
    pitch = np.deg2rad(2.0)
    Rx = np.array([[1.0, 0.0, 0.0],
                   [0.0, np.cos(pitch), -np.sin(pitch)],
                   [0.0, np.sin(pitch), np.cos(pitch)]])
    R = Rx @ R0
    t = np.array([0.05, -0.1, 0.2])
    return K @ np.concatenate([R, t[:, None]], axis=1)


def _plane_depth_at(A, U, V, camera_height):
    """Analytic plane depth evaluated at CONTINUOUS pixel coordinates —
    the float64 ground truth for any resampling of the PE channel."""
    R_inv = np.linalg.inv(A[:3, :3])
    RT = R_inv @ A[:3, 3]
    denom = R_inv[2, 0] * U + R_inv[2, 1] * V + R_inv[2, 2]
    with np.errstate(divide="ignore"):
        return (RT[2] - camera_height) / denom


def _pe_grid(A, h, w):
    u, v = np.meshgrid(np.arange(w), np.arange(h), indexing="xy")
    return _plane_depth_at(A, u.astype(np.float64), v.astype(np.float64),
                           CAMERA_HEIGHT)


def test_resize_pe_exact_matches_analytic_plane():
    A = _projection_with_horizon()
    h, w, oh, ow = 96, 320, 64, 224
    pe = sanitize_pe_raw(_pe_grid(A, h, w))
    assert (pe < 0).any() and (pe > 0).any(), "horizon must be in frame"

    out = np.asarray(resize_pe_exact(
        jnp.asarray(pe)[None, ..., None], (oh, ow)))[0, ..., 0]

    # The coordinate remap the resize performs, evaluated explicitly:
    # resizing the (affine) u/v meshgrids with the same kernel yields the
    # source coordinate of every output pixel, including the edge-clamped
    # taps, so the analytic plane depth at those coordinates is the exact
    # expected value.
    u, v = np.meshgrid(np.arange(w, dtype=np.float32),
                       np.arange(h, dtype=np.float32), indexing="xy")
    U = np.asarray(resize_bilinear(jnp.asarray(u)[None, ..., None],
                                   (oh, ow)))[0, ..., 0].astype(np.float64)
    V = np.asarray(resize_bilinear(jnp.asarray(v)[None, ..., None],
                                   (oh, ow)))[0, ..., 0].astype(np.float64)
    ref = sanitize_pe_raw(_plane_depth_at(A, U, V, CAMERA_HEIGHT))

    valid = np.abs(ref) < 1e5  # away from the sanitize clamp boundary
    assert valid.mean() > 0.95
    rel = np.abs(out[valid] - ref[valid]) / np.maximum(np.abs(ref[valid]),
                                                       1e-3)
    assert rel.max() < 1e-3, rel.max()

    # The naive direct resize (the pre-fix behavior) is badly wrong in the
    # rows around the horizon where pe sweeps through ±inf.
    naive = np.asarray(resize_bilinear(
        jnp.asarray(pe)[None, ..., None], (oh, ow)))[0, ..., 0]
    band = valid & (np.abs(ref) > 50) & (np.abs(ref) < 1e4)
    assert band.any()
    naive_rel = np.abs(naive[band] - ref[band]) / np.abs(ref[band])
    exact_rel = np.abs(out[band] - ref[band]) / np.abs(ref[band])
    assert naive_rel.max() > 10 * max(exact_rel.max(), 1e-6)


def test_resize_pe_exact_upsample_and_horizon_zero():
    """Upsampling is exact too, and the sanitized NaN row (pe == 0, the
    exact horizon) round-trips through inverse space as a clamp, never a
    NaN/inf."""
    A = _projection_with_horizon()
    pe = sanitize_pe_raw(_pe_grid(A, 48, 160))
    pe[24, :] = 0.0  # inject the sanitize NaN->0 row
    out = np.asarray(resize_pe_exact(
        jnp.asarray(pe)[None, ..., None], (96, 320)))[0, ..., 0]
    assert np.isfinite(out).all()
    assert np.abs(out).max() <= 1e6 + 1


def test_resize_img5_scaled_recomputes_input_channel():
    A = _projection_with_horizon()
    h, w, oh, ow = 64, 192, 96, 256
    pe_raw = sanitize_pe_raw(_pe_grid(A, h, w))
    rng = np.random.default_rng(0)
    rgb = rng.standard_normal((h, w, 3)).astype(np.float32)
    # load-time channel 3: clip to (0, 200], zero outside, divide by 200
    pe_in = np.where((pe_raw > 0) & (pe_raw <= 200.0), pe_raw / 200.0, 0.0)
    img = np.concatenate([rgb, pe_in[..., None].astype(np.float32),
                          pe_raw[..., None]], axis=-1)[None]

    out = np.asarray(resize_img5_scaled(jnp.asarray(img), (oh, ow), 200.0))
    assert out.shape == (1, oh, ow, 5)

    np.testing.assert_allclose(
        out[..., :3],
        np.asarray(resize_bilinear(jnp.asarray(img[..., :3]), (oh, ow))),
        rtol=1e-6, atol=1e-6)
    pe_raw_s = np.asarray(resize_pe_exact(
        jnp.asarray(img[..., 4:5]), (oh, ow)))[0, ..., 0]
    np.testing.assert_allclose(out[0, ..., 4], pe_raw_s, rtol=1e-6)
    expect3 = np.where((pe_raw_s > 0) & (pe_raw_s <= 200.0),
                       pe_raw_s / 200.0, 0.0)
    np.testing.assert_allclose(out[0, ..., 3], expect3, rtol=1e-5,
                               atol=1e-7)
    # the recomputed channel obeys the load-time invariants everywhere
    assert (out[0, ..., 3] >= 0).all() and (out[0, ..., 3] <= 1.0).all()


def test_resize_img5_scaled_passthrough_3ch():
    rng = np.random.default_rng(1)
    img = rng.standard_normal((1, 32, 48, 3)).astype(np.float32)
    out = np.asarray(resize_img5_scaled(jnp.asarray(img), (16, 24), 200.0))
    np.testing.assert_allclose(
        out, np.asarray(resize_bilinear(jnp.asarray(img), (16, 24))),
        rtol=1e-6)
