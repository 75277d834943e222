"""Synthetic ground-plane dataset for tests, smoke training, and benchmarks.

Generates geometrically consistent samples from the same PE math the real
datasets use: a wide-angle camera over a tilted ground plane, textured RGB,
sparse lidar-like GT, the PE input channels, and slope-bin GT. This stands in
for KITTI in environments without the dataset and exercises every contract of
the real pipeline (5-channel input, slope classes, ignore regions).
"""
from __future__ import annotations

import numpy as np

from gedepth_tpu.geometry.plane import (
    plane_embedding_from_projection,
    slope_bin_gt,
    slope_gt_to_class,
    clip_pe_for_input,
    sanitize_pe_raw,
)


def _toy_projection(h, w):
    fx = 0.6 * w
    K = np.array([[fx, 0, w / 2], [0, fx, 0.42 * h], [0, 0, 1.0]])
    R = np.array([[0, -1, 0], [0, 0, -1], [1, 0, 0]], dtype=np.float64)
    return K @ np.concatenate([R, np.zeros((3, 1))], axis=1)


class SyntheticGroundDataset:
    """KITTI-shaped synthetic samples.

    Each index deterministically yields a scene with a per-scene ground slope
    in [-4deg, 4deg], lidar-sparse GT, and objects (boxes of constant depth)
    off the ground.
    """

    def __init__(self, size=64, height=352, width=1216, use_pe=True,
                 camera_height=1.65, depth_scale=200.0, min_depth=1e-3,
                 max_depth=80.0, seed=0):
        self.size = size
        self.height = height
        self.width = width
        self.use_pe = use_pe
        self.camera_height = camera_height
        self.depth_scale = depth_scale
        self.min_depth = min_depth
        self.max_depth = max_depth
        self.seed = seed
        self._A = _toy_projection(height, width)
        self._pe = plane_embedding_from_projection(
            self._A, height, width, camera_height)

    def __len__(self):
        return self.size

    def __getitem__(self, idx):
        rng = np.random.default_rng(self.seed * 100003 + idx)
        H, W = self.height, self.width
        pe = self._pe

        # Ground truth: ground plane tilted by a per-scene slope.
        slope_deg = rng.uniform(-4, 4)
        tan_k = np.tan(np.deg2rad(slope_deg))
        h = self.camera_height
        with np.errstate(divide="ignore", invalid="ignore"):
            gt = h / (h / pe + tan_k)
        gt = np.where((gt > self.min_depth) & (gt < self.max_depth) & (pe > 0),
                      gt, 0.0)

        # A few boxes of constant depth (objects above ground).
        for _ in range(3):
            bh = int(rng.integers(H // 8, H // 3))
            bw = int(rng.integers(W // 12, W // 4))
            y0 = int(rng.integers(0, H - bh))
            x0 = int(rng.integers(0, W - bw))
            depth = rng.uniform(3.0, 60.0)
            gt[y0:y0 + bh, x0:x0 + bw] = depth

        # Lidar-like sparsity: keep ~5% of rows in a scanline pattern.
        keep = np.zeros((H, W), dtype=bool)
        keep[:: max(H // 64, 1), ::2] = True
        gt = np.where(keep, gt, 0.0).astype(np.float32)

        # RGB: depth-shaded gradient + noise (values 0..255).
        shade = np.where(gt > 0, gt / self.max_depth, 0.5)
        base = np.stack([shade * 200 + 30,
                         np.linspace(0, 1, H)[:, None].repeat(W, 1) * 180 + 40,
                         np.linspace(0, 1, W)[None, :].repeat(H, 0) * 160 + 50],
                        axis=-1)
        rgb = np.clip(base + rng.normal(0, 8, size=(H, W, 3)), 0, 255)
        rgb = rgb.astype(np.float32)

        sample = {
            "depth_gt": gt,
            "cam_height": np.float32(h),
            "index": idx,
        }
        if self.use_pe:
            pe_clip = clip_pe_for_input(pe, self.depth_scale)
            pe_raw = sanitize_pe_raw(pe)
            sample["img"] = np.concatenate(
                [rgb, pe_clip[..., None], pe_raw[..., None]], axis=-1)
            k_img = slope_bin_gt(gt, pe, camera_height=h)
            sample["pe_k_gt"] = slope_gt_to_class(k_img)
            sample["pe_ori_point"] = np.float32(pe_raw[-1, -1])
        else:
            sample["img"] = rgb
        return sample
