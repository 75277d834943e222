"""KITTI Eigen dataset.

Split-file driven (same format as the reference: `image_rel depth_rel focal`
per line, `None` depth filtered, sorted by filename for determinism —
depth/datasets/kitti.py:210-243). Loads:
  * RGB from `<data_root>/input/<image_rel>` (PNG, converted to RGB floats),
  * GT from `<data_root>/gt_depth/<depth_rel>` (uint16 PNG / depth_scale),
  * the precomputed plane prior `<date>/pe/pe_165.npy` (made by
    tools/preprocess_data_kitti.py),
  * slope-bin GT from `slope_range_5_5_interval_1/<depth_rel>.npz`
    (+5 shift to class ids, 255 ignore; reference loading.py:144-151).
"""
from __future__ import annotations

import os.path as osp

import numpy as np
from PIL import Image

from gedepth_tpu.geometry.calib import (
    KITTI_CAM_INTRINSICS_4COL, KITTI_CAMERA_HEIGHT)
from gedepth_tpu.geometry.plane import clip_pe_for_input, sanitize_pe_raw


class KittiDataset:
    def __init__(self, data_root, split, img_dir="input", ann_dir="gt_depth",
                 depth_scale=256.0, use_pe=True, load_slope_gt=True,
                 pe_clip=200.0, test_mode=False,
                 min_depth=1e-3, max_depth=80.0,
                 garg_crop=True, eigen_crop=False):
        self.data_root = data_root
        self.img_dir = osp.join(data_root, img_dir)
        self.ann_dir = osp.join(data_root, ann_dir)
        self.depth_scale = depth_scale
        self.use_pe = use_pe
        self.load_slope_gt = load_slope_gt and not test_mode
        self.pe_clip = pe_clip
        self.test_mode = test_mode
        self.min_depth = min_depth
        self.max_depth = max_depth
        self.garg_crop = garg_crop
        self.eigen_crop = eigen_crop
        self.infos = self._load_split(split)
        self._pe_cache = {}

    def _load_split(self, split):
        infos = []
        invalid = 0
        with open(split) as f:
            for line in f:
                parts = line.strip().split(" ")
                if not parts or not parts[0]:
                    continue
                depth_rel = parts[1] if len(parts) > 1 else "None"
                if depth_rel == "None":
                    # invalid pairs are filtered in BOTH train and test mode
                    # (this is the 652-of-697 Eigen protocol,
                    # reference kitti.py:226-230)
                    invalid += 1
                    continue
                infos.append({"filename": parts[0], "depth_map": depth_rel})
        infos.sort(key=lambda x: x["filename"])
        self.invalid_depth_num = invalid
        return infos

    def __len__(self):
        return len(self.infos)

    def _date_of(self, filename):
        return filename.split("/")[0]

    def _load_pe(self, date):
        if date not in self._pe_cache:
            self._pe_cache[date] = np.load(
                osp.join(self.img_dir, date, "pe", "pe_165.npy")
            ).astype(np.float32)
        return self._pe_cache[date]

    def gt_path(self, idx):
        return osp.join(self.ann_dir, self.infos[idx]["depth_map"])

    def load_gt(self, idx):
        # native 16-bit PNG fast path with PIL fallback
        from gedepth_tpu.utils.native import load_depth_png
        return load_depth_png(self.gt_path(idx), self.depth_scale)

    def __getitem__(self, idx):
        info = self.infos[idx]
        img = np.asarray(
            Image.open(osp.join(self.img_dir, info["filename"])).convert("RGB"),
            dtype=np.float32)
        date = self._date_of(info["filename"])
        sample = {
            "index": idx,
            "filename": info["filename"],
            "cam_height": np.float32(KITTI_CAMERA_HEIGHT),
            "cam_intrinsic": np.asarray(
                KITTI_CAM_INTRINSICS_4COL.get(date), dtype=np.float32),
        }
        if self.use_pe:
            pe_raw = sanitize_pe_raw(self._load_pe(date))
            pe_in = clip_pe_for_input(pe_raw, self.pe_clip)
            sample["img"] = np.concatenate(
                [img, pe_in[..., None], pe_raw[..., None]], axis=-1)
            sample["pe_ori_point"] = np.float32(pe_raw[-1, -1])
        else:
            sample["img"] = img

        if not self.test_mode and info["depth_map"] is not None:
            depth_gt = self.load_gt(idx)
            sample["depth_gt"] = depth_gt
            if self.load_slope_gt:
                slope_path = self.gt_path(idx).replace(".png", ".npz").replace(
                    "gt_depth", "slope_range_5_5_interval_1")
                k = np.load(slope_path)["k_img"].astype(np.float32)
                k = k + 5
                k[k == 260] = 255
                if k.shape != depth_gt.shape:
                    import cv2
                    k = cv2.resize(k, (depth_gt.shape[1], depth_gt.shape[0]),
                                   interpolation=cv2.INTER_NEAREST)
                sample["pe_k_gt"] = k
        return sample
