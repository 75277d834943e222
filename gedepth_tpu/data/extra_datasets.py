"""Additional benchmark datasets from the toolbox inventory
(reference depth/datasets/{nyu,sunrgbd,cityscapes,nuscenes,custom}.py;
SURVEY.md §2.4 "other datasets"). None are used by the shipped GEDepth
configs, but they complete the framework surface.

All follow the same contract as KittiDataset: split-file driven, sorted,
__getitem__ -> sample dict, load_gt for the eval loop.
"""
from __future__ import annotations

import json
import os.path as osp

import numpy as np
from PIL import Image


class _SplitDataset:
    """Shared split-file machinery: `img_rel depth_rel [extra]` per line."""

    def __init__(self, data_root, split, depth_scale, test_mode,
                 min_depth, max_depth, garg_crop=False, eigen_crop=False):
        self.data_root = data_root
        self.depth_scale = depth_scale
        self.test_mode = test_mode
        self.min_depth = min_depth
        self.max_depth = max_depth
        self.garg_crop = garg_crop
        self.eigen_crop = eigen_crop
        self.infos = self._load_split(split)

    def _load_split(self, split):
        infos = []
        path = split if osp.isabs(split) else osp.join(self.data_root, split)
        if not osp.exists(path):
            path = split
        with open(path) as f:
            for line in f:
                parts = line.strip().split(" ")
                if not parts or not parts[0]:
                    continue
                depth_rel = parts[1] if len(parts) > 1 else None
                if depth_rel == "None":
                    if not self.test_mode:
                        continue
                    depth_rel = None
                info = {"filename": parts[0], "depth_map": depth_rel}
                if len(parts) > 2:
                    info["extra"] = parts[2]
                infos.append(info)
        infos.sort(key=lambda x: x["filename"])
        return infos

    def __len__(self):
        return len(self.infos)

    def _abs(self, rel):
        return rel if osp.isabs(rel) else osp.join(self.data_root, rel)

    def _load_rgb(self, rel):
        return np.asarray(Image.open(self._abs(rel)).convert("RGB"),
                          dtype=np.float32)


class NYUDataset(_SplitDataset):
    """NYU Depth v2: GT png / 1000, eigen crop, max depth 10
    (reference nyu.py:30-90). Samples are RGB-only (no PE — indoor scenes
    have no ground-plane prior)."""

    def __init__(self, data_root, split, depth_scale=1000.0, test_mode=False,
                 min_depth=1e-3, max_depth=10.0, scene_classes=False):
        super().__init__(data_root, split, depth_scale, test_mode,
                         min_depth, max_depth, eigen_crop=True)
        self.scene_classes = scene_classes
        if scene_classes and not test_mode:
            # scene label = first path component's prefix before '_'
            # (reference nyu_binsformer.py:98-105). Label ids are assigned
            # in sorted-filename order here (deterministic); the reference
            # assigns in raw split-file order — the mapping is an arbitrary
            # permutation either way (ids feed a classification CE only).
            class_dict: dict = {}
            for info in self.infos:
                name = info["filename"].lstrip("/").split("/")[0]
                cls = name.split("_")[0]
                if cls not in class_dict:
                    class_dict[cls] = len(class_dict)
                info["scene_class"] = class_dict[cls]
            self.scene_class_names = list(class_dict)

    def load_gt(self, idx):
        return np.asarray(Image.open(self._abs(self.infos[idx]["depth_map"])),
                          dtype=np.float32) / self.depth_scale

    def __getitem__(self, idx):
        info = self.infos[idx]
        sample = {"index": idx, "filename": info["filename"],
                  "img": self._load_rgb(info["filename"]),
                  "cam_height": np.float32(0.0)}
        if not self.test_mode and info["depth_map"] is not None:
            sample["depth_gt"] = self.load_gt(idx)
        if "scene_class" in info:
            sample["scene_class"] = np.int32(info["scene_class"])
        return sample


class SUNRGBDDataset(NYUDataset):
    """SUN RGB-D: same structure as NYU (png GT / 10000 in the common dump;
    reference sunrgbd.py mirrors nyu.py)."""

    def __init__(self, data_root, split, depth_scale=10000.0,
                 test_mode=False, min_depth=1e-3, max_depth=10.0):
        _SplitDataset.__init__(self, data_root, split, depth_scale,
                               test_mode, min_depth, max_depth,
                               eigen_crop=True)


class CityscapesDataset(_SplitDataset):
    """Cityscapes depth-from-disparity: depth = baseline * fx / disparity
    with disparity = (png - 1) / 256, invalid (png <= 0) masked out
    (reference cityscapes.py + loading.py:196-216). Split lines carry a
    third column with the camera json path."""

    def __init__(self, data_root, split, test_mode=False,
                 min_depth=1e-3, max_depth=80.0):
        super().__init__(data_root, split, 256.0, test_mode,
                         min_depth, max_depth)

    def load_gt(self, idx):
        info = self.infos[idx]
        disp_png = np.asarray(Image.open(self._abs(info["depth_map"])),
                              dtype=np.float32)
        cam_rel = info.get("extra")
        if cam_rel is None:
            cam_rel = info["depth_map"].replace(
                "disparity", "camera").replace("_camera.png", "_camera.json")
        with open(self._abs(cam_rel)) as f:
            camera = json.load(f)
        baseline = camera["extrinsic"]["baseline"]
        fx = camera["intrinsic"]["fx"]
        disparity = (disp_png - 1.0) / 256.0
        invalid = disp_png <= 0
        disparity[invalid] = 1.0
        depth = baseline * fx / disparity
        depth[invalid] = 0.0
        return depth

    def __getitem__(self, idx):
        info = self.infos[idx]
        sample = {"index": idx, "filename": info["filename"],
                  "img": self._load_rgb(info["filename"]),
                  "cam_height": np.float32(0.0)}
        if not self.test_mode and info["depth_map"] is not None:
            sample["depth_gt"] = self.load_gt(idx)
        return sample


class NuScenesDataset(_SplitDataset):
    """nuScenes depth: png GT / 256 (KITTI-style dumps), no crop
    (reference nuscenes.py role)."""

    def __init__(self, data_root, split, depth_scale=256.0, test_mode=False,
                 min_depth=1e-3, max_depth=80.0):
        super().__init__(data_root, split, depth_scale, test_mode,
                         min_depth, max_depth)

    def load_gt(self, idx):
        return np.asarray(Image.open(self._abs(self.infos[idx]["depth_map"])),
                          dtype=np.float32) / self.depth_scale

    __getitem__ = NYUDataset.__getitem__


class CustomDepthDataset(_SplitDataset):
    """Folder-of-images dataset for qualitative inference
    (reference custom.py role): no GT required."""

    def __init__(self, data_root, split=None, depth_scale=256.0,
                 test_mode=True, min_depth=1e-3, max_depth=80.0):
        if split is None:
            import os
            files = sorted(
                f for f in os.listdir(data_root)
                if f.lower().endswith((".png", ".jpg", ".jpeg")))
            self.data_root = data_root
            self.depth_scale = depth_scale
            self.test_mode = True
            self.min_depth = min_depth
            self.max_depth = max_depth
            self.garg_crop = self.eigen_crop = False
            self.infos = [{"filename": f, "depth_map": None} for f in files]
        else:
            super().__init__(data_root, split, depth_scale, test_mode,
                             min_depth, max_depth)

    def __getitem__(self, idx):
        info = self.infos[idx]
        return {"index": idx, "filename": info["filename"],
                "img": self._load_rgb(info["filename"]),
                "cam_height": np.float32(0.0)}
