#!/usr/bin/env python
"""Offline KITTI ground-embedding precompute (reference
tools/preprocess_data_kitti.py behavior, parallelised and CLI-ified).

Stage 1 — per KITTI date dir under <data-root>/input:
  parse calib, A = P2 @ R0_rect @ Tr_velo_to_cam, analytic plane depth with
  camera height 1.65, save input/<date>/pe/pe_165.npy.

Stage 2 — per train-split image with GT:
  slope GT k = round(deg(arctan(h/gt - h/pe))) clipped to [-5, 5], 255 where
  gt == 0; saved under gt_depth -> slope_range_5_5_interval_1 as npz k_img.

Usage:
  python tools/preprocess_data_kitti.py --data-root data/kitti \
      --split splits/kitti_eigen_train.txt [--workers N]
"""
import argparse
import os
import os.path as osp
import sys
from concurrent.futures import ProcessPoolExecutor

import numpy as np

sys.path.insert(0, osp.dirname(osp.dirname(osp.abspath(__file__))))

from gedepth_tpu.geometry import (  # noqa: E402
    kitti_plane_embedding, slope_bin_gt, KITTI_CAMERA_HEIGHT)
from gedepth_tpu.geometry.calib import parse_kitti_calib  # noqa: E402


def precompute_pe(data_root: str):
    input_root = osp.join(data_root, "input")
    for date in sorted(os.listdir(input_root)):
        date_dir = osp.join(input_root, date)
        cam_calib = osp.join(date_dir, "calib_cam_to_cam.txt")
        velo_calib = osp.join(date_dir, "calib_velo_to_cam.txt")
        if not (osp.isfile(cam_calib) and osp.isfile(velo_calib)):
            continue
        A = parse_kitti_calib(cam_calib, velo_calib)["A"]
        # image size from the first drive's first frame
        h = w = None
        for entry in sorted(os.listdir(date_dir)):
            img0 = osp.join(date_dir, entry, "image_02", "data",
                            "0000000000.png")
            if "sync" in entry and osp.isfile(img0):
                from PIL import Image
                with Image.open(img0) as im:
                    w, h = im.size
                break
        if h is None:
            print(f"skip {date}: no sync drives found")
            continue
        pe = kitti_plane_embedding(A, h, w, KITTI_CAMERA_HEIGHT)
        out_dir = osp.join(date_dir, "pe")
        os.makedirs(out_dir, exist_ok=True)
        np.save(osp.join(out_dir, "pe_165.npy"), pe)
        print(f"{date}: pe_165.npy {pe.shape}")


def _slope_one(args):
    data_root, image_rel, depth_rel = args
    from PIL import Image
    gt_path = osp.join(data_root, "gt_depth", depth_rel)
    gt = np.asarray(Image.open(gt_path), dtype=np.float64) / 256.0
    date = image_rel.split("/")[0]
    pe = np.load(osp.join(data_root, "input", date, "pe",
                          "pe_165.npy")).astype(np.float32)
    k = slope_bin_gt(gt, pe, camera_height=KITTI_CAMERA_HEIGHT,
                     rounding="round")
    out_path = osp.join(data_root, "slope_range_5_5_interval_1", depth_rel)
    out_path = out_path.replace(".png", ".npz")
    os.makedirs(osp.dirname(out_path), exist_ok=True)
    np.savez_compressed(out_path, k_img=k)
    return out_path


def precompute_slope(data_root: str, split: str, workers: int):
    tasks = []
    with open(split) as f:
        for line in f:
            parts = line.strip().split(" ")
            if len(parts) < 2 or parts[1] == "None":
                continue
            tasks.append((data_root, parts[0], parts[1]))
    print(f"{len(tasks)} images")
    if workers <= 1:
        for i, t in enumerate(tasks):
            _slope_one(t)
            if (i + 1) % 100 == 0:
                print(f"  {i+1}/{len(tasks)}")
    else:
        with ProcessPoolExecutor(max_workers=workers) as ex:
            for i, _ in enumerate(ex.map(_slope_one, tasks, chunksize=16)):
                if (i + 1) % 100 == 0:
                    print(f"  {i+1}/{len(tasks)}")


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--data-root", default="data/kitti")
    parser.add_argument("--split", default="splits/kitti_eigen_train.txt")
    parser.add_argument("--workers", type=int, default=os.cpu_count())
    parser.add_argument("--skip-pe", action="store_true")
    parser.add_argument("--skip-slope", action="store_true")
    args = parser.parse_args()
    if not args.skip_pe:
        precompute_pe(args.data_root)
    if not args.skip_slope:
        precompute_slope(args.data_root, args.split, args.workers)


if __name__ == "__main__":
    main()
