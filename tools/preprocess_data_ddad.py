#!/usr/bin/env python
"""Offline DDAD ground-embedding precompute (reference
tools/preprocess_data_ddad.py behavior).

Stage 1 needs the TRI dgp SDK to read camera/lidar poses; if dgp is not
installed, pass precomputed calibration via --calib-npz (a npz with, per
camera, '<CAM>_K' (3,3), '<CAM>_cam_pose' (4,4), '<CAM>_lidar_pose' (4,4),
'<CAM>_hw' (2,)). Writes <data-root>/pe_public_debug/<CAM>/ddad_pe.npz.

Stage 2 — slope GT per train-split depth npz, with per-camera heights
(1.56/1.57/1.53/1.53) and int-truncation binning; saved next to the depth
as *_slope_public_debug.npz.
"""
import argparse
import os
import os.path as osp
import sys
from concurrent.futures import ProcessPoolExecutor

import numpy as np

sys.path.insert(0, osp.dirname(osp.dirname(osp.abspath(__file__))))

from gedepth_tpu.geometry import (  # noqa: E402
    ddad_plane_embedding, slope_bin_gt, DDAD_CAMERA_HEIGHTS)

CAMERAS = ["CAMERA_01", "CAMERA_05", "CAMERA_06", "CAMERA_09"]


def precompute_pe_from_dgp(data_root: str, ddad_json: str):
    from dgp.datasets import SynchronizedSceneDataset  # type: ignore

    datums = ["lidar"] + CAMERAS
    dataset = SynchronizedSceneDataset(
        ddad_json, datum_names=datums, split="train",
        generate_depth_from_datum="lidar")
    sample = dataset[0][0]
    lidar_pose = np.asarray(sample[len(CAMERAS)]["pose"].matrix)
    for cam_id, cam in enumerate(CAMERAS):
        rgb = np.array(sample[cam_id]["rgb"])
        K = np.asarray(sample[cam_id]["intrinsics"])
        cam_pose = np.asarray(sample[cam_id]["pose"].matrix)
        pe = ddad_plane_embedding(K, cam_pose, lidar_pose,
                                  rgb.shape[0], rgb.shape[1])
        out = osp.join(data_root, "pe_public_debug", cam)
        os.makedirs(out, exist_ok=True)
        np.savez_compressed(osp.join(out, "ddad_pe.npz"), pe=pe)
        print(f"{cam}: ddad_pe.npz {pe.shape}")


def precompute_pe_from_npz(data_root: str, calib_npz: str):
    data = np.load(calib_npz)
    for cam in CAMERAS:
        K = data[f"{cam}_K"]
        cam_pose = data[f"{cam}_cam_pose"]
        lidar_pose = data[f"{cam}_lidar_pose"]
        h, w = data[f"{cam}_hw"].astype(int)
        pe = ddad_plane_embedding(K, cam_pose, lidar_pose, h, w)
        out = osp.join(data_root, "pe_public_debug", cam)
        os.makedirs(out, exist_ok=True)
        np.savez_compressed(osp.join(out, "ddad_pe.npz"), pe=pe)
        print(f"{cam}: ddad_pe.npz {pe.shape}")


def _slope_one(args):
    data_root, depth_rel = args
    cam = depth_rel.split("/")[-2]
    gt_path = depth_rel if osp.isabs(depth_rel) else osp.join(data_root,
                                                              depth_rel)
    gt = np.load(gt_path)["depth"]
    pe = np.load(osp.join(data_root, "pe_public_debug", cam,
                          "ddad_pe.npz"))["pe"]
    k = slope_bin_gt(gt, pe, camera_height=DDAD_CAMERA_HEIGHTS[cam],
                     rounding="trunc")
    out_path = gt_path.replace(".npz", "_slope_public_debug.npz")
    np.savez_compressed(out_path, k_img=k)
    return out_path


def precompute_slope(data_root: str, split: str, workers: int):
    tasks = []
    with open(split) as f:
        for line in f:
            parts = line.strip().split(" ")
            if len(parts) < 2 or parts[1] == "None":
                continue
            if parts[1].split("/")[-2] not in CAMERAS:
                continue
            tasks.append((data_root,
                          parts[1].replace("depth_val", "depth")))
    print(f"{len(tasks)} depth maps")
    with ProcessPoolExecutor(max_workers=workers) as ex:
        for i, _ in enumerate(ex.map(_slope_one, tasks, chunksize=8)):
            if (i + 1) % 100 == 0:
                print(f"  {i+1}/{len(tasks)}")


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--data-root", default="data/DDAD")
    parser.add_argument("--ddad-json", default="data/DDAD/ddad.json")
    parser.add_argument("--calib-npz", default=None)
    parser.add_argument("--split", default="splits/ddad_train_split.txt")
    parser.add_argument("--workers", type=int, default=os.cpu_count())
    parser.add_argument("--skip-pe", action="store_true")
    parser.add_argument("--skip-slope", action="store_true")
    args = parser.parse_args()
    if not args.skip_pe:
        if args.calib_npz:
            precompute_pe_from_npz(args.data_root, args.calib_npz)
        else:
            precompute_pe_from_dgp(args.data_root, args.ddad_json)
    if not args.skip_slope:
        precompute_slope(args.data_root, args.split, args.workers)


if __name__ == "__main__":
    main()
