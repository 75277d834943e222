"""End-to-end KITTI-format integration: fake dataset tree on disk ->
preprocess CLI functions -> KittiDataset -> 2 train iters -> full eval
protocol (kb-crop, garg mask, flip TTA)."""
import os
import os.path as osp
import sys

import numpy as np
import pytest
from PIL import Image

pytestmark = pytest.mark.slow  # compile-heavy: full-model jits (test tiers, NOTES r4)

sys.path.insert(0, osp.dirname(osp.dirname(osp.abspath(__file__))))

H_FULL, W_FULL = 120, 400   # "full-res" images
H_EVAL, W_EVAL = 96, 320    # kb-crop target


@pytest.fixture(scope="module")
def kitti_tree(tmp_path_factory):
    root = tmp_path_factory.mktemp("kitti")
    date = "2011_09_26"
    drive = f"{date}_drive_0001_sync"
    img_dir = root / "input" / date / drive / "image_02" / "data"
    gt_dir = root / "gt_depth" / drive / "proj_depth" / "groundtruth" / \
        "image_02"
    img_dir.mkdir(parents=True)
    gt_dir.mkdir(parents=True)

    # calibration: toy wide-angle cam in KITTI file format
    fx, cx, cy = 60.0, W_FULL / 2, 0.45 * H_FULL
    date_dir = root / "input" / date
    with open(date_dir / "calib_cam_to_cam.txt", "w") as f:
        f.write("R_rect_00: 1 0 0 0 1 0 0 0 1\n")
        f.write(f"P_rect_02: {fx} 0 {cx} 0 0 {fx} {cy} 0 0 0 1 0\n")
    with open(date_dir / "calib_velo_to_cam.txt", "w") as f:
        # lidar(x fwd, y left, z up) -> cam(x right, y down, z fwd)
        f.write("R: 0 -1 0 0 0 -1 1 0 0\n")
        f.write("T: 0 0 0\n")

    rng = np.random.default_rng(0)
    names = []
    for i in range(4):
        name = f"{i:010d}.png"
        names.append(name)
        Image.fromarray(rng.integers(0, 255, (H_FULL, W_FULL, 3),
                                     dtype=np.uint8)).save(img_dir / name)
        # plausible GT: ground plane + noise, sparse
        from gedepth_tpu.geometry.calib import parse_kitti_calib
        from gedepth_tpu.geometry.plane import kitti_plane_embedding
        A = parse_kitti_calib(str(date_dir / "calib_cam_to_cam.txt"),
                              str(date_dir / "calib_velo_to_cam.txt"))["A"]
        pe = kitti_plane_embedding(A, H_FULL, W_FULL)
        gt = np.where((pe > 1) & (pe < 75), pe * 1.02, 0.0)
        gt[::3] = 0.0  # lidar sparsity
        Image.fromarray((gt * 256).astype(np.uint16)).save(gt_dir / name)

    rel_img = [f"{date}/{drive}/image_02/data/{n}" for n in names]
    rel_gt = [f"{drive}/proj_depth/groundtruth/image_02/{n}" for n in names]
    (root / "splits").mkdir()
    with open(root / "splits" / "train.txt", "w") as f:
        for a, b in zip(rel_img[:3], rel_gt[:3]):
            f.write(f"{a} {b} 700\n")
    with open(root / "splits" / "test.txt", "w") as f:
        f.write(f"{rel_img[3]} {rel_gt[3]} 700\n")
        f.write(f"{rel_img[0]} None 700\n")  # filtered invalid pair
    return str(root)


def test_preprocess_and_full_loop(kitti_tree):
    from tools.preprocess_data_kitti import precompute_pe, precompute_slope

    precompute_pe(kitti_tree)
    pe_path = osp.join(kitti_tree, "input", "2011_09_26", "pe", "pe_165.npy")
    assert osp.exists(pe_path)
    assert np.load(pe_path).shape == (H_FULL, W_FULL)

    precompute_slope(kitti_tree, osp.join(kitti_tree, "splits", "train.txt"),
                     workers=1)
    slope_dir = osp.join(kitti_tree, "slope_range_5_5_interval_1")
    assert osp.isdir(slope_dir)

    # dataset contract
    from gedepth_tpu.data import KittiDataset
    ds = KittiDataset(kitti_tree, osp.join(kitti_tree, "splits", "train.txt"))
    assert len(ds) == 3
    s = ds[0]
    assert s["img"].shape == (H_FULL, W_FULL, 5)
    assert s["pe_k_gt"].shape == (H_FULL, W_FULL)
    classes = set(np.unique(s["pe_k_gt"]))
    assert classes <= set(range(11)) | {255.0}

    # tiny end-to-end train + KITTI-protocol eval
    import dataclasses
    from gedepth_tpu.configs import get_config
    from gedepth_tpu.train.loop import train

    cfg = get_config("smoke_synthetic")
    cfg = cfg.replace(
        data=dataclasses.replace(
            cfg.data, dataset="kitti", data_root=kitti_tree,
            train_split=osp.join(kitti_tree, "splits", "train.txt"),
            test_split=osp.join(kitti_tree, "splits", "test.txt"),
            eval_size=(H_EVAL, W_EVAL), crop_size=(64, 160),
            garg_crop=True, eval_flip_tta=True),
        train=dataclasses.replace(cfg.train, max_iters=2, global_batch=2,
                                  eval_interval=2, checkpoint_interval=2,
                                  log_interval=1),
    )
    state, best = train(cfg, work_dir=os.path.join(kitti_tree, "work"))
    assert np.isfinite(best["abs_rel"])
    assert osp.exists(osp.join(kitti_tree, "work", "best_abs_rel.npz"))
    # the eval saw exactly the 1 valid test image
    assert best["iter"] == 2
