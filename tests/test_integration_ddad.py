"""End-to-end DDAD-format integration: fake npz dataset tree -> slope
preprocess -> DDADDataset -> 2 train iters -> DDAD eval protocol
(align-corners upsample to full-res GT, no crop/TTA)."""
import os
import os.path as osp
import sys

import numpy as np
import pytest
from PIL import Image

pytestmark = pytest.mark.slow  # compile-heavy: full-model jits (test tiers, NOTES r4)

sys.path.insert(0, osp.dirname(osp.dirname(osp.abspath(__file__))))

H_FULL, W_FULL = 152, 242   # "full-res" DDAD-like frames
H_NET, W_NET = 96, 160      # network input (DDADResize target)


@pytest.fixture(scope="module")
def ddad_tree(tmp_path_factory):
    root = tmp_path_factory.mktemp("ddad")
    rng = np.random.default_rng(0)

    # plane prior per camera (toy wide-angle camera, z-up lidar frame)
    from gedepth_tpu.geometry.plane import (
        plane_embedding_from_projection, sanitize_pe_raw)
    K = np.array([[70.0, 0, W_FULL / 2], [0, 70.0, 0.45 * H_FULL],
                  [0, 0, 1.0]])
    R = np.array([[0, -1, 0], [0, 0, -1], [1, 0, 0]], dtype=np.float64)
    A = K @ np.concatenate([R, np.zeros((3, 1))], axis=1)

    lines = []
    for cam in ("CAMERA_01", "CAMERA_05"):
        h_cam = {"CAMERA_01": 1.56, "CAMERA_05": 1.57}[cam]
        pe = plane_embedding_from_projection(A, H_FULL, W_FULL, h_cam)
        pe_dir = root / "pe_public_debug" / cam
        pe_dir.mkdir(parents=True)
        np.savez_compressed(pe_dir / "ddad_pe.npz", pe=pe)

        img_dir = root / "rgb" / cam
        depth_dir = root / "depth" / cam
        img_dir.mkdir(parents=True)
        depth_dir.mkdir(parents=True)
        for i in range(3):
            Image.fromarray(rng.integers(0, 255, (H_FULL, W_FULL, 3),
                                         dtype=np.uint8)).save(
                img_dir / f"{i:06d}.png")
            gt = np.where((pe > 1) & (pe < 150), pe * 1.03, 0.0)
            gt[::2] = 0.0
            np.savez_compressed(depth_dir / f"{i:06d}.npz",
                                depth=gt.astype(np.float32))
            lines.append(f"rgb/{cam}/{i:06d}.png depth/{cam}/{i:06d}.npz\n")

    (root / "splits").mkdir()
    (root / "splits" / "train.txt").write_text("".join(lines[:4]))
    (root / "splits" / "test.txt").write_text("".join(lines[4:]))
    return str(root)


def test_ddad_preprocess_dataset_train_eval(ddad_tree):
    from tools.preprocess_data_ddad import precompute_slope

    # slope GT generation (trunc binning, per-camera heights)
    precompute_slope(ddad_tree, osp.join(ddad_tree, "splits", "train.txt"),
                     workers=1)
    slope_file = osp.join(ddad_tree, "depth", "CAMERA_01",
                          "000000_slope_public_debug.npz")
    assert osp.exists(slope_file)
    k = np.load(slope_file)["k_img"]
    vals = set(np.unique(k))
    assert vals <= set(range(-5, 6)) | {255}

    from gedepth_tpu.data import DDADDataset
    ds = DDADDataset(ddad_tree, osp.join(ddad_tree, "splits", "train.txt"))
    assert len(ds) == 4
    s = ds[0]
    assert s["img"].shape == (H_FULL, W_FULL, 5)
    assert s["pe_k_gt"].shape == (H_FULL, W_FULL)
    assert abs(float(s["cam_height"]) - 1.56) < 1e-5 or \
        abs(float(s["cam_height"]) - 1.57) < 1e-5
    assert np.isfinite(s["img"]).all()

    # tiny end-to-end train + DDAD eval protocol (upsample to full-res GT)
    import dataclasses
    from gedepth_tpu.configs import get_config
    from gedepth_tpu.train.loop import train

    cfg = get_config("smoke_synthetic")
    cfg = cfg.replace(
        model=dataclasses.replace(cfg.model, max_depth=150.0,
                                  depth_scale=250.0,
                                  default_cam_height=1.55),
        data=dataclasses.replace(
            cfg.data, dataset="ddad", data_root=ddad_tree,
            train_split=osp.join(ddad_tree, "splits", "train.txt"),
            test_split=osp.join(ddad_tree, "splits", "test.txt"),
            eval_size=(H_NET, W_NET), crop_size=(H_NET, W_NET),
            ddad_resize=(H_NET, W_NET), flip_prob=0.0,
            garg_crop=False, eval_flip_tta=False),
        train=dataclasses.replace(cfg.train, max_iters=2, global_batch=2,
                                  eval_interval=2, checkpoint_interval=2,
                                  log_interval=1),
    )
    state, best = train(cfg, work_dir=os.path.join(ddad_tree, "work"))
    assert np.isfinite(best["abs_rel"])
