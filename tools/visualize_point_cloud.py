#!/usr/bin/env python
"""Back-project depth maps to point clouds and export/render them
(reference tools/misc/visualize_point-cloud_*.py surface).

For each image, back-projects GT / PE-prior / predicted depth through the
camera intrinsics and writes PLY point clouds (plus an optional matplotlib
scatter render). Works headless — no open3d dependency.

Usage:
  python tools/visualize_point_cloud.py <config-name> \
      [--checkpoint ckpt.npz] [--indices 0 1 2] [--out-dir pc_out]
      [--render]
"""
import argparse
import os
import os.path as osp
import sys

import numpy as np

sys.path.insert(0, osp.dirname(osp.dirname(osp.abspath(__file__))))


def backproject(depth, K):
    """(H, W) depth + 3x3 intrinsics -> (N, 3) camera-frame points."""
    h, w = depth.shape
    us, vs = np.meshgrid(np.arange(w), np.arange(h), indexing="xy")
    z = depth.reshape(-1)
    valid = z > 0
    uv1 = np.stack([us.reshape(-1), vs.reshape(-1),
                    np.ones(h * w)], axis=0)[:, valid]
    pts = (np.linalg.inv(K) @ uv1) * z[valid]
    return pts.T


def write_ply(path, points, color=(180, 180, 180)):
    with open(path, "w") as f:
        f.write("ply\nformat ascii 1.0\n"
                f"element vertex {len(points)}\n"
                "property float x\nproperty float y\nproperty float z\n"
                "property uchar red\nproperty uchar green\n"
                "property uchar blue\nend_header\n")
        for p in points:
            f.write(f"{p[0]:.4f} {p[1]:.4f} {p[2]:.4f} "
                    f"{color[0]} {color[1]} {color[2]}\n")


def render_scatter(path, clouds):
    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    fig = plt.figure(figsize=(10, 4))
    ax = fig.add_subplot(111, projection="3d")
    for (pts, label, color) in clouds:
        sel = pts[:: max(len(pts) // 4000, 1)]
        ax.scatter(sel[:, 0], sel[:, 2], -sel[:, 1], s=0.5, label=label,
                   color=color, alpha=0.5)
    ax.set_xlabel("x"), ax.set_ylabel("z"), ax.legend()
    plt.tight_layout()
    plt.savefig(path, dpi=130)
    plt.close(fig)


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("config")
    parser.add_argument("--checkpoint", default=None)
    parser.add_argument("--indices", nargs="+", type=int, default=[0])
    parser.add_argument("--out-dir", default="pc_out")
    parser.add_argument("--render", action="store_true")
    args = parser.parse_args()

    from gedepth_tpu.configs import get_config
    from gedepth_tpu.train.loop import build_datasets
    from gedepth_tpu.apis import init_depther, inference_depther
    from gedepth_tpu.geometry.calib import KITTI_CAM_INTRINSICS_3x3

    cfg = get_config(args.config)
    _, test_ds = build_datasets(cfg)
    handle = init_depther(cfg, checkpoint=args.checkpoint, flip_tta=False)
    os.makedirs(args.out_dir, exist_ok=True)

    for idx in args.indices:
        sample = test_ds[idx]
        K = sample.get("cam_intrinsic")
        if K is not None:
            K = np.asarray(K)[:3, :3]
        else:
            K = KITTI_CAM_INTRINSICS_3x3["2011_09_26"]
        pred = inference_depther(handle, sample["img"],
                                 float(sample.get("cam_height", 1.65)))
        clouds = [(backproject(pred, K), "pred", "tab:blue")]
        if sample["img"].shape[-1] == 5:
            pe = np.clip(sample["img"][..., 4], 0, cfg.model.max_depth)
            pe[pe < 0] = 0
            pe_c = pe[:pred.shape[0], :pred.shape[1]]
            clouds.append((backproject(pe_c, K), "pe", "tab:green"))
        if hasattr(test_ds, "load_gt") and not test_ds.test_mode:
            gt = test_ds.load_gt(idx)
            clouds.append((backproject(gt, K), "gt", "tab:red"))
        for pts, label, _ in clouds:
            write_ply(osp.join(args.out_dir, f"{idx:05d}_{label}.ply"), pts)
        if args.render:
            render_scatter(osp.join(args.out_dir, f"{idx:05d}.png"), clouds)
        print(f"index {idx}: wrote {len(clouds)} clouds", flush=True)


if __name__ == "__main__":
    main()
