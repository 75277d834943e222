#!/usr/bin/env python
"""Single-image depth inference CLI.

The reference exposes init_depther/inference_depther only as a Python API
(depth/apis/inference.py:12,70; its dict_inference.sh just re-runs test.py
--show-dir). This gives the API a first-class CLI:

  python tools/inference.py <config> <checkpoint.npz> img1.png [img2.png ...]
      [--pe pe_165.npy] [--cam-height 1.65] [--out-dir out/]
      [--bf16] [--no-tta] [--npy]

Writes <stem>_depth.png (colorized) and optionally <stem>_depth.npy
(metric depth) per input image.
"""
import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    parser = argparse.ArgumentParser(description="Single-image inference")
    parser.add_argument("config")
    parser.add_argument("checkpoint")
    parser.add_argument("images", nargs="+", help="RGB image paths")
    parser.add_argument("--pe", default=None,
                        help="precomputed plane-embedding .npy/.npz "
                             "(required for PE-variant configs)")
    parser.add_argument("--cam-height", type=float, default=None)
    parser.add_argument("--out-dir", default="inference_out")
    parser.add_argument("--bf16", action="store_true",
                        help="bfloat16 serving forward")
    parser.add_argument("--no-tta", action="store_true",
                        help="disable flip TTA")
    parser.add_argument("--npy", action="store_true",
                        help="also dump metric depth as .npy")
    args = parser.parse_args()

    import numpy as np
    from PIL import Image

    from gedepth_tpu.apis.inference import init_depther, inference_depther
    from gedepth_tpu.utils import colorize_depth

    handle = init_depther(args.config, args.checkpoint,
                          flip_tta=False if args.no_tta else None,
                          pe_path=args.pe, bf16=args.bf16)
    os.makedirs(args.out_dir, exist_ok=True)
    for path in args.images:
        depth = inference_depther(handle, path, cam_height=args.cam_height)
        stem = os.path.splitext(os.path.basename(path))[0]
        Image.fromarray(colorize_depth(depth)).save(
            os.path.join(args.out_dir, stem + "_depth.png"))
        if args.npy:
            np.save(os.path.join(args.out_dir, stem + "_depth.npy"), depth)
        print(f"{path}: depth [{depth.min():.2f}, {depth.max():.2f}] m "
              f"-> {args.out_dir}/{stem}_depth.png", flush=True)


if __name__ == "__main__":
    main()
