#!/usr/bin/env python
"""Weighted-average ensembling of saved depth predictions (reference
tools/ensemble.py behavior: average .npy prediction dumps, write 16-bit
PNGs).

Usage:
  python tools/ensemble.py --inputs runA/preds runB/preds \
      --weights 0.5 0.5 --out ensemble_out [--scale 256]
"""
import argparse
import os
import os.path as osp

import numpy as np
from PIL import Image


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--inputs", nargs="+", required=True,
                        help="directories of per-image .npy predictions")
    parser.add_argument("--weights", nargs="+", type=float, default=None)
    parser.add_argument("--out", required=True)
    parser.add_argument("--scale", type=float, default=256.0,
                        help="multiplier before uint16 quantisation")
    args = parser.parse_args()

    weights = args.weights or [1.0 / len(args.inputs)] * len(args.inputs)
    assert len(weights) == len(args.inputs)
    os.makedirs(args.out, exist_ok=True)

    names = sorted(n for n in os.listdir(args.inputs[0])
                   if n.endswith(".npy"))
    for name in names:
        acc = None
        for d, w in zip(args.inputs, weights):
            arr = np.load(osp.join(d, name)).astype(np.float64) * w
            acc = arr if acc is None else acc + arr
        out16 = np.clip(acc * args.scale, 0, 65535).astype(np.uint16)
        Image.fromarray(out16).save(
            osp.join(args.out, name.replace(".npy", ".png")))
    print(f"wrote {len(names)} ensembled maps to {args.out}")


if __name__ == "__main__":
    main()
