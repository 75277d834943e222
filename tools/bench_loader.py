"""Input-pipeline throughput: is the host loader fast enough to feed the
chips? (VERDICT r4 item 6.)

Times TrainLoader batches/sec (and samples/sec) for the KITTI train
pipeline (KBCrop -> ratio-resize -> pad -> rotate -> flip -> crop ->
color -> normalize, data/transforms.py) at several worker counts, and
compares against the rate a multi-chip data-parallel run needs:
  required samples/s = n_chips * per_chip_batch / sec_per_step
e.g. a v5e-8 run at the driver-measured 0.567 s/step (bf16_compute,
batch 2/chip) needs 8*2/0.567 = 28.2 samples/s from EVERY host (with one
host per 8 chips; each host materialises only its shard, so per-host
need scales with local, not global, batch).

No real KITTI is mounted in this image, so samples are KITTI-raw-shaped
synthetic scenes (376x1242 + PE planes). --png adds a PNG encode once /
decode per access round-trip to emulate the disk-decode cost of real
KITTI pngs (cv2 imdecode), which the reference pays inside its
DataLoader workers (depth/datasets/builder.py:129-141 workers_per_gpu).

Usage:
  python tools/bench_loader.py [--workers 0,2,4,8] [--steps 12]
      [--global-batch 16] [--png] [--sec-per-step 0.567] [--chips 8]
"""
from __future__ import annotations

import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


class PngRoundTripDataset:
    """Wraps a dataset so every access pays a PNG decode (and the GT a
    16-bit PNG decode), emulating real-KITTI disk IO cost. Encoded bytes
    are cached at first access — steady-state cost is decode-only, like a
    warm page cache."""

    def __init__(self, base):
        self.base = base
        self._cache = {}

    def __len__(self):
        return len(self.base)

    def __getitem__(self, idx):
        import cv2
        if idx not in self._cache:
            s = self.base[idx]
            img8 = np.clip(s["img"][..., :3], 0, 255).astype(np.uint8)
            ok1, img_png = cv2.imencode(".png", img8)
            gt16 = (np.clip(s["depth_gt"], 0, 255) * 256).astype(np.uint16)
            ok2, gt_png = cv2.imencode(".png", gt16)
            assert ok1 and ok2
            rest = {k: v for k, v in s.items() if k not in ("img", "depth_gt")}
            self._cache[idx] = (img_png.tobytes(), gt_png.tobytes(),
                                s["img"][..., 3:], rest)
        img_png, gt_png, pe, rest = self._cache[idx]
        img = cv2.imdecode(np.frombuffer(img_png, np.uint8),
                           cv2.IMREAD_COLOR).astype(np.float32)
        gt = cv2.imdecode(np.frombuffer(gt_png, np.uint8),
                          cv2.IMREAD_ANYDEPTH).astype(np.float32) / 256.0
        out = dict(rest)
        out["img"] = np.concatenate([img, pe], axis=-1)
        out["depth_gt"] = gt
        return out


def main():
    ap = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    ap.add_argument("--workers", default="0,2,4,8")
    ap.add_argument("--steps", type=int, default=12)
    ap.add_argument("--global-batch", type=int, default=16)
    ap.add_argument("--size", type=int, default=64, help="dataset size")
    ap.add_argument("--png", action="store_true",
                    help="emulate PNG decode cost per access")
    ap.add_argument("--sec-per-step", type=float, default=0.567,
                    help="device step time to compare against")
    ap.add_argument("--chips", type=int, default=8)
    ap.add_argument("--per-chip-batch", type=int, default=2)
    args = ap.parse_args()

    from gedepth_tpu.configs import get_config
    from gedepth_tpu.data import TrainLoader
    from gedepth_tpu.data.synthetic import SyntheticGroundDataset
    from gedepth_tpu.train.loop import build_train_pipeline

    cfg = get_config("gedepth_adaptive_kitti")
    pipeline = build_train_pipeline(cfg)
    ds = SyntheticGroundDataset(size=args.size, height=376, width=1242)
    if args.png:
        ds = PngRoundTripDataset(ds)
        for i in range(len(ds)):  # pre-encode so timing is decode-only
            ds[i]

    need = args.chips * args.per_chip_batch / args.sec_per_step
    print(f"required: {need:.1f} samples/s for {args.chips} chips x "
          f"batch {args.per_chip_batch} at {args.sec_per_step} s/step "
          f"({'with' if args.png else 'WITHOUT'} PNG decode emulation)")
    print("workers  batches/s  samples/s  margin")
    for w in (int(x) for x in args.workers.split(",")):
        loader = TrainLoader(ds, pipeline, args.global_batch, seed=0,
                             num_workers=w, prefetch=4)
        it = iter(loader)
        next(it)  # warm up worker pool / thread + caches
        t0 = time.perf_counter()
        for _ in range(args.steps):
            next(it)
        dt = time.perf_counter() - t0
        del it
        bps = args.steps / dt
        sps = bps * args.global_batch
        print(f"{w:>7}  {bps:9.2f}  {sps:9.1f}  {sps / need:5.1f}x",
              flush=True)


if __name__ == "__main__":
    main()
