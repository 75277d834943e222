#!/usr/bin/env python
"""Export a preset + checkpoint to an AOT StableHLO serving artifact.

Beyond-reference deployment surface (the reference serves by installing the
whole torch/mmcv training repo): produces a directory with the lowered
program (model.stablehlo), the weights (weights.msgpack) and meta.json that
a bare JAX runtime can execute via gedepth_tpu.apis.export.load_exported —
or any StableHLO consumer, without the model code.

Examples:
    python tools/export.py gedepth_adaptive_kitti_compat \
        --checkpoint work/ckpt --output serve/gedepth_kitti
    python tools/export.py smoke_synthetic --output /tmp/art --self-check
"""
import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("config", help="preset name (tools/print_config.py lists)")
    p.add_argument("--checkpoint", default=None,
                   help="orbax checkpoint dir (converted or trained)")
    p.add_argument("--output", required=True, help="artifact directory")
    p.add_argument("--batch", type=int, default=1)
    p.add_argument("--height", type=int, default=None)
    p.add_argument("--width", type=int, default=None)
    p.add_argument("--platforms", default="tpu,cpu",
                   help="comma-separated lowering targets")
    p.add_argument("--bf16", action="store_true",
                   help="bf16 forward (output depth stays f32)")
    p.add_argument("--no-flip-tta", action="store_true")
    p.add_argument("--self-check", action="store_true",
                   help="reload the artifact and run one random batch")
    args = p.parse_args()

    import gedepth_tpu  # noqa: F401  (platform/compile-cache setup)
    from gedepth_tpu.apis.export import (export_depther, load_exported,
                                         save_exported)

    hw = None
    if args.height or args.width:
        if not (args.height and args.width):
            p.error("--height and --width must be given together")
        hw = (args.height, args.width)

    exported, variables, meta = export_depther(
        args.config, checkpoint=args.checkpoint, batch=args.batch, hw=hw,
        platforms=[s.strip() for s in args.platforms.split(",") if s.strip()],
        flip_tta=False if args.no_flip_tta else None, bf16=args.bf16)
    save_exported(args.output, exported, variables, meta)
    size = sum(os.path.getsize(os.path.join(args.output, f))
               for f in os.listdir(args.output))
    print(f"exported {meta['config']} -> {args.output} "
          f"({size / 1e6:.1f} MB, platforms={meta['platforms']}, "
          f"img={meta['input']['img']})")

    if args.self_check:
        import numpy as np
        sm = load_exported(args.output)
        b, h, w, c = sm.meta["input"]["img"]
        rng = np.random.default_rng(0)
        img = rng.standard_normal((b, h, w, c)).astype(np.float32)
        if c == 5:
            img[..., 4] = np.abs(img[..., 4]) * 30 + 1.0
            img[..., 3] = np.clip(img[..., 4], 0, None) / 200.0
        depth = sm.predict(img)
        print(f"self-check ok: depth {depth.shape} "
              f"range [{depth.min():.3f}, {depth.max():.3f}] m")


if __name__ == "__main__":
    main()
