#!/usr/bin/env python
"""Training CLI.

Usage:
  python tools/train.py <config-name> [--work-dir DIR] [--max-iters N]
      [--options key=value ...]

Config names come from gedepth_tpu.configs presets (e.g.
gedepth_adaptive_kitti); --options overrides dotted dataclass fields, e.g.
--options optim.max_lr=2e-4 data.data_root=/data/kitti train.global_batch=16.

Mirrors the reference tools/train.py surface (config + CLI overrides) with
explicit dataclass configs instead of mmcv Config files; distributed launch
is jax.distributed (no torchrun/slurm wrappers needed — run the same command
on every host).
"""
import argparse
import dataclasses
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def apply_options(cfg, options):
    for opt in options or []:
        key, _, raw = opt.partition("=")
        parts = key.split(".")
        # parse value
        try:
            import ast
            val = ast.literal_eval(raw)
        except (ValueError, SyntaxError):
            val = raw
        obj_path = []
        obj = cfg
        for p in parts[:-1]:
            obj_path.append((obj, p))
            obj = getattr(obj, p)
        obj = dataclasses.replace(obj, **{parts[-1]: val})
        for parent, name in reversed(obj_path):
            obj = dataclasses.replace(parent, **{name: obj})
        cfg = obj
    return cfg


def main():
    parser = argparse.ArgumentParser(description="Train GEDepth-TPU")
    parser.add_argument("config", help="preset name (see --list)")
    parser.add_argument("--work-dir", default=None)
    parser.add_argument("--max-iters", type=int, default=None)
    parser.add_argument("--eval-max-images", type=int, default=None)
    parser.add_argument("--load-backbone-from", default=None,
                        help="stage-1 pe-mask backbone npz overlay")
    parser.add_argument("--resume-from", default=None,
                        help="orbax checkpoint dir to resume (iter+optim)")
    parser.add_argument("--seed", type=int, default=None)
    parser.add_argument("--multihost", action="store_true",
                        help="call jax.distributed.initialize() first")
    parser.add_argument("--options", nargs="*", default=None,
                        help="dotted dataclass overrides key=value")
    parser.add_argument("--list", action="store_true", dest="list_configs")
    args = parser.parse_args()

    from gedepth_tpu.configs import get_config, list_configs

    if args.list_configs:
        print("\n".join(list_configs()))
        return

    if args.multihost:
        import jax
        jax.distributed.initialize()

    cfg = get_config(args.config)
    cfg = apply_options(cfg, args.options)
    if args.seed is not None:
        cfg = cfg.replace(train=dataclasses.replace(cfg.train, seed=args.seed))

    from gedepth_tpu.train.loop import train

    state, best = train(cfg, work_dir=args.work_dir,
                        max_iters=args.max_iters,
                        eval_max_images=args.eval_max_images,
                        load_backbone_from=args.load_backbone_from,
                        resume_from=args.resume_from)
    print("best:", {k: round(v, 4) for k, v in best.items()
                    if isinstance(v, float)})


if __name__ == "__main__":
    main()
