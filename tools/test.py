#!/usr/bin/env python
"""Evaluation CLI.

Usage:
  python tools/test.py <config-name> <checkpoint.npz> [--max-images N]
      [--no-tta] [--show-dir DIR] [--format-only --format-dir DIR]
      [--options ...]

Checkpoint is a weights-only npz produced by training (best_abs_rel.npz) or
the torch converter (tools/convert_torch_checkpoint.py). Prints the 9-metric
table (reference tools/test.py surface).
"""
import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    parser = argparse.ArgumentParser(description="Evaluate GEDepth-TPU")
    parser.add_argument("config")
    parser.add_argument("checkpoint")
    parser.add_argument("--max-images", type=int, default=None)
    parser.add_argument("--batch-size", type=int, default=1)
    parser.add_argument("--no-tta", action="store_true")
    parser.add_argument("--aug-test", action="store_true",
                        help="multi-scale TTA (reference tools/test.py:96-101"
                             " intent): ratios x flip, predictions averaged")
    parser.add_argument("--aug-ratios", default="0.5,0.75,1.0,1.25,1.5,1.75",
                        help="comma-separated ratios for --aug-test")
    parser.add_argument("--bf16", action="store_true",
                        help="run the eval forward in bfloat16 (depth "
                             "clamps and final resize stay f32)")
    parser.add_argument("--slide", action="store_true",
                        help="sliding-window inference (test_cfg "
                             "mode='slide'): tile/stride from --slide-tile/"
                             "--slide-stride, overlaps averaged")
    parser.add_argument("--slide-tile", default=None,
                        help="H,W of the slide window (default: train crop)")
    parser.add_argument("--slide-stride", default=None,
                        help="H,W slide step (default: half the tile)")
    parser.add_argument("--device-metrics", action="store_true",
                        help="compute the 9 per-image metrics on device "
                             "(batched masked reductions) instead of on "
                             "the host; same numbers, less host math")
    parser.add_argument("--show-dir", default=None,
                        help="dump colorized depth maps here")
    parser.add_argument("--format-only", action="store_true")
    parser.add_argument("--format-dir", default="format_results")
    parser.add_argument("--multi-device", action="store_true",
                        help="shard eval batches over all local devices "
                             "(requires --batch-size to be a multiple of "
                             "the device count)")
    parser.add_argument("--multihost", action="store_true",
                        help="call jax.distributed.initialize() first; "
                             "each process evaluates its strided dataset "
                             "shard and metrics are allgathered (reference "
                             "multi_gpu_test + collect_results_cpu)")
    parser.add_argument("--options", nargs="*", default=None)
    args = parser.parse_args()

    import numpy as np
    import jax

    if args.multihost:
        jax.distributed.initialize()

    from gedepth_tpu.configs import get_config
    from gedepth_tpu.train.loop import build_datasets
    from gedepth_tpu.train.checkpoint import load_params_only
    from gedepth_tpu.eval import Evaluator
    from tools.train import apply_options

    cfg = get_config(args.config)
    cfg = apply_options(cfg, args.options)

    model = cfg.model.build()
    _, test_ds = build_datasets(cfg)

    # init a template then load weights
    import jax.numpy as jnp
    h, w = cfg.data.eval_size
    c = 5 if cfg.model.pe_variant != "none" else 3
    img0 = jnp.zeros((1, h, w, c), jnp.float32)
    img0 = img0.at[..., -1].set(1.0) if c == 5 else img0
    variables = model.init(jax.random.PRNGKey(0), img0,
                           jnp.ones((1,), jnp.float32))
    params, stats = load_params_only(args.checkpoint, variables["params"],
                                     variables.get("batch_stats", {}))

    ms_ratios = (tuple(float(r) for r in args.aug_ratios.split(","))
                 if args.aug_test else ())
    data_mesh = None
    if args.multi_device:
        from gedepth_tpu.parallel import create_mesh
        data_mesh = create_mesh(jax.local_devices())
    evaluator = Evaluator(model, test_ds, cfg.data,
                          data_mesh=data_mesh,
                          batch_size=args.batch_size,
                          flip_tta=False if args.no_tta else None,
                          ms_ratios=ms_ratios,
                          device_metrics=args.device_metrics,
                          bf16=args.bf16,
                          mode="slide" if args.slide else None,
                          slide_tile=tuple(
                              int(v) for v in args.slide_tile.split(","))
                          if args.slide_tile else None,
                          slide_stride=tuple(
                              int(v) for v in args.slide_stride.split(","))
                          if args.slide_stride else None)

    on_prediction = None
    if args.format_only or args.show_dir:
        import os
        from PIL import Image as PILImage

        def on_prediction(index, pred):
            name = test_ds.infos[index]["filename"].replace("/", "_")
            stem = os.path.splitext(name)[0]
            if args.format_only:
                # uint16 x depth_scale export (reference format_results,
                # kitti.py:343-346)
                os.makedirs(args.format_dir, exist_ok=True)
                out16 = np.clip(pred * cfg.data.gt_depth_scale, 0,
                                65535).astype(np.uint16)
                PILImage.fromarray(out16).save(
                    os.path.join(args.format_dir, stem + ".png"))
            if args.show_dir:
                from gedepth_tpu.utils import colorize_depth
                os.makedirs(args.show_dir, exist_ok=True)
                PILImage.fromarray(colorize_depth(pred)).save(
                    os.path.join(args.show_dir, stem + "_depth.png"))

    agg, per_image = evaluator.run(params, stats, max_images=args.max_images,
                                   progress=50, on_prediction=on_prediction,
                                   compute_metrics=not args.format_only)
    if args.format_only:
        print(f"wrote formatted predictions to {args.format_dir}")
        return

    names = list(agg.keys())
    widths = [max(len(n), 8) for n in names]
    print("+" + "+".join("-" * (w + 2) for w in widths) + "+")
    print("|" + "|".join(f" {n:>{w}} " for n, w in zip(names, widths)) + "|")
    print("+" + "+".join("-" * (w + 2) for w in widths) + "+")
    print("|" + "|".join(f" {agg[n]:>{w}.4f} " for n, w in zip(names, widths))
          + "|")
    print("+" + "+".join("-" * (w + 2) for w in widths) + "+")


if __name__ == "__main__":
    main()
