#!/usr/bin/env python
"""Inference throughput benchmark (reference tools/benchmark.py protocol:
warmup iters then timed iters with device sync; prints FPS). Also supports
jax.profiler trace dumps for TPU performance work.

Usage:
  python tools/benchmark.py <config-name> [--iters 200] [--warmup 5]
      [--batch 1] [--height 352] [--width 1216] [--trace-dir DIR]
"""
import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("config")
    parser.add_argument("--iters", type=int, default=200)
    parser.add_argument("--warmup", type=int, default=5)
    parser.add_argument("--batch", type=int, default=1)
    parser.add_argument("--height", type=int, default=352)
    parser.add_argument("--width", type=int, default=1216)
    parser.add_argument("--trace-dir", default=None)
    parser.add_argument("--train-step", action="store_true",
                        help="benchmark the training step instead")
    parser.add_argument("--sync", choices=("scalar", "full"),
                        default="scalar",
                        help="device sync: fetch an in-jit scalar checksum "
                        "(reference protocol never copies outputs; 4 bytes "
                        "over the tunnel) or the full prediction")
    parser.add_argument("--bf16", action="store_true",
                        help="cast params/activations to bfloat16 at the "
                        "jit boundary (with --train-step: mixed-precision "
                        "training, f32 master params/grads; otherwise "
                        "inference with f32 depth clamps/final resize)")
    parser.add_argument("--options", nargs="*", default=None,
                        help="dotted dataclass overrides, e.g. "
                        "model.neck_hi_min_level=1 (same syntax as "
                        "tools/train.py)")
    args = parser.parse_args()

    import numpy as np
    import jax
    import jax.numpy as jnp
    from gedepth_tpu.configs import get_config

    cfg = get_config(args.config)
    if args.options:
        from tools.train import apply_options
        cfg = apply_options(cfg, args.options)
    model = cfg.model.build()
    c = 5 if cfg.model.pe_variant != "none" else 3
    rng = np.random.default_rng(0)
    img = rng.standard_normal(
        (args.batch, args.height, args.width, c)).astype(np.float32)
    if c == 5:
        img[..., 4] = np.abs(img[..., 4]) * 30 + 1.0
    img = jnp.asarray(img)
    ch = jnp.full((args.batch,), cfg.model.default_cam_height, jnp.float32)

    # jitted init: eager flax init executes the whole model
    # op-by-op over the remote-TPU tunnel (minutes); one
    # compiled (and persistently cached) init is seconds
    variables = jax.jit(model.init)(jax.random.PRNGKey(0), img, ch)
    if args.bf16 and not args.train_step:
        # serving semantics (apis.inference.init_depther(bf16=True)): hold
        # the params in bf16 instead of re-casting the full f32 tree from
        # HBM inside every jitted forward
        variables = jax.jit(lambda v: jax.tree.map(
            lambda t: t.astype(jnp.bfloat16)
            if t.dtype == jnp.float32 else t, v))(variables)

    if args.train_step:
        from gedepth_tpu.train import (
            make_optimizer, create_train_state, make_train_step)
        tx, _ = make_optimizer(cfg.optim.max_lr, 1000, 0)
        state = create_train_state(model, tx, img, jax.random.PRNGKey(0), ch)
        step = make_train_step(model, bf16=args.bf16)
        batch = {
            "img": img,
            "depth_gt": jnp.abs(img[..., 0]) * 10,
            "pe_k_gt": jnp.zeros(img.shape[:3], jnp.float32),
            "cam_height": ch,
        }
        def run():
            nonlocal state
            state, m = step(state, batch, jax.random.PRNGKey(1))
            return m["loss"]
    else:
        @jax.jit
        def forward(v, x, c_):
            if args.bf16:
                # params already bf16 (cast once above); input casts here
                x = x.astype(jnp.bfloat16)
            depth = model.apply(v, x, c_, method=model.predict_depth)
            # scalar sync: the checksum depends on the whole computation,
            # so fetching it is a true device sync without the multi-MB
            # per-iteration output copy over the remote-TPU tunnel
            return depth if args.sync == "full" else jnp.sum(
                depth.astype(jnp.float32))

        def run():
            return forward(variables, img, ch)

    def fetch(o):
        # axon remote TPU: block_until_ready can return early; host fetch
        # is the reliable sync
        return jax.tree.map(lambda t: np.asarray(t), o)

    fetch(run())
    for _ in range(args.warmup):
        out = run()
    fetch(out)

    if args.trace_dir:
        jax.profiler.start_trace(args.trace_dir)

    t0 = time.perf_counter()
    outs = [run() for _ in range(args.iters)]
    for o in outs:
        fetch(o)
    dt = time.perf_counter() - t0

    if args.trace_dir:
        jax.profiler.stop_trace()
        print(f"trace written to {args.trace_dir}")

    fps = args.batch * args.iters / dt
    print(f"Overall fps: {fps:.2f} img / s "
          f"({dt / args.iters * 1000:.1f} ms / iter, batch {args.batch})")


if __name__ == "__main__":
    main()
