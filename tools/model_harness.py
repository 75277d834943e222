"""Full-model forward timing harness for MSDA variants.

Round-1 lesson (NOTES.md): MSDA microbenches mislead — XLA's TPU gather
cost depends on index locality, so deformable-attention timings are only
meaningful inside the real model with its real reference-point structure.
This harness builds the flagship GEDepth-Adaptive model at a configurable
resolution and times the jitted forward for each neck_sampling mode.

Usage: python tools/model_harness.py --height 176 --width 608 \
           --variants bilinear,windowed --iters 10
"""
import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--height", type=int, default=176)
    ap.add_argument("--width", type=int, default=608)
    ap.add_argument("--batch", type=int, default=1)
    ap.add_argument("--iters", type=int, default=10)
    ap.add_argument("--variants", default="bilinear,windowed")
    ap.add_argument("--config", default="gedepth_adaptive_kitti")
    ap.add_argument("--train-step", action="store_true",
                    help="time the train step instead of the forward")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    from gedepth_tpu.configs import get_config

    rng = np.random.default_rng(0)
    img = rng.standard_normal(
        (args.batch, args.height, args.width, 5)).astype(np.float32)
    img[..., 4] = np.abs(img[..., 4]) * 30 + 1.0
    img = jnp.asarray(img)
    cam_h = jnp.full((args.batch,), 1.65, jnp.float32)

    import dataclasses

    for variant in args.variants.split(","):
        cfg = get_config(args.config)
        cfg = cfg.replace(model=dataclasses.replace(
            cfg.model, neck_sampling=variant))
        model = cfg.model.build()
        # jitted init: eager flax init executes the whole model
        # op-by-op over the remote-TPU tunnel (minutes); one
        # compiled (and persistently cached) init is seconds
        variables = jax.jit(model.init)(jax.random.PRNGKey(0), img, cam_h)

        if args.train_step:
            from gedepth_tpu.train import (
                make_optimizer, create_train_state, make_train_step)
            tx, _ = make_optimizer(cfg.optim.max_lr, 1000, 0)
            state = create_train_state(model, tx, img, jax.random.PRNGKey(0),
                                       cam_h)
            step = make_train_step(model, donate=False)
            depth_gt = jnp.asarray(np.abs(rng.standard_normal(
                (args.batch, args.height, args.width))) * 20 + 1)
            pe_k = jnp.asarray(rng.integers(
                0, 11, (args.batch, args.height, args.width)).astype(
                    np.float32))
            batch = {"img": img, "depth_gt": depth_gt,
                     "pe_k_gt": pe_k, "cam_height": cam_h}

            def run():
                nonlocal state
                state, m = step(state, batch, jax.random.PRNGKey(1))
                return m["loss"]
        else:
            @jax.jit
            def forward(v, x, ch):
                return model.apply(v, x, ch, method=model.predict_depth)

            def run():
                return forward(variables, img, cam_h)

        t_c0 = time.perf_counter()
        np.asarray(run())  # compile + first exec; host fetch = real sync
        compile_s = time.perf_counter() - t_c0
        np.asarray(run())  # warm
        t0 = time.perf_counter()
        outs = [run() for _ in range(args.iters)]
        for o in outs:
            np.asarray(o)
        dt = (time.perf_counter() - t0) / args.iters
        print(f"{variant:12s} {dt * 1e3:9.1f} ms/iter "
              f"({args.batch / dt:.3f} img/s)  [compile {compile_s:.0f}s]",
              flush=True)


if __name__ == "__main__":
    main()
