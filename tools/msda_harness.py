"""MSDA implementation shoot-out at HAHI-neck scale.

Times gedepth_tpu.ops.msda variants at the exact shapes the HAHI neck uses
for a given eval resolution (default 352x1216, the KITTI protocol), without
building the rest of the model — compiles in seconds instead of tens of
minutes, so it is the iteration harness for deformable-attention work.

Usage: python tools/msda_harness.py [--height 352] [--width 1216]
       [--variants flat,windowed4,...] [--iters 20]
"""
import argparse
import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def level_shapes(height, width):
    h4, w4 = height // 4, width // 4
    return tuple((h4 // (1 << i), w4 // (1 << i)) for i in range(4))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--height", type=int, default=352)
    ap.add_argument("--width", type=int, default=1216)
    ap.add_argument("--batch", type=int, default=1)
    ap.add_argument("--heads", type=int, default=8)
    ap.add_argument("--dim", type=int, default=64)
    ap.add_argument("--points", type=int, default=8)
    ap.add_argument("--iters", type=int, default=20)
    ap.add_argument("--stage", choices=["cross", "self", "both"],
                    default="both")
    ap.add_argument("--variants", type=str,
                    default="flat,flat_bf16,windowed4,windowed2")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    from gedepth_tpu.ops import msda

    shapes = level_shapes(args.height, args.width)
    B, h, d, P = args.batch, args.heads, args.dim, args.points
    L = len(shapes)
    hw_total = sum(H * W for H, W in shapes)
    qh, qw = args.height // 2, args.width // 2  # conv-stem query grid

    rng = np.random.default_rng(0)

    def make_inputs(nq, dtype):
        vals = [jnp.asarray(rng.standard_normal((B, H, W, h, d)), dtype)
                for H, W in shapes]
        # reference-point-plus-small-offset locations (realistic: near grid)
        ref = rng.uniform(0.02, 0.98, (B, nq, 1, 1, 1, 2))
        off = rng.standard_normal((B, nq, h, L, P, 2)) * 0.01
        locs = jnp.asarray(np.clip(ref + off, 0.0, 1.0), jnp.float32)
        w = rng.uniform(0, 1, (B, nq, h, L, P)).astype(np.float32)
        w /= w.sum(axis=(3, 4), keepdims=True)
        wpx = jnp.asarray(rng.standard_normal((B, nq, h, L, P, 2)), jnp.float32)
        return vals, locs, jnp.asarray(w), wpx

    def timeit(name, fn, *inputs):
        try:
            out = fn(*inputs)
            np.asarray(out)  # sync (axon: host fetch is the only sync)
            t0 = time.perf_counter()
            outs = [fn(*inputs) for _ in range(args.iters)]
            for o in outs:
                np.asarray(o)
            dt = (time.perf_counter() - t0) / args.iters * 1e3
            print(f"  {name:24s} {dt:9.2f} ms")
            return dt
        except Exception as e:
            print(f"  {name:24s} FAIL {type(e).__name__}: "
                  f"{str(e).splitlines()[0][:120]}")
            return None

    stages = []
    if args.stage in ("cross", "both"):
        stages.append(("cross", qh * qw, (qh, qw)))
    if args.stage in ("self", "both"):
        stages.append(("self", hw_total, None))

    variants = args.variants.split(",")
    for stage_name, nq, qgrid in stages:
        print(f"[{stage_name}] Nq={nq} levels={shapes} h={h} d={d} P={P}")
        for v in variants:
            if v.startswith("windowed"):
                radius = int(v[len("windowed"):] or 4)
                if stage_name == "self":
                    # windowed self-attn runs one grid per level
                    def run_self(vals, wpx, w, radius=radius):
                        outs, s = [], 0
                        for (H_, W_) in shapes:
                            n = H_ * W_
                            outs.append(msda.msda_sample_windowed(
                                vals, radius * jnp.tanh(
                                    wpx[:, s:s + n] / radius),
                                w[:, s:s + n], (H_, W_), radius=radius))
                            s += n
                        return jnp.concatenate(outs, axis=1)
                    fn = jax.jit(run_self)
                    vals, locs, w, wpx = make_inputs(nq, jnp.float32)
                    timeit(v, fn, vals, wpx, w)
                else:
                    fn = jax.jit(functools.partial(
                        msda.msda_sample_windowed, query_hw=qgrid,
                        radius=radius))
                    vals, locs, w, wpx = make_inputs(nq, jnp.float32)
                    wpx_b = radius * jnp.tanh(wpx / radius)
                    timeit(v, lambda a, b, c: fn(a, b, c), vals, wpx_b, w)
            else:
                dtype = jnp.bfloat16 if v.endswith("bf16") else jnp.float32
                base = v.replace("_bf16", "")
                impl = "flat" if base == "flat" else "per_level"
                sampling = "nearest" if base == "nearest" else "bilinear"
                if base == "nearest":
                    impl = "flat"
                fn = jax.jit(functools.partial(
                    msda.msda_sample, impl=impl, sampling=sampling))
                vals, locs, w, wpx = make_inputs(nq, dtype)
                timeit(v, fn, vals, locs, w)


if __name__ == "__main__":
    main()
