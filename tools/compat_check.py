"""Per-checkpoint windowed_compat acceptance: pick the window radius.

The parity presets route the reference parameter tree through the dense
windowed sampler with displacements clamped to +-R level pixels
(models/hahi.py windowed_compat). How much a given TRAINED checkpoint is
distorted by the clamp depends on how far its learned reference points +
offsets actually reach, so the shipped procedure is per-checkpoint:

  1. run this tool on the converted checkpoint;
  2. read the table: per radius, the end-to-end abs-rel depth delta of
     the compat (and mixed-precision parity-scope) forward vs the EXACT
     mmcv-semantics gather on the same weights, plus the clamped
     attention mass per deformable-attention layer;
  3. serve the smallest R whose delta clears your budget (the shipped
     parity preset uses 1e-3, the released-checkpoint Abs-Rel budget).

Usage:
  python tools/compat_check.py converted.npz \
      [--config gedepth_adaptive_kitti_parity] [--radii 4,5,6,8] \
      [--budget 1e-3] [--images 2] [--seed 0] [--cpu]

Inputs are synthetic KITTI-shaped scenes (no dataset needed): the
quantity under test — where the checkpoint's offsets sample — is a
function of the weights, query grids, and input statistics, not of real
pixels. Measured rankings on synthetic vs harness-converted weights
agree (tests/test_compat_stress.py).
"""
from __future__ import annotations

import argparse
import dataclasses
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    ap.add_argument("checkpoint", help=".npz from convert_torch_checkpoint")
    ap.add_argument("--config", default="gedepth_adaptive_kitti_parity")
    ap.add_argument("--radii", default="4,5,6,8")
    ap.add_argument("--budget", type=float, default=1e-3)
    ap.add_argument("--images", type=int, default=2)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--cpu", action="store_true",
                    help="force the CPU backend (no TPU attached)")
    ap.add_argument("--options", nargs="*", default=None,
                    help="dotted config overrides, e.g. "
                         "model.embed_dims=32 data.eval_size=64,128")
    args = ap.parse_args()

    import jax
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from gedepth_tpu.configs import get_config
    from gedepth_tpu.train.checkpoint import load_params_only
    from gedepth_tpu.apis.inference import cast_params_bf16

    cfg = get_config(args.config)
    if args.options:
        from tools.train import apply_options
        cfg = apply_options(cfg, args.options)
    mc = cfg.model
    assert mc.neck_sampling == "windowed_compat", \
        "--config must be a windowed_compat preset"
    h, w = cfg.data.eval_size
    radii = [int(r) for r in args.radii.split(",")]
    scope = getattr(mc, "bf16_scope", "none")

    rng = np.random.default_rng(args.seed)
    img = rng.standard_normal((args.images, h, w, 5)).astype(np.float32)
    img[..., 3] = np.abs(img[..., 3]) * 0.3
    img[..., 4] = np.abs(img[..., 4]) * 30 + 1.0
    img = jnp.asarray(img)
    ch = jnp.full((args.images,), mc.default_cam_height, jnp.float32)

    # exact reference forward on the same weights (scan layout shared)
    exact_mc = dataclasses.replace(mc, neck_sampling="bilinear",
                                   bf16_scope="none")
    exact = exact_mc.build()
    variables = jax.jit(exact.init)(jax.random.PRNGKey(0), img, ch)
    params, stats = load_params_only(args.checkpoint, variables["params"],
                                     variables.get("batch_stats", {}))
    v = {"params": params, "batch_stats": stats}
    ref = np.asarray(jax.jit(lambda v, x: exact.apply(
        v, x, ch, method=exact.predict_depth))(v, img)).astype(np.float32)

    def abs_rel(x):
        return float(np.mean(np.abs(x - ref)
                             / np.maximum(ref, mc.min_depth)))

    print(f"config {args.config}  ckpt {args.checkpoint}  "
          f"{args.images}x{h}x{w}  budget {args.budget:g}")
    print(f"{'R':>3}  {'delta_f32':>10}  "
          f"{'delta_' + (scope if scope != 'none' else 'n/a'):>20}  "
          f"clamp_mass(self/cross)")
    rec_f32 = rec_scope = None
    for R in radii:
        row = [f"{R:>3}"]
        m_f32 = dataclasses.replace(mc, neck_window_radius=R,
                                    bf16_scope="none").build()
        out, inter = m_f32.apply(v, img, ch, method=m_f32.predict_depth,
                                 mutable=["intermediates"])
        d_f32 = abs_rel(np.asarray(out).astype(np.float32))
        row.append(f"{d_f32:>10.5f}")
        if scope != "none":
            m_s = dataclasses.replace(mc, neck_window_radius=R).build()
            vs = cast_params_bf16(v, scope=scope)
            out_s = m_s.apply(vs, img, ch, method=m_s.predict_depth)
            d_s = abs_rel(np.asarray(out_s).astype(np.float32))
            row.append(f"{d_s:>20.5f}")
        else:
            d_s = None
            row.append(f"{'-':>20}")
        masses = [float(np.asarray(x)) for x in
                  jax.tree_util.tree_leaves(inter.get("intermediates", {}))]
        row.append("  " + "/".join(f"{m:.3f}" for m in masses))
        print("".join(row), flush=True)
        if rec_f32 is None and d_f32 < args.budget:
            rec_f32 = R
        if rec_scope is None and d_s is not None and d_s < args.budget:
            rec_scope = R

    if scope != "none":
        if rec_scope is not None:
            print(f"RECOMMENDATION: serve {args.config} with "
                  f"neck_window_radius={rec_scope} (bf16_scope={scope}); "
                  f"delta clears {args.budget:g}.")
        else:
            print(f"RECOMMENDATION: no tested radius clears {args.budget:g} "
                  f"at bf16_scope={scope}; try larger --radii or f32 "
                  f"(best f32 R: {rec_f32}).")
    elif rec_f32 is not None:
        print(f"RECOMMENDATION: neck_window_radius={rec_f32} (f32).")
    else:
        print(f"RECOMMENDATION: no tested radius clears {args.budget:g}; "
              f"try larger --radii or the exact config.")


if __name__ == "__main__":
    main()
