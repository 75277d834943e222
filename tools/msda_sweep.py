"""Sweep the MSDA Pallas-kernel tunables on real hardware.

Each configuration runs in a fresh subprocess (the tunables are env vars
read at trace time) timing the flagship inference forward via
tools/benchmark.py, and the best setting is printed last as one JSON line.

  python tools/msda_sweep.py gedepth_adaptive_kitti_tpu --bf16 \
      --qtile "8,16;4,32;16,8" --vp-lanes "0;64;128" --iters 20

Tunables swept (see ops/pallas/msda_windowed.py + ops/msda.py):
  GEDEPTH_MSDA_QTILE    "th,tw" query-tile aspect (window area scales with
                        the tile bounding box, so squarer tiles shrink the
                        per-tile value band)
  GEDEPTH_MSDA_VP_LANES padded-value lane width (0 = default full 128)
  GEDEPTH_MSDA_TILE     XLA tiled-path tile "ty,tx" (only relevant for the
                        non-Pallas paths)
  GEDEPTH_MSDA_FUSE     1 = single fused multi-level pallas_call

No reference analogue; this is the tuning harness for the TPU kernel that
replaces mmcv's CUDA MultiScaleDeformableAttention (reference
depth/models/necks/hahi.py:16).
"""
import argparse
import itertools
import json
import os
import re
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def run_one(config, env_overrides, iters, bf16, timeout):
    env = dict(os.environ, **{k: v for k, v in env_overrides.items() if v})
    cmd = [sys.executable, os.path.join(REPO, "tools", "benchmark.py"),
           config, "--iters", str(iters), "--warmup", "3"]
    if bf16:
        cmd.append("--bf16")
    try:
        out = subprocess.run(cmd, capture_output=True, text=True,
                             timeout=timeout, env=env, cwd=REPO)
    except subprocess.TimeoutExpired:
        return {"error": "timeout"}
    # benchmark.py prints "Overall fps: X img / s (Y ms / iter, batch B)"
    m = re.findall(r"Overall fps: ([\d.]+) img / s \(([\d.]+) ms",
                   out.stdout or "")
    if not m:
        tail = (out.stdout or "")[-300:] + (out.stderr or "")[-300:]
        return {"error": tail.strip()[-200:]}
    return {"images_per_sec": float(m[-1][0]),
            "ms_per_iter": float(m[-1][1])}


def main():
    ap = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    ap.add_argument("config", nargs="?",
                    default="gedepth_adaptive_kitti_tpu")
    ap.add_argument("--bf16", action="store_true")
    ap.add_argument("--qtile", default=";8,16;4,32;16,8",
                    help="semicolon-separated th,tw values ('' = default)")
    ap.add_argument("--vp-lanes", default=";64;128",
                    help="semicolon-separated lane widths ('' = default)")
    ap.add_argument("--fuse", default="0", help="semicolon list of 0/1")
    ap.add_argument("--iters", type=int, default=20)
    ap.add_argument("--timeout", type=int, default=3600,
                    help="per-point timeout (cold Mosaic compiles are slow)")
    args = ap.parse_args()

    grid = list(itertools.product(args.qtile.split(";"),
                                  args.vp_lanes.split(";"),
                                  args.fuse.split(";")))
    best = None
    for qtile, vp, fuse in grid:
        env = {"GEDEPTH_MSDA_QTILE": qtile,
               "GEDEPTH_MSDA_VP_LANES": vp,
               "GEDEPTH_MSDA_FUSE": fuse}
        r = run_one(args.config, env, args.iters, args.bf16, args.timeout)
        point = {"qtile": qtile or "default", "vp_lanes": vp or "default",
                 "fuse": fuse, **r}
        print(json.dumps(point), flush=True)
        ips = r.get("images_per_sec") or r.get("value")
        if ips and (best is None or ips > best["images_per_sec"]):
            best = {"qtile": qtile, "vp_lanes": vp, "fuse": fuse,
                    "images_per_sec": ips}
    print(json.dumps({"best": best}), flush=True)


if __name__ == "__main__":
    main()
