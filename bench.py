"""Benchmark: KITTI-eval-shape inference throughput of GEDepth-Adaptive.

Prints ONE JSON line per benchmarked config (the TPU-native flagship LAST —
it is the headline number a single-line consumer parses):

  {"metric": ..., "value": N, "unit": "images/sec", "vs_baseline": N}

Protocol mirrors the reference's tools/benchmark.py (warmup then timed
iters, device-synchronised) at the KITTI eval resolution 352x1216, batch 1,
no flip TTA.

Configs benchmarked (override with BENCH_CONFIGS=comma,separated):
  * gedepth_adaptive_kitti        — exact mmcv-MSDA semantics (XLA flat
                                    gather); the checkpoint-parity config.
  * gedepth_adaptive_kitti_compat — reference parameter tree routed through
                                    the dense windowed Pallas sampler
                                    (loads converted checkpoints).
  * gedepth_adaptive_kitti_tpu    — TPU-native flagship (windowed sampling,
                                    train-from-scratch parameter tree).
The headline (last) line is the flagship at bf16 — the TPU-native
production precision (abs-rel depth delta vs f32 measured at 0.0013 on
converted Swin-S-scale weights, tests/test_composite_deltas.py).

vs_baseline: the reference publishes no throughput figures (SURVEY.md §6).
We normalise against an assumed 10 images/sec for the PyTorch
DepthFormer-SwinL on one A100 (same protocol), the BASELINE.json comparison
point; adjust ASSUMED_BASELINE_FPS when a measured number lands.
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

ASSUMED_BASELINE_FPS = 10.0
BATCH = int(os.environ.get("BENCH_BATCH", "1"))
WARMUP = int(os.environ.get("BENCH_WARMUP", "5"))
ITERS = int(os.environ.get("BENCH_ITERS", "50"))
HEIGHT, WIDTH = 352, 1216
DEFAULT_CONFIGS = ("gedepth_adaptive_kitti,"
                   "gedepth_adaptive_kitti_compat,"
                   "gedepth_adaptive_kitti_tpu,"
                   "gedepth_adaptive_kitti_tpu:bf16")


def bench_config(name, bf16=False):
    import numpy as np
    import jax
    import jax.numpy as jnp
    from gedepth_tpu.configs import get_config

    cfg = get_config(name)
    model = cfg.model.build()

    rng = np.random.default_rng(0)
    img = rng.standard_normal((BATCH, HEIGHT, WIDTH, 5)).astype(np.float32)
    img[..., 4] = np.abs(img[..., 4]) * 30 + 1.0
    img = jnp.asarray(img)
    cam_h = jnp.full((BATCH,), 1.65, jnp.float32)

    # jitted init: eager flax init executes the whole model
    # op-by-op over the remote-TPU tunnel (minutes); one
    # compiled (and persistently cached) init is seconds
    variables = jax.jit(model.init)(jax.random.PRNGKey(0), img, cam_h)

    # Sync protocol: the reference's tools/benchmark.py never copies the
    # prediction to host (torch.cuda.synchronize() only). On the axon
    # remote-TPU platform block_until_ready() is unreliable, so we sync by
    # fetching a SCALAR checksum computed inside the same jit — the fetch
    # depends on the full computation (true sync) but moves 4 bytes per
    # iteration instead of the 1.7 MB depth map over the tunnel.
    # BENCH_SYNC=full restores the full-map fetch for comparison.
    sync_full = os.environ.get("BENCH_SYNC", "scalar") == "full"

    @jax.jit
    def forward(v, x, ch):
        if bf16:
            # TPU-native precision: bf16 params/activations (measured
            # abs-rel depth delta 0.0013 on converted Swin-S-scale
            # weights, tests/test_composite_deltas.py); depth clamps and
            # the final resize stay f32 inside predict_depth.
            v = jax.tree.map(
                lambda t: t.astype(jnp.bfloat16)
                if t.dtype == jnp.float32 else t, v)
            x = x.astype(jnp.bfloat16)
        depth = model.apply(v, x, ch,
                            method=model.predict_depth).astype(jnp.float32)
        return depth if sync_full else jnp.sum(depth)

    # NOTE: on the axon remote-TPU platform block_until_ready() can return
    # before execution completes; a host fetch is the only reliable sync.
    np.asarray(forward(variables, img, cam_h))
    for _ in range(WARMUP):
        out = forward(variables, img, cam_h)
    np.asarray(out)

    t0 = time.perf_counter()
    outs = [forward(variables, img, cam_h) for _ in range(ITERS)]
    for o in outs:
        np.asarray(o)  # force completion of every iteration
    dt = time.perf_counter() - t0

    ips = BATCH * ITERS / dt
    tag = "_bf16" if bf16 else ""
    print(json.dumps({
        "metric": f"{cfg.name}{tag}_swinl_352x1216_infer",
        "value": round(ips, 3),
        "unit": "images/sec",
        "vs_baseline": round(ips / ASSUMED_BASELINE_FPS, 3),
    }), flush=True)


def main():
    names = os.environ.get(
        "BENCH_CONFIG",  # single-config compatibility override
        os.environ.get("BENCH_CONFIGS", DEFAULT_CONFIGS))
    for name in names.split(","):
        name = name.strip()
        bf16 = name.endswith(":bf16")
        bench_config(name[:-5] if bf16 else name, bf16=bf16)


if __name__ == "__main__":
    main()
