"""Benchmark: KITTI-shape inference + training throughput of GEDepth-Adaptive.

Prints ONE JSON line per benchmarked metric (the TPU-native flagship
inference number LAST — it is the headline a single-line consumer parses):

  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N,
   "fingerprint": ...}

Inference protocol mirrors the reference's tools/benchmark.py (warmup then
timed iters, device-synchronised) at the KITTI eval resolution 352x1216,
batch 1, no flip TTA. The train metric times the full jitted train step
(fwd+bwd+AdamW, donated state) at the training crop 352x704, batch 2 — the
reference's per-GPU shape (configs/depthformer/depthformer_a.py crop +
samples_per_gpu=2).

Configs benchmarked (override with BENCH_CONFIGS=comma,separated; append
":bf16" for the bf16 inference variant, prefix "train:" for a train-step
metric, "train+bf16:" for bf16_compute mixed-precision training):
  * gedepth_adaptive_kitti        — exact mmcv-MSDA semantics (XLA flat
                                    gather); the checkpoint-parity config.
  * gedepth_adaptive_kitti_compat — reference parameter tree routed through
                                    the dense windowed Pallas sampler
                                    (loads converted checkpoints unchanged).
  * gedepth_adaptive_kitti_parity — THE parity serving config (PARITY.md
                                    round 5): compat tree, R=5 window,
                                    bf16_scope='backbone_head' mixed
                                    precision — >=10 img/s AND <=0.001
                                    measured abs-rel delta vs exact f32.
  * gedepth_adaptive_kitti_tpu    — TPU-native flagship (windowed sampling,
                                    train-from-scratch parameter tree).
The headline (last) line is the flagship at bf16 — the TPU-native
production precision (abs-rel depth delta vs f32 measured at 0.0013 on
converted Swin-S-scale weights, tests/test_composite_deltas.py).

vs_baseline: the reference publishes no throughput figures (SURVEY.md §6).
For inference we normalise against an estimated 10 images/sec for the
PyTorch DepthFormer-SwinL on one A100 (same protocol); for training against
an estimated 1.0 s/step at the same per-device shape. These constants are
grounded in BASELINE.md ("Grounding the assumed A100 baseline"): one
forward is 1.47 TFLOPs/image (tools/flops.py on the exact config), so
10 img/s = 9.4% of A100 TF32 peak — the TOP of the realistic batch-1
eager-mode band, i.e. generous to the reference. Adjust when measured
numbers land. >1.0 is better than baseline for every line. Every line also
carries `mfu` + `gflops_per_image` — the absolute axis (achieved FLOP/s
over the device's dense bf16 MXU peak) that needs no A100 assumption.

History check: each metric is compared against the newest BENCH_r*.json
that contains it; drifts beyond 15% print a warning to stderr (finding from
round 3: an unexplained 0.747 -> 0.57 img/s drop on the exact config went
unnoticed for a round).

The fingerprint field hashes the resolved ExperimentConfig dataclass plus
the protocol knobs (batch/shape/sync/precision), so cross-round comparisons
can verify config identity instead of asserting it (round-3 advisor
finding).
"""
import glob
import hashlib
import json
import os
import re
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

ASSUMED_BASELINE_FPS = 10.0        # A100 inference, images/sec (batch 1)
ASSUMED_BASELINE_TRAIN_SPS = 1.0   # A100 train, steps/sec (batch 2, 352x704)
BATCH = int(os.environ.get("BENCH_BATCH", "1"))
WARMUP = int(os.environ.get("BENCH_WARMUP", "5"))
ITERS = int(os.environ.get("BENCH_ITERS", "50"))
TRAIN_ITERS = int(os.environ.get("BENCH_TRAIN_ITERS", "20"))
HEIGHT, WIDTH = (int(x) for x in
                 os.environ.get("BENCH_HW", "352,1216").split(","))
TRAIN_HEIGHT, TRAIN_WIDTH = (int(x) for x in os.environ.get(
    "BENCH_TRAIN_HW", "352,704").split(","))
TRAIN_BATCH = int(os.environ.get("BENCH_TRAIN_BATCH", "2"))
DEFAULT_CONFIGS = ("gedepth_adaptive_kitti,"
                   "gedepth_adaptive_kitti_compat,"
                   "gedepth_adaptive_kitti_compat:bf16,"
                   "gedepth_adaptive_kitti_parity,"
                   "train:gedepth_adaptive_kitti_tpu,"
                   "train+bf16:gedepth_adaptive_kitti_tpu,"
                   "gedepth_adaptive_kitti_tpu,"
                   "gedepth_adaptive_kitti_tpu:bf16")


def _fingerprint(cfg, **protocol):
    import dataclasses
    payload = {"config": dataclasses.asdict(cfg), "protocol": protocol}
    blob = json.dumps(payload, sort_keys=True, default=str)
    return hashlib.sha1(blob.encode()).hexdigest()[:10]


def _history():
    """metric -> (value, round) from the newest BENCH_r*.json holding it."""
    hist = {}
    here = os.path.dirname(os.path.abspath(__file__))
    for path in sorted(glob.glob(os.path.join(here, "BENCH_r*.json"))):
        m = re.search(r"BENCH_r(\d+)", path)
        rnd = int(m.group(1)) if m else -1
        try:
            tail = json.load(open(path)).get("tail", "")
        except (json.JSONDecodeError, OSError):
            continue
        for line in tail.splitlines():
            line = line.strip()
            if not line.startswith("{"):
                continue
            try:
                rec = json.loads(line)
            except json.JSONDecodeError:
                continue
            if "metric" in rec and "value" in rec:
                hist[rec["metric"]] = (rec["value"], rnd)
    return hist


def _flops_and_peak(fn, *args):
    """(analytic FLOPs of one fn(*args) call, device peak FLOP/s).

    FLOPs counted from the jaxpr (matmul/conv, 2MNK; Pallas kernel bodies
    times grid size — tools/flops.py); peak is the dense bf16 MXU peak of
    the attached device. f32 rows are reported against the SAME bf16 peak
    so MFU is comparable across precision (an f32 matmul cannot beat the
    bf16 rate on the MXU). Never fatal: benches must not die on an
    accounting error."""
    try:
        sys.path.insert(0, os.path.join(
            os.path.dirname(os.path.abspath(__file__)), "tools"))
        from flops import flops_of_fn, device_peak_flops
        return flops_of_fn(fn, *args)["total"], device_peak_flops()
    except Exception as e:  # pragma: no cover - diagnostics only
        print(f"[bench] flops accounting failed: {e!r}", file=sys.stderr)
        return None, None


def _emit(record, history):
    print(json.dumps(record), flush=True)
    prev = history.get(record["metric"])
    if prev is not None:
        pv, rnd = prev
        if pv and abs(record["value"] - pv) / abs(pv) > 0.15:
            print(f"[bench-history] WARNING: {record['metric']} = "
                  f"{record['value']} vs {pv} in BENCH_r{rnd:02d} "
                  f"({record['value'] / pv:.2f}x)", file=sys.stderr)


def bench_infer(name, history, bf16=False):
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
    scope = getattr(cfg.model, "bf16_scope", "none")
    if bf16:
        # Serving semantics (matches apis.inference.init_depther(bf16=True)):
        # params are cast ONCE and held in bf16 — casting inside the jitted
        # forward would re-read the full f32 tree from HBM every iteration
        # (~0.8 GB/iter for Swin-L, visible as convert fusions in traces).
        variables = jax.jit(lambda v: jax.tree.map(
            lambda t: t.astype(jnp.bfloat16)
            if t.dtype == jnp.float32 else t, v))(variables)
    elif scope != "none":
        # Mixed-precision config (bf16_scope): the model casts activations
        # at the scope boundary; cast the matching param subtrees once here
        # (apis.inference.cast_params_bf16 contract).
        from gedepth_tpu.apis.inference import cast_params_bf16
        variables = jax.jit(
            lambda v: cast_params_bf16(v, scope=scope))(variables)

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
            # the final resize stay f32 inside predict_depth. Params are
            # already bf16 (cast once above); only the input casts here.
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
    flops, peak = _flops_and_peak(forward, variables, img, cam_h)
    tag = "_bf16" if bf16 else ""
    rec = {
        "metric": f"{cfg.name}{tag}_swinl_{HEIGHT}x{WIDTH}_infer",
        "value": round(ips, 3),
        "unit": "images/sec",
        "vs_baseline": round(ips / ASSUMED_BASELINE_FPS, 3),
        "fingerprint": _fingerprint(
            cfg, phase="infer", batch=BATCH, hw=(HEIGHT, WIDTH),
            bf16=bf16, sync="full" if sync_full else "scalar",
            iters=ITERS),
    }
    if flops:
        rec["gflops_per_image"] = round(flops / BATCH / 1e9, 1)
        rec["mfu"] = round(ips * flops / BATCH / peak, 4)
    _emit(rec, history)


def bench_train(name, history, bf16_compute=False):
    import numpy as np
    import jax
    import jax.numpy as jnp
    from gedepth_tpu.configs import get_config
    from gedepth_tpu.train import (make_optimizer, create_train_state,
                                   make_train_step)

    cfg = get_config(name)
    model = cfg.model.build()
    tx, _ = make_optimizer(cfg.optim.max_lr, cfg.train.max_iters,
                           cfg.optim.warmup_iters)

    rng = np.random.default_rng(0)
    b, h, w = TRAIN_BATCH, TRAIN_HEIGHT, TRAIN_WIDTH
    img = rng.standard_normal((b, h, w, 5)).astype(np.float32)
    img[..., 4] = np.abs(img[..., 4]) * 30 + 1.0
    depth = np.abs(rng.standard_normal((b, h, w))).astype(np.float32) * 20
    depth[depth < 2] = 0.0
    pe_k = rng.integers(0, 11, size=(b, h, w)).astype(np.float32)
    batch = {"img": jnp.asarray(img), "depth_gt": jnp.asarray(depth),
             "pe_k_gt": jnp.asarray(pe_k),
             "cam_height": jnp.full((b,), 1.65, jnp.float32)}

    state = jax.jit(lambda k: create_train_state(
        model, tx, batch["img"], k, batch["cam_height"]),
        static_argnums=())(jax.random.PRNGKey(0))
    step = make_train_step(model, donate=True, bf16=bf16_compute)

    key = jax.random.PRNGKey(1)
    state, metrics = step(state, batch, key)  # compile
    float(metrics["loss"])  # host sync
    for _ in range(3):  # warmup
        state, metrics = step(state, batch, key)
    float(metrics["loss"])

    t0 = time.perf_counter()
    for _ in range(TRAIN_ITERS):
        state, metrics = step(state, batch, key)
    float(metrics["loss"])  # the loss fetch transitively syncs every step
    dt = time.perf_counter() - t0

    sps = dt / TRAIN_ITERS  # seconds per step
    flops, peak = _flops_and_peak(step, state, batch, key)
    tag = "_bf16c" if bf16_compute else ""
    rec = {
        "metric": f"{cfg.name}{tag}_swinl_{TRAIN_HEIGHT}x{TRAIN_WIDTH}"
                  f"_b{TRAIN_BATCH}_train",
        "value": round(sps, 3),
        "unit": "sec/step",
        "vs_baseline": round(ASSUMED_BASELINE_TRAIN_SPS / sps, 3),
        "fingerprint": _fingerprint(
            cfg, phase="train", batch=b, hw=(h, w),
            bf16_compute=bf16_compute, iters=TRAIN_ITERS, donate=True),
    }
    if flops:
        rec["gflops_per_step"] = round(flops / 1e9, 1)
        rec["mfu"] = round(flops / sps / peak, 4)
    _emit(rec, history)


def main():
    names = os.environ.get(
        "BENCH_CONFIG",  # single-config compatibility override
        os.environ.get("BENCH_CONFIGS", DEFAULT_CONFIGS))
    history = _history()
    failures = []
    for name in names.split(","):
        name = name.strip()
        try:
            if name.startswith("train+bf16:"):
                bench_train(name[len("train+bf16:"):], history,
                            bf16_compute=True)
            elif name.startswith("train:"):
                bench_train(name[len("train:"):], history)
            else:
                bf16 = name.endswith(":bf16")
                bench_infer(name[:-5] if bf16 else name, history, bf16=bf16)
        except Exception as e:  # one config must not kill the rest
            import traceback
            traceback.print_exc(file=sys.stderr)
            failures.append((name, repr(e)))
            print(f"[bench] FAILED {name}: {e!r}", file=sys.stderr)
    if failures:
        sys.exit(1)


if __name__ == "__main__":
    main()
