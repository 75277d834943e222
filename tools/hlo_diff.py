"""Compare the compiled HLO of a config's forward at two batch sizes.

Harness for the batch-scaling regression (NOTES.md "Batch scaling"): batch 4
at 352x1216 measured 3.28 img/s vs 5.55 img/s at batch 1 on the dense
gather-free path, i.e. batching HURTS per-image throughput. This tool makes
the mechanism inspectable:

  python tools/hlo_diff.py depthformer_swinl_kitti --batches 1,4 \
      --out /tmp/hlo

For each batch size it compiles the inference forward (optionally bf16),
then reports per-batch:
  * XLA cost analysis (flops, bytes accessed) — per image, so a healthy
    batch-4 compile shows ~1x per-image flops/bytes vs batch 1;
  * memory analysis (argument/output/temp/peak bytes) — temp blowup =>
    HBM working-set pressure, the prime suspect;
  * an op-category histogram of the optimized HLO (fusion kinds, copies,
    convolutions, dots, custom-calls, all-*) — copy/rematerialisation
    count inflation => scheduling/layout, the other suspect;
  * optional wall-clock timing (--time) with the scalar-checksum sync.

Full optimized HLO text is written to <out>/<config>_b<N>.hlo for manual
diffing. No reference analogue (the reference never investigates batch
scaling); this is a TPU-side profiling tool in the spirit of its
tools/benchmark.py.
"""
import argparse
import collections
import json
import os
import re
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

def op_histogram(hlo_text):
    """Count optimized-HLO instructions by category."""
    hist = collections.Counter()
    fusion_kind = re.compile(r"kind=(k\w+)")
    for line in hlo_text.splitlines():
        line = line.strip()
        m = re.match(r"(?:ROOT )?%?[\w.-]+(?:\.\d+)? = \S+ (\w+)\(", line)
        if not m:
            continue
        op = m.group(1)
        if op == "fusion":
            k = fusion_kind.search(line)
            op = f"fusion.{k.group(1)[1:]}" if k else "fusion"
        elif op == "custom-call":
            tgt = re.search(r'custom_call_target="([^"]+)"', line)
            op = f"custom-call.{tgt.group(1)}" if tgt else op
        hist[op] += 1
    return hist


def analyze(name, batch, bf16, out_dir, do_time, iters,
            height=352, width=1216):
    import numpy as np
    import jax
    import jax.numpy as jnp
    from gedepth_tpu.configs import get_config

    cfg = get_config(name)
    model = cfg.model.build()

    rng = np.random.default_rng(0)
    img = rng.standard_normal((batch, height, width, 5)).astype(np.float32)
    img[..., 4] = np.abs(img[..., 4]) * 30 + 1.0
    img = jnp.asarray(img)
    cam_h = jnp.full((batch,), 1.65, jnp.float32)
    variables = jax.jit(model.init)(jax.random.PRNGKey(0), img, cam_h)

    @jax.jit
    def forward(v, x, ch):
        if bf16:
            v = jax.tree.map(
                lambda t: t.astype(jnp.bfloat16)
                if t.dtype == jnp.float32 else t, v)
            x = x.astype(jnp.bfloat16)
        d = model.apply(v, x, ch,
                        method=model.predict_depth).astype(jnp.float32)
        return jnp.sum(d)  # scalar sync (see bench.py)

    lowered = forward.lower(variables, img, cam_h)
    compiled = lowered.compile()

    report = {"config": name, "batch": batch, "bf16": bf16,
              "hw": [height, width]}

    try:
        cost = compiled.cost_analysis()
        cost = cost[0] if isinstance(cost, (list, tuple)) else cost
        report["flops_per_image"] = cost.get("flops", float("nan")) / batch
        report["bytes_accessed_per_image"] = (
            cost.get("bytes accessed", float("nan")) / batch)
    except Exception as e:  # noqa: BLE001 — backend-dependent API
        report["cost_analysis_error"] = str(e)

    try:
        mem = compiled.memory_analysis()
        for k in ("argument_size_in_bytes", "output_size_in_bytes",
                  "temp_size_in_bytes", "generated_code_size_in_bytes",
                  "alias_size_in_bytes"):
            v = getattr(mem, k, None)
            if v is not None:
                report[k] = v
    except Exception as e:  # noqa: BLE001
        report["memory_analysis_error"] = str(e)

    hlo = compiled.as_text()
    hist = op_histogram(hlo)
    report["op_histogram_top"] = dict(hist.most_common(25))
    report["total_instructions"] = sum(hist.values())

    if out_dir:
        os.makedirs(out_dir, exist_ok=True)
        tag = "_bf16" if bf16 else ""
        path = os.path.join(out_dir, f"{name}{tag}_b{batch}.hlo")
        with open(path, "w") as f:
            f.write(hlo)
        report["hlo_path"] = path

    if do_time:
        np.asarray(forward(variables, img, cam_h))
        for _ in range(3):
            out = forward(variables, img, cam_h)
        np.asarray(out)
        t0 = time.perf_counter()
        outs = [forward(variables, img, cam_h) for _ in range(iters)]
        for o in outs:
            np.asarray(o)
        dt = time.perf_counter() - t0
        report["images_per_sec"] = round(batch * iters / dt, 3)
        report["ms_per_image"] = round(1e3 * dt / (batch * iters), 2)

    return report


def main():
    ap = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    ap.add_argument("config")
    ap.add_argument("--batches", default="1,4")
    ap.add_argument("--bf16", action="store_true")
    ap.add_argument("--out", default=None, help="dir for full HLO dumps")
    ap.add_argument("--time", action="store_true",
                    help="also wall-clock each batch size")
    ap.add_argument("--iters", type=int, default=20)
    ap.add_argument("--height", type=int, default=352)
    ap.add_argument("--width", type=int, default=1216)
    args = ap.parse_args()

    reports = []
    for b in (int(x) for x in args.batches.split(",")):
        r = analyze(args.config, b, args.bf16, args.out, args.time,
                    args.iters, args.height, args.width)
        reports.append(r)
        print(json.dumps(r, indent=2, default=str), flush=True)

    if len(reports) == 2 and "temp_size_in_bytes" in reports[0]:
        a, b = reports
        ratio = b["batch"] / a["batch"]
        print(json.dumps({
            "temp_bytes_scaling_vs_linear": round(
                b["temp_size_in_bytes"]
                / (a["temp_size_in_bytes"] * ratio), 3),
            "per_image_bytes_accessed_ratio": round(
                b.get("bytes_accessed_per_image", float("nan"))
                / a.get("bytes_accessed_per_image", float("nan")), 3)
            if "bytes_accessed_per_image" in a else None,
        }, default=str), flush=True)


if __name__ == "__main__":
    main()
