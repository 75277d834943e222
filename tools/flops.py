"""Analytic FLOP accounting for gedepth_tpu models (VERDICT r4 item 2).

Counts matmul/conv FLOPs (2*M*N*K convention) by walking the jaxpr of a
function — the *semantic* compute, independent of XLA fusion decisions —
so every config (exact gather, windowed, compat, zoo archs, train steps)
gets an exact count from its real traced shapes instead of a hand-derived
formula per architecture. Control-flow primitives are expanded
structurally: `scan` bodies multiply by trip count, `pallas_call` kernel
bodies multiply by grid size (this is how the windowed-MSDA Pallas
kernel's MXU contractions are counted), remat/pjit/custom-vjp calls
recurse.

Two headline numbers:
  * flops_fwd(model_fn, *args)  — one forward (inference) pass.
  * per-train-step = count the jaxpr of the full jitted train step (fwd +
    bwd + optimizer); remat recompute inside the backward IS counted
    (it executes on the MXU) — this is hardware FLOPs, the MFU numerator.

MFU = achieved FLOP/s / device peak. Peaks are per-devicetype matmul
peaks (dense bf16); f32 configs are reported against the SAME bf16 peak
so MFU is comparable across precision rows (an f32 matmul cannot exceed
the bf16 rate on the MXU; it runs at a fraction of it). Override with
GEDEPTH_PEAK_TFLOPS when the device kind is missing from the table.

Reference protocol mirrored: the reference publishes no FLOPs/MFU either
(SURVEY.md §6); its benchmark.py:55-82 reports img/s only. The roofline
here is the honest absolute axis the assumed-A100 baseline lacks.
"""
from __future__ import annotations

import os
import sys
from typing import Dict

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# Dense matmul peaks, FLOP/s. bf16 MXU peaks from public TPU system
# specs (cloud.google.com/tpu/docs/system-architecture); v5e = 197
# TFLOPs/chip bf16, v5p = 459, v4 = 275, v6e (Trillium) = 918.
_PEAK_BF16 = {
    "v4": 275e12,
    "v5e": 197e12,
    "v5lite": 197e12,   # axon reports device_kind "TPU v5 lite"
    "v5p": 459e12,
    "v6e": 918e12,
}


def device_peak_flops(device=None) -> float:
    """Dense bf16 matmul peak for `device` (default: first jax device)."""
    env = os.environ.get("GEDEPTH_PEAK_TFLOPS")
    if env:
        return float(env) * 1e12
    if device is None:
        import jax
        device = jax.devices()[0]
    kind = getattr(device, "device_kind", "") or ""
    k = kind.lower().replace(" ", "").replace("tpu", "")
    for name, peak in _PEAK_BF16.items():
        if name in k:
            return peak
    # axon tunnel devices may not expose a kind; this image targets v5e
    return _PEAK_BF16["v5e"]


# ---------------------------------------------------------------------------
# jaxpr walking


def _dot_flops(eqn) -> float:
    """dot_general: 2 * batch * M * N * K from the operand shapes."""
    a, b = (v.aval for v in eqn.invars[:2])
    (lc, rc), (lb, rb) = eqn.params["dimension_numbers"]
    batch = 1.0
    for d in lb:
        batch *= a.shape[d]
    k = 1.0
    for d in lc:
        k *= a.shape[d]
    m = 1.0
    for i, s in enumerate(a.shape):
        if i not in lc and i not in lb:
            m *= s
    n = 1.0
    for i, s in enumerate(b.shape):
        if i not in rc and i not in rb:
            n *= s
    return 2.0 * batch * m * n * k


def _conv_flops(eqn) -> float:
    """conv_general_dilated: 2 * out_elements * (K_in/groups * prod(kernel))."""
    lhs, rhs = (v.aval for v in eqn.invars[:2])
    out = eqn.outvars[0].aval
    dn = eqn.params["dimension_numbers"]
    groups = (eqn.params.get("feature_group_count", 1)
              * eqn.params.get("batch_group_count", 1))
    # rhs spec: (out_ch, in_ch/groups, *spatial) per dn.rhs_spec ordering
    rhs_spec = dn.rhs_spec
    kernel_spatial = [rhs.shape[d] for d in rhs_spec[2:]]
    in_ch = rhs.shape[rhs_spec[1]]
    out_elems = float(np.prod(out.shape))
    return 2.0 * out_elems * in_ch * float(np.prod(kernel_spatial)) / 1.0 \
        * (1.0 if groups == 1 else 1.0)  # in_ch is already per-group


_CALL_PARAMS = ("jaxpr", "call_jaxpr", "fun_jaxpr", "cond_jaxpr",
                "body_jaxpr")


def _grid_size(params) -> float:
    gm = params.get("grid_mapping")
    grid = getattr(gm, "grid", None) if gm is not None else params.get("grid")
    if not grid:
        return 1.0
    size = 1.0
    for g in grid:
        size *= float(g) if isinstance(g, (int, np.integer)) else 1.0
    return size


def _jaxpr_of(obj):
    return getattr(obj, "jaxpr", obj)


def jaxpr_flops(jaxpr) -> Dict[str, float]:
    """Recursively count FLOPs in a (closed) jaxpr.

    Returns {'matmul': ..., 'conv': ..., 'total': ...} — matmul includes
    Pallas-kernel dot_generals (times their grid size).
    """
    jaxpr = _jaxpr_of(jaxpr)
    acc = {"matmul": 0.0, "conv": 0.0}

    for eqn in jaxpr.eqns:
        name = eqn.primitive.name
        if name == "dot_general":
            acc["matmul"] += _dot_flops(eqn)
        elif name == "conv_general_dilated":
            acc["conv"] += _conv_flops(eqn)
        elif name == "scan":
            body = jaxpr_flops(eqn.params["jaxpr"])
            length = float(eqn.params["length"])
            for k in acc:
                acc[k] += body[k] * length
        elif name == "while":
            # not on any product path; count one body trip as a floor
            body = jaxpr_flops(eqn.params["body_jaxpr"])
            for k in acc:
                acc[k] += body[k]
        elif name == "cond":
            branches = [jaxpr_flops(b) for b in eqn.params["branches"]]
            for k in acc:
                acc[k] += max(b[k] for b in branches)
        elif name == "pallas_call":
            body = jaxpr_flops(eqn.params["jaxpr"])
            size = _grid_size(eqn.params)
            for k in acc:
                acc[k] += body[k] * size
        else:
            for key in _CALL_PARAMS:
                sub = eqn.params.get(key) if eqn.params else None
                if sub is not None:
                    body = jaxpr_flops(sub)
                    for k in acc:
                        acc[k] += body[k]
                    break
    acc["total"] = acc["matmul"] + acc["conv"]
    return acc


def flops_of_fn(fn, *args, **kwargs) -> Dict[str, float]:
    """FLOPs of one call of `fn(*args)` (abstract trace; nothing executes)."""
    import jax
    closed = jax.make_jaxpr(lambda *a: fn(*a, **kwargs))(*args)
    return jaxpr_flops(closed)


def gedepth_forward_flops(cfg, height: int, width: int, batch: int = 1,
                          ) -> Dict[str, float]:
    """FLOPs of one predict_depth forward of an ExperimentConfig's model."""
    import jax
    import jax.numpy as jnp

    model = cfg.model.build()
    img = jnp.zeros((batch, height, width, 5), jnp.float32)
    ch = jnp.ones((batch,), jnp.float32)

    def fwd(v, x, h):
        return model.apply(v, x, h, method=model.predict_depth)

    variables = jax.eval_shape(model.init, jax.random.PRNGKey(0), img, ch)
    variables = jax.tree.map(
        lambda s: jax.ShapeDtypeStruct(s.shape, s.dtype), variables)
    closed = jax.make_jaxpr(fwd)(variables, img, ch)
    return jaxpr_flops(closed)


def _fmt(f: float) -> str:
    return f"{f / 1e9:.2f} GFLOPs"


def main():
    import argparse
    import jax

    jax.config.update("jax_platforms", "cpu")
    from gedepth_tpu.configs import get_config

    ap = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    ap.add_argument("--config", default="gedepth_adaptive_kitti_tpu")
    ap.add_argument("--height", type=int, default=352)
    ap.add_argument("--width", type=int, default=1216)
    ap.add_argument("--batch", type=int, default=1)
    args = ap.parse_args()

    cfg = get_config(args.config)
    acc = gedepth_forward_flops(cfg, args.height, args.width, args.batch)
    per_img = acc["total"] / args.batch
    print(f"{args.config} @ {args.height}x{args.width} batch {args.batch}:")
    print(f"  matmul {_fmt(acc['matmul'])}  conv {_fmt(acc['conv'])}  "
          f"total {_fmt(acc['total'])}  ({per_img / 1e9:.2f} GFLOPs/image)")


if __name__ == "__main__":
    main()
