"""AOT serving export: serialize the jitted eval forward to StableHLO.

The reference has no deployment story beyond "run tools/test.py on a GPU
box with the full training repo installed" — serving a GEDepth model means
shipping torch + mmcv + the config tree. On TPU the idiomatic production
path is ahead-of-time export: `jax.export` lowers the jitted forward once
(for one or more target platforms) into a versioned, self-contained
StableHLO artifact that any JAX runtime can deserialize and execute
without the model code, the config system, or flax.

Artifact layout (a directory):
    model.stablehlo   serialized jax.export.Exported (program only)
    weights.msgpack   {"params": ..., "batch_stats": ...} via flax msgpack
                      (kept OUTSIDE the program so the compiled HLO stays
                      small — the axon remote-compile path rejects >200 MB
                      constant payloads — and so weights can be swapped
                      without re-export)
    meta.json         shapes/dtypes/config fingerprint for the loader

Platform note: lowering embeds the traced compute path. On a CPU-only
host the MSDA dispatch (ops/msda.py impl="auto") traces the portable
tiled XLA formulation, which runs correctly on TPU but without the
Mosaic kernel; export on a TPU-attached host to capture the Pallas
windowed kernel in the artifact.

Choosing the export `batch` (v5e, measured NOTES.md round 4): at the full
KITTI protocol resolution (352x1216) batch 1 is OPTIMAL — batching LOSES
throughput (15.99 -> 14.51 img/s b1 -> b2 bf16 flagship) because the
per-image win of amortising fixed overhead is outweighed by doubled live
activation HBM at this activation-heavy shape. At <= half resolution
(176x608) batching WINS ~1.8x (b4 vs b1). Rule of thumb: export batch=1
for protocol-resolution serving, batch=2-4 only for half-res-or-smaller
streams.
"""
from __future__ import annotations

import json
import os
from typing import Optional, Sequence, Union

import numpy as np


def export_depther(config: Union[str, object],
                   checkpoint: Optional[str] = None,
                   batch: int = 1,
                   hw: Optional[tuple] = None,
                   platforms: Sequence[str] = ("tpu", "cpu"),
                   flip_tta: Optional[bool] = None,
                   bf16: bool = False):
    """Lower the eval forward for `platforms`; returns (exported, variables,
    meta). `exported` is a jax.export.Exported whose call convention is
    fn(variables, batch) with batch = {"img": (B,H,W,C) f32,
    "cam_height": (B,) f32} -> (B, H, W) f32 depth."""
    import jax
    from jax import export as jexport
    from gedepth_tpu.configs import get_config
    from gedepth_tpu.train.checkpoint import load_params_only
    from gedepth_tpu.train.steps import make_eval_step

    cfg = get_config(config) if isinstance(config, str) else config
    model = cfg.model.build()
    h, w = hw if hw is not None else cfg.data.eval_size
    c = 5 if cfg.model.pe_variant != "none" else 3

    img0 = np.zeros((batch, h, w, c), np.float32)
    ch0 = np.full((batch,), cfg.model.default_cam_height, np.float32)
    variables = model.init(jax.random.PRNGKey(0), img0, ch0)
    params = variables["params"]
    stats = variables.get("batch_stats", {})
    if checkpoint:
        params, stats = load_params_only(checkpoint, params, stats)

    flip = cfg.data.eval_flip_tta if flip_tta is None else flip_tta
    eval_step = make_eval_step(model, flip_tta=flip, bf16=bf16)

    def forward(vs, batch_in):
        return eval_step(vs["params"], vs.get("batch_stats", {}), batch_in)

    vs = {"params": params}
    if stats:
        vs["batch_stats"] = stats
    batch_in = {"img": img0, "cam_height": ch0}
    exported = jexport.export(jax.jit(forward),
                              platforms=tuple(platforms))(vs, batch_in)

    meta = {
        "config": cfg.name,
        "input": {"img": [batch, h, w, c], "cam_height": [batch]},
        "output": "depth (B, H, W) float32 meters",
        "flip_tta": bool(flip),
        "bf16": bool(bf16),
        "platforms": list(platforms),
        "min_depth": float(cfg.model.min_depth),
        "max_depth": float(cfg.model.max_depth),
        "default_cam_height": float(cfg.model.default_cam_height),
        "jax_version": jax.__version__,
        "calling_convention_version": exported.calling_convention_version,
    }
    return exported, vs, meta


def save_exported(out_dir: str, exported, variables, meta) -> None:
    """Write the three-file serving artifact to `out_dir`."""
    from flax import serialization

    os.makedirs(out_dir, exist_ok=True)
    with open(os.path.join(out_dir, "model.stablehlo"), "wb") as f:
        f.write(exported.serialize())
    host_vars = _to_host(variables)
    with open(os.path.join(out_dir, "weights.msgpack"), "wb") as f:
        f.write(serialization.msgpack_serialize(host_vars))
    with open(os.path.join(out_dir, "meta.json"), "w") as f:
        json.dump(meta, f, indent=2)


def _to_host(tree):
    import jax
    return jax.tree.map(np.asarray, tree)


class ServingModel:
    """Deserialized artifact: predict() without any model/config code."""

    def __init__(self, exported, variables, meta):
        self._exported = exported
        self._variables = variables
        self.meta = meta

    def predict(self, img: np.ndarray,
                cam_height: Optional[np.ndarray] = None) -> np.ndarray:
        """img: (B, H, W, C) float32 matching meta['input']; returns
        (B, H, W) float32 depth in meters."""
        img = np.asarray(img, np.float32)
        want = tuple(self.meta["input"]["img"])
        if img.shape != want:
            raise ValueError(f"img shape {img.shape} != exported {want} "
                             "(AOT artifacts are shape-static; re-export "
                             "for other shapes)")
        if cam_height is None:
            cam_height = np.full((img.shape[0],),
                                 self.meta["default_cam_height"], np.float32)
        out = self._exported.call(
            self._variables,
            {"img": img, "cam_height": np.asarray(cam_height, np.float32)})
        return np.asarray(out)


def load_exported(art_dir: str) -> ServingModel:
    """Load a saved artifact. Needs only jax + flax.serialization (for the
    msgpack weights) — no gedepth_tpu model code."""
    from jax import export as jexport
    from flax import serialization

    with open(os.path.join(art_dir, "model.stablehlo"), "rb") as f:
        exported = jexport.deserialize(f.read())
    with open(os.path.join(art_dir, "weights.msgpack"), "rb") as f:
        variables = serialization.msgpack_restore(f.read())
    with open(os.path.join(art_dir, "meta.json")) as f:
        meta = json.load(f)
    return ServingModel(exported, variables, meta)
