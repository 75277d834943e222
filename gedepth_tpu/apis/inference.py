"""Single-image inference API (reference depth/apis/inference.py surface).

init_depther(config_name, checkpoint) -> handle
inference_depther(handle, image_or_path) -> (H, W) depth in meters

Serving guidance (v5e, measured NOTES.md round 4): at the full KITTI
protocol resolution (352x1216) serve batch 1 — batching LOSES throughput
there (15.99 -> 14.51 img/s b1 -> b2); at <= half resolution batch 2-4
wins ~1.8x. Precision: bf16=True (full-cast) is the fastest mode
(abs-rel delta ~2e-3 vs f32); for parity-grade serving use the
`gedepth_adaptive_kitti_parity` preset (windowed_compat R=5 +
bf16_scope='backbone_head', combined delta 5.9e-4) with
cast_params_bf16(scope='backbone_head').
"""
from __future__ import annotations

import dataclasses
from typing import Optional, Union

import numpy as np

from gedepth_tpu.configs import get_config
from gedepth_tpu.eval.evaluator import build_test_pipeline


def cast_params_bf16(variables, scope: str = "all"):
    """Cast f32 leaves to bf16 for serving, optionally only within a scope.

    scope='all' casts the whole tree (full-bf16 serving). 'backbone' /
    'backbone_neck' cast only those top-level module subtrees in every
    collection (params + batch_stats) — the caller-side half of the model's
    ``bf16_scope`` mixed-precision contract (models/depther.py): the model
    casts activations at the scope boundary, this casts the matching params
    so the in-scope compute actually runs on the bf16 MXU path.
    """
    import jax
    import jax.numpy as jnp

    def cast_tree(t):
        return jax.tree.map(
            lambda x: x.astype(jnp.bfloat16)
            if x.dtype == jnp.float32 else x, t)

    if scope == "all":
        return cast_tree(variables)
    mods = {"backbone": ("backbone",),
            "backbone_neck": ("backbone", "neck"),
            "backbone_head": ("backbone", "decode_head"),
            "backbone_neck_head": ("backbone", "neck", "decode_head")}[scope]
    return {coll: {k: (cast_tree(v) if k in mods else v)
                   for k, v in tree.items()}
            for coll, tree in variables.items()}


@dataclasses.dataclass
class DeptherHandle:
    cfg: object
    model: object
    params: object
    batch_stats: object
    eval_step: object
    pipeline: object
    pe_raw: Optional[np.ndarray] = None


def init_depther(config: Union[str, object], checkpoint: Optional[str] = None,
                 flip_tta: Optional[bool] = None,
                 pe_path: Optional[str] = None,
                 bf16: bool = False) -> DeptherHandle:
    """Build a model + weights handle for single-image inference.

    pe_path: precomputed plane-embedding .npy/.npz for the camera (required
    for PE variants when feeding raw images; samples dicts that already carry
    5 channels don't need it).
    bf16: run the jitted forward in bfloat16 (TPU-native serving precision;
    depth clamps / final resize stay f32 — see make_eval_step).
    """
    import jax
    import jax.numpy as jnp
    from gedepth_tpu.train.checkpoint import load_params_only
    from gedepth_tpu.train.steps import make_eval_step

    cfg = get_config(config) if isinstance(config, str) else config
    model = cfg.model.build()
    h, w = cfg.data.eval_size
    c = 5 if cfg.model.pe_variant != "none" else 3
    img0 = jnp.zeros((1, h, w, c), jnp.float32)
    variables = model.init(jax.random.PRNGKey(0), img0,
                           jnp.ones((1,), jnp.float32))
    params = variables["params"]
    stats = variables.get("batch_stats", {})
    if checkpoint:
        params, stats = load_params_only(checkpoint, params, stats)
    scope = getattr(cfg.model, "bf16_scope", "none")
    if scope != "none" and not bf16:
        # mixed-precision preset (e.g. gedepth_adaptive_kitti_parity):
        # cast the in-scope param subtrees once; the model casts
        # activations at the scope boundary (models/depther.py)
        casted = cast_params_bf16(
            {"params": params, "batch_stats": stats}, scope=scope)
        params, stats = casted["params"], casted["batch_stats"]

    flip = cfg.data.eval_flip_tta if flip_tta is None else flip_tta
    pe_raw = None
    if pe_path:
        arr = np.load(pe_path)
        pe_raw = (arr["pe"] if hasattr(arr, "files") else arr).astype(
            np.float32)
    return DeptherHandle(cfg, model, params, stats,
                         make_eval_step(model, flip_tta=flip, bf16=bf16),
                         build_test_pipeline(cfg.data), pe_raw)


def inference_depther(handle: DeptherHandle,
                      image: Union[str, np.ndarray],
                      cam_height: Optional[float] = None) -> np.ndarray:
    """Run depth prediction on one RGB image (path or HxWx3 array).

    Returns an (H', W') depth map at the model's eval resolution.
    """
    import jax.numpy as jnp
    from gedepth_tpu.geometry.plane import clip_pe_for_input

    if isinstance(image, str):
        from PIL import Image
        image = np.asarray(Image.open(image).convert("RGB"), dtype=np.float32)
    image = np.asarray(image, dtype=np.float32)

    cfg = handle.cfg
    sample = {"img": image,
              "cam_height": np.float32(
                  cam_height if cam_height is not None
                  else cfg.model.default_cam_height)}
    if cfg.model.pe_variant != "none":
        if image.shape[-1] == 5:
            sample["img"] = image
        else:
            if handle.pe_raw is None:
                raise ValueError(
                    "PE variant needs a plane embedding: pass pe_path to "
                    "init_depther or a 5-channel image")
            pe_raw = handle.pe_raw
            if pe_raw.shape != image.shape[:2]:
                raise ValueError(
                    f"pe shape {pe_raw.shape} != image {image.shape[:2]}")
            pe_in = clip_pe_for_input(pe_raw, cfg.model.depth_scale)
            sample["img"] = np.concatenate(
                [image, pe_in[..., None], pe_raw[..., None]], axis=-1)

    rng = np.random.default_rng(0)
    sample = handle.pipeline(sample, rng)
    batch = {"img": jnp.asarray(sample["img"][None]),
             "cam_height": jnp.asarray([sample["cam_height"]])}
    pred = handle.eval_step(handle.params, handle.batch_stats, batch)
    return np.asarray(pred)[0]
