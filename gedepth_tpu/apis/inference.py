"""Single-image inference API (reference depth/apis/inference.py surface).

init_depther(config_name, checkpoint) -> handle
inference_depther(handle, image_or_path) -> (H, W) depth in meters
"""
from __future__ import annotations

import dataclasses
from typing import Optional, Union

import numpy as np

from gedepth_tpu.configs import get_config
from gedepth_tpu.eval.evaluator import build_test_pipeline


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
