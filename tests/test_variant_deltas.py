"""Quantify eval-variant output deltas on shared weights (VERDICT item 10).

nearest-mode MSDA and bf16 eval are drop-in variants over the SAME
parameters, so their depth-output deltas against the f32 bilinear
reference bound their metric impact (abs_rel is computed from these maps).
Windowed mode is intentionally NOT compared here: its parameter tree
differs (no learned reference points, rescaled offset bias), so it is a
train-from-scratch architecture, not a drop-in eval mode.

Numbers from synthetic weights are a proxy; re-run against a converted
released checkpoint when one is available (NOTES.md).
"""
import dataclasses

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from gedepth_tpu.configs import get_config
from gedepth_tpu.train.steps import make_eval_step

pytestmark = pytest.mark.slow  # compile-heavy: full-model jits (test tiers, NOTES r4)


def _setup():
    cfg = get_config("smoke_synthetic")
    rng = np.random.default_rng(0)
    img = rng.standard_normal((1, 64, 96, 5)).astype(np.float32)
    img[..., 4] = np.abs(img[..., 4]) * 30 + 1.0
    ch = jnp.full((1,), 1.65, jnp.float32)
    return cfg, jnp.asarray(img), ch


def _abs_rel(ref, x):
    return float(np.mean(np.abs(x - ref) / np.maximum(ref, 1e-3)))


def test_nearest_and_bf16_depth_deltas():
    cfg, img, ch = _setup()
    model = cfg.model.build()
    variables = model.init(jax.random.PRNGKey(0), img, ch)
    params, stats = variables["params"], variables.get("batch_stats", {})
    batch = {"img": img, "cam_height": ch}

    ref = np.asarray(make_eval_step(model, flip_tta=False)(
        params, stats, batch))

    # nearest sampling: same params, different gather mode
    near_model = dataclasses.replace(cfg.model,
                                     neck_sampling="nearest").build()
    near = np.asarray(make_eval_step(near_model, flip_tta=False)(
        params, stats, batch))
    d_near = _abs_rel(ref, near)

    # bf16 eval: same params, reduced precision forward
    bf16 = np.asarray(make_eval_step(model, flip_tta=False, bf16=True)(
        params, stats, batch))
    d_bf16 = _abs_rel(ref, bf16)

    print(f"depth abs_rel vs f32-bilinear: nearest={d_near:.4f} "
          f"bf16={d_bf16:.4f}")
    # bf16 must be a small perturbation; nearest changes sampling and may
    # move predictions more, but must stay in the same regime
    assert d_bf16 < 0.02, d_bf16
    assert d_near < 0.15, d_near
    assert np.isfinite(near).all() and np.isfinite(bf16).all()
