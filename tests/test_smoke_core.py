"""Fast-tier end-to-end smoke: one forward + one train step + metrics on
the smallest possible GEDepth-Adaptive, so the default (`-m "not slow"`)
run keeps a whole-model signal while the compile-heavy suites live in the
slow tier (test tiers, NOTES r4)."""
import dataclasses

import numpy as np
import jax
import jax.numpy as jnp

from gedepth_tpu.configs import get_config
from gedepth_tpu.core.metrics import masked_metrics
from gedepth_tpu.train import (create_train_state, make_optimizer,
                               make_train_step)


def test_tiny_end_to_end_forward_train_metrics():
    cfg = get_config("smoke_synthetic")
    # shrink further: one block per stage, half the smoke preset's width
    cfg = dataclasses.replace(cfg, model=dataclasses.replace(
        cfg.model, embed_dims=24, depths=(1, 1, 1, 1),
        num_heads=(1, 2, 4, 8), neck_channels=(32, 24, 48, 96, 192),
        neck_embed_dim=64, neck_num_points=2))
    model = cfg.model.build()

    rng = np.random.default_rng(0)
    b, h, w = 2, 64, 96
    img = rng.standard_normal((b, h, w, 5)).astype(np.float32)
    img[..., 4] = np.abs(img[..., 4]) * 30 + 1.0
    depth_gt = np.abs(rng.standard_normal((b, h, w))).astype(np.float32) * 20
    depth_gt[depth_gt < 2] = 0.0
    batch = {
        "img": jnp.asarray(img),
        "depth_gt": jnp.asarray(depth_gt),
        "pe_k_gt": jnp.asarray(
            rng.integers(0, 11, size=(b, h, w)).astype(np.float32)),
        "cam_height": jnp.full((b,), 1.65, jnp.float32),
    }

    tx, _ = make_optimizer(cfg.optim.max_lr, cfg.train.max_iters,
                           cfg.optim.warmup_iters)
    state = create_train_state(model, tx, batch["img"], jax.random.PRNGKey(0),
                               batch["cam_height"])
    step = make_train_step(model, donate=False)
    state2, metrics = step(state, batch, jax.random.PRNGKey(1))
    assert np.isfinite(float(metrics["loss"]))
    assert np.isfinite(float(metrics["grad_norm"]))
    assert int(state2.step) == 1
    # params actually moved
    delta = jax.tree.reduce(
        lambda a, x: a + float(jnp.sum(jnp.abs(x))), jax.tree.map(
            lambda a, b2: a - b2, state.params, state2.params), 0.0)
    assert delta > 0

    # eval-style forward through the public predict path + metrics
    pred = model.apply({"params": state2.params,
                        "batch_stats": state2.batch_stats},
                       batch["img"], batch["cam_height"],
                       method=model.predict_depth)
    pred = np.asarray(pred)[..., 0]
    assert pred.shape == (b, h, w)
    assert (pred >= model.min_depth - 1e-6).all()
    assert (pred <= model.max_depth + 1e-6).all()
    m = masked_metrics(depth_gt[0], pred[0], min_depth=1e-3, max_depth=80.0)
    assert all(np.isfinite(v) for v in m)
