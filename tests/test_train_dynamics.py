"""Training-dynamics parity of the MSDA sampling modes (smoke scale).

The windowed modes change sampling semantics (NOTES.md "Training-dynamics
evidence"); this checks their loss trajectories track the exact bilinear
path from a shared init on the same synthetic stream. The full 150-step
comparison lives in NOTES.md; this short variant is opt-in (GEDEPTH_SLOW=1)
because 2 x 25 CPU train steps cost minutes.
"""
import dataclasses
import os

import numpy as np
import jax
import pytest

from gedepth_tpu.configs import get_config
from gedepth_tpu.train import (
    make_optimizer, create_train_state, make_train_step)

pytestmark = pytest.mark.skipif(
    os.environ.get("GEDEPTH_SLOW") != "1",
    reason="slow: set GEDEPTH_SLOW=1 to run")

STEPS = 25
B, H, W = 2, 64, 96


def _stream(n):
    rng = np.random.default_rng(0)
    for _ in range(n):
        img = rng.standard_normal((B, H, W, 5)).astype(np.float32)
        img[..., 4] = np.abs(img[..., 4]) * 30 + 1.0
        yield {
            "img": img,
            "depth_gt": np.abs(rng.standard_normal((B, H, W))).astype(
                np.float32) * 10 + 0.5,
            "pe_k_gt": rng.integers(0, 11, size=(B, H, W)).astype(
                np.float32),
            "cam_height": np.full((B,), 1.65, np.float32),
        }


def _train(mode):
    cfg = get_config("smoke_synthetic")
    cfg = cfg.replace(model=dataclasses.replace(cfg.model,
                                                neck_sampling=mode))
    model = cfg.model.build()
    tx, _ = make_optimizer(1e-4, STEPS, 5)
    state = create_train_state(
        model, tx, np.zeros((B, H, W, 5), np.float32),
        jax.random.PRNGKey(0), np.full((B,), 1.65, np.float32))
    step_fn = make_train_step(model, donate=False)
    losses = []
    for i, batch in enumerate(_stream(STEPS)):
        state, m = step_fn(state, batch,
                           jax.random.fold_in(jax.random.PRNGKey(1), i))
        losses.append(float(m["loss"]))
    return np.asarray(losses)


def test_windowed_compat_tracks_bilinear_training():
    ref = _train("bilinear")
    win = _train("windowed_compat")
    assert np.all(np.isfinite(ref)) and np.all(np.isfinite(win))
    # same init + same stream: trajectories must track closely (worst
    # observed per-step deviation at this scale: 7e-3, NOTES.md)
    np.testing.assert_allclose(win, ref, atol=1.5e-2)
    # and actually learn
    assert ref[-5:].mean() < ref[:5].mean()
