"""Tensor parallelism (Megatron-style) over the "model" mesh axis.

Beyond-reference capability (the reference is DP-only, SURVEY.md §2.11):
transformer qkv/FFN-in kernels are column-parallel, proj/FFN-out kernels
row-parallel (`parallel/mesh.py tp_param_shardings`); GSPMD propagates the
layout through the jitted train step and inserts the per-block all-reduces.
These tests verify the TP-sharded step is numerically equal to the
replicated one on a virtual 8-device mesh (data/space fold x tp — the
safe composition; see tests/test_xla_spmd_regress.py for why true
spatial sharding is gated while TP is active).
"""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from gedepth_tpu.configs import get_config
from gedepth_tpu.parallel import (
    create_mesh_3d, tp_param_shardings, shard_state_tp, shard_batch_3d,
    create_mesh, shard_batch)
from gedepth_tpu.train import (
    make_optimizer, create_train_state, make_train_step)

pytestmark = [
    pytest.mark.slow,  # compile-heavy: full-model jits (test tiers, NOTES r4)
    pytest.mark.skipif(len(jax.devices()) < 8,
                       reason="needs 8 (virtual) devices"),
]


def _tiny_batch(b=8, h=64, w=96):
    rng = np.random.default_rng(0)
    img = rng.standard_normal((b, h, w, 5)).astype(np.float32)
    img[..., 4] = np.abs(img[..., 4]) * 30 + 1.0
    return {
        "img": img,
        "depth_gt": np.abs(rng.standard_normal((b, h, w))).astype(
            np.float32) * 10,
        "pe_k_gt": rng.integers(0, 11, size=(b, h, w)).astype(np.float32),
        "cam_height": np.full((b,), 1.65, np.float32),
    }


def test_tp_rules_match_swin_blocks():
    cfg = get_config("smoke_synthetic")
    model = cfg.model.build()
    batch = _tiny_batch()
    variables = model.init(jax.random.PRNGKey(0), batch["img"],
                           batch["cam_height"])
    mesh = create_mesh_3d(jax.devices()[:8])
    specs = tp_param_shardings(variables["params"], mesh)
    flat = jax.tree.leaves(
        jax.tree.map(lambda s: s != jax.sharding.PartitionSpec(), specs))
    n_sharded = sum(bool(x) for x in flat)
    # every Swin block contributes qkv kernel+bias, proj kernel, and two
    # FFN kernels + one FFN bias that divide by tp=2
    assert n_sharded >= 12, n_sharded


def test_tp_train_step_matches_replicated():
    cfg = get_config("smoke_synthetic")
    model = cfg.model.build()
    batch_np = _tiny_batch()
    tx, _ = make_optimizer(cfg.optim.max_lr, cfg.train.max_iters,
                           cfg.optim.warmup_iters)
    state = create_train_state(model, tx, batch_np["img"],
                               jax.random.PRNGKey(0),
                               batch_np["cam_height"])
    train_step = make_train_step(model, donate=False)
    rng = jax.random.PRNGKey(1)

    # replicated DP baseline on a 1-D mesh
    mesh_dp = create_mesh(jax.devices()[:8])
    batch_dp = shard_batch(dict(batch_np), mesh_dp)
    state_dp, metrics_dp = train_step(state, batch_dp, rng)

    # (2,2,2) mesh: TP param layout; batch folded over (data, space)
    mesh = create_mesh_3d(jax.devices()[:8], shape=(2, 2, 2))
    state_tp = shard_state_tp(state, mesh)
    batch_tp = shard_batch_3d(dict(batch_np), mesh)
    state_tp, metrics_tp = train_step(state_tp, batch_tp, rng)

    np.testing.assert_allclose(float(metrics_tp["loss"]),
                               float(metrics_dp["loss"]),
                               rtol=2e-5, atol=2e-5)
    np.testing.assert_allclose(float(metrics_tp["grad_norm"]),
                               float(metrics_dp["grad_norm"]),
                               rtol=2e-4, atol=2e-4)
    # updated params agree leaf-wise (spot-check the largest TP-sharded and
    # one replicated leaf)
    flat_dp = jax.tree_util.tree_flatten_with_path(state_dp.params)[0]
    flat_tp = jax.tree_util.tree_flatten_with_path(state_tp.params)[0]
    checked = 0
    for (p_dp, x_dp), (p_tp, x_tp) in zip(flat_dp, flat_tp):
        assert p_dp == p_tp
        name = "/".join(str(getattr(k, "key", k)) for k in p_dp)
        if name.endswith("qkv/kernel") or name.endswith("Dense_1/kernel"):
            np.testing.assert_allclose(np.asarray(x_tp), np.asarray(x_dp),
                                       rtol=2e-4, atol=2e-5)
            checked += 1
        if checked >= 4:
            break
    assert checked >= 2
