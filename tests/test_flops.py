"""tools/flops.py jaxpr FLOP accounting + bf16_scope mixed precision.

The FLOP counter is the MFU numerator in bench.py (VERDICT r4 item 2);
these tests pin the 2MNK counting rules on hand-checkable graphs and the
structural multipliers (scan length, pallas grid).
"""
import os.path as osp
import sys

import numpy as np
import pytest
import jax
import jax.numpy as jnp

sys.path.insert(0, osp.join(osp.dirname(osp.dirname(osp.abspath(__file__))),
                            "tools"))
from flops import flops_of_fn, jaxpr_flops, device_peak_flops  # noqa: E402


def test_dot_general_flops():
    a = jnp.zeros((8, 32), jnp.float32)
    b = jnp.zeros((32, 16), jnp.float32)
    acc = flops_of_fn(lambda x, y: x @ y, a, b)
    assert acc["matmul"] == 2 * 8 * 16 * 32
    assert acc["total"] == acc["matmul"]


def test_batched_dot_flops():
    a = jnp.zeros((4, 8, 32), jnp.float32)
    b = jnp.zeros((4, 32, 16), jnp.float32)
    acc = flops_of_fn(jnp.matmul, a, b)
    assert acc["matmul"] == 4 * 2 * 8 * 16 * 32


def test_conv_flops():
    x = jnp.zeros((2, 16, 16, 8), jnp.float32)   # NHWC
    k = jnp.zeros((3, 3, 8, 4), jnp.float32)     # HWIO
    acc = flops_of_fn(
        lambda x, k: jax.lax.conv_general_dilated(
            x, k, (1, 1), "SAME",
            dimension_numbers=("NHWC", "HWIO", "NHWC")), x, k)
    # out elems = 2*16*16*4; per elem 2 * in_ch * kh * kw
    assert acc["conv"] == (2 * 16 * 16 * 4) * 2 * 8 * 9


def test_scan_multiplies_by_length():
    w = jnp.zeros((16, 16), jnp.float32)
    x = jnp.zeros((5, 8, 16), jnp.float32)

    def step(carry, xi):
        return carry, xi @ w

    acc = flops_of_fn(lambda x: jax.lax.scan(step, 0.0, x)[1], x)
    assert acc["matmul"] == 5 * 2 * 8 * 16 * 16


def test_remat_counted_once_in_forward():
    w = jnp.zeros((16, 16), jnp.float32)
    x = jnp.zeros((8, 16), jnp.float32)
    acc = flops_of_fn(jax.checkpoint(lambda x: x @ w), x)
    assert acc["matmul"] == 2 * 8 * 16 * 16


def test_grad_counts_backward_flops():
    w = jnp.zeros((16, 16), jnp.float32)
    x = jnp.zeros((8, 16), jnp.float32)

    def loss(w):
        return jnp.sum(x @ w)

    fwd = flops_of_fn(loss, w)["matmul"]
    both = flops_of_fn(jax.grad(loss), w)["matmul"]
    # d/dw (x@w) adds one x^T @ cotangent matmul of the same size
    assert both == 2 * fwd


def test_gedepth_model_flops_scale_with_resolution():
    from gedepth_tpu.configs import get_config
    from flops import gedepth_forward_flops

    cfg = get_config("smoke_synthetic")
    f1 = gedepth_forward_flops(cfg, 64, 128)["total"]
    f2 = gedepth_forward_flops(cfg, 128, 128)["total"]
    assert f1 > 0
    assert 1.5 < f2 / f1 < 2.6  # roughly linear in pixels


def test_device_peak_override(monkeypatch):
    monkeypatch.setenv("GEDEPTH_PEAK_TFLOPS", "123")
    assert device_peak_flops() == 123e12


def test_bf16_scope_forward_and_param_tree():
    """bf16_scope='backbone' keeps the param tree identical (checkpoint
    compat) and produces an f32 output close to the f32 model's."""
    from gedepth_tpu.models.depther import GEDepth
    from gedepth_tpu.apis.inference import cast_params_bf16

    kw = dict(embed_dims=16, depths=(1, 1, 2, 1), num_heads=(2, 2, 4, 8),
              window=2, drop_path_rate=0.0,
              neck_channels=(64, 16, 32, 64, 128), neck_embed_dim=32,
              neck_num_points=4, head_channels=16,
              neck_sampling="windowed_compat", neck_window_radius=4)
    rng = np.random.default_rng(0)
    img = rng.standard_normal((1, 64, 128, 5)).astype(np.float32)
    img[..., 4] = np.abs(img[..., 4]) * 30 + 1.0
    img = jnp.asarray(img)
    ch = jnp.full((1,), 1.65, jnp.float32)

    f32 = GEDepth(**kw)
    mixed = GEDepth(**kw, bf16_scope="backbone")
    v = f32.init(jax.random.PRNGKey(0), img, ch)
    ref = np.asarray(f32.apply(v, img, ch, method=f32.predict_depth))

    vc = cast_params_bf16(v, scope="backbone")
    # backbone subtree cast, rest untouched
    assert all(x.dtype == jnp.bfloat16
               for x in jax.tree.leaves(vc["params"]["backbone"])
               if np.issubdtype(x.dtype, np.floating))
    assert all(x.dtype == jnp.float32
               for x in jax.tree.leaves(vc["params"]["decode_head"])
               if np.issubdtype(x.dtype, np.floating))

    out = np.asarray(mixed.apply(vc, img, ch, method=mixed.predict_depth))
    assert out.dtype == np.float32
    rel = np.abs(out - ref) / np.maximum(ref, 1e-3)
    assert float(rel.mean()) < 5e-3  # smoke scale; real gate is the
    # stressed-weights 1e-3 budget in test_compat_stress/_composite_deltas
