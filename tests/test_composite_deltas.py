"""Variant metric deltas on REALISTIC converted weights (VERDICT round-2
item 8).

The smoke-scale proxies in test_variant_deltas.py bound the
nearest/bf16/windowed_compat output deltas on tiny synthetic weights. This
test scales the full composite torch-parity harness (test_composite_parity)
to a Swin-S-ish model, converts the torch weights through the real
converter, and measures each drop-in eval variant's depth delta against the
f32 exact-bilinear reference ON THE SAME CONVERTED WEIGHTS — the closest
offline stand-in for a released-checkpoint variant study this sandbox
allows (checkpoint downloads are blocked; see VERDICT missing #1).
"""
import os.path as osp
import sys

import numpy as np
import pytest

torch = pytest.importorskip("torch")
import torch.nn as nn

import jax
import jax.numpy as jnp

sys.path.insert(0, osp.dirname(osp.abspath(__file__)))
import test_composite_parity as C

pytestmark = pytest.mark.slow  # compile-heavy: full-model jits (test tiers, NOTES r4)

# Swin-S-ish scale (embed 64, depths (2,2,6,2)) — large enough that
# rounding/approximation behavior is representative, small enough for a
# CPU test. Window 4 instead of 7: the textbook torch harness has no
# window padding, so every stage resolution (down to H/32 x W/32 = 4x8)
# must divide by the window.
SCALE = dict(
    H_IMG=128, W_IMG=256, EMBED=64, DEPTHS=(2, 2, 6, 2),
    HEADS=(2, 4, 8, 16), WINDOW=4, NECK_CH=(64, 64, 128, 256, 512),
    NECK_EMBED=256, NECK_HEADS=8, NECK_POINTS=8)


def _abs_rel(ref, x):
    return float(np.mean(np.abs(x - ref) / np.maximum(ref, C.MIN_D)))


def test_variant_deltas_on_converted_swin_s_weights(monkeypatch):
    for k, v in SCALE.items():
        monkeypatch.setattr(C, k, v)

    torch.manual_seed(0)
    tm = C.TorchGEDepth("adaptive").eval()
    for m in tm.modules():
        if isinstance(m, nn.BatchNorm2d):
            m.running_mean.normal_(0, 0.5)
            m.running_var.uniform_(0.5, 2.0)

    rng = np.random.default_rng(7)
    img = C._rand_batch(rng)[:1]
    ch = jnp.full((1,), C.CAM_H, jnp.float32)

    exact = C._build_jax_model("adaptive")
    v = C._converted_variables(tm, exact, img, ch)

    # anchor: converted weights reproduce torch at this scale
    with torch.no_grad():
        want = tm(torch.from_numpy(img.transpose(0, 3, 1, 2).copy())).numpy()
    ref = np.asarray(exact.apply(v, jnp.asarray(img), ch,
                                 method=exact.predict_depth))
    np.testing.assert_allclose(ref.transpose(0, 3, 1, 2), want,
                               rtol=1e-3, atol=2e-3)

    deltas = {}
    # nearest-sampling MSDA (drop-in, same params)
    near = C._build_jax_model("adaptive", neck_sampling="nearest")
    out = np.asarray(near.apply(v, jnp.asarray(img), ch,
                                method=near.predict_depth))
    deltas["nearest"] = _abs_rel(ref, out)

    # bf16 forward (same params, cast at apply time)
    vb = jax.tree.map(lambda x: x.astype(jnp.bfloat16)
                      if x.dtype == jnp.float32 else x, v)
    out = np.asarray(exact.apply(
        vb, jnp.asarray(img).astype(jnp.bfloat16), ch,
        method=exact.predict_depth)).astype(np.float32)
    deltas["bf16"] = _abs_rel(ref, out)

    # windowed_compat (same params through the dense windowed sampler)
    for R in (8, 16):
        compat = C._build_jax_model("adaptive",
                                    neck_sampling="windowed_compat",
                                    neck_window_radius=R)
        out = np.asarray(compat.apply(v, jnp.asarray(img), ch,
                                      method=compat.predict_depth))
        deltas[f"windowed_compat_R{R}"] = _abs_rel(ref, out)

    # THE parity serving config, read from the shipped preset so this
    # gate tracks it (gedepth_adaptive_kitti_parity: compat R=5 sampling
    # + bf16_scope='backbone_head' — backbone/head params cast bf16, the
    # HAHI/PE/slope/fusion metric path stays f32; models/depther.py
    # bf16_scope; apis.inference.cast_params_bf16).
    from gedepth_tpu.apis.inference import cast_params_bf16
    from gedepth_tpu.configs import get_config
    pm = get_config("gedepth_adaptive_kitti_parity").model
    parity = C._build_jax_model("adaptive",
                                neck_sampling=pm.neck_sampling,
                                neck_window_radius=pm.neck_window_radius,
                                bf16_scope=pm.bf16_scope)
    vp = cast_params_bf16(v, scope=pm.bf16_scope)
    out = np.asarray(parity.apply(vp, jnp.asarray(img), ch,
                                  method=parity.predict_depth))
    deltas["parity_preset"] = _abs_rel(ref, out)

    print("depth abs-rel deltas vs f32 exact on converted Swin-S-ish "
          f"weights: { {k: round(x, 4) for k, x in deltas.items()} }")
    assert all(np.isfinite(list(deltas.values())))
    # ---- budget-enforcing gates (VERDICT r4 weak #2 / item 7) ----
    # The marketed parity config must stay inside the released-checkpoint
    # budget: Abs Rel within 0.001 (BASELINE.json). Round-5 measured
    # 5.9e-4 here; a regression past the budget turns the suite red.
    assert deltas["parity_preset"] < 1e-3, deltas
    # compat f32 at production radii is also marketed as parity-credible
    assert deltas["windowed_compat_R8"] < 1e-3, deltas
    # loose rails only for the documented FAST modes (nearest / full bf16
    # serving), which are not marketed as parity configs
    assert deltas["bf16"] < 0.02
    assert (deltas["windowed_compat_R16"]
            <= deltas["windowed_compat_R8"] + 1e-3)
