"""windowed_compat stress at far-from-init offset magnitudes (VERDICT r3
#6 / weak #3).

The round-3 radius sweep ran on converter-harness weights whose sampling
offsets have near-init reach, leaving the production-R parity claim
unproven for trained checkpoints (NOTES.md caveat). Real KITTI training is
environment-blocked, so this test emulates trained reach directly: it
scales the converted `sampling_offsets` Dense (kernel+bias) by 1x/4x/8x —
offsets grow linearly — and re-measures, per radius R, the abs-rel depth
delta of windowed_compat vs the EXACT bilinear path on the same scaled
weights, plus the clamp-mass telemetry. mmcv's offset-bias init reaches
P=8 px at the outermost point, so 8x reach = up to 64 level-px — far past
anything the smooth KITTI loss landscape produces.

Outcome (recorded in NOTES.md round 4): the delta stays metric-harmless at
production R even when clamp mass saturates, because clamped samples snap
to the window edge nearest their true target; the per-checkpoint procedure
stays `compat_delta_px` -> pick smallest R with delta < 1e-3.
"""
import os.path as osp
import sys

import numpy as np
import pytest

torch = pytest.importorskip("torch")
import torch.nn as nn  # noqa: E402

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

sys.path.insert(0, osp.dirname(osp.abspath(__file__)))
import test_composite_parity as C  # noqa: E402

pytestmark = pytest.mark.slow

SCALE = dict(
    H_IMG=128, W_IMG=256, EMBED=64, DEPTHS=(2, 2, 6, 2),
    HEADS=(2, 4, 8, 16), WINDOW=4, NECK_CH=(64, 64, 128, 256, 512),
    NECK_EMBED=256, NECK_HEADS=8, NECK_POINTS=8)


def _abs_rel(ref, x):
    return float(np.mean(np.abs(x - ref) / np.maximum(ref, C.MIN_D)))


def _scale_offsets(tree, factor):
    def visit(path, leaf):
        names = [str(getattr(p, "key", p)) for p in path]
        if "sampling_offsets" in names:
            return leaf * factor
        return leaf
    return jax.tree_util.tree_map_with_path(visit, tree)


def test_compat_delta_vs_offset_reach(monkeypatch):
    for k, v in SCALE.items():
        monkeypatch.setattr(C, k, v)

    torch.manual_seed(0)
    tm = C.TorchGEDepth("adaptive").eval()
    for m in tm.modules():
        if isinstance(m, nn.BatchNorm2d):
            m.running_mean.normal_(0, 0.5)
            m.running_var.uniform_(0.5, 2.0)

    rng = np.random.default_rng(7)
    img = jnp.asarray(C._rand_batch(rng)[:1])
    ch = jnp.full((1,), C.CAM_H, jnp.float32)

    exact = C._build_jax_model("adaptive")
    v0 = C._converted_variables(tm, exact, img, ch)

    from gedepth_tpu.apis.inference import cast_params_bf16
    from gedepth_tpu.configs import get_config
    _pm = get_config("gedepth_adaptive_kitti_parity").model
    parity_model = C._build_jax_model(
        "adaptive", neck_sampling=_pm.neck_sampling,
        neck_window_radius=_pm.neck_window_radius,
        bf16_scope=_pm.bf16_scope)

    table = {}
    parity = {}
    for factor in (1.0, 4.0, 8.0):
        v = _scale_offsets(v0, factor)
        ref = np.asarray(exact.apply(v, img, ch,
                                     method=exact.predict_depth))
        out = parity_model.apply(
            cast_params_bf16(v, scope=_pm.bf16_scope), img, ch,
            method=parity_model.predict_depth)
        parity[factor] = _abs_rel(ref, np.asarray(out))
        for R in (4, 8, 16):
            compat = C._build_jax_model("adaptive",
                                        neck_sampling="windowed_compat",
                                        neck_window_radius=R)
            out, inter = compat.apply(
                v, img, ch, method=compat.predict_depth,
                mutable=["intermediates"])
            clamp_vals = [float(np.mean(np.asarray(x)))
                          for x in jax.tree.leaves(
                              inter.get("intermediates", {}))]
            clamp = float(np.mean(clamp_vals)) if clamp_vals else 0.0
            table[(factor, R)] = (_abs_rel(ref, np.asarray(out)), clamp)

    print("\n(offset-scale, R) -> (abs-rel delta, mean clamp mass)")
    for k in sorted(table):
        d, c = table[k]
        print(f"  x{k[0]:<4} R={k[1]:<3} delta={d:.5f} clamp={c:.3f}")

    for factor in (1.0, 4.0, 8.0):
        # monotone improvement with R (allow float noise)
        assert table[(factor, 16)][0] <= table[(factor, 4)][0] + 1e-3
        # clamp mass must not shrink as reach grows at fixed R
        if factor > 1.0:
            assert table[(factor, 4)][1] >= table[(1.0, 4)][1] - 0.05
    # the production claim under stress: at R=8, even 8x-init reach stays
    # metric-harmless (<1e-2 abs-rel delta; measured ~1e-3 range)
    assert table[(8.0, 8)][0] < 1e-2

    # THE parity config (gedepth_adaptive_kitti_parity preset, read from
    # configs so the gate tracks what ships: compat R=5 +
    # bf16_scope='backbone_head') under the same far-from-init stress:
    # the COMBINED delta must stay inside the 0.001 released-checkpoint
    # budget at realistic trained reach (1x and the 4x over-reach;
    # round-5 measured 5.9e-4 / 7.0e-4; only the 8x stress bound exceeds
    # it at 2.6e-3 — covered by the per-checkpoint compat_delta_px
    # procedure).
    print(f"parity preset (R={_pm.neck_window_radius} + "
          f"{_pm.bf16_scope}) combined deltas: "
          f"{ {k: round(d, 5) for k, d in parity.items()} }")
    assert parity[1.0] < 1e-3, parity
    assert parity[4.0] < 1e-3, parity
    assert parity[8.0] < 5e-3, parity
