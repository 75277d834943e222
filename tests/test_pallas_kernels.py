"""Pallas kernel parity vs XLA references (interpreter mode on CPU).

Real-TPU parity runs live in the verify drives; these keep the kernels
honest in CI without a chip.
"""
import numpy as np
import pytest
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

pytestmark = pytest.mark.slow  # compile-heavy: full-model jits (test tiers, NOTES r4)


@pytest.fixture(autouse=True)
def _interpret_mode(monkeypatch):
    from jax.experimental.pallas import tpu as pltpu
    ctx = pltpu.force_tpu_interpret_mode()
    ctx.__enter__()
    yield
    ctx.__exit__(None, None, None)


def test_window_attention_pallas_parity():
    from gedepth_tpu.ops.window_attention import window_attention_xla
    from gedepth_tpu.ops.pallas.window_attn import window_attention_pallas

    rng = np.random.default_rng(0)
    for nWB, N, H, D, nW in [(12, 49, 2, 32, None), (12, 49, 2, 32, 6),
                             (8, 49, 1, 16, 8)]:
        q = jnp.asarray(rng.standard_normal((nWB, N, H, D)).astype(np.float32))
        k = jnp.asarray(rng.standard_normal((nWB, N, H, D)).astype(np.float32))
        v = jnp.asarray(rng.standard_normal((nWB, N, H, D)).astype(np.float32))
        bias = jnp.asarray(rng.standard_normal((H, N, N)).astype(np.float32))
        mask = None
        if nW is not None:
            mask = jnp.asarray(np.where(rng.random((nW, N, N)) > 0.5,
                                        0.0, -100.0).astype(np.float32))
        ref = np.asarray(window_attention_xla(q, k, v, bias, mask))
        got = np.asarray(window_attention_pallas(q, k, v, bias, mask))
        np.testing.assert_allclose(got, ref, rtol=2e-4, atol=2e-5)


def test_pe_fusion_pallas_parity_and_grads():
    from gedepth_tpu.ops.pallas.pe_fusion import (
        pe_fusion_xla, pe_fusion_pallas)

    rng = np.random.default_rng(1)
    B, H, W = 2, 32, 128
    logits = jnp.asarray(rng.standard_normal((B, H, W, 11)).astype(np.float32))
    pe = jnp.asarray((np.abs(rng.standard_normal((B, H, W))) * 50 + 0.5)
                     .astype(np.float32))
    y = jnp.asarray(rng.uniform(0, 1, (B, H, W)).astype(np.float32))
    h = jnp.asarray([1.65, 1.55], dtype=jnp.float32)

    ref = np.asarray(pe_fusion_xla(logits, pe, y, h, 200.0))
    got = np.asarray(pe_fusion_pallas(logits, pe, y, h, 200.0))
    np.testing.assert_allclose(got, ref, rtol=1e-4, atol=1e-4)

    # custom_vjp routes grads through the XLA reference
    g_ref = jax.grad(lambda l: pe_fusion_xla(l, pe, y, h, 200.0).sum())(logits)
    g_got = jax.grad(lambda l: pe_fusion_pallas(l, pe, y, h, 200.0).sum())(
        logits)
    np.testing.assert_allclose(np.asarray(g_got), np.asarray(g_ref),
                               rtol=1e-4, atol=1e-5)


def test_msda_nearest_matches_grid_sample():
    """nearest sampling mode == grid_sample(mode='nearest', zeros pad)."""
    import torch
    import torch.nn.functional as F
    from gedepth_tpu.ops.msda import msda_sample

    rng = np.random.default_rng(3)
    B, H, W, heads, dim, Nq, P = 1, 9, 13, 2, 4, 17, 5
    value = rng.standard_normal((B, H, W, heads, dim)).astype(np.float32)
    locs = rng.uniform(0.05, 0.95, size=(B, Nq, heads, 1, P, 2)).astype(
        np.float32)
    weights = rng.uniform(0, 1, size=(B, Nq, heads, 1, P)).astype(np.float32)

    got = np.asarray(msda_sample([jnp.asarray(value)], jnp.asarray(locs),
                                 jnp.asarray(weights), sampling="nearest"))

    v_t = torch.from_numpy(
        value.transpose(0, 3, 4, 1, 2).reshape(B * heads, dim, H, W))
    grid = torch.from_numpy(locs[:, :, :, 0] * 2 - 1)
    grid = grid.permute(0, 2, 1, 3, 4).reshape(B * heads, Nq, P, 2)
    sampled = F.grid_sample(v_t, grid, mode="nearest",
                            padding_mode="zeros", align_corners=False)
    w_t = torch.from_numpy(weights[:, :, :, 0])
    w_t = w_t.permute(0, 2, 1, 3).reshape(B * heads, 1, Nq, P)
    want = (sampled * w_t).sum(-1)
    want = want.reshape(B, heads, dim, Nq).permute(0, 3, 1, 2)
    want = want.reshape(B, Nq, heads * dim).numpy()
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


def test_msda_windowed_pallas_interpret_parity():
    """Pallas windowed-MSDA kernel (interpret mode) == taps reference,
    including clamped padded tiles and multi-ratio levels."""
    import numpy as np
    import jax.numpy as jnp
    from gedepth_tpu.ops.msda import msda_sample_windowed
    from gedepth_tpu.ops.pallas import msda_windowed as K

    rng = np.random.default_rng(3)
    B, h, d, P, R = 1, 2, 8, 4, 4
    Hq, Wq = 16, 40
    shapes = [(8, 20), (4, 10)]
    levels = [jnp.asarray(rng.standard_normal((B, H, W, h, d))
                          .astype(np.float32)) for H, W in shapes]
    off = jnp.asarray(rng.uniform(-R, R, (B, Hq * Wq, h, len(shapes), P, 2))
                      .astype(np.float32))
    w = jnp.asarray(rng.uniform(0, 1, (B, Hq * Wq, h, len(shapes), P))
                    .astype(np.float32))
    ref = np.asarray(msda_sample_windowed(levels, off, w, (Hq, Wq),
                                          radius=R, impl="taps"))
    got = None
    for li, v in enumerate(levels):
        plan = K._plan((Hq, Wq), (v.shape[1], v.shape[2]), R)
        assert plan is not None
        term = K._pallas_level(v, off[:, :, :, li], w[:, :, :, li],
                               (Hq, Wq), R, plan, interpret=True)
        got = term if got is None else got + term
    got = np.asarray(got).reshape(ref.shape)
    np.testing.assert_allclose(got, ref, rtol=1e-4, atol=1e-5)


def test_msda_windowed_fused_group_parity_and_grads():
    """Fused multi-level kernel (one pallas_call for the whole group,
    interpret mode) == taps reference, including the shared-extent
    padded-value path and the XLA-tiled custom VJP."""
    import numpy as np
    import jax.numpy as jnp
    from gedepth_tpu.ops.msda import (
        msda_sample_windowed, shared_value_exts)
    from gedepth_tpu.ops.pallas.msda_windowed import msda_windowed_group

    rng = np.random.default_rng(5)
    B, h, d, P, R = 1, 2, 8, 4, 4
    Hq, Wq = 16, 40
    shapes = ((8, 20), (4, 10), (16, 40))
    levels = [jnp.asarray(rng.standard_normal((B, H, W, h, d))
                          .astype(np.float32)) for H, W in shapes]
    off = jnp.asarray(rng.uniform(-R, R, (B, Hq * Wq, h, len(shapes), P, 2))
                      .astype(np.float32))
    w = jnp.asarray(rng.uniform(0, 1, (B, Hq * Wq, h, len(shapes), P))
                    .astype(np.float32))
    ref = np.asarray(msda_sample_windowed(levels, off, w, (Hq, Wq),
                                          radius=R, impl="taps"))

    # fused group, plan-native extents
    offs = tuple(off[:, :, :, l] for l in range(len(shapes)))
    ws = tuple(w[:, :, :, l] for l in range(len(shapes)))
    got = np.asarray(msda_windowed_group(tuple(levels), offs, ws,
                                         (Hq, Wq), R))
    np.testing.assert_allclose(got.reshape(ref.shape), ref,
                               rtol=1e-4, atol=1e-5)

    # shared extents across two query grids (the hahi path)
    exts = shared_value_exts(((Hq, Wq), (8, 20)), shapes, R)
    got2 = np.asarray(msda_windowed_group(tuple(levels), offs, ws,
                                          (Hq, Wq), R, exts))
    np.testing.assert_allclose(got2.reshape(ref.shape), ref,
                               rtol=1e-4, atol=1e-5)

    # custom VJP == taps-reference autodiff
    def loss_fused(vs, os_, ws_):
        o = msda_windowed_group(vs, os_, ws_, (Hq, Wq), R)
        return jnp.sum(o * o)

    def loss_taps(vs, os_, ws_):
        o = msda_sample_windowed(
            list(vs),
            jnp.stack(os_, axis=3), jnp.stack(ws_, axis=3),
            (Hq, Wq), radius=R, impl="taps")
        return jnp.sum(o.reshape(B, Hq * Wq, h, d) ** 2)

    g_fused = jax.grad(loss_fused, argnums=(0, 1, 2))(
        tuple(levels), offs, ws)
    g_taps = jax.grad(loss_taps, argnums=(0, 1, 2))(
        tuple(levels), offs, ws)
    for a, b in zip(jax.tree.leaves(g_fused), jax.tree.leaves(g_taps)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-3, atol=2e-3)


def test_msda_windowed_level_pallas_backward_parity():
    """Default-path single-level kernel: Pallas d_off/d_w backward +
    value-only tiled VJP == taps-reference autodiff (interpret mode)."""
    import numpy as np
    import jax.numpy as jnp
    from gedepth_tpu.ops.msda import msda_sample_windowed
    from gedepth_tpu.ops.pallas.msda_windowed import msda_windowed_level

    rng = np.random.default_rng(9)
    B, h, d, P, R = 1, 2, 8, 4, 4
    Hq, Wq = 16, 40
    Hv, Wv = 8, 20
    v = jnp.asarray(rng.standard_normal((B, Hv, Wv, h, d))
                    .astype(np.float32))
    off = jnp.asarray(rng.uniform(-R, R, (B, Hq * Wq, h, P, 2))
                      .astype(np.float32))
    w = jnp.asarray(rng.uniform(0, 1, (B, Hq * Wq, h, P))
                    .astype(np.float32))

    def loss_pallas(v_, o_, w_):
        out = msda_windowed_level(v_, o_, w_, (Hq, Wq), R)
        return jnp.sum(out * out)

    def loss_taps(v_, o_, w_):
        out = msda_sample_windowed(
            [v_], o_[:, :, :, None], w_[:, :, :, None], (Hq, Wq),
            radius=R, impl="taps")
        return jnp.sum(out.reshape(B, Hq * Wq, h, d) ** 2)

    gp = jax.grad(loss_pallas, argnums=(0, 1, 2))(v, off, w)
    gt = jax.grad(loss_taps, argnums=(0, 1, 2))(v, off, w)
    for a, b in zip(gp, gt):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-3, atol=2e-3)


def test_msda_windowed_levels_shared_prep_parity_and_grads():
    """Product path `msda_windowed_levels` (shared q-arg relayout, raw
    tile-layout accumulation, custom VJP): forward + all grads match the
    taps-reference autodiff."""
    import numpy as np
    import jax.numpy as jnp
    from gedepth_tpu.ops.msda import msda_sample_windowed
    from gedepth_tpu.ops.pallas.msda_windowed import msda_windowed_levels

    rng = np.random.default_rng(11)
    B, h, d, P, R = 1, 2, 8, 4, 4
    Hq, Wq = 16, 40
    shapes = [(16, 40), (8, 20)]
    vals = tuple(jnp.asarray(rng.standard_normal((B, H, W, h, d))
                             .astype(np.float32)) for H, W in shapes)
    L = len(shapes)
    off = jnp.asarray(rng.uniform(-R, R, (B, Hq * Wq, h, L, P, 2))
                      .astype(np.float32))
    w = jnp.asarray(rng.uniform(0, 1, (B, Hq * Wq, h, L, P))
                    .astype(np.float32))

    def loss_levels(vs, o_, w_):
        out = msda_windowed_levels(vs, o_, w_, (Hq, Wq), R)
        return jnp.sum(out * out)

    def loss_taps(vs, o_, w_):
        out = msda_sample_windowed(list(vs), o_, w_, (Hq, Wq), radius=R,
                                   impl="taps")
        return jnp.sum(out.reshape(B, Hq * Wq, h, d) ** 2)

    fl = loss_levels(vals, off, w)
    ft = loss_taps(vals, off, w)
    np.testing.assert_allclose(float(fl), float(ft), rtol=1e-4)

    gl = jax.grad(loss_levels, argnums=(0, 1, 2))(vals, off, w)
    gt = jax.grad(loss_taps, argnums=(0, 1, 2))(vals, off, w)
    for a, b in zip(jax.tree.leaves(gl), jax.tree.leaves(gt)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-3, atol=2e-3)


def test_msda_windowed_levels_flanes_parity_and_grads():
    """Projection-native flane q-arg path == raw-layout product path:
    forward identical, grads equal the flane_pack of the raw grads."""
    from gedepth_tpu.ops.pallas.msda_windowed import (
        _plan, flane_pack, flane_unpack, msda_windowed_levels,
        msda_windowed_levels_flanes)

    rng = np.random.default_rng(23)
    B, h, d, P, R = 1, 2, 8, 4, 4
    Hq, Wq = 16, 40
    shapes = [(16, 40), (8, 20)]
    vals = tuple(jnp.asarray(rng.standard_normal((B, H, W, h, d))
                             .astype(np.float32)) for H, W in shapes)
    L = len(shapes)
    off = jnp.asarray(rng.uniform(-R, R, (B, Hq * Wq, h, L, P, 2))
                      .astype(np.float32))
    w = jnp.asarray(rng.uniform(0, 1, (B, Hq * Wq, h, L, P))
                    .astype(np.float32))
    plan0 = _plan((Hq, Wq), shapes[0], R)
    off_f, w_f = flane_pack(off, w, (Hq, Wq), plan0)

    # pack/unpack roundtrip is exact (pure permutation)
    off_r, w_r = flane_unpack(off_f, w_f, (Hq, Wq), plan0)
    np.testing.assert_array_equal(np.asarray(off_r), np.asarray(off))
    np.testing.assert_array_equal(np.asarray(w_r), np.asarray(w))

    out_ref = msda_windowed_levels(vals, off, w, (Hq, Wq), R)
    out_fl = msda_windowed_levels_flanes(vals, off_f, w_f, (Hq, Wq), R)
    np.testing.assert_allclose(np.asarray(out_fl), np.asarray(out_ref),
                               rtol=1e-5, atol=1e-5)

    def loss_fl(vs, o_, w_):
        return jnp.sum(msda_windowed_levels_flanes(vs, o_, w_,
                                                   (Hq, Wq), R) ** 2)

    def loss_raw(vs, o_, w_):
        return jnp.sum(msda_windowed_levels(vs, o_, w_, (Hq, Wq), R) ** 2)

    gfl = jax.grad(loss_fl, argnums=(0, 1, 2))(vals, off_f, w_f)
    graw = jax.grad(loss_raw, argnums=(0, 1, 2))(vals, off, w)
    for a, b in zip(gfl[0], graw[0]):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-4)
    do_f, dw_f = flane_pack(graw[1], graw[2], (Hq, Wq), plan0)
    np.testing.assert_allclose(np.asarray(gfl[1]), np.asarray(do_f),
                               rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(gfl[2]), np.asarray(dw_f),
                               rtol=1e-4, atol=1e-4)
