"""MSDA implementation cross-checks: flat gather and windowed dense mode
against the per-level reference formulation (which is itself torch
grid_sample parity-tested in test_parity_torch.py)."""
import numpy as np
import jax
import jax.numpy as jnp

from gedepth_tpu.ops.msda import (
    msda_sample, msda_sample_windowed)


def _setup(rng, B=2, h=3, d=8, P=4, L=3, Nq=533):
    shapes = [(9, 13), (5, 7), (3, 4)][:L]
    levels = [jnp.asarray(rng.standard_normal((B, H, W, h, d))
                          .astype(np.float32)) for H, W in shapes]
    locs = jnp.asarray(rng.uniform(-0.2, 1.2, size=(B, Nq, h, L, P, 2))
                       .astype(np.float32))
    w = jnp.asarray(rng.uniform(0, 1, size=(B, Nq, h, L, P))
                    .astype(np.float32))
    return levels, locs, w


def test_flat_matches_per_level():
    rng = np.random.default_rng(0)
    levels, locs, w = _setup(rng)
    for sampling in ("bilinear", "nearest"):
        a = np.asarray(msda_sample(levels, locs, w, query_chunk=128,
                                   impl="per_level", sampling=sampling))
        b = np.asarray(msda_sample(levels, locs, w, query_chunk=128,
                                   impl="flat", sampling=sampling))
        np.testing.assert_allclose(a, b, rtol=1e-5, atol=1e-5)


def test_flat_gradients_match():
    rng = np.random.default_rng(1)
    levels, locs, w = _setup(rng, Nq=130)

    def loss(impl):
        return jax.grad(lambda ls: msda_sample(
            ls, locs, w, query_chunk=64, impl=impl).sum())(levels)

    ga, gb = loss("per_level"), loss("flat")
    for x, y in zip(ga, gb):
        np.testing.assert_allclose(np.asarray(x), np.asarray(y),
                                   rtol=1e-4, atol=1e-4)


import pytest


@pytest.mark.parametrize("impl", ["taps", "tiled"])
def test_windowed_matches_exact_for_inwindow_offsets(impl):
    """With grid-center refs and offsets within the window, the windowed
    dense sampler reproduces the exact bilinear gather to float tolerance,
    for value levels both finer and coarser than the query grid."""
    rng = np.random.default_rng(2)
    B, h, d, P, R = 2, 3, 8, 4, 3
    Hq, Wq = 16, 24
    shapes = [(32, 48), (8, 12), (4, 6), (2, 3)]
    L = len(shapes)
    levels = [jnp.asarray(rng.standard_normal((B, H, W, h, d))
                          .astype(np.float32)) for H, W in shapes]
    Nq = Hq * Wq
    off = rng.uniform(-R, R, size=(B, Nq, h, L, P, 2)).astype(np.float32)
    w = rng.uniform(0, 1, size=(B, Nq, h, L, P)).astype(np.float32)

    iy, ix = np.meshgrid(np.arange(Hq), np.arange(Wq), indexing="ij")
    cy = ((iy + 0.5) / Hq).reshape(-1)
    cx = ((ix + 0.5) / Wq).reshape(-1)
    locs = np.zeros((B, Nq, h, L, P, 2), np.float32)
    for l, (H, W) in enumerate(shapes):
        locs[..., l, :, 0] = cx[None, :, None, None] + off[..., l, :, 0] / W
        locs[..., l, :, 1] = cy[None, :, None, None] + off[..., l, :, 1] / H

    a = np.asarray(msda_sample(levels, jnp.asarray(locs), jnp.asarray(w),
                               impl="per_level"))
    b = np.asarray(msda_sample_windowed(levels, jnp.asarray(off),
                                        jnp.asarray(w), (Hq, Wq), radius=R,
                                        impl=impl))
    np.testing.assert_allclose(a, b, rtol=1e-4, atol=1e-5)

    g1 = jax.grad(lambda ls: msda_sample(
        ls, jnp.asarray(locs), jnp.asarray(w), impl="per_level").sum())(
            levels)
    g2 = jax.grad(lambda ls: msda_sample_windowed(
        ls, jnp.asarray(off), jnp.asarray(w), (Hq, Wq), radius=R,
        impl=impl).sum())(levels)
    for x, y in zip(g1, g2):
        np.testing.assert_allclose(np.asarray(x), np.asarray(y),
                                   rtol=1e-4, atol=1e-4)


def test_windowed_zero_padding_outside_image():
    """Taps that fall outside the level contribute exactly zero
    (grid_sample zeros-padding semantics)."""
    B, h, d, P, R = 1, 1, 2, 1, 4
    Hq = Wq = 4
    level = jnp.ones((B, 4, 4, h, d), jnp.float32)
    # corner query (0,0) pushed fully out of the image
    off = np.zeros((B, Hq * Wq, h, 1, P, 2), np.float32)
    off[:, 0, :, :, :, :] = -4.0   # sample at (-3.5-ish, ...) -> outside
    w = np.ones((B, Hq * Wq, h, 1, P), np.float32)
    for impl in ("taps", "tiled"):
        out = np.asarray(msda_sample_windowed(
            [level], jnp.asarray(off), jnp.asarray(w), (Hq, Wq), radius=R,
            impl=impl))
        assert abs(out[0, 0]).max() == 0.0
        np.testing.assert_allclose(out[0, 5], 1.0, atol=1e-6)  # interior = 1


def test_windowed_tiled_clamped_pad_tiles():
    """Query widths that pad to a mostly-clamped last tile used to compute
    windows past the padded value extent (caught on TPU by the verify
    drive); tiled must still equal taps."""
    rng = np.random.default_rng(7)
    B, h, d, P, R = 1, 2, 4, 2, 4
    Hq, Wq = 48, 80            # pads to TW=64 -> ntx=2, tile 1 clamped
    shapes = [(24, 40), (6, 10)]
    L = len(shapes)
    levels = [jnp.asarray(rng.standard_normal((B, H, W, h, d))
                          .astype(np.float32)) for H, W in shapes]
    off = jnp.asarray(rng.uniform(-R, R, (B, Hq * Wq, h, L, P, 2))
                      .astype(np.float32))
    w = jnp.asarray(rng.uniform(0, 1, (B, Hq * Wq, h, L, P))
                    .astype(np.float32))
    a = np.asarray(msda_sample_windowed(levels, off, w, (Hq, Wq), radius=R,
                                        impl="taps"))
    b = np.asarray(msda_sample_windowed(levels, off, w, (Hq, Wq), radius=R,
                                        impl="tiled"))
    np.testing.assert_allclose(a, b, rtol=1e-4, atol=1e-5)
