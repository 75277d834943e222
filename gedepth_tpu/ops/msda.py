"""Multi-scale deformable attention sampling core (XLA, TPU-tuned).

TPU-native replacement for mmcv's CUDA `MultiScaleDeformableAttention` kernel
(used on the hot path of the HAHI neck, reference depth/models/necks/hahi.py:16,
179-188). Semantics follow the deformable-DETR formulation with
grid_sample(align_corners=False, padding_mode='zeros') sampling:
pixel coords x = loc_x * W - 0.5, y = loc_y * H - 0.5; out-of-range corners
contribute zero.

Performance notes (measured on TPU v5e at KITTI eval resolution):
  * per-level take_along_axis with query chunking (this implementation) is
    the fastest XLA formulation found so far: full model 1.37 s/img at
    352x1216.
  * a "flatten everything into one gather" variant (single jnp.take over the
    level/head concat with corner weights folded in) wins an isolated
    microbenchmark 8x but LOSES 1.6x in the real model — materialising the
    (B, Nq, h, L, P, 4) index/weight tensors (~900MB at cross-attention
    scale) swamps the gather saving. Kept in git history (d69febf) for
    reference.
  * chunking bounds the gather intermediates; the cross-attention query grid
    is >100k tokens at eval resolution and unchunked would materialise
    multi-GB temporaries.
"""
from __future__ import annotations

from typing import Sequence

import numpy as np
import jax
import jax.numpy as jnp


def _bilinear_gather_level(value, locs):
    """Sample one level.

    value: (B, H, W, heads, dim)
    locs:  (B, Nq, heads, P, 2) normalized (x, y)
    returns (B, Nq, heads, P, dim)
    """
    B, H, W, nheads, dim = value.shape
    _, Nq, _, P, _ = locs.shape

    x = locs[..., 0] * W - 0.5
    y = locs[..., 1] * H - 0.5
    x0 = jnp.floor(x)
    y0 = jnp.floor(y)
    fx = x - x0
    fy = y - y0

    # (B, heads, H*W, dim) for per-head gathers
    flat = value.transpose(0, 3, 1, 2, 4).reshape(B, nheads, H * W, dim)

    def corner(xi, yi, w):
        inb = (xi >= 0) & (xi < W) & (yi >= 0) & (yi < H)
        xi_c = jnp.clip(xi, 0, W - 1).astype(jnp.int32)
        yi_c = jnp.clip(yi, 0, H - 1).astype(jnp.int32)
        idx = yi_c * W + xi_c                        # (B, Nq, heads, P)
        idx = idx.transpose(0, 2, 1, 3).reshape(B, nheads, Nq * P)
        g = jnp.take_along_axis(flat, idx[..., None], axis=2)
        g = g.reshape(B, nheads, Nq, P, dim).transpose(0, 2, 1, 3, 4)
        w = w * inb.astype(value.dtype)
        return g * w[..., None]

    out = (corner(x0, y0, (1 - fx) * (1 - fy))
           + corner(x0 + 1, y0, fx * (1 - fy))
           + corner(x0, y0 + 1, (1 - fx) * fy)
           + corner(x0 + 1, y0 + 1, fx * fy))
    return out


def _nearest_gather_level(value, locs):
    """Nearest-neighbour sampling: one gather per point instead of four.

    Matches grid_sample(mode='nearest', align_corners=False) semantics:
    index = floor(loc * size) clamped, zero outside. An opt-in ~4x cheaper
    approximation of the bilinear reference ('sampling="nearest"').
    """
    B, H, W, nheads, dim = value.shape
    _, Nq, _, P, _ = locs.shape
    x = jnp.floor(locs[..., 0] * W)
    y = jnp.floor(locs[..., 1] * H)
    inb = (x >= 0) & (x < W) & (y >= 0) & (y < H)
    xi = jnp.clip(x, 0, W - 1).astype(jnp.int32)
    yi = jnp.clip(y, 0, H - 1).astype(jnp.int32)
    flat = value.transpose(0, 3, 1, 2, 4).reshape(B, nheads, H * W, dim)
    idx = (yi * W + xi).transpose(0, 2, 1, 3).reshape(B, nheads, Nq * P)
    g = jnp.take_along_axis(flat, idx[..., None], axis=2)
    g = g.reshape(B, nheads, Nq, P, dim).transpose(0, 2, 1, 3, 4)
    return g * inb.astype(value.dtype)[..., None]


def _msda_sample_block(value_levels, locations, weights,
                       sampling: str = "bilinear"):
    B, Nq, nheads, L, P, _ = locations.shape
    gather = (_bilinear_gather_level if sampling == "bilinear"
              else _nearest_gather_level)
    out = None
    for l, v in enumerate(value_levels):
        sampled = gather(v, locations[:, :, :, l])
        term = jnp.einsum("bqhpd,bqhp->bqhd", sampled, weights[:, :, :, l])
        out = term if out is None else out + term
    dim = value_levels[0].shape[-1]
    return out.reshape(B, Nq, nheads * dim)


def msda_sample(value_levels, locations, weights, query_chunk: int = 4096,
                remat: bool = True, sampling: str = "bilinear"):
    """Weighted multi-scale deformable sampling.

    Args:
      value_levels: list of (B, H_l, W_l, heads, dim) per level.
      locations: (B, Nq, heads, L, P, 2) normalized (x, y).
      weights: (B, Nq, heads, L, P), already softmaxed over (L, P).
      query_chunk: queries processed per scan step.
      remat: rematerialise the gathered corner tensors in the backward pass.
        Without this, autodiff saves (chunks, B, chunk, h, P, d) x corners
        activations — measured 130 GB for one train step at the KITTI train
        crop — trading one extra gather pass for ~100x less live memory.
      sampling: 'bilinear' (reference semantics) or 'nearest' (opt-in ~4x
        cheaper approximation; one gather per point).

    Returns:
      (B, Nq, heads * dim)
    """
    B, Nq, nheads, L, P, _ = locations.shape
    assert L == len(value_levels)
    dim = value_levels[0].shape[-1]
    if remat:
        block_full = jax.checkpoint(
            lambda loc, w: _msda_sample_block(value_levels, loc, w,
                                              sampling))
    else:
        block_full = lambda loc, w: _msda_sample_block(value_levels, loc, w,
                                                       sampling)

    if Nq <= query_chunk:
        return block_full(locations, weights)

    pad = (-Nq) % query_chunk
    if pad:
        locations = jnp.pad(locations,
                            ((0, 0), (0, pad)) + ((0, 0),) * 4)
        weights = jnp.pad(weights, ((0, 0), (0, pad)) + ((0, 0),) * 3)
    nc = (Nq + pad) // query_chunk
    locs_c = locations.reshape(B, nc, query_chunk, nheads, L, P, 2)
    w_c = weights.reshape(B, nc, query_chunk, nheads, L, P)

    def body(carry, inp):
        loc, w = inp
        return carry, block_full(loc, w)

    _, out = jax.lax.scan(
        body, None,
        (locs_c.transpose(1, 0, 2, 3, 4, 5, 6),
         w_c.transpose(1, 0, 2, 3, 4, 5)))
    out = out.transpose(1, 0, 2, 3).reshape(B, nc * query_chunk,
                                            nheads * dim)
    return out[:, :Nq]
