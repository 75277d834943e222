"""Multi-scale deformable attention sampling core (XLA, TPU-tuned).

TPU-native replacement for mmcv's CUDA `MultiScaleDeformableAttention` kernel
(used on the hot path of the HAHI neck, reference depth/models/necks/hahi.py:16,
179-188). Semantics follow the deformable-DETR formulation with
grid_sample(align_corners=False, padding_mode='zeros') sampling:
pixel coords x = loc_x * W - 0.5, y = loc_y * H - 0.5; out-of-range corners
contribute zero.

Performance design (measured on TPU v5e at eval resolution):
  * ONE flat gather: all levels are concatenated into a single
    (B*heads*HW_total, dim) operand and every (level, point, corner) sample
    becomes one row index. A single `jnp.take(axis=0)` over a 2-D operand
    lowers to XLA's fast gather path — 8x faster than per-head
    take_along_axis batched gathers (6.7s -> 0.8s at self-attn scale).
  * Bilinear corner weights fold into the attention weights, so the gather
    result reduces with one einsum over (L*P*4).
  * Query chunking via lax.scan bounds the gather intermediates (the
    cross-attention query grid is >100k tokens at eval resolution; unchunked
    it materialises multi-GB temporaries).
"""
from __future__ import annotations

from typing import Sequence

import numpy as np
import jax
import jax.numpy as jnp


def _flat_indices_and_weights(locations, weights, spatial_shapes):
    """Global row indices + combined weights for the flat gather.

    locations: (B, Nq, h, L, P, 2) normalized (x, y)
    weights:   (B, Nq, h, L, P) softmaxed attention weights
    returns (idx, w): (B, Nq, h, L, P, 4) int32 row indices into the
    per-(b, h) flattened level concat of size HW_total, and float weights
    (attention x bilinear x in-bounds).
    """
    level_sizes = [h_ * w_ for (h_, w_) in spatial_shapes]
    level_offsets = np.concatenate([[0], np.cumsum(level_sizes)[:-1]])

    idx_parts = []
    w_parts = []
    for l, (H_, W_) in enumerate(spatial_shapes):
        x = locations[..., l, :, 0] * W_ - 0.5     # (B, Nq, h, P)
        y = locations[..., l, :, 1] * H_ - 0.5
        x0 = jnp.floor(x)
        y0 = jnp.floor(y)
        fx = x - x0
        fy = y - y0

        def corner(xi, yi, wgt):
            inb = (xi >= 0) & (xi < W_) & (yi >= 0) & (yi < H_)
            ii = (jnp.clip(yi, 0, H_ - 1).astype(jnp.int32) * W_
                  + jnp.clip(xi, 0, W_ - 1).astype(jnp.int32))
            return ii + int(level_offsets[l]), wgt * inb.astype(wgt.dtype)

        i00, w00 = corner(x0, y0, (1 - fx) * (1 - fy))
        i01, w01 = corner(x0 + 1, y0, fx * (1 - fy))
        i10, w10 = corner(x0, y0 + 1, (1 - fx) * fy)
        i11, w11 = corner(x0 + 1, y0 + 1, fx * fy)
        idx_parts.append(jnp.stack([i00, i01, i10, i11], axis=-1))
        w_l = weights[..., l, :]
        w_parts.append(jnp.stack([w00, w01, w10, w11], axis=-1)
                       * w_l[..., None])
    # (B, Nq, h, L, P, 4)
    return jnp.stack(idx_parts, axis=3), jnp.stack(w_parts, axis=3)


def msda_sample(value_levels: Sequence, locations, weights,
                query_chunk: int = 8192):
    """Weighted multi-scale deformable sampling.

    Args:
      value_levels: list of (B, H_l, W_l, heads, dim) per level.
      locations: (B, Nq, heads, L, P, 2) normalized (x, y).
      weights: (B, Nq, heads, L, P), already softmaxed over (L, P).
      query_chunk: queries per scan step (bounds gather temporaries).

    Returns:
      (B, Nq, heads * dim)
    """
    B, Nq, nheads, L, P, _ = locations.shape
    assert L == len(value_levels)
    dim = value_levels[0].shape[-1]
    spatial_shapes = tuple((v.shape[1], v.shape[2]) for v in value_levels)
    hw_total = sum(h_ * w_ for (h_, w_) in spatial_shapes)

    # (B, h, HW_total, d) -> flat (B*h*HW_total, d)
    flat = jnp.concatenate(
        [v.transpose(0, 3, 1, 2, 4).reshape(B, nheads, -1, dim)
         for v in value_levels], axis=2)
    flat = flat.reshape(B * nheads * hw_total, dim)

    idx, w = _flat_indices_and_weights(locations, weights, spatial_shapes)
    # add (b, h) base offsets so one flat gather covers everything
    bh_base = (jnp.arange(B, dtype=jnp.int32)[:, None] * nheads
               + jnp.arange(nheads, dtype=jnp.int32)[None, :]) * hw_total
    idx = idx + bh_base[:, None, :, None, None, None]

    J = L * P * 4
    idx = idx.reshape(B, Nq, nheads, J)
    w = w.reshape(B, Nq, nheads, J).astype(flat.dtype)

    def gather_block(idx_c, w_c):
        # idx_c/w_c: (B, C, h, J)
        g = jnp.take(flat, idx_c.reshape(-1), axis=0)
        g = g.reshape(idx_c.shape + (dim,))
        return jnp.einsum("bqhjd,bqhj->bqhd", g, w_c)

    if Nq <= query_chunk:
        out = gather_block(idx, w)
        return out.reshape(B, Nq, nheads * dim)

    pad = (-Nq) % query_chunk
    if pad:
        idx = jnp.pad(idx, ((0, 0), (0, pad), (0, 0), (0, 0)))
        w = jnp.pad(w, ((0, 0), (0, pad), (0, 0), (0, 0)))
    nc = (Nq + pad) // query_chunk
    idx_c = idx.reshape(B, nc, query_chunk, nheads, J).transpose(
        1, 0, 2, 3, 4)
    w_c = w.reshape(B, nc, query_chunk, nheads, J).transpose(1, 0, 2, 3, 4)

    def body(carry, inp):
        i_, w_ = inp
        return carry, gather_block(i_, w_)

    _, out = jax.lax.scan(body, None, (idx_c, w_c))
    out = out.transpose(1, 0, 2, 3, 4).reshape(B, nc * query_chunk,
                                               nheads * dim)
    return out[:, :Nq]


# Kept for parity tests: straightforward per-level gather reference.
def _bilinear_gather_level(value, locs):
    """value: (B, H, W, heads, dim); locs: (B, Nq, heads, P, 2) -> sampled
    (B, Nq, heads, P, dim). Reference implementation (slow path)."""
    B, H, W, nheads, dim = value.shape
    _, Nq, _, P, _ = locs.shape
    x = locs[..., 0] * W - 0.5
    y = locs[..., 1] * H - 0.5
    x0 = jnp.floor(x)
    y0 = jnp.floor(y)
    fx = x - x0
    fy = y - y0
    flat = value.transpose(0, 3, 1, 2, 4).reshape(B, nheads, H * W, dim)

    def corner(xi, yi, wgt):
        inb = (xi >= 0) & (xi < W) & (yi >= 0) & (yi < H)
        xi_c = jnp.clip(xi, 0, W - 1).astype(jnp.int32)
        yi_c = jnp.clip(yi, 0, H - 1).astype(jnp.int32)
        ii = (yi_c * W + xi_c).transpose(0, 2, 1, 3).reshape(B, nheads,
                                                             Nq * P)
        g = jnp.take_along_axis(flat, ii[..., None], axis=2)
        g = g.reshape(B, nheads, Nq, P, dim).transpose(0, 2, 1, 3, 4)
        return g * (wgt * inb.astype(value.dtype))[..., None]

    return (corner(x0, y0, (1 - fx) * (1 - fy))
            + corner(x0 + 1, y0, fx * (1 - fy))
            + corner(x0, y0 + 1, (1 - fx) * fy)
            + corner(x0 + 1, y0 + 1, fx * fy))


def _msda_sample_block(value_levels, locations, weights):
    """Reference multi-level combine on top of the slow gather (tests)."""
    B, Nq, nheads, L, P, _ = locations.shape
    out = None
    for l, v in enumerate(value_levels):
        sampled = _bilinear_gather_level(v, locations[:, :, :, l])
        term = jnp.einsum("bqhpd,bqhp->bqhd", sampled, weights[:, :, :, l])
        out = term if out is None else out + term
    dim = value_levels[0].shape[-1]
    return out.reshape(B, Nq, nheads * dim)
