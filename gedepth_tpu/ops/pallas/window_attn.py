"""Fused window attention kernel (Pallas TPU).

Computes softmax(q k^T + bias [+ mask]) v for Swin windows entirely in VMEM:
one grid step processes a tile of windows for one head, keeping the (N x N)
attention logits on-chip (N = window**2 = 49, padded to MXU tiles by
Mosaic). This removes the HBM round-trips XLA materialises between the two
matmuls and the softmax at Swin-L scale.

Layouts:
  q, k, v   (nWB, N, H, D) -> transposed to head-major (H, nWB, N, D) so the
            head is a grid axis and each block is a contiguous window slab.
  bias      (H, N, N), one head per grid step.
  mask      (num_windows, N, N) or None. Window rows are laid out
            (B, nH, nW) row-major, so row r uses mask[r % num_windows]; the
            tile size is chosen so mask indexing stays affine
            (tile % nW == 0, slab = whole batch elements, or nW % tile == 0).

Forward kernel only: the backward pass reuses the XLA reference through
jax.custom_vjp (training uses XLA autodiff; inference uses this kernel).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from gedepth_tpu.ops.window_attention import window_attention_xla


def _pick_tile(nwb: int, nw, target: int = 16) -> int:
    """Window-tile size: divides nWB; compatible with the mask period."""
    if nw is None:
        tile = min(target, nwb)
        while nwb % tile:
            tile -= 1
        return max(tile, 1)
    if nw <= target:
        tile = (target // nw) * nw
        while tile > 0 and nwb % tile:
            tile -= nw
        return max(tile, nw)
    for tile in range(min(target, nw), 0, -1):
        if nw % tile == 0 and nwb % tile == 0:
            return tile
    return 1


def _forward_pallas(q, k, v, bias, mask):
    nWB, N, H, D = q.shape
    nW = None if mask is None else mask.shape[0]
    tile = _pick_tile(nWB, nW)

    qh = q.transpose(2, 0, 1, 3)   # (H, nWB, N, D)
    kh = k.transpose(2, 0, 1, 3)
    vh = v.transpose(2, 0, 1, 3)
    bias4 = bias[:, None]          # (H, 1, N, N)

    grid = (H, nWB // tile)
    qkv_spec = pl.BlockSpec((1, tile, N, D), lambda h, w: (h, w, 0, 0),
                            memory_space=pltpu.VMEM)
    bias_spec = pl.BlockSpec((1, 1, N, N), lambda h, w: (h, 0, 0, 0),
                             memory_space=pltpu.VMEM)
    out_spec = pl.BlockSpec((1, tile, N, D), lambda h, w: (h, w, 0, 0),
                            memory_space=pltpu.VMEM)
    out_shape = jax.ShapeDtypeStruct((H, nWB, N, D), q.dtype)

    if mask is None:
        def kernel(q_ref, k_ref, v_ref, b_ref, out_ref):
            qb, kb, vb = q_ref[0], k_ref[0], v_ref[0]
            attn = jax.lax.dot_general(
                qb, kb, (((2,), (2,)), ((0,), (0,))),
                preferred_element_type=jnp.float32)
            attn = attn + b_ref[0, 0][None]
            attn = jax.nn.softmax(attn, axis=-1)
            out_ref[0] = jax.lax.dot_general(
                attn.astype(vb.dtype), vb, (((2,), (1,)), ((0,), (0,))),
                preferred_element_type=jnp.float32).astype(out_ref.dtype)

        out = pl.pallas_call(
            kernel, grid=grid,
            in_specs=[qkv_spec, qkv_spec, qkv_spec, bias_spec],
            out_specs=out_spec, out_shape=out_shape,
        )(qh, kh, vh, bias4)
    else:
        if tile % nW == 0:
            mask_tiled = jnp.tile(mask, (tile // nW, 1, 1))
            mask_spec = pl.BlockSpec((tile, N, N), lambda h, w: (0, 0, 0),
                                     memory_space=pltpu.VMEM)
        else:  # nW % tile == 0
            chunks = nW // tile
            mask_tiled = mask
            mask_spec = pl.BlockSpec(
                (tile, N, N), lambda h, w: (w % chunks, 0, 0),
                memory_space=pltpu.VMEM)

        def kernel(q_ref, k_ref, v_ref, b_ref, m_ref, out_ref):
            qb, kb, vb = q_ref[0], k_ref[0], v_ref[0]
            attn = jax.lax.dot_general(
                qb, kb, (((2,), (2,)), ((0,), (0,))),
                preferred_element_type=jnp.float32)
            attn = attn + b_ref[0, 0][None] + m_ref[:]
            attn = jax.nn.softmax(attn, axis=-1)
            out_ref[0] = jax.lax.dot_general(
                attn.astype(vb.dtype), vb, (((2,), (1,)), ((0,), (0,))),
                preferred_element_type=jnp.float32).astype(out_ref.dtype)

        out = pl.pallas_call(
            kernel, grid=grid,
            in_specs=[qkv_spec, qkv_spec, qkv_spec, bias_spec, mask_spec],
            out_specs=out_spec, out_shape=out_shape,
        )(qh, kh, vh, bias4, mask_tiled)
    return out.transpose(1, 2, 0, 3)


@jax.custom_vjp
def window_attention_pallas(q, k, v, bias, mask=None):
    return _forward_pallas(q, k, v, bias, mask)


def _fwd(q, k, v, bias, mask):
    return _forward_pallas(q, k, v, bias, mask), (q, k, v, bias, mask)


def _bwd(res, g):
    q, k, v, bias, mask = res
    _, vjp = jax.vjp(lambda q_, k_, v_, b_: window_attention_xla(
        q_, k_, v_, b_, mask), q, k, v, bias)
    dq, dk, dv, db = vjp(g)
    return dq, dk, dv, db, None


window_attention_pallas.defvjp(_fwd, _bwd)
