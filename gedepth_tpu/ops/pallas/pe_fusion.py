"""Fused adaptive ground-embedding kernel (Pallas TPU).

Fuses the whole slope->prior pipeline over the pixel grid in one VMEM pass
(the reference runs it as ~10 separate CUDA launches through
encoder_decoder.py:79-102):

  p          = softmax(logits, bins)               (11 slope bins)
  slope_deg  = sum(p * bin_centers)
  t          = tan(deg2rad(slope_deg))
  a          = -h / (pe + 1e-8)
  off        = -h / (a - t + 1e-8)
  pe_mask    = off * [0 < off <= depth_scale] * y

Layout: logits as (B, BINS, H, W) — bins on the sublane axis, W on lanes —
so the softmax reduction is a static unrolled loop over 11 planes of
(TILE_H, W) vregs; pe/y/h broadcast elementwise. Elementwise-only kernel:
entirely VPU, one HBM read per input and one write.

The op is linear in none of its inputs, so training uses the XLA reference
(`pe_fusion_xla`) for autodiff; this kernel serves inference/eval via
custom_vjp fallback to the reference for gradients.
"""
from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from gedepth_tpu.geometry.plane import (
    NUM_SLOPE_BINS, SLOPE_BIN_CENTERS_DEG, slope_to_pe_offset)

NUM_BINS = NUM_SLOPE_BINS
BIN_CENTERS = SLOPE_BIN_CENTERS_DEG
DEG2RAD = np.float32(np.pi / 180.0)


def pe_fusion_xla(slope_logits, pe_comput, y, cam_height, depth_scale):
    """Canonical XLA implementation of the adaptive PE fusion — the single
    source of truth for the in-model math (the model calls this; the Pallas
    kernel and the offline preprocessing share `slope_to_pe_offset`).

    slope_logits (B, H, W, K); pe_comput, y (B, H, W); cam_height (B,).
    Returns pe_mask (B, H, W)."""
    probs = jax.nn.softmax(slope_logits, axis=-1)
    slope_deg = jnp.sum(probs * jnp.asarray(BIN_CENTERS)[None, None, None],
                        axis=-1)
    t = jnp.tan(slope_deg * DEG2RAD)
    h = cam_height[:, None, None]
    off, _ = slope_to_pe_offset(pe_comput, t, h, depth_scale)
    return off * y


def _kernel(logits_ref, pe_ref, y_ref, h_ref, out_ref, *, depth_scale):
    # logits (1, BINS, TH, W); pe/y (1, TH, W); h (1, 1) in SMEM
    m = logits_ref[0, 0]
    for b in range(1, NUM_BINS):
        m = jnp.maximum(m, logits_ref[0, b])
    s = jnp.zeros_like(m)
    num = jnp.zeros_like(m)
    for b in range(NUM_BINS):
        e = jnp.exp(logits_ref[0, b] - m)
        s = s + e
        num = num + e * BIN_CENTERS[b]
    slope_deg = num / s
    t = jnp.tan(slope_deg * DEG2RAD)
    h = h_ref[0, 0]
    pe = pe_ref[0]
    a = -h / (pe + 1e-8)
    off = -h / ((a - t) + 1e-8)
    valid = jnp.logical_and(off > 0, off <= depth_scale)
    out_ref[0] = jnp.where(valid, off, 0.0) * y_ref[0]


def _pick_tile_h(h: int, target: int = 64) -> int:
    """Largest multiple-of-8 divisor of h up to target (Mosaic sublane
    constraint); falls back to the full dimension."""
    best = h
    tile = (min(target, h) // 8) * 8
    while tile >= 8:
        if h % tile == 0:
            return tile
        tile -= 8
    return best


def pe_fusion_pallas_fwd(slope_logits, pe_comput, y, cam_height,
                         depth_scale):
    B, H, W, K = slope_logits.shape
    assert K == NUM_BINS
    th = _pick_tile_h(H)
    logits_t = slope_logits.transpose(0, 3, 1, 2)  # (B, K, H, W)
    h_smem = cam_height.reshape(B, 1).astype(jnp.float32)

    grid = (B, H // th)
    out = pl.pallas_call(
        functools.partial(_kernel, depth_scale=float(depth_scale)),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, NUM_BINS, th, W), lambda b, i: (b, 0, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, th, W), lambda b, i: (b, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, th, W), lambda b, i: (b, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1), lambda b, i: (b, 0),
                         memory_space=pltpu.SMEM),
        ],
        out_specs=pl.BlockSpec((1, th, W), lambda b, i: (b, i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, H, W), slope_logits.dtype),
    )(logits_t, pe_comput, y, h_smem)
    return out


@functools.partial(jax.custom_vjp, nondiff_argnums=(4,))
def pe_fusion_pallas(slope_logits, pe_comput, y, cam_height, depth_scale):
    return pe_fusion_pallas_fwd(slope_logits, pe_comput, y, cam_height,
                                depth_scale)


def _fwd(slope_logits, pe_comput, y, cam_height, depth_scale):
    out = pe_fusion_pallas_fwd(slope_logits, pe_comput, y, cam_height,
                               depth_scale)
    return out, (slope_logits, pe_comput, y, cam_height)


def _bwd(depth_scale, res, g):
    slope_logits, pe_comput, y, cam_height = res
    _, vjp = jax.vjp(
        lambda l, p, y_, h: pe_fusion_xla(l, p, y_, h, depth_scale),
        slope_logits, pe_comput, y, cam_height)
    return vjp(g)


pe_fusion_pallas.defvjp(_fwd, _bwd)
