"""Multi-scale deformable attention sampling core (XLA, TPU-tuned).

TPU-native replacement for mmcv's CUDA `MultiScaleDeformableAttention` kernel
(used on the hot path of the HAHI neck, reference depth/models/necks/hahi.py:16,
179-188). Semantics follow the deformable-DETR formulation with
grid_sample(align_corners=False, padding_mode='zeros') sampling:
pixel coords x = loc_x * W - 0.5, y = loc_y * H - 0.5; out-of-range corners
contribute zero.

Two implementations, selected by `impl`:

  * "flat" (default): every (level, point, corner) sample becomes one row
    index into a single (B*heads*HW_total, dim) table and the whole chunk is
    served by ONE `jnp.take(axis=0)` — XLA's fastest TPU gather form (no
    batch dims to serialize over). Bilinear corner weights fold into the
    attention weights so the gather result reduces with one einsum over
    J = L*P*4 taps. Index/weight tensors are computed INSIDE the scan body,
    so only one chunk's worth (~30 MB) is ever live — round-1's version of
    this idea materialized them for all queries up front (~900 MB at
    cross-attention scale) and lost the gather win to HBM traffic.
  * "per_level": four per-level take_along_axis corner gathers; kept as the
    parity/readability reference and for numerical cross-checks.

Query chunking bounds the gather intermediates (the cross-attention query
grid is >100k tokens at eval resolution; unchunked it materialises multi-GB
temporaries).
"""
from __future__ import annotations

from typing import Sequence

import numpy as np
import jax
import jax.numpy as jnp


# ---------------------------------------------------------------------------
# per-level reference implementation
# ---------------------------------------------------------------------------

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


# ---------------------------------------------------------------------------
# windowed (dense, gather-free) implementation — TPU-native fast mode
# ---------------------------------------------------------------------------
#
# TPU has no efficient arbitrary gather: XLA's gather lowering measures far
# below HBM bandwidth at MSDA shapes (NOTES.md), and Mosaic only exposes a
# 128-lane dynamic shuffle. The TPU-native formulation instead BOUNDS the
# sampling offsets to a +-radius pixel window around each query's own grid
# position and enumerates the (2R+2)^2 integer taps of that window: each tap
# is a dense shifted slice of the value map (pure pad/slice/repeat — no
# gather at all), weighted by the per-query bilinear tap weight and
# accumulated on the VPU. Cost is taps * Nq * h * d FMAs instead of
# Nq * h * P * 4 random 256-byte reads.
#
# Semantics (documented design change vs the reference's unbounded mmcv
# MSDA, opt-in via neck_sampling='windowed'):
#   * reference points are the query's own grid center (the deformable-DETR
#     encoder convention) instead of sigmoid(Linear(query_pos));
#   * offsets are smoothly bounded to [-radius, +radius] level pixels by
#     radius * tanh(raw / radius) (identity near 0, so mmcv's grid-like
#     offset-bias init is preserved for small p).
# Within the window the sampling is EXACT bilinear (same corner math as the
# reference); out-of-image taps contribute zero (grid_sample zeros padding).


def _axis_anchor_residual(nq: int, nv: int):
    """Anchor (int) and residual (float) of each query center on a value
    axis: center = (i + 0.5) * nv/nq - 0.5 = anchor + residual."""
    q = (np.arange(nq, dtype=np.float64) + 0.5) * (nv / nq) - 0.5
    a = np.floor(q).astype(np.int64)
    return a, (q - a).astype(np.float32)


def _windowed_level(value, off, w, query_hw, radius: int):
    """One (query grid, value level) pair.

    value: (B, Hv, Wv, h, d); off: (B, Nq, h, P, 2) level-pixel offsets in
    [-radius, radius]; w: (B, Nq, h, P). Returns (B, Nq, h, d).
    """
    B, Hv, Wv, h, d = value.shape
    Hq, Wq = query_hw
    R = radius
    pad = R + 2

    ay, ry = _axis_anchor_residual(Hq, Hv)
    ax, rx = _axis_anchor_residual(Wq, Wv)

    off = off.reshape(B, Hq, Wq, h, -1, 2)
    P = off.shape[4]
    w = w.reshape(B, Hq, Wq, h, P)

    # sample position relative to the anchor, in (-R, R + 1)
    ty = jnp.asarray(ry)[None, :, None, None, None] + off[..., 1]
    tx = jnp.asarray(rx)[None, None, :, None, None] + off[..., 0]
    y0 = jnp.floor(ty)
    x0 = jnp.floor(tx)
    fy = (ty - y0).astype(value.dtype)
    fx = (tx - x0).astype(value.dtype)
    y0 = y0.astype(jnp.int32)                     # in [-R, R]
    x0 = x0.astype(jnp.int32)

    # per-tap separable weights: wy[dy] = (dy==y0)(1-fy) + (dy==y0+1)fy
    taps = np.arange(-R, R + 2, dtype=np.int32)
    tgrid = jnp.asarray(taps)[None, None, None, None, None, :]
    wy = ((tgrid == y0[..., None]).astype(value.dtype) * (1 - fy[..., None])
          + (tgrid == (y0 + 1)[..., None]).astype(value.dtype)
          * fy[..., None])                        # (B,Hq,Wq,h,P,Ty)
    wx = ((tgrid == x0[..., None]).astype(value.dtype) * (1 - fx[..., None])
          + (tgrid == (x0 + 1)[..., None]).astype(value.dtype)
          * fx[..., None])

    # zero-padding semantics: row/col selections below clamp into the padded
    # value, and pad >= R+2 guarantees every (anchor + tap) lands on a real
    # or zero row — no masking needed.
    vp = jnp.pad(value, ((0, 0), (pad, pad), (pad, pad), (0, 0), (0, 0)))

    # fold attention weight into the separable y weight once
    wyp = wy * w[..., None]                       # (B,Hq,Wq,h,P,Ty)

    out = jnp.zeros((B, Hq, Wq, h, d), value.dtype)
    for i, dy in enumerate(taps):
        rows = np.clip(ay + dy + pad, 0, Hv + 2 * pad - 1)
        vrow = jnp.take(vp, jnp.asarray(rows), axis=1)
        wyi = jnp.sum(wyp[..., i:i + 1] * wx, axis=4)   # (B,Hq,Wq,h,Tx)
        for j, dx in enumerate(taps):
            cols = np.clip(ax + dx + pad, 0, Wv + 2 * pad - 1)
            vtap = jnp.take(vrow, jnp.asarray(cols), axis=2)
            out = out + vtap * wyi[..., j:j + 1]
    return out.reshape(B, Hq * Wq, h, d)


def shared_value_exts(query_shapes, value_hws, radius: int):
    """Per-level padded-value extents (ext_y8, ext_x8) covering EVERY query
    grid whose plan supports the Pallas kernel, so one pad+transpose per
    level serves all grids (XLA CSE dedupes the identical preps). None for
    levels no grid can take through the kernel."""
    from gedepth_tpu.ops.pallas.msda_windowed import _plan
    exts = []
    for vhw in value_hws:
        eys, exs = [], []
        for q in query_shapes:
            p = _plan(tuple(q), tuple(vhw), radius)
            if p is not None:
                eys.append(p["ext_y8"])
                exs.append(p["ext_x8"])
        exts.append((max(eys), max(exs)) if eys else None)
    return tuple(exts)


def msda_sample_windowed(value_levels, offsets_px, weights, query_hw,
                         radius: int = 4, remat: bool = True,
                         impl: str = "auto", precision=None,
                         value_exts=None):
    """Dense windowed multi-scale deformable sampling.

    Args:
      value_levels: list of (B, H_l, W_l, heads, dim).
      offsets_px: (B, Nq, heads, L, P, 2) offsets in LEVEL pixels (x, y),
        bounded to [-radius, radius] by the caller.
      weights: (B, Nq, heads, L, P) softmaxed attention weights.
      query_hw: (Hq, Wq) — queries are this grid, row-major; the grid must
        map affinely onto every level (power-of-two ratios).
      radius: window half-size in level pixels.
      impl: 'auto' (Pallas kernel on TPU, 'tiled' elsewhere), 'pallas'
        (force the kernel), 'tiled' (XLA local-attention matmul) or 'taps'
        (dense tap enumeration on the VPU; the readable reference — all
        compute identical math; the TPU MXU paths carry ~4e-3 relative
        rounding from bf16 multiply passes).
      precision: matmul precision for the tiled impl (None = backend
        default; pass jax.lax.Precision.HIGHEST for f32-exact tests).
      value_exts: optional `shared_value_exts` result for cross-query-grid
        padded-value sharing (pallas impl only).

    Returns: (B, Nq, heads * dim)
    """
    B, Nq, h, L, P, _ = offsets_px.shape
    assert Nq == query_hw[0] * query_hw[1]
    d = value_levels[0].shape[-1]

    if impl == "auto":
        # the axon remote-TPU platform reports its own backend name, so
        # gate on "not a known non-TPU backend" rather than == "tpu";
        # the Mosaic kernel would crash inside pallas_call on GPU.
        impl = ("tiled" if jax.default_backend() in ("cpu", "gpu", "cuda",
                                                     "rocm")
                else "pallas")
    if impl == "pallas":
        # fused multi-level dispatch: ONE pallas_call per VMEM-budget group
        # of levels (band scratches for the whole group must coexist);
        # pairs whose window blows the per-level budget (coarse query grid
        # sampling a much finer level) use the XLA tiled path
        from gedepth_tpu.ops.pallas.msda_windowed import (
            _plan, msda_windowed_group, msda_windowed_levels)

        orig_dtype = value_levels[0].dtype
        if orig_dtype != jnp.float32:
            # bf16 VALUE bands ride through the kernel natively (half the
            # band DMA bytes; the MXU contraction runs bf16 x bf16 -> f32),
            # but the A-build needs f32 sub-pixel offsets/weights, and the
            # fused multi-level variant is f32-only.
            offsets_px = offsets_px.astype(jnp.float32)
            weights = weights.astype(jnp.float32)
            if os.environ.get("GEDEPTH_MSDA_FUSE", "0") != "0":
                value_levels = [v.astype(jnp.float32) for v in value_levels]

        plans = [_plan(query_hw, (v.shape[1], v.shape[2]), radius)
                 for v in value_levels]
        if os.environ.get("GEDEPTH_MSDA_FUSE", "0") == "0":
            # DEFAULT: per-level kernel launches behind ONE shared q-arg
            # relayout + ONE output relayout per query grid
            # (msda_windowed_levels). The in-kernel fused multi-level
            # variants (GEDEPTH_MSDA_FUSE=1) measured SLOWER on v5e in
            # every configuration tried — full-ntx blocked q-args blow
            # VMEM at full res; a column-tile grid dimension pays ~6us
            # per step plus 3x-cost dynamic sublane window slices; manual
            # chunked q-arg DMA pays the stacking concat in HBM traffic.
            # Kept behind the flag with those dead ends documented.
            kept = [l for l, p in enumerate(plans) if p is not None]
            out = None
            if kept:
                exts_k = (tuple(value_exts[l] for l in kept)
                          if value_exts is not None else None)
                if kept == list(range(len(value_levels))):
                    off_k, w_k = offsets_px, weights
                else:
                    off_k = jnp.stack(
                        [offsets_px[:, :, :, l] for l in kept], axis=3)
                    w_k = jnp.stack(
                        [weights[:, :, :, l] for l in kept], axis=3)
                gf = (jax.checkpoint(msda_windowed_levels,
                                     static_argnums=(3, 4, 5))
                      if remat else msda_windowed_levels)
                out = gf(tuple(value_levels[l] for l in kept), off_k, w_k,
                         query_hw, radius, exts_k)
            tf = (jax.checkpoint(_windowed_level_tiled,
                                 static_argnums=(3, 4))
                  if remat else _windowed_level_tiled)
            for l, p in enumerate(plans):
                if p is not None:
                    continue
                term = tf(value_levels[l], offsets_px[:, :, :, l],
                          weights[:, :, :, l], query_hw, radius)
                out = term if out is None else out + term
            return out.astype(orig_dtype).reshape(B, Nq, h * d)
        budget = 8 * 1024 * 1024
        groups, cur, cur_bytes = [], [], 0
        fallback = []
        for l, p in enumerate(plans):
            if p is None:
                fallback.append(l)
                continue
            ex = p["ext_x8"]
            if value_exts is not None and value_exts[l] is not None:
                ex = max(ex, value_exts[l][1])
            bb = p["wh8"] * ex * 128 * 4
            if cur and cur_bytes + bb > budget:
                groups.append(cur)
                cur, cur_bytes = [], 0
            cur.append(l)
            cur_bytes += bb
        if cur:
            groups.append(cur)

        out = None
        for grp in groups:
            exts = (tuple(value_exts[l] for l in grp)
                    if value_exts is not None else None)

            def group_fn(vs, os_, ws_, _exts=exts):
                return msda_windowed_group(vs, os_, ws_, query_hw, radius,
                                           _exts)
            if remat:
                group_fn = jax.checkpoint(group_fn)
            term = group_fn(
                tuple(value_levels[l] for l in grp),
                tuple(offsets_px[:, :, :, l] for l in grp),
                tuple(weights[:, :, :, l] for l in grp))
            out = term if out is None else out + term

        if fallback:
            def level_fn(value, off, w):
                return _windowed_level_tiled(value, off, w, query_hw,
                                             radius, precision=precision)
            if remat:
                level_fn = jax.checkpoint(level_fn)
            for l in fallback:
                term = level_fn(value_levels[l], offsets_px[:, :, :, l],
                                weights[:, :, :, l])
                out = term if out is None else out + term
        return out.astype(orig_dtype).reshape(B, Nq, h * d)
    elif impl == "tiled":
        def level_fn(value, off, w):
            return _windowed_level_tiled(value, off, w, query_hw, radius,
                                         precision=precision)
    else:
        assert impl == "taps", impl

        def level_fn(value, off, w):
            return _windowed_level(value, off, w, query_hw, radius)
    if remat:
        level_fn = jax.checkpoint(level_fn)

    out = None
    for l, v in enumerate(value_levels):
        term = level_fn(v, offsets_px[:, :, :, l], weights[:, :, :, l])
        out = term if out is None else out + term
    return out.reshape(B, Nq, h * d)


# ---------------------------------------------------------------------------
# tiled windowed implementation — local attention on the MXU
# ---------------------------------------------------------------------------
#
# The tap-enumeration form above does (2R+2)^2 full-grid VPU passes. This
# form instead tiles the query grid and, per tile, materialises the bilinear
# sampling operator as an explicit local attention matrix
#   A[q, win] = sum_p w[q,p] * wrow_p[q, iy] * wcol_p[q, ix]
# over the tile's value window (all queries in a tile share one window),
# then computes the output with ONE batched matmul A @ V_win on the MXU.
# Everything is static-shape; the only dynamic op is a dynamic_slice of the
# padded value map per scan step. No gather anywhere, forward or backward.


def _tile_plan(nq_axis: int, nv_axis: int, tile: int, radius: int):
    """Static per-tile tables for one axis.

    Returns (n_tiles, win, base, rel, res, extent):
      base:   (n_tiles,) int32 window start in left-padded value coords
              (left pad = radius + 3),
      rel:    (n_tiles, tile) int32 anchor row relative to window start,
      res:    (n_tiles, tile) float32 residual of the query center,
      extent: required padded-axis length — windows of size `win` starting
              at every base stay in [0, extent) (tile spans vary once the
              grid-padding clamp kicks in, so the uniform `win` can overrun
              the natural right pad; the caller pads the value axis to
              `extent`). Queries beyond nq_axis clamp to the last real
              query, with zero weights upstream.
    """
    pad = radius + 3
    anchors, res = _axis_anchor_residual(nq_axis, nv_axis)
    n_tiles = -(-nq_axis // tile)
    total = n_tiles * tile
    idx = np.minimum(np.arange(total), nq_axis - 1)
    a = anchors[idx].reshape(n_tiles, tile)
    r = res[idx].reshape(n_tiles, tile)
    base = a.min(axis=1) - radius + pad
    span = int((a.max(axis=1) - a.min(axis=1)).max())
    win = span + 2 * radius + 2
    rel = (a + pad - base[:, None]).astype(np.int32)  # anchor minus window start
    extent = max(int(base.max()) + win, nv_axis + 2 * pad)
    return (n_tiles, win, base.astype(np.int32), rel, r.astype(np.float32),
            extent)


import os

# Query-tile defaults. Smaller tiles shrink the per-query window (less
# A-build HBM traffic: win/query 588 -> 216 going from 8x64 to 4x16 at a
# 1/2-ratio level) at the cost of more scan steps; 4x32 measured best on
# v5e. Override for sweeps: GEDEPTH_MSDA_TILE="ty,tx".


def _tile_default():
    raw = os.environ.get("GEDEPTH_MSDA_TILE", "")
    if raw:
        try:
            ty, tx = (int(v) for v in raw.split(","))
            return ty, tx
        except ValueError:
            import warnings
            warnings.warn(
                f"ignoring malformed GEDEPTH_MSDA_TILE={raw!r} "
                "(expected 'ty,tx'); using (4, 32)")
    return 4, 32


def _pick_tile(hq, wq, hv, wv, radius):
    """Query-tile shape such that the value window stays small even when the
    value level is finer than the query grid (window grows with the
    value/query ratio)."""
    ty0, tx0 = _tile_default()
    ty = max(1, min(ty0, (2 * ty0 * hq) // max(hv, 1)))
    tx = max(1, min(tx0, (tx0 * wq) // max(wv, 1)))
    return min(ty, hq), min(tx, wq)


def _windowed_level_tiled(value, off, w, query_hw, radius: int,
                          precision=None):
    """Tiled-local-attention version of `_windowed_level` (same semantics).

    Scans over query-row bands: the row offset is the only dynamic index
    (one dynamic_slice per band); the column tiling is fully static, so the
    per-tile value windows are static slices of the row band. Per band, one
    batched A-build einsum and one batched A @ V matmul serve every column
    tile and head at once.

    value: (B, Hv, Wv, h, d); off: (B, Nq, h, P, 2) in [-radius, radius]
    level pixels; w: (B, Nq, h, P). Returns (B, Nq, h, d).
    """
    B, Hv, Wv, h, d = value.shape
    Hq, Wq = query_hw
    R = radius
    pad = R + 3

    TH, TW = _pick_tile(Hq, Wq, Hv, Wv, R)
    nty, wh, base_y, rel_y, res_y, ext_y = _tile_plan(Hq, Hv, TH, R)
    ntx, ww, base_x, rel_x, res_x, ext_x = _tile_plan(Wq, Wv, TW, R)

    P = off.shape[3]
    off = off.reshape(B, Hq, Wq, h, P, 2)
    w = w.reshape(B, Hq, Wq, h, P)

    # pad the query grid to tile multiples (weights 0 => no contribution)
    py, px = nty * TH - Hq, ntx * TW - Wq
    if py or px:
        off = jnp.pad(off, ((0, 0), (0, py), (0, px), (0, 0), (0, 0), (0, 0)))
        w = jnp.pad(w, ((0, 0), (0, py), (0, px), (0, 0), (0, 0)))
    Wqp = ntx * TW

    vp = jnp.pad(value, ((0, 0), (pad, ext_y - Hv - pad),
                         (pad, ext_x - Wv - pad), (0, 0), (0, 0)))
    Wvp = ext_x

    # per-band query tensors: (nty, B, TH, Wqp, h, P[, 2])
    off_t = off.reshape(B, nty, TH, Wqp, h, P, 2).transpose(
        1, 0, 2, 3, 4, 5, 6)
    w_t = w.reshape(B, nty, TH, Wqp, h, P).transpose(1, 0, 2, 3, 4, 5)

    # static per-column tables (column tiling never moves)
    rel_x_cols = jnp.asarray(
        (rel_x.reshape(-1)), jnp.int32)              # (Wqp,)
    res_x_cols = jnp.asarray(res_x.reshape(-1))      # (Wqp,)

    iot_y = jnp.arange(wh, dtype=jnp.int32)
    iot_x = jnp.arange(ww, dtype=jnp.int32)

    def step(carry, xs):
        offs, ws, by, ry, ey = xs
        # row band: (B, wh, Wvp, h, d)
        band = jax.lax.dynamic_slice(
            vp, (0, by, 0, 0, 0), (B, wh, Wvp, h, d))
        # static column windows -> (B, ntx, wh, ww, h, d)
        wins = jnp.stack(
            [jax.lax.slice_in_dim(band, int(bx), int(bx) + ww, axis=2)
             for bx in base_x], axis=1)

        # sampling position relative to the anchor
        tyy = ey[None, :, None, None, None] + offs[..., 1]  # (B,TH,Wqp,h,P)
        txx = res_x_cols[None, None, :, None, None] + offs[..., 0]
        y0 = jnp.floor(tyy)
        x0 = jnp.floor(txx)
        fy = (tyy - y0).astype(value.dtype)
        fx = (txx - x0).astype(value.dtype)
        wy0 = (ry[None, :, None, None, None] + y0.astype(jnp.int32))
        wx0 = (rel_x_cols[None, None, :, None, None] + x0.astype(jnp.int32))

        wrow = ((iot_y == wy0[..., None]).astype(value.dtype)
                * (1 - fy[..., None])
                + (iot_y == (wy0 + 1)[..., None]).astype(value.dtype)
                * fy[..., None])                     # (B,TH,Wqp,h,P,wh)
        wcol = ((iot_x == wx0[..., None]).astype(value.dtype)
                * (1 - fx[..., None])
                + (iot_x == (wx0 + 1)[..., None]).astype(value.dtype)
                * fx[..., None])                     # (B,TH,Wqp,h,P,ww)
        wrow = wrow * ws[..., None]                  # fold attention weight

        # group query columns by tile: (B, TH, ntx, TW, h, P, i/j)
        wrow_t = wrow.reshape(B, TH, ntx, TW, h, P, wh)
        wcol_t = wcol.reshape(B, TH, ntx, TW, h, P, ww)
        amat = jnp.einsum("bymthpi,bymthpj->bhmytij", wrow_t, wcol_t,
                          precision=precision)       # (B,h,ntx,TH,TW,wh,ww)
        amat = amat.reshape(B, h, ntx, TH * TW, wh * ww)
        wmat = wins.transpose(0, 4, 1, 2, 3, 5).reshape(
            B, h, ntx, wh * ww, d)
        out = jnp.einsum("bhmqw,bhmwd->bhmqd", amat, wmat,
                         precision=precision)        # (B,h,ntx,TH*TW,d)
        out = out.reshape(B, h, ntx, TH, TW, d).transpose(0, 3, 2, 4, 1, 5)
        return carry, out.reshape(B, TH, Wqp, h, d)

    # remat the band body: differentiating the scan would otherwise save
    # every band's A matrix (B*h*ntx*128*win floats per step — measured
    # 12 GB at the train crop); recomputing A in the backward is cheap
    _, outs = jax.lax.scan(
        jax.checkpoint(step, prevent_cse=False), None,
        (off_t, w_t, jnp.asarray(base_y), jnp.asarray(rel_y),
         jnp.asarray(res_y)))
    # (nty, B, TH, Wqp, h, d) -> (B, Hq, Wq, h, d) -> (B, Nq, h, d)
    outs = outs.transpose(1, 0, 2, 3, 4, 5).reshape(
        B, nty * TH, Wqp, h, d)
    return outs[:, :Hq, :Wq].reshape(B, Hq * Wq, h, d)


# ---------------------------------------------------------------------------
# flat single-gather implementation
# ---------------------------------------------------------------------------

def _chunk_flat_idx_w(locations, weights, spatial_shapes, sampling):
    """Flat per-(b, h) row indices + folded weights for one query chunk.

    locations: (B, C, h, L, P, 2) normalized (x, y)
    weights:   (B, C, h, L, P) softmaxed attention weights
    Returns (idx, w): both (B, C, h, J) with J = L*P*4 (bilinear) or L*P
    (nearest); idx indexes the level-concat of size HW_total; w folds
    attention x bilinear-corner x in-bounds.
    """
    level_sizes = [h_ * w_ for (h_, w_) in spatial_shapes]
    level_offsets = np.concatenate([[0], np.cumsum(level_sizes)[:-1]])

    idx_parts, w_parts = [], []
    for l, (H_, W_) in enumerate(spatial_shapes):
        w_l = weights[..., l, :]
        if sampling == "bilinear":
            x = locations[..., l, :, 0] * W_ - 0.5      # (B, C, h, P)
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
            w_parts.append(jnp.stack([w00, w01, w10, w11], axis=-1)
                           * w_l[..., None])
        else:  # nearest
            x = jnp.floor(locations[..., l, :, 0] * W_)
            y = jnp.floor(locations[..., l, :, 1] * H_)
            inb = (x >= 0) & (x < W_) & (y >= 0) & (y < H_)
            ii = (jnp.clip(y, 0, H_ - 1).astype(jnp.int32) * W_
                  + jnp.clip(x, 0, W_ - 1).astype(jnp.int32))
            idx_parts.append((ii + int(level_offsets[l]))[..., None])
            w_parts.append((w_l * inb.astype(w_l.dtype))[..., None])

    B, C, h = weights.shape[:3]
    idx = jnp.stack(idx_parts, axis=3).reshape(B, C, h, -1)
    w = jnp.stack(w_parts, axis=3).reshape(B, C, h, -1)
    return idx, w


def _flat_table(value_levels):
    """(B*heads*HW_total, dim) level-concat value table."""
    B, _, _, nheads, dim = value_levels[0].shape
    flat = jnp.concatenate(
        [v.transpose(0, 3, 1, 2, 4).reshape(B, nheads, -1, dim)
         for v in value_levels], axis=2)
    hw_total = flat.shape[2]
    return flat.reshape(B * nheads * hw_total, dim), hw_total


def _msda_flat_block(flat, bh_base, locs_c, w_c, spatial_shapes, sampling):
    """One chunk: compute indices, ONE flat gather, einsum reduce.

    flat: (B*h*HW_total, d); bh_base: (B, h) int32 row offsets;
    locs_c: (B, C, h, L, P, 2); w_c: (B, C, h, L, P).
    """
    idx, w = _chunk_flat_idx_w(locs_c, w_c, spatial_shapes, sampling)
    idx = idx + bh_base[:, None, :, None]
    g = flat.at[idx.reshape(-1)].get(mode="promise_in_bounds")
    g = g.reshape(idx.shape + (flat.shape[-1],))
    out = jnp.einsum("bqhjd,bqhj->bqhd", g, w.astype(flat.dtype))
    B, C, h = w.shape[:3]
    return out.reshape(B, C, h * flat.shape[-1])


def msda_sample(value_levels, locations, weights, query_chunk: int = 4096,
                remat: bool = True, sampling: str = "bilinear",
                impl: str = "flat"):
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
      impl: 'flat' (one fused gather per chunk, fastest on TPU) or
        'per_level' (reference formulation).

    Returns:
      (B, Nq, heads * dim)
    """
    B, Nq, nheads, L, P, _ = locations.shape
    assert L == len(value_levels)
    dim = value_levels[0].shape[-1]

    if impl == "flat":
        spatial_shapes = tuple((v.shape[1], v.shape[2])
                               for v in value_levels)
        flat, hw_total = _flat_table(value_levels)
        bh_base = ((jnp.arange(B, dtype=jnp.int32)[:, None] * nheads
                    + jnp.arange(nheads, dtype=jnp.int32)[None, :])
                   * hw_total)

        def block_fn(loc, w):
            return _msda_flat_block(flat, bh_base, loc, w, spatial_shapes,
                                    sampling)
    else:
        def block_fn(loc, w):
            return _msda_sample_block(value_levels, loc, w, sampling)

    block_full = jax.checkpoint(block_fn) if remat else block_fn

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
    # (nc, B, C, h*d) -> (B, nc*C, h*d)
    out = out.transpose(1, 0, 2, 3).reshape(B, nc * query_chunk,
                                            nheads * dim)
    return out[:, :Nq]
