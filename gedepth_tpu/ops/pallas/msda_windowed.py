"""Pallas TPU kernel for windowed multi-scale deformable sampling.

The XLA tiled formulation (ops/msda.py `_windowed_level_tiled`) is
HBM-bound: the bilinear-operator tensors (wrow/wcol/A) spill to HBM every
scan step (~85 ms of a 98 ms half-res forward, profiled). This kernel
builds the per-tile local attention matrix A in VMEM and contracts it on
the MXU without ever materialising it to HBM.

Semantics are identical to `_windowed_level_tiled` / `_windowed_level`
(exact bilinear within the clamped window, grid_sample zeros padding) —
parity-tested against both (tests/test_pallas_kernels.py).

Layout: query tiles of TH x TW = 128 queries ride the LANE dimension;
A is (win, 128) with win = wh*ww window positions on sublanes, so the
A-build runs at full lane utilisation and the output contraction is one
(win,128)^T x (win,d) MXU dot per tile. Grid = (B, row-band, head); the
value row band is DMA'd from HBM once per (band, head). Mosaic constraints
shape the value layout: the head dim leads (DMA may only slice leading
dims), the minor dims are physically tile-aligned (d padded to 128 lanes,
ext_x to a sublane multiple), and band starts are 8-aligned with the
residual row offset applied when slicing the VMEM band (arbitrary dynamic
starts on the tiled second-minor dim are rejected).

Backward: the product path (`msda_windowed_levels`) computes d_off/d_w
with the band-tiled Pallas backward kernel (`_kernel_bwd`, column tile on
the grid for Mosaic compile time) and dV via the XLA tiled VJP restricted
to the value argument; the legacy per-level wrapper keeps the full XLA
tiled VJP unless GEDEPTH_MSDA_PALLAS_BWD=1.
"""
from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from gedepth_tpu.ops import msda as _msda

_Q_LANES = 128  # queries per tile == one lane tile
_D_LANES = 128  # value feature dim padded to one lane tile for the DMA


def _round8(x):
    return int(-(-x // 8) * 8)


def _qtile():
    """Query-tile aspect (TH, TW), TH*TW == 128. The A-build window area
    is (TH*ratio + 2R+3)(TW*ratio + 2R+3) — squarer tiles shrink it (e.g.
    8x16 is ~20% less VPU work than 4x32 at ratio 1, R=8). Override with
    GEDEPTH_MSDA_QTILE=\"th,tw\" for hardware A/B sweeps."""
    import os
    raw = os.environ.get("GEDEPTH_MSDA_QTILE", "")
    if raw:
        try:
            th, tw = (int(v) for v in raw.split(","))
            if th * tw == _Q_LANES and th > 0:
                return th, tw
        except ValueError:
            pass
    return 4, 32


def _plan(query_hw, value_hw, radius):
    """Tile plan with TH*TW == 128 (q-on-lanes layout)."""
    Hq, Wq = query_hw
    Hv, Wv = value_hw
    TH0, TW0 = _qtile()
    TW = min(TW0, Wq)
    TH = max(1, _Q_LANES // TW)
    if TH > Hq:
        TH = 1 << int(np.floor(np.log2(max(Hq, 1))))
        TW = _Q_LANES // TH
    if TH * TW != _Q_LANES or TW > Wq:
        return None
    nty, wh, base_y, rel_y, res_y, ext_y = _msda._tile_plan(Hq, Hv, TH,
                                                            radius)
    ntx, ww, base_x, rel_x, res_x, ext_x = _msda._tile_plan(Wq, Wv, TW,
                                                            radius)
    base8 = (base_y // 8) * 8
    roff = (base_y - base8).astype(np.int32)
    wh8 = _round8(wh + 7)
    ext_y8 = _round8(max(int(base8.max()) + wh8, ext_y))
    # 8-aligned x-window starts for the fused kernel (the column tile is a
    # grid dimension there, so the in-band x slice start is dynamic — the
    # sublane-tiled dim only takes aligned dynamic starts). The residual
    # is folded into rel_x; the window widens by up to 8.
    basex8 = ((base_x // 8) * 8).astype(np.int32)
    rxoff = (base_x - basex8).astype(np.int32)
    ww8 = ww + 8
    ext_x8 = _round8(max(ext_x, int(basex8.max()) + ww8))
    # VMEM budget: the row band + A scratch must fit alongside the blocked
    # inputs/outputs (~16 MB total). Oversized plans (coarse query grids
    # sampling fine levels blow the window up with the ratio) fall back to
    # the XLA tiled path.
    band_bytes = wh8 * ext_x8 * _D_LANES * 4
    amat_bytes = wh * ww8 * _Q_LANES * 4
    if band_bytes + amat_bytes > 8 * 1024 * 1024:
        return None
    # double-buffer the band DMA (prefetch next grid step's band under the
    # current step's A-build) when two bands fit the budget
    db = 2 * band_bytes + amat_bytes <= 8 * 1024 * 1024
    return dict(TH=TH, TW=TW, nty=nty, ntx=ntx, wh=wh, ww=ww, wh8=wh8,
                base8=base8, roff=roff, rel_y=rel_y, res_y=res_y,
                ext_y8=ext_y8, base_x=base_x, rel_x=rel_x, res_x=res_x,
                ext_x8=ext_x8, basex8=basex8, rxoff=rxoff, ww8=ww8, db=db)


def _kernel(base8_ref, roff_ref, off_ref, w_ref, vp_ref, out_ref, band,
            sem, amat, *, plan, d):
    ntx = plan["ntx"]
    wh, ww, wh8 = plan["wh"], plan["ww"], plan["wh8"]
    base_x = plan["base_x"]
    nty, h = plan["nty"], pl.num_programs(2)

    b = pl.program_id(0)
    i = pl.program_id(1)
    j = pl.program_id(2)

    if plan["db"]:
        # double-buffered band DMA: the (i, j) grid step prefetches the
        # next step's value row band while this step's A-build/dot runs,
        # hiding the band HBM read entirely
        s = (b * nty + i) * h + j
        nsteps = pl.num_programs(0) * nty * h
        slot = jax.lax.rem(s, 2)

        def start(step, which):
            jn = jax.lax.rem(step, h)
            rest = jax.lax.div(step, h)
            in_ = jax.lax.rem(rest, nty)
            bn = jax.lax.div(rest, nty)
            pltpu.make_async_copy(
                vp_ref.at[bn, jn, pl.ds(base8_ref[in_], wh8)],
                band.at[which], sem.at[which]).start()

        @pl.when(s == 0)
        def _():
            start(s, slot)

        @pl.when(s + 1 < nsteps)
        def _():
            start(s + 1, 1 - slot)

        pltpu.make_async_copy(
            vp_ref.at[b, j, pl.ds(base8_ref[i], wh8)],
            band.at[slot], sem.at[slot]).wait()
        band = band.at[slot]
    else:
        # value row band for this head: (wh8, ext_x8, 128)
        copy = pltpu.make_async_copy(
            vp_ref.at[b, j, pl.ds(base8_ref[i], wh8)], band, sem)
        copy.start()
        copy.wait()
    roff = roff_ref[i]

    iot_w = jax.lax.broadcasted_iota(jnp.int32, (ww, _Q_LANES), 0)
    iot_h = jax.lax.broadcasted_iota(jnp.int32, (wh, _Q_LANES), 0)

    P = plan["P"]
    for m in range(ntx):
        acc = jnp.zeros((wh, ww, _Q_LANES), jnp.float32)
        for p in range(P):
            # anchored offsets (window base + residual folded in on the
            # XLA side — the integer base survives floor() exactly) ride
            # the lane layout raw: 3P lanes of HBM traffic instead of 5P
            # and no XLA-side corner-split materialisation. The q-args
            # block carries a level axis (size 1 per call) so all levels
            # of one query grid share a single relayout pass; x points
            # occupy sublanes [0, P), y points [P, 2P).
            if plan.get("flane"):
                # projection-native layout (h, L, 2P, B, nty, ntx, q):
                # the q-arg blocks arrive as (1, 1, 2P|P, 1, 1, ntx, 128)
                tx = off_ref[0, 0, pl.ds(p, 1), 0, 0, m, :]
                ty = off_ref[0, 0, pl.ds(P + p, 1), 0, 0, m, :]
                wp = w_ref[0, 0, pl.ds(p, 1), 0, 0, m, :]
            else:
                tx = off_ref[0, 0, 0, m, 0, pl.ds(p, 1), :]
                ty = off_ref[0, 0, 0, m, 0, pl.ds(P + p, 1), :]
                wp = w_ref[0, 0, 0, m, 0, pl.ds(p, 1), :]
            y0f = jnp.floor(ty)
            x0f = jnp.floor(tx)
            fy = ty - y0f
            fx = tx - x0f
            wy0 = y0f.astype(jnp.int32)
            wx0 = x0f.astype(jnp.int32)
            fxw0 = (1.0 - fx) * wp
            fxw1 = fx * wp
            # (ww, 128): attention-weighted x-corner weights
            wx = ((iot_w == wx0).astype(fxw0.dtype) * fxw0
                  + (iot_w == (wx0 + 1)).astype(fxw0.dtype) * fxw1)
            # (wh, 128): y-corner weights
            wy = ((iot_h == wy0).astype(fy.dtype) * (1.0 - fy)
                  + (iot_h == (wy0 + 1)).astype(fy.dtype) * fy)
            acc = acc + wy[:, None, :] * wx[None, :, :]
        amat[...] = acc.reshape(wh * ww, _Q_LANES)

        win = band[pl.ds(roff, wh), pl.ds(int(base_x[m]), ww), :d]
        # Mosaic's shape-cast only lowers in f32 — reshape there, then
        # drop back to bf16 for a native MXU bf16 x bf16 -> f32 dot when
        # the value band is bf16 (half the DMA bytes of the f32 path)
        win = win.astype(jnp.float32).reshape(wh * ww, d)
        a = amat[...]
        if band.dtype == jnp.bfloat16:
            a = a.astype(jnp.bfloat16)
            win = win.astype(jnp.bfloat16)
        out_ref[0, 0, 0, m] = jax.lax.dot_general(
            a, win, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)


def _anchor_for_plan(plan, bwd=False):
    """(Hqp, Wqp, 2) per-query window anchor: integer window-relative base
    + fractional residual, folded into the offsets so floor() recovers the
    corner index in-kernel. bwd=True anchors x at the 8-ALIGNED tile
    window start basex8 (the backward kernel's dynamic slice)."""
    nty, TH = plan["nty"], plan["TH"]
    ntx, TW = plan["ntx"], plan["TW"]
    comb_y = (plan["rel_y"].astype(np.float64)
              + plan["res_y"]).reshape(nty * TH).astype(np.float32)
    comb_x = (plan["rel_x"].astype(np.float64).reshape(ntx, TW)
              + (plan["rxoff"].reshape(ntx, 1) if bwd else 0)
              + plan["res_x"].reshape(ntx, TW)).reshape(
                  ntx * TW).astype(np.float32)
    anchor = np.zeros((nty * TH, ntx * TW, 2), np.float32)
    anchor[..., 1] = comb_y[:, None]
    anchor[..., 0] = comb_x[None, :]
    return anchor


def _prep_lanes(off, w, query_hw, plans):
    """Anchored q-args in lane layout, ONE relayout pass for all levels.

    off: (B, Nq, h, L, P, 2); w: (B, Nq, h, L, P); plans: per-level.
    Returns off_t (B, nty, h, ntx, L, 2P, 128) — x points on sublanes
    [0, P), y on [P, 2P) — and w_t (B, nty, h, ntx, L, P, 128)."""
    B, Nq, h, L, P, _ = off.shape
    Hq, Wq = query_hw
    p0 = plans[0]
    TH, TW, nty, ntx = p0["TH"], p0["TW"], p0["nty"], p0["ntx"]

    off = off.reshape(B, Hq, Wq, h, L, P, 2)
    w = w.reshape(B, Hq, Wq, h, L, P)
    py, px = nty * TH - Hq, ntx * TW - Wq
    if py or px:
        off = jnp.pad(off, ((0, 0), (0, py), (0, px), (0, 0), (0, 0),
                            (0, 0), (0, 0)))
        w = jnp.pad(w, ((0, 0), (0, py), (0, px), (0, 0), (0, 0), (0, 0)))

    anchor = np.stack([_anchor_for_plan(p) for p in plans], axis=2)
    # (HqP, WqP, L, 2) -> broadcast over (B, ., ., h, ., P, .)
    off = (off.astype(jnp.float32)
           + jnp.asarray(anchor)[None, :, :, None, :, None, :])

    off_t = off.reshape(
        B, nty, TH, ntx, TW, h, L, P, 2).transpose(
        0, 1, 5, 3, 6, 8, 7, 2, 4).reshape(
        B, nty, h, ntx, L, 2 * P, TH * TW)
    w_t = w.astype(jnp.float32).reshape(
        B, nty, TH, ntx, TW, h, L, P).transpose(
        0, 1, 5, 3, 6, 7, 2, 4).reshape(B, nty, h, ntx, L, P, TH * TW)
    return off_t, w_t


def _pallas_level_lanes(value, off_t, w_t, lvl, radius, plan,
                        ext=None, interpret=False):
    """One (query grid, level) kernel launch from pre-relayouted q-args.

    value: (B, Hv, Wv, h, d); off_t/w_t: `_prep_lanes` outputs (the level
    axis is selected by the block index map — no XLA slice).
    Returns RAW tile-layout output (B, nty, h, ntx, 128, d) f32."""
    B, Hv, Wv, h, d = value.shape
    P = w_t.shape[-2]
    plan = dict(plan, P=P)
    nty, ntx = plan["nty"], plan["ntx"]
    wh, ww, wh8 = plan["wh"], plan["ww"], plan["wh8"]

    ey, ex = ext if ext is not None else (plan["ext_y8"], plan["ext_x8"])
    vp = prepare_padded_value(value, radius, ey, ex)
    plan["ext_x8"] = int(vp.shape[3])

    off_spec = pl.BlockSpec(
        (1, 1, 1, ntx, 1, 2 * P, _Q_LANES),
        lambda b, i, j, *_: (b, i, j, 0, lvl, 0, 0),
        memory_space=pltpu.VMEM)
    w_spec = pl.BlockSpec(
        (1, 1, 1, ntx, 1, P, _Q_LANES),
        lambda b, i, j, *_: (b, i, j, 0, lvl, 0, 0),
        memory_space=pltpu.VMEM)

    return pl.pallas_call(
        functools.partial(_kernel, plan=plan, d=d),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,
            grid=(B, nty, h),
            in_specs=[off_spec, w_spec,
                      pl.BlockSpec(memory_space=pl.ANY)],  # padded value
            out_specs=pl.BlockSpec(
                (1, 1, 1, ntx, _Q_LANES, d),
                lambda b, i, j, *_: (b, i, j, 0, 0, 0),
                memory_space=pltpu.VMEM),
            scratch_shapes=[
                pltpu.VMEM(
                    ((2, wh8, plan["ext_x8"], int(vp.shape[-1]))
                     if plan["db"]
                     else (wh8, plan["ext_x8"], int(vp.shape[-1]))),
                    value.dtype),
                (pltpu.SemaphoreType.DMA((2,)) if plan["db"]
                 else pltpu.SemaphoreType.DMA),
                pltpu.VMEM((wh * ww, _Q_LANES), jnp.float32),
            ]),
        out_shape=jax.ShapeDtypeStruct((B, nty, h, ntx, _Q_LANES, d),
                                       jnp.float32),
        interpret=interpret,
    )(jnp.asarray(plan["base8"], jnp.int32),
      jnp.asarray(plan["roff"], jnp.int32), off_t, w_t, vp)


def _untile_out(out, plan, query_hw, d):
    """(B, nty, h, ntx, TH*TW, d) raw tile layout -> (B, Nq, h, d)."""
    B, nty, h = out.shape[:3]
    TH, TW, ntx = plan["TH"], plan["TW"], plan["ntx"]
    Hq, Wq = query_hw
    out = out.reshape(B, nty, h, ntx, TH, TW, d).transpose(
        0, 1, 4, 3, 5, 2, 6).reshape(B, nty * TH, ntx * TW, h, d)
    return out[:, :Hq, :Wq].reshape(B, Hq * Wq, h, d)


def _pallas_level(value, off, w, query_hw, radius, plan, interpret=False):
    """Single-level wrapper (tests / per-level API): value (B,Hv,Wv,h,d);
    off (B,Nq,h,P,2); w (B,Nq,h,P)."""
    d = value.shape[-1]
    plan = dict(plan, P=w.shape[-1])
    off_t, w_t = _prep_lanes(off[:, :, :, None], w[:, :, :, None],
                             query_hw, [plan])
    out = _pallas_level_lanes(value, off_t, w_t, 0, radius, plan,
                              interpret=interpret)
    return _untile_out(out, plan, query_hw, d)


def pallas_windowed_supported(query_hw, value_hw, radius) -> bool:
    return _plan(query_hw, value_hw, radius) is not None


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5, 6))
def msda_windowed_levels(values, off, w, query_hw, radius, exts=None,
                         interpret=False):
    """Multi-level windowed sampling for ONE query grid — the product
    path. All levels share a single anchored lane-layout relayout of the
    q-args, per-level kernels read their level slab via the block index
    map, and the per-level outputs accumulate in raw tile layout with one
    final relayout (vs per-level prep + out relayout in the naive path).

    values: tuple of (B, Hv, Wv, h, d) — every level kernel-eligible for
    this grid; off: (B, Nq, h, L, P, 2) RAW level-pixel offsets;
    w: (B, Nq, h, L, P). exts: optional per-level (ext_y8, ext_x8).
    Returns (B, Nq, h, d) summed over levels.

    Backward: d_off/d_w via the band-tiled Pallas backward kernel
    (`_kernel_bwd`), dV via the XLA tiled VJP restricted to value."""
    return _levels_fwd_impl(values, off, w, query_hw, radius, exts,
                            interpret)


def _levels_fwd_impl(values, off, w, query_hw, radius, exts,
                     interpret=False):
    B, Nq, h, L, P, _ = off.shape
    d = values[0].shape[-1]
    plans = [dict(_plan(query_hw, v.shape[1:3], radius), P=P)
             for v in values]
    off_t, w_t = _prep_lanes(off, w, query_hw, plans)
    out = None
    for idx, (v, plan) in enumerate(zip(values, plans)):
        ext = exts[idx] if exts is not None else None
        term = _pallas_level_lanes(v, off_t, w_t, idx, radius, plan, ext,
                                   interpret=interpret)
        out = term if out is None else out + term
    return _untile_out(out, plans[0], query_hw, d)


def _levels_fwd(values, off, w, query_hw, radius, exts, interpret=False):
    return (_levels_fwd_impl(values, off, w, query_hw, radius, exts,
                             interpret),
            (values, off, w))


def _levels_bwd(query_hw, radius, exts, interpret, res, g):
    values, off, w = res
    dvs, dos, dws = [], [], []
    for idx, v in enumerate(values):
        ext = exts[idx] if exts is not None else None
        o_l, w_l = off[:, :, :, idx], w[:, :, :, idx]
        do, dw = msda_windowed_level_bwd_offw(v, o_l, w_l, g, query_hw,
                                              radius, ext,
                                              interpret=interpret)
        _, vjp_v = jax.vjp(
            lambda vv, _o=o_l, _w=w_l: _msda._windowed_level_tiled(
                vv, _o, _w, query_hw, radius), v)
        dv, = vjp_v(g)
        dvs.append(dv)
        dos.append(do)
        dws.append(dw)
    return (tuple(dvs), jnp.stack(dos, axis=3), jnp.stack(dws, axis=3))


msda_windowed_levels.defvjp(_levels_fwd, _levels_bwd)


# ---------------------------------------------------------------------------
# projection-native ("flane") q-arg layout: (h, L, 2P|P, B, nty, ntx, 128)
# ---------------------------------------------------------------------------
#
# The lane relayout in `_prep_lanes` is the single biggest copy cost on the
# product forward (~7 ms/iter of scrambled 9-D transposes at the 352x1216
# protocol shape, r5 trace). This layout removes it: the offset/weight
# Dense projections are computed as dot_general(W^T, q^T) so the projected
# F axis lands on the MAJOR dims and the query axis lands on lanes — the
# dot output (F, B, nty*ntx, 128) pure-reshapes into the kernel's block
# layout. Only the query FEATURES pay one tile-order block permute
# (32KB-contiguous chunks, ~3x fewer bytes than off+w and block- instead
# of element-granular). See models/hahi.py `_LaneDense`.


def flane_pack(off, w, query_hw, plan):
    """Raw q-args -> flane layout (reference layout transform, used by the
    backward for grad repacking and by tests).

    off (B, Nq, h, L, P, 2), w (B, Nq, h, L, P) ->
    off_f (h, L, 2P, B, nty, ntx, 128) with x points on [0, P) and y on
    [P, 2P); w_f (h, L, P, B, nty, ntx, 128)."""
    B, Nq, h, L, P, _ = off.shape
    Hq, Wq = query_hw
    TH, TW, nty, ntx = plan["TH"], plan["TW"], plan["nty"], plan["ntx"]
    off = off.reshape(B, Hq, Wq, h, L, P, 2)
    w = w.reshape(B, Hq, Wq, h, L, P)
    py, px = nty * TH - Hq, ntx * TW - Wq
    if py or px:
        off = jnp.pad(off, ((0, 0), (0, py), (0, px)) + ((0, 0),) * 4)
        w = jnp.pad(w, ((0, 0), (0, py), (0, px)) + ((0, 0),) * 3)
    off_f = off.reshape(B, nty, TH, ntx, TW, h, L, P, 2).transpose(
        5, 6, 8, 7, 0, 1, 3, 2, 4).reshape(h, L, 2 * P, B, nty, ntx,
                                           TH * TW)
    w_f = w.reshape(B, nty, TH, ntx, TW, h, L, P).transpose(
        5, 6, 7, 0, 1, 3, 2, 4).reshape(h, L, P, B, nty, ntx, TH * TW)
    return off_f.astype(jnp.float32), w_f.astype(jnp.float32)


def flane_unpack(off_f, w_f, query_hw, plan):
    """Inverse of `flane_pack` (backward-pass helper)."""
    h, L, P2, B, nty, ntx, Q = off_f.shape
    P = P2 // 2
    Hq, Wq = query_hw
    TH, TW = plan["TH"], plan["TW"]
    off = off_f.reshape(h, L, 2, P, B, nty, ntx, TH, TW).transpose(
        4, 5, 7, 6, 8, 0, 1, 3, 2).reshape(
        B, nty * TH, ntx * TW, h, L, P, 2)
    w = w_f.reshape(h, L, P, B, nty, ntx, TH, TW).transpose(
        3, 4, 6, 5, 7, 0, 1, 2).reshape(B, nty * TH, ntx * TW, h, L, P)
    off = off[:, :Hq, :Wq].reshape(B, Hq * Wq, h, L, P, 2)
    w = w[:, :Hq, :Wq].reshape(B, Hq * Wq, h, L, P)
    return off, w


def flane_anchors(plans):
    """Per-level window anchors in flane lane order, as two SMALL arrays
    whose broadcast-add fuses into the surrounding elementwise chain:
    (ANX (L, ntx, 128), ANY (L, nty, 128)) — x anchors vary over (j, tx),
    y anchors over (i, ty); lane q = ty*TW + tx."""
    p0 = plans[0]
    TH, TW, nty, ntx = p0["TH"], p0["TW"], p0["nty"], p0["ntx"]
    anx, any_ = [], []
    for plan in plans:
        comb_y = (plan["rel_y"].astype(np.float64)
                  + plan["res_y"]).reshape(nty, TH).astype(np.float32)
        comb_x = (plan["rel_x"].astype(np.float64)
                  + plan["res_x"]).reshape(ntx, TW).astype(np.float32)
        anx.append(np.tile(comb_x[:, None, :], (1, TH, 1)).reshape(
            ntx, TH * TW))
        any_.append(np.repeat(comb_y, TW, axis=1).reshape(nty, TH * TW))
    return np.stack(anx), np.stack(any_)


def _pallas_level_flanes(value, off_f, w_f, lvl, radius, plan,
                         ext=None, interpret=False):
    """One (query grid, level) launch from flane q-args (anchors already
    folded in). Returns RAW tile-layout output (B, nty, h, ntx, 128, d)."""
    B, Hv, Wv, h, d = value.shape
    P = w_f.shape[2]
    plan = dict(plan, P=P, flane=True)
    nty, ntx = plan["nty"], plan["ntx"]
    wh, ww, wh8 = plan["wh"], plan["ww"], plan["wh8"]

    ey, ex = ext if ext is not None else (plan["ext_y8"], plan["ext_x8"])
    vp = prepare_padded_value(value, radius, ey, ex)
    plan["ext_x8"] = int(vp.shape[3])

    off_spec = pl.BlockSpec(
        (1, 1, 2 * P, 1, 1, ntx, _Q_LANES),
        lambda b, i, j, *_: (j, lvl, 0, b, i, 0, 0),
        memory_space=pltpu.VMEM)
    w_spec = pl.BlockSpec(
        (1, 1, P, 1, 1, ntx, _Q_LANES),
        lambda b, i, j, *_: (j, lvl, 0, b, i, 0, 0),
        memory_space=pltpu.VMEM)

    return pl.pallas_call(
        functools.partial(_kernel, plan=plan, d=d),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,
            grid=(B, nty, h),
            in_specs=[off_spec, w_spec,
                      pl.BlockSpec(memory_space=pl.ANY)],
            out_specs=pl.BlockSpec(
                (1, 1, 1, ntx, _Q_LANES, d),
                lambda b, i, j, *_: (b, i, j, 0, 0, 0),
                memory_space=pltpu.VMEM),
            scratch_shapes=[
                pltpu.VMEM(
                    ((2, wh8, plan["ext_x8"], int(vp.shape[-1]))
                     if plan["db"]
                     else (wh8, plan["ext_x8"], int(vp.shape[-1]))),
                    value.dtype),
                (pltpu.SemaphoreType.DMA((2,)) if plan["db"]
                 else pltpu.SemaphoreType.DMA),
                pltpu.VMEM((wh * ww, _Q_LANES), jnp.float32),
            ]),
        out_shape=jax.ShapeDtypeStruct((B, nty, h, ntx, _Q_LANES, d),
                                       jnp.float32),
        interpret=interpret,
    )(jnp.asarray(plan["base8"], jnp.int32),
      jnp.asarray(plan["roff"], jnp.int32), off_f, w_f, vp)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5, 6))
def msda_windowed_levels_flanes(values, off_f, w_f, query_hw, radius,
                                exts=None, interpret=False):
    """Multi-level windowed sampling from projection-native flane q-args.

    Same sampling semantics/returns as `msda_windowed_levels`, but off_f /
    w_f arrive ALREADY in the kernel lane layout (h, L, 2P|P, B, nty,
    ntx, 128) — see `flane_pack` — with offsets still window-relative
    (bounded to +-radius level pixels); the per-level window anchors are
    folded in here. Returns (B, Nq, h, d) summed over levels.

    Backward: grads flow to off_f/w_f (repacked from the raw-layout Pallas
    backward kernel) and to values (XLA tiled VJP) — the extra relayouts
    ride the backward only."""
    return _flanes_fwd_impl(values, off_f, w_f, query_hw, radius, exts,
                            interpret)


def _flanes_fwd_impl(values, off_f, w_f, query_hw, radius, exts,
                     interpret=False):
    d = values[0].shape[-1]
    P = w_f.shape[2]
    plans = [dict(_plan(query_hw, v.shape[1:3], radius), P=P)
             for v in values]
    anx, any_ = flane_anchors(plans)
    # x points ride sublanes [0, P), y on [P, 2P) — anchor each plane
    # with its per-(level, tile-axis) table; the broadcasts fuse into the
    # caller's bounding elementwise chain (tanh/clip).
    off_a = jnp.concatenate([
        off_f[:, :, :P] + jnp.asarray(anx)[None, :, None, None, None],
        off_f[:, :, P:] + jnp.asarray(any_)[None, :, None, None, :, None]],
        axis=2)
    out = None
    for idx, (v, plan) in enumerate(zip(values, plans)):
        ext = exts[idx] if exts is not None else None
        term = _pallas_level_flanes(v, off_a, w_f, idx, radius, plan, ext,
                                    interpret=interpret)
        out = term if out is None else out + term
    return _untile_out(out, plans[0], query_hw, d)


def _flanes_fwd(values, off_f, w_f, query_hw, radius, exts,
                interpret=False):
    return (_flanes_fwd_impl(values, off_f, w_f, query_hw, radius, exts,
                             interpret),
            (values, off_f, w_f))


def _flanes_bwd(query_hw, radius, exts, interpret, res, g):
    values, off_f, w_f = res
    plan0 = _plan(query_hw, values[0].shape[1:3], radius)
    off, w = flane_unpack(off_f, w_f, query_hw, plan0)
    dvs, dos, dws = [], [], []
    for idx, v in enumerate(values):
        ext = exts[idx] if exts is not None else None
        o_l, w_l = off[:, :, :, idx], w[:, :, :, idx]
        do, dw = msda_windowed_level_bwd_offw(v, o_l, w_l, g, query_hw,
                                              radius, ext,
                                              interpret=interpret)
        _, vjp_v = jax.vjp(
            lambda vv, _o=o_l, _w=w_l: _msda._windowed_level_tiled(
                vv, _o, _w, query_hw, radius), v)
        dv, = vjp_v(g)
        dvs.append(dv)
        dos.append(do)
        dws.append(dw)
    d_off_f, d_w_f = flane_pack(jnp.stack(dos, axis=3),
                                jnp.stack(dws, axis=3), query_hw, plan0)
    return tuple(dvs), d_off_f.astype(off_f.dtype), d_w_f.astype(w_f.dtype)


msda_windowed_levels_flanes.defvjp(_flanes_fwd, _flanes_bwd)


# ---------------------------------------------------------------------------
# fused multi-level kernel: one pallas_call per QUERY GRID
# ---------------------------------------------------------------------------
#
# The per-(grid, level) kernel above costs XLA a full prep + dispatch + out
# relayout per level (the HAHI neck runs 4 query grids x 4 levels of
# self-attention + 1 grid x 4 levels of cross-attention = 20 calls per
# forward). The query tiling (TH, TW, nty, ntx) depends only on the query
# grid, so all levels of one grid share the same grid loop — this kernel
# processes every VMEM-fitting level inside ONE pallas_call: per
# (batch, row-band, head) it starts all levels' band DMAs up front (each
# level's DMA overlaps the previous level's A-build/matmul) and accumulates
# the per-level contractions into a single output block, collapsing L
# output relayouts into one.


def _kernel_multi(base8_ref, roff_ref, qstack_ref, *refs, plans, d):
    """refs layout: vp x L, out, band x L, bsem (L,), qbuf (2,...),
    qsem (2,), amat.

    Grid (B, nty, h). The column-tile loop stays a static Python loop (all
    window slices static), but the per-query tensors live in HBM as ONE
    stacked array (B, nty, h, ntx, L*5*P, 128) and are DMA'd per
    column-tile chunk with double buffering — the first fused version kept
    L*5 full-ntx rows of tiles blocked in VMEM, which blew the budget at
    full resolution; the second moved the tile loop onto the grid, whose
    per-step overhead plus the then-dynamic (sublane) window slices cost
    ~3x. Integer corner indices ride the stack as exact small floats."""
    L = len(plans)
    vps = refs[:L]
    out_ref = refs[L]
    bands = refs[L + 1:2 * L + 1]
    bsem = refs[2 * L + 1]
    qbuf = refs[2 * L + 2]
    qsem = refs[2 * L + 3]
    amat = refs[2 * L + 4]

    P = plans[0]["P"]
    MC = plans[0]["MC"]
    ntx = plans[0]["ntx"]
    nmc = -(-ntx // MC)

    b = pl.program_id(0)
    i = pl.program_id(1)
    j = pl.program_id(2)

    def band_dma(l):
        return pltpu.make_async_copy(
            vps[l].at[b, j, pl.ds(base8_ref[l, i], plans[l]["wh8"])],
            bands[l], bsem.at[l])

    def q_dma(slot, mq):
        return pltpu.make_async_copy(
            qstack_ref.at[b, i, j, pl.ds(mq * MC, MC)],
            qbuf.at[slot], qsem.at[slot])

    for l in range(L):
        band_dma(l).start()
    q_dma(0, 0).start()
    for l in range(L):
        band_dma(l).wait()

    for mq in range(nmc):
        slot = mq % 2
        if mq + 1 < nmc:
            q_dma((mq + 1) % 2, mq + 1).start()
        q_dma(slot, mq).wait()
        for mi in range(MC):
            m = mq * MC + mi
            if m >= ntx:
                break
            acc_out = None
            for l, plan in enumerate(plans):
                wh, ww = plan["wh"], plan["ww"]
                base_x = plan["base_x"]
                roff = roff_ref[l, i]
                band = bands[l]
                qb = l * 5 * P

                iot_w = jax.lax.broadcasted_iota(
                    jnp.int32, (ww, _Q_LANES), 0)
                iot_h = jax.lax.broadcasted_iota(
                    jnp.int32, (wh, _Q_LANES), 0)

                acc = jnp.zeros((wh, ww, _Q_LANES), jnp.float32)
                for pp in range(P):
                    # corner indices ride the float stack as exact small
                    # floats; back to int32 for the iota compare
                    wy0 = qbuf[slot, mi,
                               pl.ds(qb + pp, 1), :].astype(jnp.int32)
                    fy = qbuf[slot, mi, pl.ds(qb + P + pp, 1), :]
                    wx0 = qbuf[slot, mi,
                               pl.ds(qb + 2 * P + pp, 1), :].astype(
                                   jnp.int32)
                    fxw0 = qbuf[slot, mi, pl.ds(qb + 3 * P + pp, 1), :]
                    fxw1 = qbuf[slot, mi, pl.ds(qb + 4 * P + pp, 1), :]
                    wx = ((iot_w == wx0).astype(jnp.float32) * fxw0
                          + (iot_w == (wx0 + 1)).astype(jnp.float32)
                          * fxw1)
                    wy = ((iot_h == wy0).astype(jnp.float32) * (1.0 - fy)
                          + (iot_h == (wy0 + 1)).astype(jnp.float32)
                          * fy)
                    acc = acc + wy[:, None, :] * wx[None, :, :]
                amat[0:wh * ww] = acc.reshape(wh * ww, _Q_LANES)

                win = band[pl.ds(roff, wh),
                           pl.ds(int(base_x[m]), ww), :d]
                win = win.reshape(wh * ww, d)
                term = jax.lax.dot_general(
                    amat[0:wh * ww], win.astype(jnp.float32),
                    (((0,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32)
                acc_out = term if acc_out is None else acc_out + term
            out_ref[0, 0, 0, m] = acc_out


def _vp_lanes(d):
    """Lane width of the padded value's minor dim. Default pads d to one
    full 128-lane tile; GEDEPTH_MSDA_VP_LANES=<n> (multiple of 8, >= d)
    shrinks it so the per-band DMA moves only ~d lanes of HBM instead of
    128 (4x less traffic at d=32), at the cost of lane-padded VMEM tiles
    (same VMEM footprint as the 128 pad)."""
    import os
    raw = os.environ.get("GEDEPTH_MSDA_VP_LANES", "")
    if raw:
        try:
            n = int(raw)
            if n >= d and n % 8 == 0:
                return n
        except ValueError:
            pass
    return _D_LANES


def prepare_padded_value(value, radius, ext_y8, ext_x8):
    """Pad + head-major transpose of one value level for the kernel DMA
    layout: (B, Hv, Wv, h, d) -> (B, h, ext_y8, ext_x8, _vp_lanes(d)).

    Shared across every query grid sampling this level (the left pad is
    always radius + 3; grids only differ in the required extents, so
    padding to the max extent serves them all)."""
    B, Hv, Wv, h, d = value.shape
    pad = radius + 3
    vp = jnp.pad(value, ((0, 0), (pad, ext_y8 - Hv - pad),
                         (pad, ext_x8 - Wv - pad), (0, 0),
                         (0, _vp_lanes(d) - d)))
    return vp.transpose(0, 3, 1, 2, 4)


def _qargs_for_level(off, w, value_dtype, query_hw, plan):
    """XLA-side prep of one level's folded corner/weight tensors in the
    q-on-lanes tiled layout (same math as `_pallas_level`, but wx0 is
    relative to the 8-ALIGNED window start basex8 — the fused kernel's
    dynamic x slice)."""
    B = off.shape[0]
    Hq, Wq = query_hw
    P = w.shape[-1]
    TH, TW = plan["TH"], plan["TW"]
    nty, ntx = plan["nty"], plan["ntx"]

    off = off.reshape(B, Hq, Wq, -1, P, 2)
    h = off.shape[3]
    w = w.reshape(B, Hq, Wq, h, P)
    py, px = nty * TH - Hq, ntx * TW - Wq
    if py or px:
        off = jnp.pad(off, ((0, 0), (0, py), (0, px), (0, 0), (0, 0),
                            (0, 0)))
        w = jnp.pad(w, ((0, 0), (0, py), (0, px), (0, 0), (0, 0)))

    res_y = jnp.asarray(plan["res_y"].reshape(nty * TH))
    rel_y = jnp.asarray(plan["rel_y"].reshape(nty * TH))
    res_x = jnp.asarray(plan["res_x"].reshape(ntx * TW))
    rel_x = jnp.asarray(plan["rel_x"].reshape(ntx * TW))

    ty = res_y[None, :, None, None, None] + off[..., 1]
    tx = res_x[None, None, :, None, None] + off[..., 0]
    y0 = jnp.floor(ty)
    x0 = jnp.floor(tx)
    fy = (ty - y0).astype(value_dtype)
    fx = (tx - x0).astype(value_dtype)
    wy0 = rel_y[None, :, None, None, None] + y0.astype(jnp.int32)
    wx0 = rel_x[None, None, :, None, None] + x0.astype(jnp.int32)
    fxw0 = (1.0 - fx) * w
    fxw1 = fx * w

    def to_lanes(x):
        x = x.reshape(B, nty, TH, ntx, TW, h, P)
        return x.transpose(0, 1, 5, 3, 6, 2, 4).reshape(
            B, nty, h, ntx, P, TH * TW)

    return [to_lanes(a) for a in (wy0, fy, wx0, fxw0, fxw1)]


def msda_windowed_fused(vps, offs, ws, query_hw, radius, plans, d,
                        interpret=False):
    """Fused multi-level windowed sampling for one query grid.

    vps: list of padded/transposed values from `prepare_padded_value`
      (each (B, h, ext_y8_l, ext_x8_l, 128) — extents may exceed the
      per-level plan's, e.g. when shared across query grids).
    offs/ws: per level, (B, Nq, h, P, 2) / (B, Nq, h, P).
    plans: per-level `_plan` dicts (all sharing TH/TW/nty/ntx).
    d: true head dim (vps are lane-padded to 128).
    Returns (B, Nq, h, d) summed over the levels.
    """
    L = len(vps)
    B, h = vps[0].shape[0], vps[0].shape[1]
    Hq, Wq = query_hw
    P = ws[0].shape[-1]
    plan0 = dict(plans[0], P=P)
    nty, ntx = plan0["nty"], plan0["ntx"]
    TH, TW = plan0["TH"], plan0["TW"]

    # one stacked q-arg array: (B, nty, h, ntx, L*5*P, 128); the integer
    # corner indices are stored as exact small floats
    stacks = []
    for l in range(L):
        a = _qargs_for_level(offs[l], ws[l], jnp.float32, query_hw,
                             plans[l])
        stacks.extend([x.astype(jnp.float32) for x in a])
    qstack = jnp.concatenate(stacks, axis=4)

    MC = min(4, ntx)
    ntx_pad = -(-ntx // MC) * MC
    if ntx_pad != ntx:
        # the chunked DMA reads whole MC-tile chunks; compute skips m>=ntx
        qstack = jnp.pad(qstack, ((0, 0), (0, 0), (0, 0),
                                  (0, ntx_pad - ntx), (0, 0), (0, 0)))

    table = np.stack([p["base8"] for p in plans]).astype(np.int32)
    roff = np.stack([p["roff"] for p in plans]).astype(np.int32)
    amat_rows = max(p["wh"] * p["ww"] for p in plans)

    plans_k = [dict(p, P=P, MC=MC) for p in plans]
    # the kernel band scratch spans each vp's actual (possibly shared/max)
    # column extent so the static window slices stay in range
    for p, vp in zip(plans_k, vps):
        p["ext_x8"] = int(vp.shape[3])

    out = pl.pallas_call(
        functools.partial(_kernel_multi, plans=plans_k, d=d),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,
            grid=(B, nty, h),
            in_specs=[pl.BlockSpec(memory_space=pl.ANY)] * (1 + L),
            out_specs=pl.BlockSpec(
                (1, 1, 1, ntx, _Q_LANES, d),
                lambda b, i, j, *_: (b, i, j, 0, 0, 0),
                memory_space=pltpu.VMEM),
            scratch_shapes=[
                pltpu.VMEM((p["wh8"], int(vp.shape[3]),
                            int(vp.shape[4])), vp.dtype)
                for p, vp in zip(plans_k, vps)
            ] + [
                pltpu.SemaphoreType.DMA((L,)),
                pltpu.VMEM((2, MC, L * 5 * P, _Q_LANES), jnp.float32),
                pltpu.SemaphoreType.DMA((2,)),
                pltpu.VMEM((amat_rows, _Q_LANES), jnp.float32),
            ]),
        out_shape=jax.ShapeDtypeStruct((B, nty, h, ntx, _Q_LANES, d),
                                       jnp.float32),
        interpret=interpret,
    )(jnp.asarray(table), jnp.asarray(roff), qstack, *vps)

    out = out.reshape(B, nty, h, ntx, TH, TW, d).transpose(
        0, 1, 4, 3, 5, 2, 6).reshape(B, nty * TH, ntx * TW, h, d)
    return out[:, :Hq, :Wq].reshape(B, Hq * Wq, h, d)


# ---------------------------------------------------------------------------
# backward kernel: d_offsets / d_weights (query-tiled)
# ---------------------------------------------------------------------------
#
# The XLA-tiled VJP re-runs the A-build einsum backward, spilling the
# wrow/wcol/A intermediates to HBM every scan band — the same HBM wall the
# forward kernel removed. This kernel computes the offset/weight grads with
# the forward's band-DMA tiling: per query tile it forms
#   M[win, q] = V_win · g_q   (one MXU dot)
# and contracts it against the separable tap-weight factors and their
# derivatives on the VPU:
#   d_w[q,p]   = sum_win Wy_p Wx_p M          (A excl. attention weight)
#   d_offy[q,p]= w * sum_win (dWy/dfy) Wx M   (floor() has zero grad)
#   d_offx[q,p]= w * sum_win Wy (dWx/dfx) M
# dV falls back to the XLA-tiled VJP (it needs scatter across overlapping
# windows; see _group_bwd).


def _kernel_bwd(base8_ref, roff_ref, basex8_ref, off_ref, w_ref, g_ref,
                vp_ref, dw_ref, dox_ref, doy_ref, band, sem, *, plan, d):
    """d_off / d_w for one (batch, row band, head, column tile) grid step.

    The column tile is a GRID dimension (not an unrolled python loop):
    Mosaic compiles ONE body per P instead of ntx*P — the unrolled
    variant's compile time (~2 min/shape) made the kernel unusable. The
    price is an 8-aligned dynamic x-window slice (basex8; the residual is
    folded into the offset anchor, widening the window by up to 8)."""
    wh, ww8, wh8 = plan["wh"], plan["ww8"], plan["wh8"]

    b = pl.program_id(0)
    i = pl.program_id(1)
    j = pl.program_id(2)
    m = pl.program_id(3)

    @pl.when(m == 0)
    def _():
        pltpu.make_async_copy(
            vp_ref.at[b, j, pl.ds(base8_ref[i], wh8)], band, sem).start()
        pltpu.make_async_copy(
            vp_ref.at[b, j, pl.ds(base8_ref[i], wh8)], band, sem).wait()
    roff = roff_ref[i]

    iot_w = jax.lax.broadcasted_iota(jnp.int32, (ww8, _Q_LANES), 0)
    iot_h = jax.lax.broadcasted_iota(jnp.int32, (wh, _Q_LANES), 0)

    g = g_ref[0, 0, 0, 0]                           # (128, d)
    win = band[pl.ds(roff, wh), pl.ds(basex8_ref[m], ww8), :d]
    win = win.astype(jnp.float32).reshape(wh * ww8, d)
    # M[win, q] = sum_d V[win, d] g[q, d]
    M = jax.lax.dot_general(
        win, g.astype(jnp.float32),
        (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)         # (wh*ww8, 128)
    M3 = M.reshape(wh, ww8, _Q_LANES)

    for p in range(plan["P"]):
        ty = off_ref[0, 0, 0, 0, 1, pl.ds(p, 1), :]
        tx = off_ref[0, 0, 0, 0, 0, pl.ds(p, 1), :]
        w = w_ref[0, 0, 0, 0, pl.ds(p, 1), :]
        y0f = jnp.floor(ty)
        x0f = jnp.floor(tx)
        fy = ty - y0f
        fx = tx - x0f
        wy0 = y0f.astype(jnp.int32)
        wx0 = x0f.astype(jnp.int32)

        hy0 = (iot_h == wy0).astype(jnp.float32)
        hy1 = (iot_h == (wy0 + 1)).astype(jnp.float32)
        hx0 = (iot_w == wx0).astype(jnp.float32)
        hx1 = (iot_w == (wx0 + 1)).astype(jnp.float32)
        Wy = hy0 * (1.0 - fy) + hy1 * fy            # (wh, 128)
        Wx = hx0 * (1.0 - fx) + hx1 * fx            # (ww8, 128)
        dWy = hy1 - hy0
        dWx = hx1 - hx0

        # per-row / per-col partial contractions of M
        MWy = jnp.sum(M3 * Wx[None, :, :], axis=1)  # (wh, 128)
        MWx = jnp.sum(M3 * Wy[:, None, :], axis=0)  # (ww8, 128)

        dw_ref[0, 0, 0, 0, pl.ds(p, 1), :] = jnp.sum(
            Wy * MWy, axis=0, keepdims=True)
        doy_ref[0, 0, 0, 0, pl.ds(p, 1), :] = w * jnp.sum(
            dWy * MWy, axis=0, keepdims=True)
        dox_ref[0, 0, 0, 0, pl.ds(p, 1), :] = w * jnp.sum(
            dWx * MWx, axis=0, keepdims=True)


def msda_windowed_level_bwd_offw(value, off, w, g, query_hw, radius,
                                 ext=None, interpret=False):
    """Pallas d_off / d_w for one level.

    value: (B, Hv, Wv, h, d); off/w: (B, Nq, h, P, 2) / (B, Nq, h, P);
    g: (B, Nq, h, d) upstream cotangent.
    Returns (d_off, d_w) with the input shapes.

    The kernel always runs in f32: its band slices are 8-aligned (f32
    sublane granularity) and bf16 vmem buffers need 16-aligned dynamic
    starts Mosaic cannot prove here (bf16_compute training hit this —
    'cannot statically prove that index in dimension 1 is a multiple of
    8'). Inputs are cast up, the (d_off, d_w) cotangents cast back to the
    primal dtypes; the backward accumulates in f32 regardless, so this
    only adds the boundary casts.
    """
    off_dtype, w_dtype = off.dtype, w.dtype
    value = value.astype(jnp.float32)
    g = g.astype(jnp.float32)
    B, Hv, Wv, h, d = value.shape
    Hq, Wq = query_hw
    P = w.shape[-1]
    plan = _plan(query_hw, (Hv, Wv), radius)
    assert plan is not None
    plan = dict(plan, P=P)
    TH, TW = plan["TH"], plan["TW"]
    nty, ntx = plan["nty"], plan["ntx"]

    ey, ex = ext if ext is not None else (plan["ext_y8"], plan["ext_x8"])
    vp = prepare_padded_value(value, radius, ey, ex)
    plan["ext_x8"] = int(vp.shape[3])

    # anchored offsets (cf. `_pallas_level`): y anchor = rel_y + res_y;
    # x anchor is relative to the 8-ALIGNED tile window start basex8, so
    # the per-tile residual rxoff rides the anchor and the kernel's
    # dynamic x slice stays aligned
    off = off.reshape(B, Hq, Wq, h, P, 2)
    w = w.reshape(B, Hq, Wq, h, P)
    py, px = nty * TH - Hq, ntx * TW - Wq
    if py or px:
        off = jnp.pad(off, ((0, 0), (0, py), (0, px), (0, 0), (0, 0),
                            (0, 0)))
        w = jnp.pad(w, ((0, 0), (0, py), (0, px), (0, 0), (0, 0)))
    comb_y = (plan["rel_y"].astype(np.float64)
              + plan["res_y"]).reshape(nty * TH).astype(np.float32)
    comb_x = (plan["rel_x"].astype(np.float64).reshape(ntx, TW)
              + plan["rxoff"].reshape(ntx, 1)
              + plan["res_x"].reshape(ntx, TW)).reshape(
                  ntx * TW).astype(np.float32)
    anchor = np.zeros((nty * TH, ntx * TW, 2), np.float32)
    anchor[..., 1] = comb_y[:, None]
    anchor[..., 0] = comb_x[None, :]
    off = off.astype(jnp.float32) + jnp.asarray(anchor)[None, :, :, None,
                                                        None, :]
    off_t = off.reshape(
        B, nty, TH, ntx, TW, h, P, 2).transpose(
        0, 1, 5, 3, 7, 6, 2, 4).reshape(B, nty, h, ntx, 2, P, TH * TW)
    w_t = w.astype(jnp.float32).reshape(
        B, nty, TH, ntx, TW, h, P).transpose(
        0, 1, 5, 3, 6, 2, 4).reshape(B, nty, h, ntx, P, TH * TW)

    # upstream cotangent in the forward-output tile layout
    gq = g.reshape(B, Hq, Wq, h, d)
    if py or px:
        gq = jnp.pad(gq, ((0, 0), (0, py), (0, px), (0, 0), (0, 0)))
    gq = gq.reshape(B, nty, TH, ntx, TW, h, d).transpose(
        0, 1, 5, 3, 2, 4, 6).reshape(B, nty, h, ntx, TH * TW, d)

    off_spec = pl.BlockSpec(
        (1, 1, 1, 1, 2, P, _Q_LANES),
        lambda b, i, j, m, *_: (b, i, j, m, 0, 0, 0),
        memory_space=pltpu.VMEM)
    w_spec = pl.BlockSpec(
        (1, 1, 1, 1, P, _Q_LANES),
        lambda b, i, j, m, *_: (b, i, j, m, 0, 0),
        memory_space=pltpu.VMEM)
    gspec = pl.BlockSpec(
        (1, 1, 1, 1, _Q_LANES, d),
        lambda b, i, j, m, *_: (b, i, j, m, 0, 0),
        memory_space=pltpu.VMEM)
    oshape = jax.ShapeDtypeStruct((B, nty, h, ntx, P, _Q_LANES),
                                  jnp.float32)

    dw_t, dox_t, doy_t = pl.pallas_call(
        functools.partial(_kernel_bwd, plan=dict(plan, P=P), d=d),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=3,
            grid=(B, nty, h, ntx),
            in_specs=[off_spec, w_spec, gspec,
                      pl.BlockSpec(memory_space=pl.ANY)],
            out_specs=(w_spec, w_spec, w_spec),
            scratch_shapes=[
                pltpu.VMEM((plan["wh8"], plan["ext_x8"],
                            int(vp.shape[-1])), vp.dtype),
                pltpu.SemaphoreType.DMA,
            ]),
        out_shape=(oshape, oshape, oshape),
        interpret=interpret,
    )(jnp.asarray(plan["base8"], jnp.int32),
      jnp.asarray(plan["roff"], jnp.int32),
      jnp.asarray(plan["basex8"], jnp.int32), off_t, w_t, gq, vp)

    def untile(x):
        # (B, nty, h, ntx, P, TH*TW) -> (B, Nq, h, P)
        x = x.reshape(B, nty, h, ntx, P, TH, TW)
        x = x.transpose(0, 1, 5, 3, 6, 2, 4)
        x = x.reshape(B, nty * TH, ntx * TW, h, P)
        return x[:, :Hq, :Wq].reshape(B, Hq * Wq, h, P)

    d_w = untile(dw_t).astype(w_dtype)
    d_off = jnp.stack([untile(dox_t), untile(doy_t)],
                      axis=-1).astype(off_dtype)
    return d_off, d_w


def _group_forward(values, offs, ws, query_hw, radius, exts):
    plans = [_plan(query_hw, (v.shape[1], v.shape[2]), radius)
             for v in values]
    d = values[0].shape[-1]
    vps = []
    for li, (v, p) in enumerate(zip(values, plans)):
        ey, ex = (exts[li] if exts is not None and exts[li] is not None
                  else (p["ext_y8"], p["ext_x8"]))
        vps.append(prepare_padded_value(v, radius, ey, ex))
    return msda_windowed_fused(vps, list(offs), list(ws), query_hw, radius,
                               plans, d)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5))
def msda_windowed_group(values, offs, ws, query_hw, radius, exts=None):
    """Fused multi-level Pallas forward / XLA-tiled backward.

    values/offs/ws: per-level tuples — (B,Hv,Wv,h,d) / (B,Nq,h,P,2) /
    (B,Nq,h,P); all levels must pass `pallas_windowed_supported` for this
    query grid. exts: optional per-level (ext_y8, ext_x8) overrides so the
    padded-value prep is identical across query grids (XLA CSE then shares
    one pad+transpose per level instead of one per grid).
    Returns (B, Nq, h, d) summed over the levels.
    """
    return _group_forward(values, offs, ws, query_hw, radius, exts)


def _group_fwd(values, offs, ws, query_hw, radius, exts):
    return (msda_windowed_group(values, offs, ws, query_hw, radius, exts),
            (values, offs, ws))


def _group_bwd(query_hw, radius, exts, res, g):
    """d_off / d_w via the Pallas band-tiled kernel; dV via the XLA tiled
    VJP restricted to the value argument (its A-build backward — the HBM
    spill the kernels avoid — is no longer differentiated)."""
    values, offs, ws = res
    dvs, dos, dws = [], [], []
    for li, (v, o, w_) in enumerate(zip(values, offs, ws)):
        ext = exts[li] if exts is not None else None
        do, dw = msda_windowed_level_bwd_offw(v, o, w_, g, query_hw,
                                              radius, ext)
        _, vjp_v = jax.vjp(
            lambda vv: _msda._windowed_level_tiled(
                vv, o, w_, query_hw, radius), v)
        dv, = vjp_v(g)
        dvs.append(dv)
        dos.append(do)
        dws.append(dw)
    return tuple(dvs), tuple(dos), tuple(dws)


msda_windowed_group.defvjp(_group_fwd, _group_bwd)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4))
def msda_windowed_level(value, off, w, query_hw, radius):
    """Pallas forward windowed sampling for one level. Backward: Pallas
    d_off/d_w kernel + value-only XLA tiled VJP (see `_group_bwd`).

    Same contract as `_windowed_level_tiled`."""
    plan = _plan(query_hw, (value.shape[1], value.shape[2]), radius)
    return _pallas_level(value, off, w, query_hw, radius, plan)


def _fwd(value, off, w, query_hw, radius):
    return msda_windowed_level(value, off, w, query_hw, radius), (value,
                                                                  off, w)


def _use_pallas_bwd():
    """Legacy gate for the single-level wrapper's backward. The original
    unrolled backward kernel compiled pathologically slowly (~2 min/shape);
    `_kernel_bwd` has since been restructured with the column tile as a
    GRID dimension (one Mosaic body per P), which fixed compile time, and
    the product path (`msda_windowed_levels`) uses it unconditionally.
    This per-level wrapper keeps the XLA tiled VJP by default only because
    tests compare against it; opt in with GEDEPTH_MSDA_PALLAS_BWD=1."""
    import os
    return os.environ.get("GEDEPTH_MSDA_PALLAS_BWD") == "1"


def _bwd(query_hw, radius, res, g):
    value, off, w = res
    if _use_pallas_bwd():
        do, dw = msda_windowed_level_bwd_offw(value, off, w, g, query_hw,
                                              radius)
        _, vjp_v = jax.vjp(
            lambda v: _msda._windowed_level_tiled(
                v, off, w, query_hw, radius), value)
        dv, = vjp_v(g)
        return dv, do, dw
    _, vjp = jax.vjp(
        lambda v, o, ww_: _msda._windowed_level_tiled(
            v, o, ww_, query_hw, radius), value, off, w)
    return vjp(g)


msda_windowed_level.defvjp(_fwd, _bwd)
