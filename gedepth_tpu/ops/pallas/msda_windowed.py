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

Backward: `msda_windowed_level` is a custom_vjp whose backward runs the
XLA tiled implementation's VJP (training keeps the fused-remat XLA path;
this kernel is the inference hot path).
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


def _plan(query_hw, value_hw, radius):
    """Tile plan with TH*TW == 128 (q-on-lanes layout)."""
    Hq, Wq = query_hw
    Hv, Wv = value_hw
    TW = min(32, Wq)
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
    ext_x8 = _round8(ext_x)
    # VMEM budget: the row band + A scratch must fit alongside the blocked
    # inputs/outputs (~16 MB total). Oversized plans (coarse query grids
    # sampling fine levels blow the window up with the ratio) fall back to
    # the XLA tiled path.
    band_bytes = wh8 * ext_x8 * _D_LANES * 4
    amat_bytes = wh * ww * _Q_LANES * 4
    if band_bytes + amat_bytes > 8 * 1024 * 1024:
        return None
    return dict(TH=TH, TW=TW, nty=nty, ntx=ntx, wh=wh, ww=ww, wh8=wh8,
                base8=base8, roff=roff, rel_y=rel_y, res_y=res_y,
                ext_y8=ext_y8, base_x=base_x, rel_x=rel_x, res_x=res_x,
                ext_x8=ext_x8)


def _kernel(base8_ref, roff_ref, wy0_ref, fy_ref, wx0_ref, fxw0_ref,
            fxw1_ref, vp_ref, out_ref, band, sem, amat, *, plan, d):
    ntx = plan["ntx"]
    wh, ww, wh8 = plan["wh"], plan["ww"], plan["wh8"]
    base_x = plan["base_x"]

    b = pl.program_id(0)
    i = pl.program_id(1)
    j = pl.program_id(2)

    # value row band for this head: (wh8, ext_x8, 128)
    copy = pltpu.make_async_copy(
        vp_ref.at[b, j, pl.ds(base8_ref[i], wh8)], band, sem)
    copy.start()
    copy.wait()
    roff = roff_ref[i]

    iot_w = jax.lax.broadcasted_iota(jnp.int32, (ww, _Q_LANES), 0)
    iot_h = jax.lax.broadcasted_iota(jnp.int32, (wh, _Q_LANES), 0)

    for m in range(ntx):
        acc = jnp.zeros((wh, ww, _Q_LANES), jnp.float32)
        for p in range(plan["P"]):
            wy0 = wy0_ref[0, 0, 0, m, pl.ds(p, 1), :]   # (1, 128) int32
            fy = fy_ref[0, 0, 0, m, pl.ds(p, 1), :]     # (1, 128)
            wx0 = wx0_ref[0, 0, 0, m, pl.ds(p, 1), :]
            fxw0 = fxw0_ref[0, 0, 0, m, pl.ds(p, 1), :]
            fxw1 = fxw1_ref[0, 0, 0, m, pl.ds(p, 1), :]
            # (ww, 128): attention-weighted x-corner weights
            wx = ((iot_w == wx0).astype(fxw0.dtype) * fxw0
                  + (iot_w == (wx0 + 1)).astype(fxw0.dtype) * fxw1)
            # (wh, 128): y-corner weights
            wy = ((iot_h == wy0).astype(fy.dtype) * (1.0 - fy)
                  + (iot_h == (wy0 + 1)).astype(fy.dtype) * fy)
            acc = acc + wy[:, None, :] * wx[None, :, :]
        amat[...] = acc.reshape(wh * ww, _Q_LANES)

        win = band[pl.ds(roff, wh), pl.ds(int(base_x[m]), ww), :d]
        win = win.reshape(wh * ww, d)
        out_ref[0, 0, 0, m] = jax.lax.dot_general(
            amat[...], win.astype(amat.dtype),
            (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)


def _pallas_level(value, off, w, query_hw, radius, plan, interpret=False):
    """value: (B, Hv, Wv, h, d); off: (B, Nq, h, P, 2); w: (B, Nq, h, P)."""
    B, Hv, Wv, h, d = value.shape
    Hq, Wq = query_hw
    P = w.shape[-1]
    plan = dict(plan, P=P)
    TH, TW = plan["TH"], plan["TW"]
    nty, ntx = plan["nty"], plan["ntx"]
    wh, ww, wh8 = plan["wh"], plan["ww"], plan["wh8"]
    pad = radius + 3

    # ---- XLA-side prep: pad, fold corner weights, q-on-lanes layout ----
    off = off.reshape(B, Hq, Wq, h, P, 2)
    w = w.reshape(B, Hq, Wq, h, P)
    py, px = nty * TH - Hq, ntx * TW - Wq
    if py or px:
        off = jnp.pad(off, ((0, 0), (0, py), (0, px), (0, 0), (0, 0),
                            (0, 0)))
        w = jnp.pad(w, ((0, 0), (0, py), (0, px), (0, 0), (0, 0)))

    # (B, h, ext_y8, ext_x8, 128): head dim leads; minor dims tile-aligned
    vp = jnp.pad(value, ((0, 0), (pad, plan["ext_y8"] - Hv - pad),
                         (pad, plan["ext_x8"] - Wv - pad), (0, 0),
                         (0, _D_LANES - d)))
    vp = vp.transpose(0, 3, 1, 2, 4)

    res_y = jnp.asarray(plan["res_y"].reshape(nty * TH))
    rel_y = jnp.asarray(plan["rel_y"].reshape(nty * TH))
    res_x = jnp.asarray(plan["res_x"].reshape(ntx * TW))
    rel_x = jnp.asarray(plan["rel_x"].reshape(ntx * TW))

    ty = res_y[None, :, None, None, None] + off[..., 1]
    tx = res_x[None, None, :, None, None] + off[..., 0]
    y0 = jnp.floor(ty)
    x0 = jnp.floor(tx)
    fy = (ty - y0).astype(value.dtype)
    fx = (tx - x0).astype(value.dtype)
    wy0 = rel_y[None, :, None, None, None] + y0.astype(jnp.int32)
    wx0 = rel_x[None, None, :, None, None] + x0.astype(jnp.int32)
    fxw0 = (1.0 - fx) * w
    fxw1 = fx * w

    def to_lanes(x):
        # (B, Hqp, Wqp, h, P) -> (B, nty, h, ntx, P, TH*TW)
        x = x.reshape(B, nty, TH, ntx, TW, h, P)
        return x.transpose(0, 1, 5, 3, 6, 2, 4).reshape(
            B, nty, h, ntx, P, TH * TW)

    args = [to_lanes(a) for a in (wy0, fy, wx0, fxw0, fxw1)]

    # index maps receive the scalar-prefetch refs as trailing args
    qspec = pl.BlockSpec(
        (1, 1, 1, ntx, P, _Q_LANES),
        lambda b, i, j, *_: (b, i, j, 0, 0, 0),
        memory_space=pltpu.VMEM)

    out = pl.pallas_call(
        functools.partial(_kernel, plan=plan, d=d),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,
            grid=(B, nty, h),
            in_specs=[qspec] * 5 + [
                pl.BlockSpec(memory_space=pltpu.ANY)],   # padded value
            out_specs=pl.BlockSpec(
                (1, 1, 1, ntx, _Q_LANES, d),
                lambda b, i, j, *_: (b, i, j, 0, 0, 0),
                memory_space=pltpu.VMEM),
            scratch_shapes=[
                pltpu.VMEM((wh8, plan["ext_x8"], _D_LANES), value.dtype),
                pltpu.SemaphoreType.DMA,
                pltpu.VMEM((wh * ww, _Q_LANES), jnp.float32),
            ]),
        out_shape=jax.ShapeDtypeStruct((B, nty, h, ntx, _Q_LANES, d),
                                       jnp.float32),
        interpret=interpret,
    )(jnp.asarray(plan["base8"], jnp.int32),
      jnp.asarray(plan["roff"], jnp.int32), *args, vp)

    # (B, nty, h, ntx, TH*TW, d) -> (B, Nq, h, d)
    out = out.reshape(B, nty, h, ntx, TH, TW, d).transpose(
        0, 1, 4, 3, 5, 2, 6).reshape(B, nty * TH, ntx * TW, h, d)
    return out[:, :Hq, :Wq].reshape(B, Hq * Wq, h, d)


def pallas_windowed_supported(query_hw, value_hw, radius) -> bool:
    return _plan(query_hw, value_hw, radius) is not None


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4))
def msda_windowed_level(value, off, w, query_hw, radius):
    """Pallas forward / XLA-tiled backward windowed sampling for one level.

    Same contract as `_windowed_level_tiled`."""
    plan = _plan(query_hw, (value.shape[1], value.shape[2]), radius)
    return _pallas_level(value, off, w, query_hw, radius, plan)


def _fwd(value, off, w, query_hw, radius):
    return msda_windowed_level(value, off, w, query_hw, radius), (value,
                                                                  off, w)


def _bwd(query_hw, radius, res, g):
    value, off, w = res
    _, vjp = jax.vjp(
        lambda v, o, ww_: _msda._windowed_level_tiled(
            v, o, ww_, query_hw, radius), value, off, w)
    return vjp(g)


msda_windowed_level.defvjp(_fwd, _bwd)
