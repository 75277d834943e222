"""HAHI neck: heterogeneous attention across conv-stem and Swin features.

Re-design of the reference HAHIHeteroNeck (depth/models/necks/hahi.py:82-357):
  * HI — deformable self-attention over the 4 flattened transformer scales,
  * HA — deformable cross-attention with the conv-stem feature as query,
both on top of `gedepth_tpu.ops.msda` (the TPU replacement for mmcv's CUDA
MultiScaleDeformableAttention).

Positional encodings and reference grids are static per shape and folded in
as constants (sine PE over an all-valid mask == fixed grid tables).
"""
from __future__ import annotations

import os
from typing import Sequence

import numpy as np
import jax
import jax.numpy as jnp
import flax.linen as nn

from gedepth_tpu.models.layers import (
    ConvModule, sine_positional_encoding, xavier_uniform_init)
from gedepth_tpu.ops.msda import (
    msda_sample, msda_sample_windowed, shared_value_exts)


def _tile_query_order(H, W, th, tw):
    """Static tile-major raster permutation of H*W raster indices: queries
    are emitted tile by tile (row-major over tiles, row-major within a
    tile), so consecutive query chunks cover compact 2D regions. Returns
    an int32 index array of length H*W (a pure function of the shape —
    folded into the jitted program as a constant)."""
    ys = np.arange(H)
    xs = np.arange(W)
    yy, xx = np.meshgrid(ys, xs, indexing="ij")
    key = ((yy // th) * (-(-W // tw)) + (xx // tw)) * (th * tw) \
        + (yy % th) * tw + (xx % tw)
    return np.argsort(key.reshape(-1), kind="stable").astype(np.int32)


def _msda_offset_bias_init(num_heads, num_levels, num_points, scale=1.0):
    """Deformable-DETR sampling-offset bias: per-head unit directions scaled
    by point rank (x `scale`; windowed mode rescales to fill its window)."""
    thetas = np.arange(num_heads, dtype=np.float64) * (2 * np.pi / num_heads)
    grid = np.stack([np.cos(thetas), np.sin(thetas)], axis=-1)  # (h, 2)
    grid = grid / np.abs(grid).max(axis=-1, keepdims=True)
    grid = np.tile(grid[:, None, None, :], (1, num_levels, num_points, 1))
    for p in range(num_points):
        grid[:, :, p, :] *= (p + 1) * scale
    flat = grid.reshape(-1).astype(np.float32)

    def init(key, shape, dtype=jnp.float32):
        assert shape == flat.shape
        return jnp.asarray(flat, dtype)

    return init


def _grid_centers(query_shapes) -> np.ndarray:
    """Normalized (x, y) affine centers of one or more row-major query
    grids, concatenated: (sum HW, 2)."""
    pts = []
    for (H_, W_) in query_shapes:
        ys = (np.arange(H_, dtype=np.float32) + 0.5) / H_
        xs = (np.arange(W_, dtype=np.float32) + 0.5) / W_
        gy, gx = np.meshgrid(ys, xs, indexing="ij")
        pts.append(np.stack([gx.reshape(-1), gy.reshape(-1)], axis=-1))
    return np.concatenate(pts, axis=0)


def compat_delta_px(reference_points, offsets, query_shapes, spatial_shapes):
    """Exact per-sample displacement (in level pixels) from the query's own
    affine grid center, under the REFERENCE sampling semantics
    p = ref + off/normalizer (hahi.py:176,300 + mmcv MSDA).

    The 'windowed_compat' mode clamps this displacement to the +-R window;
    unclamped it reproduces the exact sampling positions bit-for-bit, so
    callers can also use it to quantify how much clamping distorts a given
    set of weights (fraction of |delta| > R per level).

    reference_points: (Nq, L, 2) or (B, Nq, L, 2) normalized (x, y).
    offsets: (B, Nq, h, L, P, 2) in level pixels.
    Returns (B, Nq, h, L, P, 2) level-pixel displacements.
    """
    centers = _grid_centers(query_shapes)                       # (Nq, 2)
    if reference_points.ndim == 3:
        ref = reference_points[None]
    else:
        ref = reference_points
    delta_norm = ref - jnp.asarray(centers)[None, :, None, :]   # (B',Nq,L,2)
    normalizer = np.array([[w_, h_] for (h_, w_) in spatial_shapes],
                          dtype=np.float32)                     # (L, 2)
    return (delta_norm[:, :, None, :, None, :]
            * jnp.asarray(normalizer)[None, None, None, :, None, :]
            + offsets)


def _flane_mode(query_shapes, spatial_shapes, radius):
    """Pick the projection-native lane path for windowed/compat sampling.

    Returns 'tpu' (Pallas kernel), 'interpret' (CPU interpreter — tests),
    or None (raw-layout path). Requires EVERY (query grid, level) pair to
    be kernel-eligible, since the lane path has no per-level XLA fallback.
    Env: GEDEPTH_MSDA_FLANE = auto (default) | 0 | interpret."""
    env = os.environ.get("GEDEPTH_MSDA_FLANE", "auto")
    if env == "0":
        return None
    from gedepth_tpu.ops.pallas.msda_windowed import _plan
    for q in query_shapes:
        for v in spatial_shapes:
            if _plan(tuple(q), tuple(v), radius) is None:
                return None
    if env == "interpret":
        return "interpret"
    if jax.default_backend() in ("cpu", "gpu", "cuda", "rocm"):
        return None
    return "tpu"


def _tile_queries(q, grid_hw, plan):
    """(B, Nq, C) row-major -> (B, Nt, C, Q=128) tile-major with queries
    on the MINOR axis — the rhs layout the lane projections contract
    against. The only data movement the lane path pays on the query side:
    a block permute (TW*C-contiguous chunks) plus a per-tile 2-D feature
    transpose, ~3x fewer bytes than relayouting off+w downstream."""
    B, Nq, C = q.shape
    Hq, Wq = grid_hw
    TH, TW, nty, ntx = plan["TH"], plan["TW"], plan["nty"], plan["ntx"]
    q = q.reshape(B, Hq, Wq, C)
    py, px = nty * TH - Hq, ntx * TW - Wq
    if py or px:
        q = jnp.pad(q, ((0, 0), (0, py), (0, px), (0, 0)))
    return q.reshape(B, nty, TH, ntx, TW, C).transpose(
        0, 1, 3, 5, 2, 4).reshape(B, nty * ntx, C, TH * TW)


def _flane_ref_base(reference_points, grid_hw, centers, spatial_shapes,
                    plan):
    """compat mode: (ref - grid_center) * normalizer in flane plane
    layout (1, L, 2, 1, B', nty, ntx, Q) — the constant part of the
    reference sampling displacement, broadcast over heads and points."""
    if reference_points.ndim == 3:
        ref = reference_points[None]
    else:
        ref = reference_points
    Br = ref.shape[0]
    L = ref.shape[2]
    delta_norm = ref - jnp.asarray(centers)[None, :, None, :]
    norm = np.array([[w_, h_] for (h_, w_) in spatial_shapes], np.float32)
    base = (delta_norm.astype(jnp.float32)
            * jnp.asarray(norm)[None, None, :, :])
    Hq, Wq = grid_hw
    TH, TW, nty, ntx = plan["TH"], plan["TW"], plan["nty"], plan["ntx"]
    base = base.reshape(Br, Hq, Wq, L, 2)
    py, px = nty * TH - Hq, ntx * TW - Wq
    if py or px:
        base = jnp.pad(base, ((0, 0), (0, py), (0, px), (0, 0), (0, 0)))
    base = base.reshape(Br, nty, TH, ntx, TW, L, 2).transpose(
        5, 6, 0, 1, 3, 2, 4).reshape(L, 2, Br, nty, ntx, TH * TW)
    return base[None, :, :, None]


def _lane_valid_mask(grid_hw, plan):
    """(nty, ntx, Q) {0,1} — 0 on tile-padding lanes (queries beyond the
    real grid); metric sums over lanes must exclude them."""
    Hq, Wq = grid_hw
    TH, TW, nty, ntx = plan["TH"], plan["TW"], plan["nty"], plan["ntx"]
    m = np.zeros((nty * TH, ntx * TW), np.float32)
    m[:Hq, :Wq] = 1.0
    return m.reshape(nty, TH, ntx, TW).transpose(0, 2, 1, 3).reshape(
        nty, ntx, TH * TW)


class _LaneDense(nn.Module):
    """Dense projection emitting (F, B, Nt, Q) from tile-ordered query
    features (B, Nt, C, Q): dot_general(kernel^T-contraction, q) lands the
    projected feature axis on MAJOR dims and queries on lanes, so the
    output pure-reshapes into the windowed kernel's flane block layout —
    no scrambled q-arg relayout (r5 trace: ~7 ms/iter at protocol res).
    Parameter tree is IDENTICAL to nn.Dense (kernel (C, F), bias (F,)):
    converted reference checkpoints load unchanged. `col_perm` statically
    reorders the OUTPUT features (e.g. (h,L,P,2) -> (h,L,2,P) so x/y
    planes land on sublane blocks [0,P) / [P,2P))."""
    features: int
    kernel_init: object = xavier_uniform_init
    bias_init: object = nn.initializers.zeros
    col_perm: tuple = None

    @nn.compact
    def __call__(self, q_tiles):
        C = q_tiles.shape[2]
        kernel = self.param("kernel", self.kernel_init, (C, self.features))
        bias = self.param("bias", self.bias_init, (self.features,))
        if self.col_perm is not None:
            perm = np.asarray(self.col_perm)
            kernel = kernel[:, perm]
            bias = bias[perm]
        out = jax.lax.dot_general(
            kernel.astype(q_tiles.dtype), q_tiles,
            dimension_numbers=(((0,), (2,)), ((), ())))
        return out + bias[:, None, None, None].astype(out.dtype)


class MSDeformAttention(nn.Module):
    """Deformable attention layer (query side); mmcv-compatible params.

    sampling='windowed' is the TPU-native dense mode (see ops/msda.py):
    reference points are the queries' own grid centers, offsets are bounded
    to +-window_radius level pixels, and sampling is gather-free. It
    requires `query_shapes` — the query token set as one or more row-major
    grids (one grid per query level).

    sampling='windowed_compat' keeps the REFERENCE parameter tree and
    sampling formula (learned reference points + unscaled mmcv offset-bias
    init, p = ref + off/normalizer) but routes the sample through the same
    dense windowed machinery by hard-clamping the displacement from the
    query's affine grid center to +-window_radius level pixels. A converted
    reference checkpoint loads into it unchanged; samples the trained model
    takes within the window are EXACT bilinear, samples beyond it snap to
    the window edge (quantified per checkpoint via `compat_delta_px`)."""
    embed_dims: int = 512
    num_heads: int = 8
    num_levels: int = 4
    num_points: int = 8
    dropout: float = 0.1
    sampling: str = "bilinear"
    window_radius: int = 4
    # Rematerialise the sampling op's gathered/extracted tensors in the
    # backward pass (trades one extra sampling pass for ~100x less live
    # activation memory — see ops/msda.py msda_sample docstring). Turning
    # it off is a remat-granularity knob for small-activation regimes.
    msda_remat: bool = True
    # Windowed/compat modes only: carry the projected VALUE maps through
    # the sampler in bfloat16 — halves the kernel's band DMA bytes and
    # runs the contraction as a native bf16 MXU dot with f32 accumulation
    # (ops/pallas/msda_windowed.py). Offsets, attention weights, and the
    # query/output projections stay f32. A surgical memory-bandwidth
    # knob: measure the abs-rel delta before marketing it on a parity
    # config (see tests/test_composite_deltas.py round-5 rows).
    value_bf16: bool = False

    @nn.compact
    def __call__(self, query, value, query_pos, reference_points,
                 spatial_shapes, deterministic: bool = True,
                 query_shapes=None):
        """
        query: (B, Nq, C); value: (B, Nv, C) flattened over levels.
        query_pos: (B or 1, Nq, C) additive positional encoding.
        reference_points: (Nq, L, 2) or (B, Nq, L, 2) normalized (x, y);
          ignored in windowed mode (grid centers are implied).
        spatial_shapes: static tuple of (H, W) per level; sum(H*W) == Nv.
        query_shapes: static tuple of (H, W) query grids, required for
          windowed mode; sum(H*W) == Nq.
        """
        B, Nq, C = query.shape
        identity = query
        if query_pos is not None:
            query = query + query_pos
        h, L, P = self.num_heads, self.num_levels, self.num_points
        head_dim = C // h
        windowed = self.sampling == "windowed"
        compat = self.sampling == "windowed_compat"
        flane = None
        if windowed or compat:
            assert query_shapes is not None, \
                "windowed sampling needs the query grid(s)"
            flane = _flane_mode(query_shapes, spatial_shapes,
                                self.window_radius)

        value_proj = nn.Dense(C, kernel_init=xavier_uniform_init,
                              name="value_proj")(value)

        bias_scale = self.window_radius / P if windowed else 1.0
        if flane is None:
            offsets = nn.Dense(h * L * P * 2,
                               kernel_init=nn.initializers.zeros,
                               bias_init=_msda_offset_bias_init(
                                   h, L, P, scale=bias_scale),
                               name="sampling_offsets")(query)
            offsets = offsets.reshape(B, Nq, h, L, P, 2)

            weights = nn.Dense(h * L * P, kernel_init=nn.initializers.zeros,
                               bias_init=nn.initializers.zeros,
                               name="attention_weights")(query)
            weights = jax.nn.softmax(
                weights.reshape(B, Nq, h, L * P), axis=-1)
            weights = weights.reshape(B, Nq, h, L, P)

        # split flattened value into per-level maps
        levels = []
        start = 0
        for (H_, W_) in spatial_shapes:
            n = H_ * W_
            levels.append(value_proj[:, start:start + n].reshape(
                B, H_, W_, h, head_dim))
            start += n

        if windowed or compat:
            if self.value_bf16:
                levels = [l.astype(jnp.bfloat16) for l in levels]
            R = float(self.window_radius)
            if flane is not None:
                # Projection-native lane path: queries are block-permuted
                # into tile order ONCE, the offset/weight projections emit
                # the kernel's flane block layout directly (see _LaneDense),
                # and the per-query-grid scrambled q-arg relayout of the raw
                # path (~7 ms/iter at protocol res, r5 trace) disappears.
                from gedepth_tpu.ops.pallas.msda_windowed import (
                    _plan, msda_windowed_levels_flanes)
                interpret = flane == "interpret"
                # output features (h, L, P, 2) -> (h, L, 2, P): x points on
                # sublanes [0, P), y on [P, 2P) per (head, level) plane
                off_perm = tuple(
                    np.arange(h * L * P * 2).reshape(h, L, P, 2)
                    .transpose(0, 1, 3, 2).reshape(-1).tolist())
                off_proj = _LaneDense(
                    h * L * P * 2, kernel_init=nn.initializers.zeros,
                    bias_init=_msda_offset_bias_init(
                        h, L, P, scale=bias_scale),
                    col_perm=off_perm, name="sampling_offsets")
                w_proj = _LaneDense(
                    h * L * P, kernel_init=nn.initializers.zeros,
                    bias_init=nn.initializers.zeros,
                    name="attention_weights")
                exts = shared_value_exts(tuple(query_shapes),
                                         tuple(spatial_shapes),
                                         self.window_radius)
                sample = msda_windowed_levels_flanes
                if self.msda_remat:
                    sample = jax.checkpoint(
                        msda_windowed_levels_flanes,
                        static_argnums=(3, 4, 5, 6))
                levels_t = tuple(levels)
                outs = []
                start = 0
                clamp_num = 0.0
                for (Hq, Wq) in query_shapes:
                    n = Hq * Wq
                    plan = _plan((Hq, Wq), spatial_shapes[0],
                                 self.window_radius)
                    nty, ntx = plan["nty"], plan["ntx"]
                    Ql = plan["TH"] * plan["TW"]
                    q_t = _tile_queries(query[:, start:start + n],
                                        (Hq, Wq), plan)
                    off_f = off_proj(q_t).reshape(
                        h, L, 2 * P, B, nty, ntx, Ql)
                    w_f = w_proj(q_t)
                    w_f = jax.nn.softmax(
                        w_f.reshape(h, L * P, B, nty, ntx, Ql),
                        axis=1).reshape(h, L, P, B, nty, ntx, Ql)
                    off_f = off_f.astype(jnp.float32)
                    w_f = w_f.astype(jnp.float32)
                    if compat:
                        if reference_points.ndim == 3:
                            ref_g = reference_points[start:start + n]
                        else:
                            ref_g = reference_points[:, start:start + n]
                        base = _flane_ref_base(
                            ref_g, (Hq, Wq), _grid_centers([(Hq, Wq)]),
                            spatial_shapes, plan)
                        delta = off_f.reshape(
                            h, L, 2, P, B, nty, ntx, Ql) + base
                        clamped = (jnp.abs(delta) > R).any(axis=2)
                        valid = jnp.asarray(
                            _lane_valid_mask((Hq, Wq), plan))
                        clamp_num = clamp_num + jnp.sum(
                            w_f * clamped
                            * valid[None, None, None, None])
                        off_f = jnp.clip(delta, -R, R).reshape(
                            h, L, 2 * P, B, nty, ntx, Ql)
                    else:
                        off_f = R * jnp.tanh(off_f / R)
                    term = sample(levels_t, off_f, w_f, (Hq, Wq),
                                  self.window_radius, exts, interpret)
                    outs.append(term.astype(levels_t[0].dtype)
                                .reshape(B, n, C))
                    start += n
                assert start == Nq
                if compat:
                    self.sow("intermediates", "compat_clamp_mass",
                             clamp_num / (B * Nq * h))
                out = (jnp.concatenate(outs, axis=1) if len(outs) > 1
                       else outs[0])
                out = nn.Dense(C, kernel_init=xavier_uniform_init,
                               name="output_proj")(out)
                if self.dropout > 0:
                    out = nn.Dropout(self.dropout)(
                        out, deterministic=deterministic)
                return identity + out
            if compat:
                delta = compat_delta_px(reference_points, offsets,
                                        query_shapes, spatial_shapes)
                # attention mass landing outside the window (snapped to the
                # edge) — the per-checkpoint approximation metric; fetch via
                # apply(..., mutable=["intermediates"])
                clamped = (jnp.abs(delta) > R).any(-1).astype(weights.dtype)
                self.sow("intermediates", "compat_clamp_mass",
                         jnp.sum(weights * clamped) / (B * Nq * h))
                off_px = jnp.clip(delta, -R, R)
            else:
                off_px = R * jnp.tanh(offsets / R)
            # shared padded-value extents: one pad+transpose per level
            # serves every query grid of this attention (XLA CSE)
            exts = shared_value_exts(tuple(query_shapes),
                                     tuple(spatial_shapes),
                                     self.window_radius)
            outs = []
            start = 0
            for (Hq, Wq) in query_shapes:
                n = Hq * Wq
                outs.append(msda_sample_windowed(
                    levels, off_px[:, start:start + n],
                    weights[:, start:start + n], (Hq, Wq),
                    radius=self.window_radius, remat=self.msda_remat,
                    value_exts=exts))
                start += n
            assert start == Nq
            out = jnp.concatenate(outs, axis=1) if len(outs) > 1 else outs[0]
        else:
            # offsets are in feature-map pixels; normalizer is (W, H) per
            # level to match the (x, y) ordering of the locations.
            normalizer = np.array([[w_, h_] for (h_, w_) in spatial_shapes],
                                  dtype=np.float32)  # (L, 2)
            if reference_points.ndim == 3:
                ref = reference_points[None, :, None, :, None, :]
            else:
                ref = reference_points[:, :, None, :, None, :]
            locs = ref + offsets / jnp.asarray(normalizer)[None, None, None,
                                                           :, None, :]
            # GEDEPTH_MSDA_EXACT_IMPL: 'per_level' (default) | 'flat'.
            # The r01->r03 0.747->0.57 img/s regression on this exact-
            # semantics path traced to round 2 defaulting to 'flat', which
            # wins at half res (253 vs 382 ms) but loses at the 352x1216
            # protocol res (0.57 vs 0.754 img/s measured r4) — TPU gather
            # cost is locality-dependent and the flat table's index spread
            # grows with resolution. See NOTES.md round 4.
            import os
            out = msda_sample(levels, locs, weights,
                              sampling=self.sampling,
                              remat=self.msda_remat,
                              impl=os.environ.get(
                                  "GEDEPTH_MSDA_EXACT_IMPL", "per_level"))
        out = nn.Dense(C, kernel_init=xavier_uniform_init,
                       name="output_proj")(out)
        if self.dropout > 0:
            out = nn.Dropout(self.dropout)(out, deterministic=deterministic)
        return identity + out


def _center_reference_points(spatial_shapes) -> np.ndarray:
    """Per-pixel normalized centers across levels: (sum HW, L, 2) (x, y)."""
    pts = []
    for (H_, W_) in spatial_shapes:
        ys = (np.arange(H_, dtype=np.float32) + 0.5) / H_
        xs = (np.arange(W_, dtype=np.float32) + 0.5) / W_
        gy, gx = np.meshgrid(ys, xs, indexing="ij")
        pts.append(np.stack([gx.reshape(-1), gy.reshape(-1)], axis=-1))
    ref = np.concatenate(pts, axis=0)  # (N, 2)
    L = len(spatial_shapes)
    return np.tile(ref[:, None, :], (1, L, 1))


class HAHINeck(nn.Module):
    """5-scale neck: [conv stem, 4 swin scales] -> same shapes out.

    sampling: 'bilinear' (exact mmcv semantics) | 'nearest' | 'windowed'
    (TPU-native dense mode, changed parameter tree) | 'windowed_compat'
    (reference parameter tree — learned cross-attn reference points,
    unscaled offset bias — with the displacement clamped into the dense
    +-window_radius window; loads the same converted checkpoints as
    'bilinear')."""
    in_channels: Sequence[int] = (64, 192, 384, 768, 1536)
    out_channels: Sequence[int] = (64, 192, 384, 768, 1536)
    embed_dim: int = 512
    num_heads: int = 8
    num_points: int = 8
    pos_num_feats: int = 0  # 0 -> embed_dim // 2
    self_att: bool = True
    cross_att: bool = True
    sampling: str = "bilinear"
    window_radius: int = 4
    # First transformer level whose tokens QUERY the HI self-attention.
    # 0 = all levels (reference semantics). 1 = skip the finest level's
    # queries (it still serves as VALUES and keeps its lateral path) —
    # the Mask2Former pixel-decoder design (deformable encoder on the
    # coarser strides only): the finest grid is ~75% of the query tokens
    # and dominates the deformable-attention cost. Parameter shapes are
    # IDENTICAL for every setting (the query-side Denses are per-token),
    # but a checkpoint trained at one setting expects its own semantics —
    # this is a train-from-scratch knob for the TPU-native flagship, not a
    # drop-in eval mode.
    hi_min_level: int = 0
    # remat granularity of the deformable sampling (see MSDeformAttention)
    msda_remat: bool = True
    # bf16 VALUE maps through the windowed sampler (see MSDeformAttention)
    value_bf16: bool = False

    @nn.compact
    def __call__(self, inputs, train: bool = False):
        deterministic = not train
        assert len(inputs) == len(self.in_channels)
        num_feats = self.pos_num_feats or self.embed_dim // 2
        feats = [
            ConvModule(c_out, kernel_size=1, use_norm=True, act=nn.relu,
                       name=f"lateral{i}")(x, train=train)
            for i, (x, c_out) in enumerate(zip(inputs, self.out_channels))
        ]
        feat_conv, feats_trans = feats[0], feats[1:]
        L = len(feats_trans)
        spatial_shapes = tuple((f.shape[1], f.shape[2]) for f in feats_trans)

        level_embed = self.param(
            "level_embed", nn.initializers.normal(stddev=1.0),
            (L, self.embed_dim))

        src_flat, pos_flat = [], []
        for i, f in enumerate(feats_trans):
            B, H_, W_, _ = f.shape
            proj = ConvModule(self.embed_dim, kernel_size=1, use_norm=True,
                              act=nn.relu, name=f"trans_proj{i}")(
                                  f, train=train)
            src_flat.append(proj.reshape(B, H_ * W_, self.embed_dim))
            pos = sine_positional_encoding(H_, W_, num_feats)
            pos = jnp.asarray(pos.reshape(1, H_ * W_, -1), proj.dtype)
            pos_flat.append(pos + level_embed[i][None, None, :])
        src = jnp.concatenate(src_flat, axis=1)
        pos = jnp.concatenate(pos_flat, axis=1)

        windowed = self.sampling == "windowed"
        # self-attention reference points ARE the grid centers, so windowed
        # mode changes only the offset bounding for the HI stage.
        ref_self = (None if windowed
                    else jnp.asarray(_center_reference_points(spatial_shapes)))
        if self.self_att:
            lo = self.hi_min_level
            assert 0 <= lo < L
            n0 = sum(h_ * w_ for (h_, w_) in spatial_shapes[:lo])
            attn = MSDeformAttention(
                self.embed_dim, self.num_heads, L, self.num_points,
                sampling=self.sampling, window_radius=self.window_radius,
                msda_remat=self.msda_remat, value_bf16=self.value_bf16,
                name="self_attn")
            if lo == 0:
                src = attn(src, src, pos, ref_self, spatial_shapes,
                           deterministic, query_shapes=spatial_shapes)
            else:
                upd = attn(src[:, n0:], src, pos[:, n0:],
                           None if ref_self is None else ref_self[n0:],
                           spatial_shapes, deterministic,
                           query_shapes=spatial_shapes[lo:])
                src = jnp.concatenate([src[:, :n0], upd], axis=1)

        # HA: conv-stem query cross-attends into the token pyramid.
        B, Hc, Wc, _ = feat_conv.shape
        conv_proj = ConvModule(self.embed_dim, kernel_size=1, use_norm=True,
                               act=nn.relu, name="conv_proj")(
                                   feat_conv, train=train)
        query = conv_proj.reshape(B, Hc * Wc, self.embed_dim)
        qpos = sine_positional_encoding(Hc, Wc, num_feats)
        qpos = jnp.asarray(qpos.reshape(1, Hc * Wc, -1), query.dtype)
        if windowed:
            # grid centers replace sigmoid(Linear(qpos)) — qpos is a
            # constant, so the reference's learned points cannot be
            # content-dependent anyway; the grid is the TPU-native choice.
            ref_q = None
        else:
            ref_q = nn.Dense(2, kernel_init=xavier_uniform_init,
                             bias_init=nn.initializers.zeros,
                             name="reference_points")(qpos)
            ref_q = jax.nn.sigmoid(ref_q)                  # (1, Nq, 2)
            ref_q = jnp.tile(ref_q[:, :, None, :], (1, 1, L, 1))
            ref_q = jnp.broadcast_to(ref_q, (B,) + ref_q.shape[1:])
        # Locality experiment (NOTES r2: TPU gather cost is
        # LOCALITY-DEPENDENT; VERDICT r4 item 4): reorder the cross-attn
        # queries into square tiles so each 4096-query gather chunk samples
        # a compact 2D region of every value level instead of a full-width
        # 7-row band. Pointwise ops (Dense offsets/weights, softmax) are
        # order-agnostic, so only one pre-permute of query/qpos/ref and one
        # inverse post-permute of the output are added. Exact/bilinear
        # sampling only (windowed mode owns its own tiling geometry).
        # Env: GEDEPTH_MSDA_QUERY_ORDER=tile[:TH,TW] (default raster).
        perm = inv_perm = None
        order = os.environ.get("GEDEPTH_MSDA_QUERY_ORDER", "raster")
        if (self.cross_att and not windowed and order.startswith("tile")):
            th, tw = 64, 64
            if ":" in order:
                th, tw = (int(v) for v in order.split(":")[1].split(","))
            perm = _tile_query_order(Hc, Wc, th, tw)
            inv_perm = np.argsort(perm)
            query = query[:, perm]
            qpos = qpos[:, perm]
            if ref_q is not None:
                ref_q = ref_q[:, perm]
        if self.cross_att:
            fused = MSDeformAttention(
                self.embed_dim, self.num_heads, L, self.num_points,
                sampling=self.sampling, window_radius=self.window_radius,
                msda_remat=self.msda_remat, value_bf16=self.value_bf16,
                name="cross_attn")(query, src, qpos, ref_q, spatial_shapes,
                                   deterministic, query_shapes=((Hc, Wc),))
        else:
            fused = query
        if inv_perm is not None:
            fused = fused[:, inv_perm]
        fused = fused.reshape(B, Hc, Wc, self.embed_dim)
        out_conv = ConvModule(self.out_channels[0], kernel_size=3,
                              use_norm=True, act=nn.relu, name="conv_fusion")(
            jnp.concatenate([fused, feat_conv], axis=-1), train=train)

        outs = [out_conv]
        start = 0
        for i, f in enumerate(feats_trans):
            B, H_, W_, _ = f.shape
            n = H_ * W_
            tok = src[:, start:start + n].reshape(B, H_, W_, self.embed_dim)
            start += n
            merged = jnp.concatenate([f, tok], axis=-1)
            outs.append(ConvModule(self.out_channels[i + 1], kernel_size=3,
                                   use_norm=True, act=nn.relu,
                                   name=f"trans_fusion{i}")(
                merged, train=train))
        return outs
