"""ASNDepthHeadV2 — full-parity TPU implementation.

The reference's adaptive-surface-normal head
(/root/reference/depth/models/decode_heads/asn_depth_head.py, 443 lines) is
a dead experiment variant (no shipped config constructs it) built from four
pieces, all re-designed here for TPU:

  * AdaptiveDepth2normal (asn_depth_head.py:14-210): depth -> camera-frame
    point cloud -> k*k neighborhood patches -> normals of randomly sampled
    point TRIANGLES, combined with a softmax over triangle weights (validity
    x triangle area x pixel-adaptive guidance affinity).
    -> `adaptive_depth_to_normals` (static shifted-slice patches, no
    unfold/gather; constant triangle index table folded at trace time).
  * packernel2d gaussian guidance kernel (pac.py:133-222) + the smoothing /
    renormalisation in DepthNormalConversion (asn_depth_head.py:241-274)
    -> `pa_gaussian_kernel` / `asn_guide_weight`.
  * SegHead (asn_depth_head.py:289-332): 3x(conv-BN-relu) fuse + per-key 1x1
    classifier + sigmoid + x scale_factor bilinear align_corners=True
    upsample -> `ASNSegHead`.
  * ASNDepthHeadV2 (asn_depth_head.py:345-443): disparity head + guidance
    head + disp->depth post-processor + train-time normal estimation and
    the supervised/smoothness/surface-normal loss dict -> `ASNDepthHeadV2`
    (+ `asn_losses`).

Randomness: the reference draws the triangle triplet table from the GLOBAL
numpy RNG on every forward (asn_depth_head.py:70-75) — untraceable and
non-reproducible by construction. Here the table is drawn once, host-side,
from an explicit np.random.Generator (`select_triangles`) and enters the
jitted computation as a static constant — same distribution, deterministic
under this repo's seeding convention, and a fixed shape for XLA.
"""
from __future__ import annotations

from typing import Optional, Sequence

import numpy as np
import jax
import jax.numpy as jnp
import flax.linen as nn

from gedepth_tpu.models.layers import torch_conv_kernel_init
from gedepth_tpu.ops.resize import resize_bilinear


def select_triangles(k_size: int = 3, sample_num: int = 40,
                     rng: Optional[np.random.Generator] = None,
                     area_type: int = 1, area_thred: float = 0.0):
    """Sample and filter triangle triplets inside a k*k window.

    Reference semantics (asn_depth_head.py:65-120): draw `sample_num`
    triplets of window indices with replacement, sort each, drop duplicates
    and near-degenerate triangles (|cross-product area| <= thred, with
    thred = k^2/2 * area_thred), orient every kept triangle positively
    (swap p2/p3 when the signed area is negative), weight by area^area_type
    and normalise the weights to sum 1.

    Returns (triplets (n, 3) int32, area_weights (n,) float32) — both
    host-side numpy, meant to be closed over as constants by a jitted fn.
    """
    rng = rng or np.random.default_rng(0)
    num = k_size * k_size
    thred = (k_size ** 2 * 0.5) * area_thred
    cols = []
    for _ in range(3):
        p = rng.choice(num, int(sample_num), replace=True)
        rng.shuffle(p)
        cols.append(p)
    index_list = np.stack(cols, axis=1)

    valid, seen, areas = [], set(), []
    for row in index_list:
        p1, p2, p3 = np.sort(row)
        if (p1, p2, p3) in seen:
            continue
        x1, y1 = p1 % k_size, p1 // k_size
        x2, y2 = p2 % k_size, p2 // k_size
        x3, y3 = p3 % k_size, p3 // k_size
        area = (x2 - x1) * (y3 - y1) - (y2 - y1) * (x3 - x1)
        if area > thred:
            valid.append([p1, p2, p3])
            seen.add((p1, p2, p3))
            areas.append(area)
        elif area < -thred:
            valid.append([p1, p3, p2])
            seen.add((p1, p3, p2))
            areas.append(-area)
    if not valid:
        raise ValueError("no valid triangles sampled; raise sample_num")
    triplets = np.asarray(valid, dtype=np.int32)
    w = np.asarray(areas, dtype=np.float64) ** area_type
    return triplets, (w / w.sum()).astype(np.float32)


def unfold_patches(x, k_size: int, dilation: int = 1):
    """torch.nn.Unfold analogue on NHWC: (B, H, W, C) ->
    (B, H, W, k*k, C) zero-padded neighborhoods, taps in the row-major
    window order torch uses. Static shifted slices — no gather."""
    d = dilation
    pad = d * (k_size - 1) // 2
    B, H, W, C = x.shape
    xp = jnp.pad(x, ((0, 0), (pad, pad), (pad, pad), (0, 0)))
    taps = [xp[:, dy * d:dy * d + H, dx * d:dx * d + W, :]
            for dy in range(k_size) for dx in range(k_size)]
    return jnp.stack(taps, axis=3)


def _border_mask(h: int, w: int, k_size: int, dilation: int, dtype):
    """nd2col of an all-ones map: 1 where the tap falls inside the image
    (packernel2d's mask_pattern, pac.py:152-163)."""
    ones = jnp.ones((1, h, w, 1), dtype)
    return unfold_patches(ones, k_size, dilation)[..., 0]  # (1, H, W, k*k)


def pa_gaussian_kernel(guide, k_size: int = 3, dilation: int = 1):
    """packernel2d(kernel_type='gaussian', channel_wise=False,
    normalize_kernel=True) — pac.py:133-222.

    Per pixel p and window tap q: exp(-0.5 * sum_c (g_q - g_p)^2), where
    the center feature is the UNsmoothed tap at the window center
    (smooth_kernel_type='none', pac.py:175-177). Out-of-image taps are
    zeroed via the ones-pattern mask, then the kernel is normalised to sum
    1 over taps (empty positions divide by 1).

    guide: (B, H, W, C) -> (B, H, W, k*k).
    """
    B, H, W, C = guide.shape
    patches = unfold_patches(guide, k_size, dilation)      # (B,H,W,kk,C)
    diff = patches - guide[:, :, :, None, :]
    aff = jnp.exp(-0.5 * jnp.sum(diff * diff, axis=-1))    # (B,H,W,kk)
    aff = aff * _border_mask(H, W, k_size, dilation, aff.dtype)
    norm = jnp.sum(aff, axis=-1, keepdims=True)
    return aff / (norm + (norm == 0))


def asn_guide_weight(guidance, k_size: int = 3, dilation: int = 1):
    """DepthNormalConversion's kernel smoothing (asn_depth_head.py:255-268):
    add the uniform 1/k^2 kernel, renormalise, and scale by k^2 so the taps
    average ~1 (the reference's 'scale to larger values')."""
    kk = k_size * k_size
    gw = pa_gaussian_kernel(guidance, k_size, dilation) + 1.0 / kk
    norm = jnp.sum(gw, axis=-1, keepdims=True)
    return gw / norm * kk


def adaptive_depth_to_normals(depth, intrinsic, triplets, area_weights,
                              guide_weight=None, k_size: int = 3,
                              dilation: int = 1, depth_max: float = 10.0,
                              if_area: bool = True, if_pa: bool = True):
    """AdaptiveDepth2normal.forward (asn_depth_head.py:122-210), TPU-style.

    Args:
      depth:        (B, H, W) metric depth.
      intrinsic:    (B, 3, 3) camera intrinsics.
      triplets:     (n, 3) int window-index triangles (select_triangles) —
                    a host constant, folded into the trace.
      area_weights: (n,) normalised triangle areas.
      guide_weight: optional (B, H, W, k*k) pixel-adaptive tap weights
                    (asn_guide_weight); None = all-ones.
      depth_max:    validity upper bound (reference default 10 — NYU scale).

    Returns (B, H, W, 3) unit normals, zeroed where the center pixel's
    depth is invalid.

    Design notes vs the reference: the k*k point patches come from static
    shifted slices; the (n, 3) triangle table indexes the tap axis with
    constant indices (XLA folds this to slices — no dynamic gather); the
    validity/area/guidance weight product and the softmax over triangles
    are identical, including the quirk that softmax (not masking) is what
    suppresses invalid triangles, so all-invalid neighborhoods still
    average all triangle normals uniformly before the center-validity zero.
    """
    B, H, W = depth.shape
    f32 = jnp.float32
    depth = depth.astype(f32)
    K_inv = jnp.linalg.inv(intrinsic.astype(f32))          # (B, 3, 3)

    u = jnp.arange(W, dtype=f32)[None, None, :]
    v = jnp.arange(H, dtype=f32)[None, :, None]
    pix = jnp.stack([jnp.broadcast_to(u, (1, H, W)),
                     jnp.broadcast_to(v, (1, H, W)),
                     jnp.ones((1, H, W), f32)], axis=-1)   # (1, H, W, 3)
    rays = jnp.einsum("bij,lhwj->bhwi", K_inv, pix)        # (B, H, W, 3)
    points = rays * depth[..., None]

    patches = unfold_patches(points, k_size, dilation)     # (B,H,W,kk,3)
    tri = jnp.take(patches, jnp.asarray(triplets).reshape(-1), axis=3)
    tri = tri.reshape(B, H, W, -1, 3, 3)                   # (B,H,W,n,3,3)
    v01 = tri[..., 1, :] - tri[..., 0, :]
    v02 = tri[..., 2, :] - tri[..., 0, :]
    normals = jnp.cross(v01, v02)
    normals = normals / (jnp.linalg.norm(normals, axis=-1,
                                         keepdims=True) + 1e-5)

    valid = ((depth > 0) & (depth < depth_max)).astype(f32)
    vpatch = unfold_patches(valid[..., None], k_size, dilation)[..., 0]
    vtri = jnp.take(vpatch, jnp.asarray(triplets).reshape(-1), axis=3)
    vtri = vtri.reshape(B, H, W, -1, 3)
    w = vtri[..., 0] * vtri[..., 1] * vtri[..., 2]         # (B,H,W,n)

    if if_area:
        w = w * jnp.asarray(area_weights)[None, None, None, :]
    if if_pa:
        if guide_weight is None:
            guide_weight = jnp.ones((B, H, W, k_size * k_size), f32)
        gtri = jnp.take(guide_weight.astype(f32),
                        jnp.asarray(triplets).reshape(-1), axis=3)
        gtri = gtri.reshape(B, H, W, -1, 3)
        w = w * gtri[..., 0] * gtri[..., 1] * gtri[..., 2]

    w = jax.nn.softmax(w, axis=-1)
    n = jnp.sum(normals * w[..., None], axis=3)            # (B, H, W, 3)
    n = n / (jnp.linalg.norm(n, axis=-1, keepdims=True) + 1e-5)
    return n * valid[..., None]


def depth_normal_conversion(depth, intrinsic, guidance, triplets,
                            area_weights, k_size: int = 3,
                            dilation: int = 1, depth_max: float = 10.0,
                            if_area: bool = True, if_pa: bool = True):
    """DepthNormalConversion.forward (asn_depth_head.py:255-274): build the
    smoothed pixel-adaptive guidance kernel (or None) and estimate normals.

    depth (B, H, W); guidance (B, H, W, C) or None; intrinsic (B, 3, 3).
    """
    gw = None
    if guidance is not None:
        gw = asn_guide_weight(guidance, k_size, dilation)
    return adaptive_depth_to_normals(
        depth, intrinsic, triplets, area_weights, gw, k_size, dilation,
        depth_max, if_area=if_area, if_pa=if_pa)


class ASNSegHead(nn.Module):
    """SegHead (asn_depth_head.py:289-332): 3 x (3x3 conv no-bias -> BN ->
    ReLU) fuse trunk, one 1x1 classifier per key, sigmoid, then a
    x scale_factor bilinear align_corners=True upsample.

    Returns {key: map}. (The reference's forward returns only the LAST
    key's tensor — an apparent bug that is invisible in practice because
    both usages pass a single key; we return the dict.)
    """
    mid_channels: int
    output_channels: Sequence[int] = (1,)
    class_key: Sequence[str] = ("disparity",)
    scale_factor: float = 8.0

    @nn.compact
    def __call__(self, x, train: bool = False):
        for i in range(3):
            x = nn.Conv(self.mid_channels, (3, 3),
                        padding=[(1, 1), (1, 1)], use_bias=False,
                        kernel_init=torch_conv_kernel_init,
                        name=f"fuse{i}")(x)
            x = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                             epsilon=1e-5, name=f"bn{i}")(x)
            x = nn.relu(x)
        out = {}
        for key, ch in zip(self.class_key, self.output_channels):
            m = nn.Conv(ch, (1, 1), kernel_init=torch_conv_kernel_init,
                        name=f"cls_{key}")(x)
            m = jax.nn.sigmoid(m)
            oh = int(round(m.shape[1] * self.scale_factor))
            ow = int(round(m.shape[2] * self.scale_factor))
            out[key] = resize_bilinear(m, (oh, ow), align_corners=True)
        return out


def disp_to_depth(disp, min_depth: float, max_depth: float):
    """Monodepth-convention post-processor: sigmoid disparity in [0, 1] ->
    metric depth via linear inverse-depth scaling. The reference delegates
    this to an arbitrary `post_processor` neck built from a config it never
    ships (asn_depth_head.py:368 — the variant is dead upstream); this is
    the conventional choice and is swappable via ASNDepthHeadV2.post."""
    min_disp, max_disp = 1.0 / max_depth, 1.0 / min_depth
    return 1.0 / (min_disp + (max_disp - min_disp) * disp)


class ASNDepthHeadV2(nn.Module):
    """Full-parity ASN head (asn_depth_head.py:345-443).

    __call__(features (B, H, W, C), intrinsic (B, 3, 3), train) returns
    {'disp', 'depth', 'guidance', 'normals'} — normals only when intrinsic
    is given (the reference computes them in forward_train only;
    simple_test returns disp/depth, asn_depth_head.py:431-437).
    """
    input_features_dim: int = 128
    scale_factor: float = 8.0
    k_size: int = 3
    sample_num: int = 40
    min_depth: float = 0.1
    max_depth: float = 10.0
    triangle_seed: int = 0

    def setup(self):
        self.depth_head = ASNSegHead(
            self.input_features_dim, (1,), ("disparity",),
            self.scale_factor, name="depth_head")
        self.guidance_head = ASNSegHead(
            self.input_features_dim, (1,), ("guidance",),
            self.scale_factor, name="guidance_head")
        self._triplets, self._areas = select_triangles(
            self.k_size, self.sample_num,
            np.random.default_rng(self.triangle_seed))

    def __call__(self, features, intrinsic=None, train: bool = False):
        disp = self.depth_head(features, train)["disparity"]
        guidance = self.guidance_head(features, train)["guidance"]
        depth = disp_to_depth(disp, self.min_depth, self.max_depth)
        out = {"disp": disp, "depth": depth, "guidance": guidance}
        if intrinsic is not None:
            out["normals"] = depth_normal_conversion(
                depth[..., 0], intrinsic, guidance, self._triplets,
                self._areas, self.k_size, depth_max=self.max_depth)
        return out


def asn_losses(out, depth_gt, rgb=None, surface_normal_gt=None,
               sig_loss_weight: float = 1.0, smooth_weight: float = 0.001,
               normal_weight: float = 1.0, max_depth: float = 10.0):
    """The reference loss dict (asn_depth_head.py:376-386): supervised
    SigLoss on depth (mask depth_gt > 0.1), edge-aware smoothness on the
    disparity vs the RGB, and cosine surface-normal supervision under the
    same mask. Each term is optional, as in the reference's None-gated
    builders."""
    from gedepth_tpu.models.losses import sigloss
    from gedepth_tpu.models.losses_extra import (
        cosine_similarity_loss, edge_aware_smoothness_loss)

    losses = {}
    mask = depth_gt > 0.1
    pred = out["depth"][..., 0]
    losses["supvised_loss"] = sig_loss_weight * sigloss(pred, depth_gt,
                                                        valid=mask)
    if rgb is not None:
        losses["smooth_loss"] = edge_aware_smoothness_loss(
            out["disp"], rgb, loss_weight=smooth_weight)
    if surface_normal_gt is not None and "normals" in out:
        losses["surface_norm_loss"] = normal_weight * cosine_similarity_loss(
            out["normals"], surface_normal_gt, mask)
    return losses
