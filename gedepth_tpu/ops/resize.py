"""TPU-friendly separable image resize.

In-model interpolation (the reference leans on ``F.interpolate`` everywhere:
neck fusion, mask upsampling, loss-side resize) is implemented here as two
dense matmuls with precomputed interpolation weights:

    out = W_h @ x @ W_w^T        (per batch/channel, via einsum)

Because shapes under jit are static, the (out, in) weight matrices are built
in numpy at trace time and folded into the graph as constants; the resize
itself runs on the MXU instead of as a gather, which is the fast path on TPU.

Semantics match torch.nn.functional.interpolate:
  * mode='bilinear', align_corners=False  -> half-pixel source mapping,
    src = (o + 0.5) * I/O - 0.5, edges clamped.
  * mode='bilinear', align_corners=True   -> src = o * (I-1)/(O-1).
  * mode='nearest'                        -> src = floor(o * I/O).
"""
from __future__ import annotations

import functools

import numpy as np
import jax.numpy as jnp


@functools.lru_cache(maxsize=256)
def _linear_weights(in_size: int, out_size: int, align_corners: bool) -> np.ndarray:
    """(out_size, in_size) bilinear interpolation matrix."""
    if out_size == in_size:
        return np.eye(out_size, dtype=np.float32)
    o = np.arange(out_size, dtype=np.float64)
    if align_corners:
        if out_size == 1:
            src = np.zeros_like(o)
        else:
            src = o * (in_size - 1) / (out_size - 1)
    else:
        src = (o + 0.5) * (in_size / out_size) - 0.5
        src = np.clip(src, 0.0, in_size - 1)
    i0 = np.floor(src).astype(np.int64)
    i0 = np.clip(i0, 0, in_size - 1)
    i1 = np.minimum(i0 + 1, in_size - 1)
    frac = src - i0
    w = np.zeros((out_size, in_size), dtype=np.float64)
    w[np.arange(out_size), i0] += 1.0 - frac
    w[np.arange(out_size), i1] += frac
    return w.astype(np.float32)


@functools.lru_cache(maxsize=256)
def _nearest_weights(in_size: int, out_size: int) -> np.ndarray:
    """(out_size, in_size) 0/1 nearest-neighbour matrix (torch 'nearest')."""
    if out_size == in_size:
        return np.eye(out_size, dtype=np.float32)
    o = np.arange(out_size, dtype=np.float64)
    src = np.floor(o * (in_size / out_size)).astype(np.int64)
    src = np.clip(src, 0, in_size - 1)
    w = np.zeros((out_size, in_size), dtype=np.float32)
    w[np.arange(out_size), src] = 1.0
    return w


def _apply_separable(x, wh: np.ndarray, ww: np.ndarray):
    """Apply (Oh, H) and (Ow, W) weights to (..., H, W, C) input.

    precision=HIGHEST: interpolation feeds parity-critical paths (masks, loss
    resize, eval upsampling); the default bf16 MXU pass loses ~1e-2 which is
    visible in Abs Rel. The fp32 pass is still MXU-bound and cheap at these
    sizes.
    """
    import jax

    wh_j = jnp.asarray(wh, dtype=x.dtype)
    ww_j = jnp.asarray(ww, dtype=x.dtype)
    x = jnp.einsum("oh,...hwc->...owc", wh_j, x,
                   precision=jax.lax.Precision.HIGHEST)
    x = jnp.einsum("pw,...hwc->...hpc", ww_j, x,
                   precision=jax.lax.Precision.HIGHEST)
    return x


def resize_bilinear(x, size, align_corners: bool = False):
    """Bilinearly resize NHWC (or HWC) x to `size` = (out_h, out_w)."""
    out_h, out_w = int(size[0]), int(size[1])
    h, w = x.shape[-3], x.shape[-2]
    if (h, w) == (out_h, out_w):
        return x
    return _apply_separable(
        x,
        _linear_weights(h, out_h, align_corners),
        _linear_weights(w, out_w, align_corners),
    )


def resize_nearest(x, size):
    """Nearest-neighbour resize of NHWC (or HWC) x to (out_h, out_w)."""
    out_h, out_w = int(size[0]), int(size[1])
    h, w = x.shape[-3], x.shape[-2]
    if (h, w) == (out_h, out_w):
        return x
    return _apply_separable(x, _nearest_weights(h, out_h), _nearest_weights(w, out_w))
