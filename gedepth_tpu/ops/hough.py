"""Deep Hough Transform line accumulator (TPU-native).

Functional equivalent of the reference's only in-tree native component, the
`_cdht` CUDA extension (depth/models/_cdht/deep_hough_cuda.cpp:33-98,
deep_hough_cuda_kernel.cu:27-95):

  forward:  out[b, c, a, r] = sum over pixels (x, y) with
            r == round(xx * cos(angle_a) / irho + yy * sin(angle_a) / irho)
                 + numrho // 2,
            xx = x - W//2, yy = y - H//2,
            irho = int(sqrt(H^2 + W^2) + 1) / (numrho - 1),
            angle_a = a * pi / numangle
  backward: exact transpose (gather of grad_out at each pixel's bin).

TPU design: the pixel->bin map is static per (H, W, numangle, numrho), so
the accumulation is a linear operator. Instead of atomic scatter-adds (the
CUDA approach — hostile to TPUs), the forward runs as a lax.scan of one-hot
matmuls on the MXU: per angle, out_a = feat_flat @ onehot(r_idx[a], numrho).
The backward is a take_along_axis gather summed over angles. A C++ CPU
reference used for parity tests lives in native/hough_ref.cpp.
"""
from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp


@functools.lru_cache(maxsize=16)
def hough_bin_index(h: int, w: int, numangle: int, numrho: int) -> np.ndarray:
    """(numangle, h*w) int32: rho-bin of each pixel per angle."""
    irho = int(np.sqrt(h * h + w * w) + 1) / float(numrho - 1)
    itheta = np.pi / numangle
    angles = np.arange(numangle, dtype=np.float64) * itheta
    tab_cos = np.cos(angles) / irho
    tab_sin = np.sin(angles) / irho
    xs, ys = np.meshgrid(np.arange(w), np.arange(h), indexing="xy")
    xx = (xs - w // 2).reshape(-1).astype(np.float64)
    yy = (ys - h // 2).reshape(-1).astype(np.float64)
    # float32 round to match the CUDA kernel's float math
    r = np.round((xx[None] * tab_cos[:, None]
                  + yy[None] * tab_sin[:, None]).astype(np.float32))
    r = r.astype(np.int64) + numrho // 2
    return np.clip(r, 0, numrho - 1).astype(np.int32)


def _forward(feat, numangle: int, numrho: int):
    """feat: (B, C, H, W) -> (B, C, numangle, numrho)."""
    B, C, H, W = feat.shape
    idx = jnp.asarray(hough_bin_index(H, W, numangle, numrho))
    flat = feat.reshape(B * C, H * W)

    def body(carry, idx_a):
        onehot = jax.nn.one_hot(idx_a, numrho, dtype=flat.dtype)
        return carry, jnp.dot(flat, onehot,
                              preferred_element_type=jnp.float32)

    _, out = jax.lax.scan(body, None, idx)          # (numangle, B*C, numrho)
    out = out.astype(feat.dtype)
    return out.transpose(1, 0, 2).reshape(B, C, numangle, numrho)


def _backward(grad_out, numangle: int, numrho: int, H: int, W: int):
    """grad_out: (B, C, numangle, numrho) -> grad_in (B, C, H, W)."""
    B, C = grad_out.shape[:2]
    idx = jnp.asarray(hough_bin_index(H, W, numangle, numrho))  # (A, HW)
    g = grad_out.reshape(B * C, numangle, numrho)

    def body(carry, inp):
        g_a, idx_a = inp          # (B*C, numrho), (HW,)
        return carry + jnp.take(g_a, idx_a, axis=1), None

    init = jnp.zeros((B * C, H * W), grad_out.dtype)
    acc, _ = jax.lax.scan(body, init, (g.transpose(1, 0, 2), idx))
    return acc.reshape(B, C, H, W)


@functools.partial(jax.custom_vjp, nondiff_argnums=(1, 2))
def deep_hough_transform(feat, numangle: int, numrho: int):
    """Line accumulator with the reference's tabulation; differentiable."""
    return _forward(feat, numangle, numrho)


def _dht_fwd(feat, numangle, numrho):
    return _forward(feat, numangle, numrho), feat.shape


def _dht_bwd(numangle, numrho, shape, g):
    return (_backward(g, numangle, numrho, shape[2], shape[3]),)


deep_hough_transform.defvjp(_dht_fwd, _dht_bwd)
