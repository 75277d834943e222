"""Experiment heads & ops from the toolbox inventory (SURVEY.md §2.8):
GuidanceHead, pixel-adaptive convolution (pac.py), depth->surface-normal
conversion (the core of ASNDepthHeadV2's AdaptiveDepth2normal), and a compact
ASN-style depth head with the surface-normal auxiliary output."""
from __future__ import annotations

from typing import Optional, Sequence

import numpy as np
import jax
import jax.numpy as jnp
import flax.linen as nn

from gedepth_tpu.models.layers import ConvModule, torch_conv_kernel_init
from gedepth_tpu.models.heads import UpSampleBlock, _leaky_relu


class GuidanceHead(nn.Module):
    """DenseDepth-style guidance decoder emitting a raw 1-channel map
    (relu+min_depth or sigmoid; reference guidance_head.py:27-110)."""
    up_sample_channels: Sequence[int]
    min_depth: float = 1e-3
    use_sigmoid: bool = False

    @nn.compact
    def __call__(self, inputs):
        up_channels = list(self.up_sample_channels)[::-1]
        feats = inputs[::-1]
        x = None
        act = None if self.use_sigmoid else _leaky_relu
        for i, (feat, ch) in enumerate(zip(feats, up_channels)):
            if i == 0:
                x = ConvModule(ch, kernel_size=1, act=None, use_bias=True,
                               name=f"conv{i}")(feat)
            else:
                x = UpSampleBlock(ch, name=f"up{i}")(x, feat)
        g = nn.Conv(1, (3, 3), padding=[(1, 1), (1, 1)],
                    kernel_init=torch_conv_kernel_init, name="conv_depth")(x)
        if self.use_sigmoid:
            return jax.nn.sigmoid(g)
        return nn.relu(g) + self.min_depth


def pixel_adaptive_conv(x, guide, kernel, kernel_size: int = 3,
                        channel_wise: bool = False):
    """Pixel-adaptive convolution (reference pac.py; Su et al. 2019).

    Standard convolution whose spatial kernel is modulated per pixel by a
    Gaussian affinity of the guidance features:

      out[p] = sum_q K[p-q] * exp(-0.5 ||g_p - g_q||^2) * x[q]

    Args:
      x:      (B, H, W, C) input.
      guide:  (B, H, W, Cg) guidance features.
      kernel: (kh, kw, C, Cout) conv kernel.
      kernel_size: neighborhood size (odd).

    TPU formulation: unfold the k*k shifted neighborhoods (static shifts, no
    gather), weight each tap by the guidance affinity, and contract with the
    kernel via one einsum (MXU).
    """
    B, H, W, C = x.shape
    k = kernel_size
    pad = k // 2
    xp = jnp.pad(x, ((0, 0), (pad, pad), (pad, pad), (0, 0)))
    gp = jnp.pad(guide, ((0, 0), (pad, pad), (pad, pad), (0, 0)))

    taps = []
    affs = []
    for dy in range(k):
        for dx in range(k):
            taps.append(xp[:, dy:dy + H, dx:dx + W, :])
            diff = gp[:, dy:dy + H, dx:dx + W, :] - guide
            affs.append(jnp.exp(-0.5 * jnp.sum(diff * diff, axis=-1)))
    taps = jnp.stack(taps, axis=3)           # (B, H, W, k*k, C)
    affs = jnp.stack(affs, axis=3)           # (B, H, W, k*k)
    weighted = taps * affs[..., None]
    kern = kernel.reshape(k * k, C, -1)
    return jnp.einsum("bhwtc,tco->bhwo", weighted, kern)


class PacConv(nn.Module):
    """flax wrapper over pixel_adaptive_conv with a learned kernel."""
    features: int
    kernel_size: int = 3

    @nn.compact
    def __call__(self, x, guide):
        kern = self.param(
            "kernel", torch_conv_kernel_init,
            (self.kernel_size, self.kernel_size, x.shape[-1], self.features))
        bias = self.param("bias", nn.initializers.zeros, (self.features,))
        return pixel_adaptive_conv(x, guide, kern, self.kernel_size) + bias


def depth_to_normals(depth, fx: float, fy: float):
    """Surface normals from a depth map via central differences
    (AdaptiveDepth2normal's core, reference asn_depth_head.py:14-264).

    depth: (B, H, W, 1) metric depth; fx, fy: focal lengths in pixels.
    Returns unit normals (B, H, W, 3) in camera coordinates.
    """
    d = depth[..., 0]
    dzdx = (jnp.roll(d, -1, axis=2) - jnp.roll(d, 1, axis=2)) * 0.5
    dzdy = (jnp.roll(d, -1, axis=1) - jnp.roll(d, 1, axis=1)) * 0.5
    # metric gradients: dz/dX = dz/du * du/dX, du/dX = fx / z
    nx = -dzdx * fx / jnp.maximum(d, 1e-6)
    ny = -dzdy * fy / jnp.maximum(d, 1e-6)
    nz = jnp.ones_like(d)
    n = jnp.stack([nx, ny, nz], axis=-1)
    return n / (jnp.linalg.norm(n, axis=-1, keepdims=True) + 1e-12)


class ASNDepthHead(nn.Module):
    """ASN-style head: DenseDepth decoder + guidance-modulated (PAC)
    refinement + surface-normal auxiliary output — a compact form kept for
    its decoder-integrated shape. The FULL-parity reference head
    (triangle-sampled adaptive normals, SegHead trunks, guidance kernel)
    is models/asn.py ASNDepthHeadV2 (reference asn_depth_head.py:345)."""
    up_sample_channels: Sequence[int]
    channels: int = 64
    min_depth: float = 1e-3
    max_depth: float = 10.0
    focal: float = 519.0

    @nn.compact
    def __call__(self, inputs):
        up_channels = list(self.up_sample_channels)[::-1]
        feats = inputs[::-1]
        x = None
        for i, (feat, ch) in enumerate(zip(feats, up_channels)):
            if i == 0:
                x = ConvModule(ch, kernel_size=1, act=None, use_bias=True,
                               name=f"conv{i}")(feat)
            else:
                x = UpSampleBlock(ch, name=f"up{i}")(x, feat)
        guide = ConvModule(16, kernel_size=3, act=_leaky_relu, use_bias=True,
                           name="guide")(x)
        x = PacConv(self.channels, name="pac")(x, guide)
        d = nn.Conv(1, (3, 3), padding=[(1, 1), (1, 1)],
                    kernel_init=torch_conv_kernel_init, name="conv_depth")(x)
        depth = nn.relu(d) + self.min_depth
        normals = depth_to_normals(depth, self.focal, self.focal)
        return depth, normals
