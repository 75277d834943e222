"""BTS decode head — multi-scale Local Planar Guidance
(reference depth/models/decode_heads/bts_head.py; Lee et al. 2019).
Toolbox model-zoo component (SURVEY.md §2.8). NHWC flax re-implementation;
pairs with the ResNet-50 backbone's 5-scale pyramid
[/2, /4, /8, /16, /32] channels e.g. (64, 256, 512, 1024, 2048).
"""
from __future__ import annotations

import math
from typing import Sequence

import numpy as np
import jax
import jax.numpy as jnp
import flax.linen as nn

from gedepth_tpu.models.layers import torch_conv_kernel_init
from gedepth_tpu.ops.resize import resize_nearest


def _bn(x, train, name):
    # torch momentum 0.01 -> flax momentum 0.99
    return nn.BatchNorm(use_running_average=not train, momentum=0.99,
                        epsilon=1.1e-5, name=name)(x)


class UpConv(nn.Module):
    features: int
    ratio: int = 2

    @nn.compact
    def __call__(self, x):
        h, w = x.shape[1] * self.ratio, x.shape[2] * self.ratio
        x = resize_nearest(x, (h, w))
        x = nn.Conv(self.features, (3, 3), padding=[(1, 1), (1, 1)],
                    use_bias=False, kernel_init=torch_conv_kernel_init,
                    name="conv")(x)
        return nn.elu(x)


class AtrousConv(nn.Module):
    features: int
    dilation: int
    apply_bn_first: bool = True

    @nn.compact
    def __call__(self, x, train: bool = False):
        if self.apply_bn_first:
            x = _bn(x, train, "first_bn")
        # reference bts_head.py:18-22: aconv_sequence = ReLU -> 1x1 conv ->
        # BN -> ReLU -> dilated 3x3 (the leading ReLU applies even when
        # apply_bn_first is False)
        x = nn.relu(x)
        x = nn.Conv(self.features * 2, (1, 1), use_bias=False,
                    kernel_init=torch_conv_kernel_init, name="conv1x1")(x)
        x = _bn(x, train, "bn")
        x = nn.relu(x)
        d = self.dilation
        x = nn.Conv(self.features, (3, 3), padding=[(d, d), (d, d)],
                    kernel_dilation=(d, d), use_bias=False,
                    kernel_init=torch_conv_kernel_init, name="conv3x3")(x)
        return x


class Reduction1x1(nn.Module):
    """1x1 conv+ELU chain halving filters; emits plane params (theta, phi,
    dist) -> unit normal + distance, or a final sigmoid depth fraction."""
    num_out_filters: int
    max_depth: float
    is_final: bool = False

    @nn.compact
    def __call__(self, x):
        n_out = self.num_out_filters
        while n_out >= 4:
            if n_out < 8:
                if self.is_final:
                    x = nn.Conv(1, (1, 1), use_bias=False,
                                kernel_init=torch_conv_kernel_init,
                                name="final")(x)
                    return jax.nn.sigmoid(x)
                x = nn.Conv(3, (1, 1), use_bias=False,
                            kernel_init=torch_conv_kernel_init,
                            name="plane_params")(x)
                break
            # named like the reference's sequential entries
            # (bts_head.py:61-64: 'inter_{in}_{out}') so checkpoint keys map 1:1
            x = nn.Conv(n_out, (1, 1), use_bias=False,
                        kernel_init=torch_conv_kernel_init,
                        name=f"inter_{x.shape[-1]}_{n_out}")(x)
            x = nn.elu(x)
            n_out //= 2
        theta = jax.nn.sigmoid(x[..., 0]) * (math.pi / 3)
        phi = jax.nn.sigmoid(x[..., 1]) * (math.pi * 2)
        dist = jax.nn.sigmoid(x[..., 2]) * self.max_depth
        n1 = jnp.sin(theta) * jnp.cos(phi)
        n2 = jnp.sin(theta) * jnp.sin(phi)
        n3 = jnp.cos(theta)
        return jnp.stack([n1, n2, n3, dist], axis=-1)


def local_planar_guidance(plane_eq, upratio: int):
    """(B, h, w, 4) plane params -> (B, h*r, w*r) depth via per-pixel plane
    intersection with sub-pixel ray offsets (reference bts_head.py:83-105)."""
    B, h, w, _ = plane_eq.shape
    r = upratio
    exp = jnp.repeat(jnp.repeat(plane_eq, r, axis=1), r, axis=2)
    n1, n2, n3, n4 = (exp[..., 0], exp[..., 1], exp[..., 2], exp[..., 3])
    u = (np.arange(r, dtype=np.float32) - (r - 1) * 0.5) / r
    v = (np.arange(r, dtype=np.float32) - (r - 1) * 0.5) / r
    u_full = jnp.tile(jnp.asarray(u)[None, None, :], (1, h * r, w))
    v_full = jnp.tile(jnp.asarray(v)[None, :, None].repeat(h, 0)
                      .reshape(1, h * r, 1), (1, 1, w * r))
    return n4 / (n1 * u_full + n2 * v_full + n3)


class BTSHead(nn.Module):
    """Inputs: 5-scale pyramid fine->coarse; returns depth (B, H/2, W/2, 1).

    focal: (B,) fx values (used when final_norm, KITTI-style)."""
    in_channels: Sequence[int] = (64, 256, 512, 1024, 2048)
    num_features: int = 512
    max_depth: float = 10.0
    min_depth: float = 1e-3
    final_norm: bool = False
    scale_up: bool = False

    @nn.compact
    def __call__(self, features, focal=None, train: bool = False):
        nf = self.num_features
        skip0, skip1, skip2, skip3, feat = features
        dense = nn.relu(feat)

        up5 = _bn(UpConv(nf, name="upconv5")(dense), train, "bn5")   # /16
        up5 = resize_nearest(up5, skip3.shape[1:3])
        cat5 = jnp.concatenate([up5, skip3], axis=-1)
        i5 = nn.elu(nn.Conv(nf, (3, 3), padding=[(1, 1), (1, 1)],
                            use_bias=False,
                            kernel_init=torch_conv_kernel_init,
                            name="conv5")(cat5))

        up4 = _bn(UpConv(nf // 2, name="upconv4")(i5), train, "bn4")  # /8
        up4 = resize_nearest(up4, skip2.shape[1:3])
        cat4 = jnp.concatenate([up4, skip2], axis=-1)
        i4 = nn.elu(nn.Conv(nf // 2, (3, 3), padding=[(1, 1), (1, 1)],
                            use_bias=False,
                            kernel_init=torch_conv_kernel_init,
                            name="conv4")(cat4))
        i4 = _bn(i4, train, "bn4_2")

        d3 = AtrousConv(nf // 4, 3, apply_bn_first=False,
                        name="daspp_3")(i4, train)
        c2 = jnp.concatenate([cat4, d3], axis=-1)
        d6 = AtrousConv(nf // 4, 6, name="daspp_6")(c2, train)
        c3 = jnp.concatenate([c2, d6], axis=-1)
        d12 = AtrousConv(nf // 4, 12, name="daspp_12")(c3, train)
        c4 = jnp.concatenate([c3, d12], axis=-1)
        d18 = AtrousConv(nf // 4, 18, name="daspp_18")(c4, train)
        c5 = jnp.concatenate([c4, d18], axis=-1)
        d24 = AtrousConv(nf // 4, 24, name="daspp_24")(c5, train)
        daspp = jnp.concatenate([i4, d3, d6, d12, d18, d24], axis=-1)
        daspp_feat = nn.elu(nn.Conv(nf // 4, (3, 3),
                                    padding=[(1, 1), (1, 1)], use_bias=False,
                                    kernel_init=torch_conv_kernel_init,
                                    name="daspp_conv")(daspp))

        def plane_branch(x, n_out, upratio, name):
            eq = Reduction1x1(n_out, self.max_depth, name=name)(x)
            normal = eq[..., :3]
            normal = normal / (jnp.linalg.norm(normal, axis=-1,
                                               keepdims=True) + 1e-12)
            eq = jnp.concatenate([normal, eq[..., 3:]], axis=-1)
            depth = local_planar_guidance(eq, upratio)
            return depth[..., None] / self.max_depth   # scaled to [0, 1]

        depth_8x8 = plane_branch(daspp_feat, nf // 4, 8, "reduc8x8")
        d8_ds = resize_nearest(depth_8x8, (depth_8x8.shape[1] // 4,
                                           depth_8x8.shape[2] // 4))

        up3 = _bn(UpConv(nf // 4, name="upconv3")(daspp_feat), train, "bn3")
        up3 = resize_nearest(up3, skip1.shape[1:3])
        d8_ds = resize_nearest(d8_ds, skip1.shape[1:3])
        cat3 = jnp.concatenate([up3, skip1, d8_ds], axis=-1)
        i3 = nn.elu(nn.Conv(nf // 4, (3, 3), padding=[(1, 1), (1, 1)],
                            use_bias=False,
                            kernel_init=torch_conv_kernel_init,
                            name="conv3")(cat3))

        depth_4x4 = plane_branch(i3, nf // 8, 4, "reduc4x4")
        d4_ds = resize_nearest(depth_4x4, (depth_4x4.shape[1] // 2,
                                           depth_4x4.shape[2] // 2))

        up2 = _bn(UpConv(nf // 8, name="upconv2")(i3), train, "bn2")
        up2 = resize_nearest(up2, skip0.shape[1:3])
        d4_ds = resize_nearest(d4_ds, skip0.shape[1:3])
        cat2 = jnp.concatenate([up2, skip0, d4_ds], axis=-1)
        i2 = nn.elu(nn.Conv(nf // 8, (3, 3), padding=[(1, 1), (1, 1)],
                            use_bias=False,
                            kernel_init=torch_conv_kernel_init,
                            name="conv2")(cat2))

        depth_2x2 = plane_branch(i2, nf // 16, 2, "reduc2x2")

        up1 = UpConv(nf // 16, name="upconv1")(i2)
        r1 = Reduction1x1(nf // 32, self.max_depth, is_final=True,
                          name="reduc1x1")(up1)
        tgt = up1.shape[1:3]
        cat1 = jnp.concatenate(
            [up1, resize_nearest(r1, tgt), resize_nearest(depth_2x2, tgt),
             resize_nearest(depth_4x4, tgt), resize_nearest(depth_8x8, tgt)],
            axis=-1)
        i1 = nn.elu(nn.Conv(nf // 16, (3, 3), padding=[(1, 1), (1, 1)],
                            use_bias=False,
                            kernel_init=torch_conv_kernel_init,
                            name="conv1")(cat1))

        out = nn.Conv(1, (3, 3), padding=[(1, 1), (1, 1)],
                      kernel_init=torch_conv_kernel_init,
                      name="conv_depth")(i1)
        if self.scale_up:
            out = jax.nn.sigmoid(out) * self.max_depth
        else:
            out = nn.relu(out) + self.min_depth
        if self.final_norm and focal is not None:
            out = out * focal.reshape(-1, 1, 1, 1) / 715.0873
        return out
