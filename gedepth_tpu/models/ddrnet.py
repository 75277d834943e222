"""DDRNet (dual-resolution) backbone (reference
depth/models/backbones/ddrnet.py role): a high-resolution branch (/8) and a
low-resolution branch (/32+) with bilateral fusion, ending in a DAPPM-lite
context module. Compact NHWC flax DDRNet-23-slim shape."""
from __future__ import annotations

import jax
import jax.numpy as jnp
import flax.linen as nn

from gedepth_tpu.models.resnet import BasicBlock, Bottleneck, _ConvBN
from gedepth_tpu.ops.resize import resize_bilinear


class DualResNet(nn.Module):
    planes: int = 32
    spp_planes: int = 128

    @nn.compact
    def __call__(self, x, train: bool = False):
        p = self.planes
        # stem -> /4
        x = nn.relu(_ConvBN(p, 3, 2, name="stem1")(x, train))
        x = nn.relu(_ConvBN(p, 3, 2, name="stem2")(x, train))
        for b in range(2):
            x = BasicBlock(p, name=f"layer1_b{b}")(x, train)
        for b in range(2):
            x = BasicBlock(2 * p, stride=2 if b == 0 else 1,
                           downsample=(b == 0), name=f"layer2_b{b}")(x, train)

        # split: high branch stays /8; low branch goes deeper
        low = x
        for b in range(2):
            low = BasicBlock(4 * p, stride=2 if b == 0 else 1,
                             downsample=(b == 0),
                             name=f"layer3_b{b}")(low, train)
        high = x
        for b in range(2):
            high = BasicBlock(2 * p, name=f"layer3h_b{b}")(high, train)

        # bilateral fusion 1
        low = low + _ConvBN(4 * p, 3, 2, name="down1")(nn.relu(high), train)
        comp = _ConvBN(2 * p, 1, name="comp1")(nn.relu(low), train)
        high = high + resize_bilinear(comp, high.shape[1:3])

        low2 = low
        for b in range(2):
            low2 = BasicBlock(8 * p, stride=2 if b == 0 else 1,
                              downsample=(b == 0),
                              name=f"layer4_b{b}")(low2, train)
        high2 = high
        for b in range(2):
            high2 = BasicBlock(2 * p, name=f"layer4h_b{b}")(high2, train)

        low2 = low2 + _ConvBN(
            8 * p, 3, 2, name="down2_b")(nn.relu(_ConvBN(
                4 * p, 3, 2, name="down2_a")(nn.relu(high2), train)), train)
        comp2 = _ConvBN(2 * p, 1, name="comp2")(nn.relu(low2), train)
        high2 = high2 + resize_bilinear(comp2, high2.shape[1:3])

        high3 = Bottleneck(2 * p, downsample=True,
                           name="layer5h")(high2, train)
        low3 = Bottleneck(8 * p, stride=2, downsample=True,
                          name="layer5")(low2, train)

        # DAPPM-lite: multi-scale pooled context on the low branch
        ctx_in = nn.relu(low3)
        branches = [_ConvBN(self.spp_planes, 1, name="spp0")(ctx_in, train)]
        for i, k in enumerate((2, 4)):
            kk = (min(k, ctx_in.shape[1]), min(k, ctx_in.shape[2]))
            pooled = nn.avg_pool(ctx_in, kk, strides=kk)
            c = _ConvBN(self.spp_planes, 1, name=f"spp{i + 1}")(pooled, train)
            branches.append(resize_bilinear(c, ctx_in.shape[1:3]))
        gp = jnp.mean(ctx_in, axis=(1, 2), keepdims=True)
        gpc = _ConvBN(self.spp_planes, 1, name="sppg")(gp, train)
        branches.append(jnp.broadcast_to(
            gpc, branches[0].shape[:3] + (self.spp_planes,)))
        ctx = _ConvBN(4 * p, 1, name="spp_out")(
            nn.relu(sum(branches)), train)
        ctx_up = resize_bilinear(ctx, high3.shape[1:3])

        out = jnp.concatenate([high3, ctx_up], axis=-1)
        return [high, high2, out, nn.relu(low3)]
