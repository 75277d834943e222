"""HRNet backbone (reference depth/models/backbones/hrnet.py role).

Parallel multi-resolution streams with repeated cross-resolution fusion
(Wang et al. 2019). Compact NHWC flax implementation of the standard
W18/W32/W48 configurations: stem (/4) -> stage1 (4x Bottleneck) -> three
multi-branch stages of BasicBlock modules with full fusion; outputs the
4-scale pyramid [/4, /8, /16, /32].
"""
from __future__ import annotations

from typing import Sequence, Tuple

import jax
import jax.numpy as jnp
import flax.linen as nn

from gedepth_tpu.models.resnet import BasicBlock, Bottleneck, _ConvBN


def _upsample_nearest(x, hw):
    """Nearest 2**k upsample (reference hrnet.py:508-509 nn.Upsample
    mode='nearest'), via repeat + crop so odd target sizes stay safe."""
    h, w = hw
    ry = -(-h // x.shape[1])
    rx = -(-w // x.shape[2])
    x = jnp.repeat(jnp.repeat(x, ry, axis=1), rx, axis=2)
    return x[:, :h, :w]

HRNET_CFGS = {
    "w18": ((1, (4,), (64,)),
            (1, (4, 4), (18, 36)),
            (4, (4, 4, 4), (18, 36, 72)),
            (3, (4, 4, 4, 4), (18, 36, 72, 144))),
    "w32": ((1, (4,), (64,)),
            (1, (4, 4), (32, 64)),
            (4, (4, 4, 4), (32, 64, 128)),
            (3, (4, 4, 4, 4), (32, 64, 128, 256))),
    "w48": ((1, (4,), (64,)),
            (1, (4, 4), (48, 96)),
            (4, (4, 4, 4), (48, 96, 192)),
            (3, (4, 4, 4, 4), (48, 96, 192, 384))),
}


class _FuseLayer(nn.Module):
    """Full cross-resolution fusion: every output branch sums transformed
    versions of every input branch."""
    channels: Sequence[int]

    @nn.compact
    def __call__(self, xs, train: bool = False):
        n = len(self.channels)
        outs = []
        for i in range(n):
            acc = None
            for j, x in enumerate(xs):
                if j == i:
                    y = x
                elif j > i:
                    # upsample coarse -> fine: 1x1 conv + NEAREST
                    # (reference hrnet.py:496-509)
                    y = _ConvBN(self.channels[i], 1,
                                name=f"up{i}_{j}")(x, train)
                    y = _upsample_nearest(y, xs[i].shape[1:3])
                else:
                    # downsample fine -> coarse: strided 3x3 chain
                    y = x
                    for k in range(i - j):
                        last = k == i - j - 1
                        ch = self.channels[i] if last else self.channels[j]
                        y = _ConvBN(ch, 3, stride=2,
                                    name=f"down{i}_{j}_{k}")(y, train)
                        if not last:
                            y = nn.relu(y)
                acc = y if acc is None else acc + y
            outs.append(nn.relu(acc))
        return outs


class _HRModule(nn.Module):
    channels: Sequence[int]
    num_blocks: Sequence[int]

    @nn.compact
    def __call__(self, xs, train: bool = False):
        ys = []
        for i, x in enumerate(xs):
            for b in range(self.num_blocks[i]):
                need_down = x.shape[-1] != self.channels[i]
                x = BasicBlock(self.channels[i], downsample=need_down,
                               name=f"branch{i}_block{b}")(x, train)
            ys.append(x)
        return _FuseLayer(self.channels, name="fuse")(ys, train)


class HRNet(nn.Module):
    arch: str = "w18"

    @nn.compact
    def __call__(self, x, train: bool = False):
        cfg = HRNET_CFGS[self.arch]
        # stem: two stride-2 3x3 convs -> /4
        x = nn.relu(_ConvBN(64, 3, stride=2, name="stem1")(x, train))
        x = nn.relu(_ConvBN(64, 3, stride=2, name="stem2")(x, train))

        # stage 1: Bottlenecks at /4 (w18/32/48: 4 x 64 planes -> 256ch)
        planes1 = cfg[0][2][0]
        for b in range(cfg[0][1][0]):
            need_down = b == 0 and x.shape[-1] != planes1 * 4
            x = Bottleneck(planes1, downsample=need_down,
                           name=f"layer1_block{b}")(x, train)

        branches = [x]
        for stage_idx, (num_modules, num_blocks, channels) in enumerate(
                cfg[1:], start=2):
            # transition: adapt existing branches + create the new one
            new_branches = []
            for i, ch in enumerate(channels):
                if i < len(branches):
                    if branches[i].shape[-1] != ch:
                        y = nn.relu(_ConvBN(
                            ch, 3, name=f"t{stage_idx}_adapt{i}")(
                            branches[i], train))
                    else:
                        y = branches[i]
                else:
                    y = nn.relu(_ConvBN(
                        ch, 3, stride=2, name=f"t{stage_idx}_new{i}")(
                        branches[-1], train))
                new_branches.append(y)
            branches = new_branches
            for m in range(num_modules):
                branches = _HRModule(channels, num_blocks,
                                     name=f"stage{stage_idx}_module{m}")(
                    branches, train)
        return branches
