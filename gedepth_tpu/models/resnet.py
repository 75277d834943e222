"""ResNet backbone family (NHWC flax).

Reference depth/models/backbones/resnet.py (torchvision-style BasicBlock /
Bottleneck, 'pytorch' style: stride on the 3x3). Provides the standalone
backbone for the toolbox model zoo (BTS uses ResNet-50, the conv-stem
ResLayer variants of DepthFormerSwin use these blocks) — SURVEY.md §2.6.
"""
from __future__ import annotations

from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import flax.linen as nn

from gedepth_tpu.models.layers import torch_conv_kernel_init


class _ConvBN(nn.Module):
    features: int
    kernel: int
    stride: int = 1
    dilation: int = 1

    @nn.compact
    def __call__(self, x, train: bool = False):
        pad = self.dilation * (self.kernel // 2)
        x = nn.Conv(self.features, (self.kernel, self.kernel),
                    strides=(self.stride, self.stride),
                    kernel_dilation=(self.dilation, self.dilation),
                    padding=[(pad, pad), (pad, pad)], use_bias=False,
                    kernel_init=torch_conv_kernel_init, name="conv")(x)
        return nn.BatchNorm(use_running_average=not train, momentum=0.9,
                            epsilon=1e-5, name="bn")(x)


class BasicBlock(nn.Module):
    planes: int
    stride: int = 1
    dilation: int = 1
    downsample: bool = False
    expansion: int = 1

    @nn.compact
    def __call__(self, x, train: bool = False):
        identity = x
        out = _ConvBN(self.planes, 3, self.stride, self.dilation,
                      name="convbn1")(x, train)
        out = nn.relu(out)
        out = _ConvBN(self.planes, 3, 1, self.dilation,
                      name="convbn2")(out, train)
        if self.downsample:
            identity = _ConvBN(self.planes * self.expansion, 1, self.stride,
                               name="downsample")(x, train)
        return nn.relu(out + identity)


class Bottleneck(nn.Module):
    planes: int
    stride: int = 1
    dilation: int = 1
    downsample: bool = False
    expansion: int = 4

    @nn.compact
    def __call__(self, x, train: bool = False):
        identity = x
        out = nn.relu(_ConvBN(self.planes, 1, name="convbn1")(x, train))
        # 'pytorch' style: stride on the 3x3
        out = nn.relu(_ConvBN(self.planes, 3, self.stride, self.dilation,
                              name="convbn2")(out, train))
        out = _ConvBN(self.planes * self.expansion, 1,
                      name="convbn3")(out, train)
        if self.downsample:
            identity = _ConvBN(self.planes * self.expansion, 1, self.stride,
                               name="downsample")(x, train)
        return nn.relu(out + identity)


ARCH_SETTINGS = {
    18: (BasicBlock, (2, 2, 2, 2)),
    34: (BasicBlock, (3, 4, 6, 3)),
    50: (Bottleneck, (3, 4, 6, 3)),
    101: (Bottleneck, (3, 4, 23, 3)),
    152: (Bottleneck, (3, 8, 36, 3)),
}


class ResNet(nn.Module):
    """ResNet producing a 4-scale pyramid [/4, /8, /16, /32].

    include_stem=True prepends the post-relu /2 stem feature (64ch), giving
    the 5-level pyramid the BTS/DenseDepth heads expect (reference
    configs/_base_/models/bts.py in_channels [64, 256, ...])."""
    depth: int = 50
    in_strides: Sequence[int] = (1, 2, 2, 2)
    dilations: Sequence[int] = (1, 1, 1, 1)
    out_indices: Sequence[int] = (0, 1, 2, 3)
    base_channels: int = 64
    include_stem: bool = False

    @nn.compact
    def __call__(self, x, train: bool = False):
        block_cls, stage_blocks = ARCH_SETTINGS[self.depth]
        x = nn.Conv(self.base_channels, (7, 7), strides=(2, 2),
                    padding=[(3, 3), (3, 3)], use_bias=False,
                    kernel_init=torch_conv_kernel_init, name="conv1")(x)
        x = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                         epsilon=1e-5, name="bn1")(x)
        x = nn.relu(x)
        stem = x
        x = nn.max_pool(x, (3, 3), strides=(2, 2), padding=[(1, 1), (1, 1)])

        outs = [stem] if self.include_stem else []
        planes = self.base_channels
        for i, n_blocks in enumerate(stage_blocks):
            for b in range(n_blocks):
                stride = self.in_strides[i] if b == 0 else 1
                need_down = (b == 0 and
                             (stride != 1 or
                              x.shape[-1] != planes * block_cls.expansion))
                x = block_cls(planes, stride, self.dilations[i],
                              downsample=need_down,
                              name=f"layer{i + 1}_block{b}")(x, train)
            if i in self.out_indices:
                outs.append(x)
            planes *= 2
        return outs
