"""EfficientNet backbone (reference depth/models/backbones/efficientnet.py
role). Compact NHWC flax implementation of EfficientNet-B0..B3 (MBConv with
squeeze-excite, swish), emitting the standard 4-scale feature pyramid
(strides 4/8/16/32 endpoints)."""
from __future__ import annotations

import math
from typing import Sequence

import jax
import jax.numpy as jnp
import flax.linen as nn

from gedepth_tpu.models.layers import torch_conv_kernel_init

# (expand, channels, repeats, stride, kernel) per stage — B0 base
_B0_STAGES = (
    (1, 16, 1, 1, 3),
    (6, 24, 2, 2, 3),
    (6, 40, 2, 2, 5),
    (6, 80, 3, 2, 3),
    (6, 112, 3, 1, 5),
    (6, 192, 4, 2, 5),
    (6, 320, 1, 1, 3),
)
# width, depth multipliers
_SCALES = {"b0": (1.0, 1.0), "b1": (1.0, 1.1), "b2": (1.1, 1.2),
           "b3": (1.2, 1.4)}


def _round_ch(c, mult, divisor=8):
    c = c * mult
    new = max(divisor, int(c + divisor / 2) // divisor * divisor)
    if new < 0.9 * c:
        new += divisor
    return int(new)


class _ConvBNAct(nn.Module):
    features: int
    kernel: int = 3
    stride: int = 1
    groups: int = 1
    act: bool = True

    @nn.compact
    def __call__(self, x, train=False):
        pad = self.kernel // 2
        x = nn.Conv(self.features, (self.kernel, self.kernel),
                    strides=(self.stride, self.stride),
                    padding=[(pad, pad), (pad, pad)],
                    feature_group_count=self.groups, use_bias=False,
                    kernel_init=torch_conv_kernel_init, name="conv")(x)
        x = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                         epsilon=1e-3, name="bn")(x)
        return nn.swish(x) if self.act else x


class MBConv(nn.Module):
    features: int
    expand: int
    kernel: int
    stride: int
    se_ratio: float = 0.25

    @nn.compact
    def __call__(self, x, train=False):
        inp = x.shape[-1]
        identity = x
        h = x
        if self.expand != 1:
            h = _ConvBNAct(inp * self.expand, 1, name="expand")(h, train)
        mid = h.shape[-1]
        h = _ConvBNAct(mid, self.kernel, self.stride, groups=mid,
                       name="dw")(h, train)
        # squeeze-excite
        se_ch = max(1, int(inp * self.se_ratio))
        s = jnp.mean(h, axis=(1, 2), keepdims=True)
        s = nn.swish(nn.Conv(se_ch, (1, 1), name="se_reduce")(s))
        s = jax.nn.sigmoid(nn.Conv(mid, (1, 1), name="se_expand")(s))
        h = h * s
        h = _ConvBNAct(self.features, 1, act=False, name="project")(h, train)
        if self.stride == 1 and inp == self.features:
            h = h + identity
        return h


class EfficientNet(nn.Module):
    arch: str = "b0"
    out_strides: Sequence[int] = (4, 8, 16, 32)

    @nn.compact
    def __call__(self, x, train: bool = False):
        wm, dm = _SCALES[self.arch]
        x = _ConvBNAct(_round_ch(32, wm), 3, 2, name="stem")(x, train)
        outs = []
        stride = 2
        for si, (expand, ch, reps, s0, k) in enumerate(_B0_STAGES):
            ch = _round_ch(ch, wm)
            reps = int(math.ceil(reps * dm))
            for r in range(reps):
                s = s0 if r == 0 else 1
                if s == 2 and stride in self.out_strides:
                    outs.append(x)
                stride *= s
                x = MBConv(ch, expand, k, s, name=f"s{si}_b{r}")(x, train)
        outs.append(x)
        return outs[-len(self.out_strides):]
