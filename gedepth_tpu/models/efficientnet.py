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


def _same_pads(size: int, k: int, s: int):
    """TF 'SAME' asymmetric padding (timm tf_ variants): extra pixel goes
    bottom/right."""
    pad = max(0, (-(-size // s) - 1) * s + k - size)
    return pad // 2, pad - pad // 2


class _TfConv(nn.Module):
    """Conv with TF-SAME padding (matches timm Conv2dSame used by every
    tf_efficientnet_* checkpoint)."""
    features: int
    kernel: int
    stride: int = 1
    groups: int = 1
    use_bias: bool = False

    @nn.compact
    def __call__(self, x):
        py = _same_pads(x.shape[1], self.kernel, self.stride)
        px = _same_pads(x.shape[2], self.kernel, self.stride)
        return nn.Conv(self.features, (self.kernel, self.kernel),
                       strides=(self.stride, self.stride),
                       padding=[py, px],
                       feature_group_count=self.groups,
                       use_bias=self.use_bias,
                       kernel_init=torch_conv_kernel_init, name="conv")(x)


class _TfBN(nn.Module):
    @nn.compact
    def __call__(self, x, train=False):
        return nn.BatchNorm(use_running_average=not train, momentum=0.9,
                            epsilon=1e-3, name="bn")(x)


class _TimmSE(nn.Module):
    """gen-efficientnet SqueezeExcite: reduce from the BLOCK INPUT channel
    count, gate the mid features (conv_reduce/conv_expand, biased 1x1)."""
    reduced: int

    @nn.compact
    def __call__(self, h):
        mid = h.shape[-1]
        s = jnp.mean(h, axis=(1, 2), keepdims=True)
        s = nn.swish(nn.Conv(self.reduced, (1, 1),
                             name="conv_reduce")(s))
        s = jax.nn.sigmoid(nn.Conv(mid, (1, 1), name="conv_expand")(s))
        return h * s


class _TimmDSBlock(nn.Module):
    """DepthwiseSeparableConv (stage-0 block): dw -> se -> pw, no
    expansion, no post-pw act."""
    features: int
    kernel: int
    stride: int
    se_ratio: float = 0.25

    @nn.compact
    def __call__(self, x, train=False):
        inp = x.shape[-1]
        h = _TfConv(inp, self.kernel, self.stride, groups=inp,
                    name="conv_dw")(x)
        h = nn.swish(_TfBN(name="bn1")(h, train))
        h = _TimmSE(max(1, int(inp * self.se_ratio)), name="se")(h)
        h = _TfConv(self.features, 1, name="conv_pw")(h)
        h = _TfBN(name="bn2")(h, train)
        if self.stride == 1 and inp == self.features:
            h = h + x
        return h


class _TimmIRBlock(nn.Module):
    """InvertedResidual: pw-expand -> dw -> se -> pw-linear."""
    features: int
    expand: int
    kernel: int
    stride: int
    se_ratio: float = 0.25

    @nn.compact
    def __call__(self, x, train=False):
        inp = x.shape[-1]
        mid = inp * self.expand
        h = _TfConv(mid, 1, name="conv_pw")(x)
        h = nn.swish(_TfBN(name="bn1")(h, train))
        h = _TfConv(mid, self.kernel, self.stride, groups=mid,
                    name="conv_dw")(h)
        h = nn.swish(_TfBN(name="bn2")(h, train))
        h = _TimmSE(max(1, int(inp * self.se_ratio)), name="se")(h)
        h = _TfConv(self.features, 1, name="conv_pwl")(h)
        h = _TfBN(name="bn3")(h, train)
        if self.stride == 1 and inp == self.features:
            h = h + x
        return h


# timm gen-efficientnet scalings for the tf_ checkpoint family
_TIMM_SCALES = {"tf_b5": (1.6, 2.2)}


class TimmEfficientNet(nn.Module):
    """Checkpoint-faithful tf_efficientnet_* backbone.

    Mirrors the reference's AdaBins backbone — a gen-efficientnet
    tf_efficientnet_b5_ap wrapped with out_index=[4, 5, 6, 8, 11]
    (reference depth/models/backbones/efficientnet.py:20-43): returns
    [stage0 (/2), stage1 (/4), stage2 (/8), stage4 (/16), conv_head (/32)]
    — channels (24, 40, 64, 176, 2048) at b5; the conv_head endpoint is the
    RAW conv output (the reference stops before bn2). State-dict layout
    (conv_stem/bn1/blocks.{s}.{b}.*/conv_head) matches timm so released
    AdaBins checkpoints convert directly."""
    arch: str = "tf_b5"

    @nn.compact
    def __call__(self, x, train: bool = False):
        wm, dm = _TIMM_SCALES[self.arch]
        x = _TfConv(_round_ch(32, wm), 3, 2, name="conv_stem")(x)
        x = nn.swish(_TfBN(name="bn1")(x, train))
        outs = []
        for si, (expand, ch, reps, s0, k) in enumerate(_B0_STAGES):
            ch = _round_ch(ch, wm)
            # timm scales repeats with ceil for every stage incl. first/last
            reps = int(math.ceil(reps * dm))
            for r in range(reps):
                s = s0 if r == 0 else 1
                if si == 0:
                    x = _TimmDSBlock(ch, k, s,
                                     name=f"blocks{si}_{r}")(x, train)
                else:
                    x = _TimmIRBlock(ch, expand, k, s,
                                     name=f"blocks{si}_{r}")(x, train)
            if si in (0, 1, 2, 4):
                outs.append(x)
        x = _TfConv(_round_ch(1280, wm), 1, name="conv_head")(x)
        outs.append(x)
        return outs


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
