"""Experiment-variant necks from the reference inventory
(depth/models/necks/{pemask_neck,dynamicpe_neck,skip_neck}.py, unused by the
shipped configs but part of the framework surface — SURVEY.md §2.7)."""
from __future__ import annotations

from typing import Optional, Sequence

import jax
import jax.numpy as jnp
import flax.linen as nn

from gedepth_tpu.models.layers import ConvModule, xavier_uniform_init
from gedepth_tpu.models.heads import UpSampleBlock, _leaky_relu
from gedepth_tpu.models.necks import _ScaleFuse
from gedepth_tpu.ops.resize import resize_bilinear


def _conv3(features, name):
    return nn.Conv(features, (3, 3), padding=[(1, 1), (1, 1)],
                   kernel_init=xavier_uniform_init,
                   bias_init=nn.initializers.zeros, name=name)


class _UpSampleChain(nn.Module):
    """DenseDepth-style decoder chain used by the heavy mask necks."""
    up_sample_channels: Sequence[int]

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
        return x


class PEMaskNeck(nn.Module):
    """Heavy mask decoder: UpSample chain -> sigmoid mask
    (reference pemask_neck.py:67-127)."""
    up_sample_channels: Sequence[int] = (64, 192, 384, 768, 1536)

    @nn.compact
    def __call__(self, inputs):
        x = _UpSampleChain(self.up_sample_channels, name="chain")(inputs)
        return jax.nn.sigmoid(_conv3(1, "conv1")(x)), None


class DynamicPEMaskNeck(nn.Module):
    """Heavy combined mask + slope-bin decoder
    (reference pemask_neck.py:172-232)."""
    up_sample_channels: Sequence[int] = (64, 192, 384, 768, 1536)
    num_bins: int = 11

    @nn.compact
    def __call__(self, inputs):
        x = _UpSampleChain(self.up_sample_channels, name="chain")(inputs)
        return (jax.nn.sigmoid(_conv3(1, "conv1")(x)),
                _conv3(self.num_bins, "conv2")(x))


class LightDynamicPEMaskNeck(nn.Module):
    """Light combined mask + slope-bin head over the shared 5-scale fusion
    (reference pemask_neck.py:130-166)."""
    channels: int = 64
    num_bins: int = 11

    @nn.compact
    def __call__(self, inputs):
        x = _ScaleFuse(self.channels, name="fuse")(inputs)
        return (jax.nn.sigmoid(_conv3(1, "convfinal_attn")(x)),
                _conv3(self.num_bins, "convfinal_dynamic")(x))


class DynamicPENeckGlobal(nn.Module):
    """Global (per-image) slope regression variant
    (reference dynamicpe_neck.py:79-170 DynamicPENeck family): pools the
    fused feature to a single slope distribution per image."""
    channels: int = 64
    num_bins: int = 11

    @nn.compact
    def __call__(self, inputs):
        x = _ScaleFuse(self.channels, name="fuse")(inputs)
        x = jnp.mean(x, axis=(1, 2))
        x = nn.Dense(self.channels, name="fc1")(x)
        x = _leaky_relu(x)
        return nn.Dense(self.num_bins, name="fc2")(x)


class DynamicPENeckStem(nn.Module):
    """Global slope scalar over the full pyramid (reference
    dynamicpe_neck.py:148-249 DynamicPENeck): 1x1 increase on the conv stem,
    then a stride-2 downsample cascade that ADDS each pyramid level
    (feat = down[i](feat) + inputs[i+1]), a 1x1 to 2048, global avg pool,
    Linear(1), and tanh LAST — the returned slope is bounded to [-1, 1].

    Expects the 5-scale pyramid [stem@/2, s1@/4 .. s4@/32] whose channel
    widths match `widths[1:]` (the skip adds are element-wise)."""
    widths: Sequence[int] = (96, 192, 384, 768, 1536)
    final_channels: int = 2048

    @nn.compact
    def __call__(self, inputs, train: bool = False):
        x = ConvModule(self.widths[0], kernel_size=1, use_norm=True,
                       act=nn.relu, name="increase")(inputs[0], train=train)
        for i in range(len(self.widths) - 1):
            x = ConvModule(self.widths[i + 1], kernel_size=3, stride=2,
                           use_norm=True, act=nn.relu,
                           name=f"down{i}")(x, train=train)
            x = x + inputs[i + 1]
        x = ConvModule(self.final_channels, kernel_size=1, use_norm=True,
                       act=nn.relu, name="final")(x, train=train)
        x = jnp.mean(x, axis=(1, 2))
        return jnp.tanh(nn.Dense(1, name="mlp")(x))  # (B, 1) global slope


class DynamicAttnPENeck(nn.Module):
    """Global slope-bin logits via strided convs + global max pool
    (reference dynamicpe_neck.py:80-145 DynamicATTNPENeck)."""
    out_channels: int = 5

    @nn.compact
    def __call__(self, stem_feat, train: bool = False):
        widths = (128, 64)
        x = stem_feat
        for i, c in enumerate(widths):
            x = ConvModule(c, kernel_size=3, stride=2, use_norm=True,
                           act=nn.relu, name=f"down{i}")(x, train=train)
        x = ConvModule(self.out_channels, kernel_size=1, use_norm=True,
                       act=nn.relu, name="final")(x, train=train)
        return jnp.max(x, axis=(1, 2))            # (B, out_channels)


class DynamicPENeckBackbone(nn.Module):
    """Global 9-bin slope head over an HRNet pyramid (reference
    dynamicpe_neck.py:251-317): per-scale Bottleneck increase layers, a
    stride-2 downsample cascade with adds, final 1x1 -> pool -> Linear(9)."""
    in_widths: Sequence[int] = (18, 36, 72, 144)
    out_widths: Sequence[int] = (128, 256, 512, 1024)
    final_channels: int = 2048
    num_bins: int = 9

    @nn.compact
    def __call__(self, inputs, train: bool = False):
        from gedepth_tpu.models.resnet import Bottleneck

        incs = [Bottleneck(c // 4, stride=1, downsample=True,
                           name=f"increase{i}")(
                    x, train=train)
                for i, (x, c) in enumerate(zip(inputs, self.out_widths))]
        feat = incs[0]
        for i in range(len(self.out_widths) - 1):
            feat = ConvModule(self.out_widths[i + 1], kernel_size=3,
                              stride=2, use_norm=True, act=nn.relu,
                              name=f"down{i}")(feat, train=train)
            feat = feat + incs[i + 1]
        feat = ConvModule(self.final_channels, kernel_size=1, use_norm=True,
                          act=nn.relu, name="final")(feat, train=train)
        x = jnp.mean(feat, axis=(1, 2))
        return nn.Dense(self.num_bins, name="fc")(x)


class DynamicPENeckSoft2(nn.Module):
    """Per-pixel slope bins over DETACHED features (reference
    dynamicpe_neck.py:318-355 DynamicPENeckSOFT2 — trains the slope head
    without backprop into the trunk)."""
    channels: int = 64
    num_bins: int = 11

    @nn.compact
    def __call__(self, inputs):
        inputs = [jax.lax.stop_gradient(x) for x in inputs]
        feats = inputs[::-1]                      # coarse -> fine
        tgt = feats[-1].shape[1:3]
        acc = None
        for i, f in enumerate(feats):
            y = _conv3(self.channels, f"conv{i}")(f)
            if f.shape[1:3] != tgt:
                y = resize_bilinear(y, tgt, align_corners=True)
            acc = y if acc is None else acc + y
        return _conv3(self.num_bins, "convfinal")(acc)


class DynamicPENeckSoftHRNet(nn.Module):
    """4-scale HRNet flavour of the soft slope head (reference
    dynamicpe_neck.py:357-393)."""
    channels: int = 18
    num_bins: int = 11

    @nn.compact
    def __call__(self, inputs):
        feats = inputs[::-1]
        tgt = feats[-1].shape[1:3]
        acc = None
        for i, f in enumerate(feats):
            y = _conv3(self.channels, f"conv{i}")(f)
            if f.shape[1:3] != tgt:
                y = resize_bilinear(y, tgt, align_corners=True)
            acc = y if acc is None else acc + y
        return _conv3(self.num_bins, "convfinal")(acc)


class DynamicPENeckSoftDDR(nn.Module):
    """Single-feature DDRNet flavour (reference dynamicpe_neck.py:395-428):
    conv-BN-ReLU x2 + 1x1 slope-bin conv."""
    channels: int = 256
    num_bins: int = 11

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = ConvModule(self.channels, kernel_size=3, use_norm=True,
                       act=nn.relu, name="fuse0")(x, train=train)
        x = ConvModule(self.channels, kernel_size=3, use_norm=True,
                       act=nn.relu, name="fuse1")(x, train=train)
        return nn.Conv(self.num_bins, (1, 1),
                       kernel_init=xavier_uniform_init, name="out")(x)


class DynamicPENeckHeavy(nn.Module):
    """DenseDepth UpSample chain -> 11-bin slope conv (reference
    dynamicpe_neck.py:430-488 DYNAMICPENeckHeavy)."""
    up_sample_channels: Sequence[int] = (64, 192, 384, 768, 1536)
    num_bins: int = 11

    @nn.compact
    def __call__(self, inputs):
        x = _UpSampleChain(self.up_sample_channels, name="chain")(inputs)
        return _conv3(self.num_bins, "conv1")(x)


class SkipNeck(nn.Module):
    """Passthrough/rescale neck (reference skip_neck.py:9)."""
    scales: Optional[Sequence[float]] = None

    @nn.compact
    def __call__(self, inputs):
        if not self.scales:
            return list(inputs)
        outs = []
        for x, s in zip(inputs, self.scales):
            if s == 1:
                outs.append(x)
            else:
                h, w = int(x.shape[1] * s), int(x.shape[2] * s)
                outs.append(resize_bilinear(x, (h, w)))
        return outs
