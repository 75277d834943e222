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
