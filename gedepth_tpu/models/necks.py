"""Ground-embedding necks.

LightPEMaskNeck — shared 5-scale fusion producing the learned ground mask y
(sigmoid) plus the 64-channel shared feature (reference
depth/models/necks/pemask_neck.py:29-64).

DynamicPENeckSoft — same fusion topology, 11-channel slope-bin logits head
(reference depth/models/necks/dynamicpe_neck.py:490-539).

Both consume the 5 neck outputs ordered [stem(64), s1, s2, s3, s4] and fuse
at the *largest* (stem, H/2) resolution with align_corners=True bilinear
upsampling.
"""
from __future__ import annotations

from typing import Sequence

import jax
import jax.numpy as jnp
import flax.linen as nn

from gedepth_tpu.models.layers import xavier_uniform_init, torch_bias_init
from gedepth_tpu.ops.resize import resize_bilinear


class _ScaleFuse(nn.Module):
    """Per-scale 3x3 conv to `channels`, upsample to the largest scale, sum."""
    channels: int = 64

    @nn.compact
    def __call__(self, inputs):
        target_hw = inputs[0].shape[1:3]  # stem scale (H/2)
        fused = None
        # Reference maps conv0->smallest ... conv4->stem; keep that naming.
        for i, x in enumerate(inputs[::-1]):
            y = nn.Conv(self.channels, (3, 3), padding=[(1, 1), (1, 1)],
                        kernel_init=xavier_uniform_init,
                        bias_init=nn.initializers.zeros,
                        name=f"conv{i}")(x)
            if y.shape[1:3] != target_hw:
                y = resize_bilinear(y, target_hw, align_corners=True)
            fused = y if fused is None else fused + y
        return fused


class LightPEMaskNeck(nn.Module):
    channels: int = 64

    @nn.compact
    def __call__(self, inputs):
        x = _ScaleFuse(self.channels, name="fuse")(inputs)
        y = nn.Conv(1, (3, 3), padding=[(1, 1), (1, 1)],
                    kernel_init=xavier_uniform_init,
                    bias_init=nn.initializers.zeros, name="convfinal")(x)
        return jax.nn.sigmoid(y), x


class DynamicPENeckSoft(nn.Module):
    channels: int = 64
    num_bins: int = 11

    @nn.compact
    def __call__(self, inputs):
        x = _ScaleFuse(self.channels, name="fuse")(inputs)
        return nn.Conv(self.num_bins, (3, 3), padding=[(1, 1), (1, 1)],
                       kernel_init=xavier_uniform_init,
                       bias_init=nn.initializers.zeros, name="convfinal")(x)
