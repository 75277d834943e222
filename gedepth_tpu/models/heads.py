"""DenseDepth decode head with ground-embedding fusion.

UpSample skip-fusion chain from the deepest neck scale up to the conv-stem
scale (reference depth/models/decode_heads/densedepth_head.py:29-131), then
the fusion formula depth = relu(conv(feat)) * (1 - y) + pe + min_depth
(decode_head.py:460-509). align_corners=True everywhere (base config).
"""
from __future__ import annotations

from typing import Optional, Sequence

import jax
import jax.numpy as jnp
import flax.linen as nn

from gedepth_tpu.models.layers import (
    ConvModule, torch_conv_kernel_init, torch_bias_init)
from gedepth_tpu.ops.resize import resize_bilinear


def _leaky_relu(x):
    return nn.leaky_relu(x, negative_slope=0.01)


class UpSampleBlock(nn.Module):
    """upsample -> concat skip -> two 3x3 convs (act only, no norm).

    act defaults to LeakyReLU(0.01) — the GEDepth configs override the
    toolbox's ReLU default (depthformer_a.py:121); zoo heads built from the
    toolbox `_base_` configs pass nn.relu."""
    features: int
    act: object = None

    @nn.compact
    def __call__(self, x, skip):
        act = self.act or _leaky_relu
        x = resize_bilinear(x, skip.shape[1:3], align_corners=True)
        x = jnp.concatenate([x, skip], axis=-1)
        x = ConvModule(self.features, kernel_size=3, act=act,
                       use_bias=True, name="convA")(x)
        x = ConvModule(self.features, kernel_size=3, act=act,
                       use_bias=True, name="convB")(x)
        return x


class DenseDepthHead(nn.Module):
    """Decoder over the 5 neck scales; returns (depth, y_resized).

    in_channels/up_sample_channels are listed coarse->fine order reversed
    from the config ([64, ..., 1536] in config == fine->coarse); internally
    we process deepest-first like the reference.

    fpn=True switches to the FPN decoder variant (1x1 lateral + add-upsample
    + 3x3 output convs; reference densedepth_head.py:53-75,103-118).
    """
    up_sample_channels: Sequence[int] = (64, 192, 384, 768, 1536)
    channels: int = 64
    min_depth: float = 1e-3
    max_depth: float = 80.0
    align_corners: bool = True
    fpn: bool = False
    fpn_dim: int = 256

    @nn.compact
    def __call__(self, inputs, pe_mask=None, y=None):
        # inputs: [stem, s1, s2, s3, s4] fine->coarse; iterate coarse->fine.
        up_channels = list(self.up_sample_channels)[::-1]
        feats = inputs[::-1]
        x = None
        if self.fpn:
            for i, feat in enumerate(feats):
                lat = ConvModule(self.fpn_dim, kernel_size=1, act=None,
                                 use_bias=True, name=f"lateral{i}")(feat)
                if x is None:
                    x = lat
                else:
                    x = lat + resize_bilinear(x, lat.shape[1:3],
                                              align_corners=True)
                x = ConvModule(self.fpn_dim, kernel_size=3, act=_leaky_relu,
                               use_bias=True, name=f"output{i}")(x)
        else:
            for i, (feat, ch) in enumerate(zip(feats, up_channels)):
                if i == 0:
                    x = ConvModule(ch, kernel_size=1, act=None,
                                   use_bias=True, name=f"conv{i}")(feat)
                else:
                    x = UpSampleBlock(ch, name=f"up{i}")(x, feat)

        d = nn.Conv(1, (3, 3), padding=[(1, 1), (1, 1)],
                    kernel_init=torch_conv_kernel_init,
                    bias_init=torch_bias_init(9 * x.shape[-1]),
                    name="conv_depth")(x)
        d = nn.relu(d)

        if pe_mask is not None:
            pe = resize_bilinear(pe_mask, d.shape[1:3],
                                 align_corners=self.align_corners)
            y_r = resize_bilinear(y, d.shape[1:3],
                                  align_corners=self.align_corners)
            out = d * (1.0 - y_r) + pe + self.min_depth
            return out, y_r
        return d + self.min_depth, None
