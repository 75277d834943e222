"""DPT decode head (reference depth/models/decode_heads/dpt_head.py role;
Ranftl et al. 2021): reassemble ViT tokens into 4 scales, fuse with residual
conv units, regress depth."""
from __future__ import annotations

from typing import Sequence

import jax
import jax.numpy as jnp
import flax.linen as nn

from gedepth_tpu.models.layers import torch_conv_kernel_init
from gedepth_tpu.ops.resize import resize_bilinear


class _Deconv(nn.Module):
    """k=s transposed conv as Dense + depth-to-space — bit-exact torch
    ConvTranspose2d semantics for non-overlapping kernels (reference
    dpt_head.py:77-89 resize_layers)."""
    features: int
    factor: int

    @nn.compact
    def __call__(self, x):
        B, h, w, _ = x.shape
        f = self.factor
        x = nn.Dense(f * f * self.features, name="dense")(x)
        x = x.reshape(B, h, w, f, f, self.features)
        x = x.transpose(0, 1, 3, 2, 4, 5)
        return x.reshape(B, h * f, w * f, self.features)


class ReassembleBlock(nn.Module):
    """Project tokens (+cls readout) to a spatial map at a given scale.

    Resizing is LEARNED, matching the reference (dpt_head.py:77-96):
    scale 4/2 -> transposed conv k=s, scale 1 -> identity, scale 0.5 ->
    stride-2 3x3 conv."""
    features: int
    scale: float  # relative to the patch grid: 4, 2, 1, 0.5

    @nn.compact
    def __call__(self, tokens, hw):
        B, N, C = tokens.shape
        h, w = hw
        cls_tok, grid = tokens[:, :1], tokens[:, 1:]
        # 'project' readout: concat cls to every token then mlp back to C
        # (the dpt config sets readout_type='project', _base_/models/dpt.py)
        x = jnp.concatenate(
            [grid, jnp.broadcast_to(cls_tok, grid.shape)], axis=-1)
        x = nn.gelu(nn.Dense(C, name="readout")(x))
        x = x.reshape(B, h, w, C)
        x = nn.Conv(self.features, (1, 1),
                    kernel_init=torch_conv_kernel_init, name="proj")(x)
        if self.scale >= 2:
            x = _Deconv(self.features, int(self.scale), name="resize")(x)
        elif self.scale == 0.5:
            x = nn.Conv(self.features, (3, 3), strides=(2, 2),
                        padding=[(1, 1), (1, 1)],
                        kernel_init=torch_conv_kernel_init,
                        name="resize")(x)
        return x


class ResidualConvUnit(nn.Module):
    """Pre-act residual unit; convs are bias-free like the reference
    (dpt_head.py:148-168 ConvModule(bias=False))."""
    features: int

    @nn.compact
    def __call__(self, x):
        y = nn.relu(x)
        y = nn.Conv(self.features, (3, 3), padding=[(1, 1), (1, 1)],
                    use_bias=False,
                    kernel_init=torch_conv_kernel_init, name="conv1")(y)
        y = nn.relu(y)
        y = nn.Conv(self.features, (3, 3), padding=[(1, 1), (1, 1)],
                    use_bias=False,
                    kernel_init=torch_conv_kernel_init, name="conv2")(y)
        return x + y


class FeatureFusionBlock(nn.Module):
    features: int

    @nn.compact
    def __call__(self, x, skip=None):
        if skip is not None:
            x = x + ResidualConvUnit(self.features, name="rcu1")(skip)
        x = ResidualConvUnit(self.features, name="rcu2")(x)
        x = resize_bilinear(x, (x.shape[1] * 2, x.shape[2] * 2),
                            align_corners=True)
        return nn.Conv(self.features, (1, 1),
                       kernel_init=torch_conv_kernel_init, name="out")(x)


class DPTHead(nn.Module):
    """Inputs: list of (tokens, (h, w)) from 4 ViT layers (shallow->deep)."""
    post_process_channels: Sequence[int] = (96, 192, 384, 768)
    channels: int = 256
    min_depth: float = 1e-3
    max_depth: float = 10.0

    @nn.compact
    def __call__(self, inputs):
        scales = (4.0, 2.0, 1.0, 0.5)
        maps = []
        for i, ((tokens, hw), c, s) in enumerate(
                zip(inputs, self.post_process_channels, scales)):
            x = ReassembleBlock(c, s, name=f"reassemble{i}")(tokens, hw)
            x = nn.Conv(self.channels, (3, 3), padding=[(1, 1), (1, 1)],
                        use_bias=False, kernel_init=torch_conv_kernel_init,
                        name=f"channel_proj{i}")(x)
            maps.append(x)

        x = FeatureFusionBlock(self.channels, name="fusion3")(maps[3])
        x = resize_bilinear(x, maps[2].shape[1:3], align_corners=True)
        x = FeatureFusionBlock(self.channels, name="fusion2")(x, maps[2])
        x = resize_bilinear(x, maps[1].shape[1:3], align_corners=True)
        x = FeatureFusionBlock(self.channels, name="fusion1")(x, maps[1])
        x = resize_bilinear(x, maps[0].shape[1:3], align_corners=True)
        x = FeatureFusionBlock(self.channels, name="fusion0")(x, maps[0])

        # post-fusion project conv (reference dpt_head.py:290-295; norm_cfg
        # is None in the dpt config so this is conv + ReLU)
        x = nn.relu(nn.Conv(self.channels, (3, 3), padding=[(1, 1), (1, 1)],
                            kernel_init=torch_conv_kernel_init,
                            name="project")(x))
        x = nn.Conv(self.channels // 2, (3, 3), padding=[(1, 1), (1, 1)],
                    kernel_init=torch_conv_kernel_init, name="head_conv1")(x)
        x = resize_bilinear(x, (x.shape[1] * 2, x.shape[2] * 2),
                            align_corners=True)
        x = nn.relu(nn.Conv(32, (3, 3), padding=[(1, 1), (1, 1)],
                            kernel_init=torch_conv_kernel_init,
                            name="head_conv2")(x))
        d = nn.Conv(1, (1, 1), kernel_init=torch_conv_kernel_init,
                    name="conv_depth")(x)
        return nn.relu(d) + self.min_depth
