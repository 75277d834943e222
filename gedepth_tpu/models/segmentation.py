"""Segmentation-style scaffolding from the toolbox
(reference depth/models/depther/{encoder_decoder_seg,cascade_encoder_decoder}
and decode_heads/{fcn,ocr}-style heads): used by the ground-mask pretrain
path and for seg-style auxiliary experiments (SURVEY.md §2.5/2.8)."""
from __future__ import annotations

from typing import Callable, Optional, Sequence

import jax
import jax.numpy as jnp
import flax.linen as nn

from gedepth_tpu.models.layers import ConvModule, torch_conv_kernel_init
from gedepth_tpu.ops.resize import resize_bilinear


class FCNHead(nn.Module):
    """num_convs x (3x3 conv+BN+ReLU) -> 1x1 classifier
    (mmseg FCNHead shape)."""
    channels: int = 256
    num_classes: int = 2
    num_convs: int = 2
    in_index: int = -1
    concat_input: bool = False

    @nn.compact
    def __call__(self, inputs, train: bool = False):
        x = inputs[self.in_index]
        inp = x
        for i in range(self.num_convs):
            x = ConvModule(self.channels, kernel_size=3, use_norm=True,
                           act=nn.relu, name=f"conv{i}")(x, train=train)
        if self.concat_input:
            x = ConvModule(self.channels, kernel_size=3, use_norm=True,
                           act=nn.relu, name="conv_cat")(
                jnp.concatenate([inp, x], axis=-1), train=train)
        return nn.Conv(self.num_classes, (1, 1),
                       kernel_init=torch_conv_kernel_init,
                       name="conv_seg")(x)


class OCRHead(nn.Module):
    """Object-contextual representations head (mmseg OCRHead shape):
    soft object regions from a prior head -> object region features ->
    pixel-object attention -> fused classification."""
    channels: int = 256
    ocr_channels: int = 128
    num_classes: int = 2
    in_index: int = -1

    @nn.compact
    def __call__(self, inputs, prev_logits, train: bool = False):
        x = inputs[self.in_index]
        B, H, W, _ = x.shape
        feats = ConvModule(self.channels, kernel_size=3, use_norm=True,
                           act=nn.relu, name="bottleneck")(x, train=train)

        # object region representations: soft-masked average pooling
        probs = jax.nn.softmax(
            resize_bilinear(prev_logits, (H, W)), axis=-1)   # (B,H,W,K)
        flat_f = feats.reshape(B, H * W, self.channels)
        flat_p = probs.reshape(B, H * W, self.num_classes)
        flat_p = flat_p / (jnp.sum(flat_p, axis=1, keepdims=True) + 1e-6)
        regions = jnp.einsum("bnk,bnc->bkc", flat_p, flat_f)  # (B,K,C)

        # pixel-region attention (single head, scaled dot product)
        q = nn.Dense(self.ocr_channels, name="query_proj")(flat_f)
        k = nn.Dense(self.ocr_channels, name="key_proj")(regions)
        v = nn.Dense(self.ocr_channels, name="value_proj")(regions)
        attn = jax.nn.softmax(
            jnp.einsum("bnc,bkc->bnk", q, k) / self.ocr_channels ** 0.5,
            axis=-1)
        ctx = jnp.einsum("bnk,bkc->bnc", attn, v).reshape(
            B, H, W, self.ocr_channels)
        fused = ConvModule(self.channels, kernel_size=1, use_norm=True,
                           act=nn.relu, name="fuse")(
            jnp.concatenate([feats, ctx], axis=-1), train=train)
        return nn.Conv(self.num_classes, (1, 1),
                       kernel_init=torch_conv_kernel_init,
                       name="conv_seg")(fused)


class EncoderDecoderSeg(nn.Module):
    """backbone_apply -> decode head; logits upsampled to input size
    (reference encoder_decoder_seg.py role)."""
    backbone: nn.Module
    head: nn.Module

    @nn.compact
    def __call__(self, img, train: bool = False):
        feats = self.backbone(img, train=train)
        logits = self.head(feats, train=train)
        return resize_bilinear(logits, img.shape[1:3])


class CascadeEncoderDecoderSeg(nn.Module):
    """Cascade: stage-1 head's logits feed subsequent (OCR-style) stages
    (reference cascade_encoder_decoder.py role). Returns per-stage logits
    at input resolution, last = final prediction."""
    backbone: nn.Module
    first_head: nn.Module
    cascade_heads: Sequence[nn.Module]

    @nn.compact
    def __call__(self, img, train: bool = False):
        feats = self.backbone(img, train=train)
        logits = self.first_head(feats, train=train)
        outs = [resize_bilinear(logits, img.shape[1:3])]
        for head in self.cascade_heads:
            logits = head(feats, logits, train=train)
            outs.append(resize_bilinear(logits, img.shape[1:3]))
        return outs
