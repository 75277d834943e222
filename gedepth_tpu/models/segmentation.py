"""Segmentation-style scaffolding from the toolbox
(reference depth/models/depther/{encoder_decoder_seg,cascade_encoder_decoder}
and decode_heads/{fcn,ocr}-style heads): used by the ground-mask pretrain
path and for seg-style auxiliary experiments (SURVEY.md §2.5/2.8)."""
from __future__ import annotations

from typing import Any, Callable, Optional, Sequence

import jax
import jax.numpy as jnp
import flax.linen as nn

from gedepth_tpu.models.layers import ConvModule, torch_conv_kernel_init
from gedepth_tpu.ops.resize import resize_bilinear


def resize_concat(inputs, indices):
    """mmseg input_transform='resize_concat': upsample the selected scales
    to the first one's resolution and concatenate on channels."""
    sel = [inputs[i] for i in indices]
    hw = sel[0].shape[1:3]
    return jnp.concatenate(
        [sel[0]] + [resize_bilinear(f, hw) for f in sel[1:]], axis=-1)


class FCNHead(nn.Module):
    """num_convs x (kxk conv+BN+ReLU) -> 1x1 classifier
    (mmseg FCNHead shape). in_index may be an int (single scale) or a
    tuple (resize_concat of those scales, ocrnet_hr18 style)."""
    channels: int = 256
    num_classes: int = 2
    num_convs: int = 2
    in_index: Any = -1
    concat_input: bool = False
    kernel_size: int = 3

    @nn.compact
    def __call__(self, inputs, train: bool = False):
        if isinstance(self.in_index, (tuple, list)):
            x = resize_concat(inputs, self.in_index)
        else:
            x = inputs[self.in_index]
        inp = x
        for i in range(self.num_convs):
            x = ConvModule(self.channels, kernel_size=self.kernel_size,
                           use_norm=True, act=nn.relu,
                           name=f"conv{i}")(x, train=train)
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
    in_index: Any = -1

    @nn.compact
    def __call__(self, inputs, prev_logits, train: bool = False):
        if isinstance(self.in_index, (tuple, list)):
            x = resize_concat(inputs, self.in_index)
        else:
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


class SegOCRNet(nn.Module):
    """ocrnet_hr18 analogue, CLI-launchable (reference
    configs/_base_/models/ocrnet_hr18.py): HRNet backbone -> resize_concat
    of the 4 streams -> cascade [FCNHead(kernel 1, 1 conv, channels =
    sum(stream widths), stage weight 0.4), OCRHead(channels, ocr_channels,
    stage weight 1.0)]. Classes default to 2 — the in-tree segmentation
    task is the PE ground mask (reference MaskedPE / base_seg scaffolding);
    the reference base config's 19 classes are a Cityscapes placeholder.

    Exposes the GEDepth forward contract (`__call__(img, cam_height,
    train)`) so tools/train.py drives it; the output dict carries
    "seg_logits" = [aux, final] at input resolution and no "depth"."""
    backbone_arch: str = "w18"
    num_classes: int = 2
    ocr_channels: int = 512
    ocr_key_channels: int = 256
    cascade: bool = True     # False -> FCN head only
    # train-loop dispatch / interface parity with GEDepth
    arch: str = "seg"
    pe_variant: str = "vanilla"   # datasets load the PE channel (mask GT)
    min_depth: float = 1e-3
    max_depth: float = 80.0
    default_cam_height: float = 1.65

    @nn.compact
    def __call__(self, img, cam_height=None, train: bool = False):
        from gedepth_tpu.models.hrnet import HRNET_CFGS, HRNet
        rgb = img[..., :3]
        feats = HRNet(arch=self.backbone_arch, name="backbone")(
            rgb, train=train)
        widths = HRNET_CFGS[self.backbone_arch][-1][2]
        idx = tuple(range(len(feats)))
        aux = FCNHead(channels=sum(widths), num_classes=self.num_classes,
                      num_convs=1, kernel_size=1, in_index=idx,
                      name="aux_head")(feats, train=train)
        outs = [resize_bilinear(aux, img.shape[1:3])]
        if self.cascade:
            final = OCRHead(channels=self.ocr_channels,
                            ocr_channels=self.ocr_key_channels,
                            num_classes=self.num_classes, in_index=idx,
                            name="ocr_head")(feats, aux, train=train)
            outs.append(resize_bilinear(final, img.shape[1:3]))
        return {"seg_logits": outs, "depth": None, "y": None,
                "slope_logits": None, "pe_mask": None}


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
