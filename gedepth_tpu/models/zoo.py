"""Launchable model-zoo composition.

The reference inherits a model zoo from the Monocular-Depth-Estimation-
Toolbox as `configs/_base_/models/{adabins,bts,dpt,binsformer,densedepth,
ocrnet_hr18}.py` — backbone + decode-head pairs built through the
DepthEncoderDecoder registry (reference depth/models/builder.py:9-46). Here
the same pairings are one explicit flax module with the SAME interface as
`GEDepth` (`__call__ -> dict`, `predict_depth`), so every zoo model trains
and evals through the standard `tools/train.py` / `tools/test.py` path.

Pairings (mirroring the reference `_base_` fragments):
  adabins    — EfficientNet + AdabinsHead        (_base_/models/adabins.py)
  bts        — ResNet-50 (+stem skip) + BTSHead  (_base_/models/bts.py)
  dpt        — ViT + DPTHead                     (_base_/models/dpt.py)
  binsformer — Swin + BinsFormerHead             (_base_/models/binsformer.py)
  densedepth — ResNet-50 + DenseDepthHead        (_base_/models/densedepth.py)
"""
from __future__ import annotations

from typing import Optional, Sequence

import jax.numpy as jnp
import flax.linen as nn

from gedepth_tpu.ops.resize import resize_bilinear

ZOO_ARCHS = ("adabins", "bts", "dpt", "binsformer", "densedepth")


class ZooDepther(nn.Module):
    """Backbone + decode-head pair with the GEDepth forward contract.

    Returns {"depth", "y": None, "slope_logits": None, "bin_edges"?,
    "class_logits"?}; auxiliary outputs feed optional zoo losses
    (BinsChamferLoss for adabins/binsformer, scene-class CE for binsformer).
    """
    arch: str = "bts"
    backbone_variant: str = ""        # '50' resnet depth, 'b0' efficientnet
    backbone_embed_dims: int = 0      # 0 = arch default (ViT 768 / Swin 96)
    backbone_depth: int = 0           # 0 = arch default (ViT 12 layers)
    min_depth: float = 1e-3
    max_depth: float = 10.0
    head_channels: int = 128
    n_bins: int = 256                 # adabins/binsformer bin count
    # interface parity with GEDepth (train/eval steps read these)
    pe_variant: str = "none"
    default_cam_height: float = 1.65

    @nn.compact
    def __call__(self, img, cam_height=None, train: bool = False):
        assert self.arch in ZOO_ARCHS, self.arch
        rgb = img[..., :3]
        out = {"y": None, "slope_logits": None, "pe_mask": None}

        if self.arch == "adabins":
            from gedepth_tpu.models.adabins import AdabinsHead
            variant = self.backbone_variant or "b0"
            if variant.startswith("tf_"):
                # checkpoint-faithful timm backbone (the reference wraps
                # tf_efficientnet_b5_ap; released AdaBins ckpts need its
                # exact endpoints/channels)
                from gedepth_tpu.models.efficientnet import TimmEfficientNet
                feats = TimmEfficientNet(variant, name="backbone")(
                    rgb, train=train)
            else:
                from gedepth_tpu.models.efficientnet import EfficientNet
                feats = EfficientNet(variant, name="backbone")(
                    rgb, train=train)
            widths = tuple(
                self.head_channels * (2 ** i) for i in range(len(feats)))
            depth, edges = AdabinsHead(
                up_sample_channels=widths, channels=self.head_channels,
                n_bins=self.n_bins, min_depth=self.min_depth,
                max_depth=self.max_depth, name="decode_head")(feats)
            out.update(depth=depth, bin_edges=edges)
        elif self.arch == "bts":
            from gedepth_tpu.models.resnet import ResNet
            from gedepth_tpu.models.bts import BTSHead
            feats = ResNet(depth=int(self.backbone_variant or 50),
                           include_stem=True, name="backbone")(
                               rgb, train=train)
            depth = BTSHead(
                in_channels=tuple(f.shape[-1] for f in feats),
                num_features=self.head_channels * 4,
                min_depth=self.min_depth, max_depth=self.max_depth,
                name="decode_head")(feats, train=train)
            out.update(depth=depth)
        elif self.arch == "dpt":
            from gedepth_tpu.models.vit import VisionTransformer
            from gedepth_tpu.models.dpt import DPTHead
            ed = self.backbone_embed_dims or 768
            dep = self.backbone_depth or 12
            out_idx = tuple(round((i + 1) * dep / 4) - 1 for i in range(4))
            tokens = VisionTransformer(
                embed_dims=ed, depth=dep, num_heads=max(1, ed // 64),
                out_indices=out_idx, name="backbone")(rgb, train=train)
            post = tuple(max(8, ed * m // 8) for m in (1, 2, 4, 8))
            depth = DPTHead(channels=self.head_channels,
                            post_process_channels=post,
                            min_depth=self.min_depth,
                            name="decode_head")(tokens)
            out.update(depth=depth)
        elif self.arch == "binsformer":
            from gedepth_tpu.models.swin import DepthFormerSwin
            from gedepth_tpu.models.binsformer import BinsFormerHead
            ed = self.backbone_embed_dims or 96
            heads = tuple(max(1, ed * m // 96) for m in (3, 6, 12, 24))
            feats = DepthFormerSwin(
                embed_dims=ed, depths=(2, 2, 6, 2), num_heads=heads,
                use_pe=False, name="backbone")(rgb, train=train)
            layer_outs = BinsFormerHead(
                in_channels=tuple(f.shape[-1] for f in feats),
                conv_dim=self.head_channels,
                n_bins=self.n_bins if self.n_bins <= 64 else 64,
                min_depth=self.min_depth, max_depth=self.max_depth,
                name="decode_head")(feats, train=train)
            final = layer_outs[-1]
            out.update(depth=final["depth"],
                       bin_edges=final.get("bin_edges"),
                       class_logits=final.get("class_logits"),
                       aux_layer_outs=layer_outs[:-1] if train else None)
        else:  # densedepth
            from gedepth_tpu.models.resnet import ResNet
            from gedepth_tpu.models.heads import DenseDepthHead
            feats = ResNet(depth=int(self.backbone_variant or 50),
                           include_stem=True, name="backbone")(
                               rgb, train=train)
            depth, _ = DenseDepthHead(
                up_sample_channels=tuple(f.shape[-1] for f in feats),
                channels=self.head_channels, min_depth=self.min_depth,
                max_depth=self.max_depth, name="decode_head")(
                    feats, None, None)
            out.update(depth=depth)
        return out

    def predict_depth(self, img, cam_height=None):
        out = self(img, cam_height=cam_height, train=False)
        depth = jnp.clip(out["depth"], self.min_depth, self.max_depth)
        return resize_bilinear(depth, img.shape[1:3], align_corners=True)
