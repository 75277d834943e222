"""GEDepth model composition: backbone -> HAHI -> PE necks -> decode head.

Replaces the reference's registry-built DepthEncoderDecoder
(depth/models/depther/encoder_decoder.py:21-274) with one flax module.

PE variants:
  * 'none'     — plain DepthFormer baseline, depth = relu(conv)+min_depth.
  * 'vanilla'  — pe_mask = img[..., 3] * y * vanilla_pe_multiplier. The
    reference hardcodes 200 here even when depth_scale=250 (DDAD)
    (encoder_decoder.py:120-123); we default to 200 and make it explicit.
  * 'adaptive' — slope-bin logits -> soft expected slope -> re-derived prior
    (encoder_decoder.py:79-102), using per-sample camera height.

Forward returns a dict so train/eval steps stay pure functions:
  depth        (B, h/2, w/2, 1) raw fused depth (pre-clamp)
  y            (B, H, W, 1) ground mask at input res (None for 'none')
  slope_logits (B, H, W, 11) for the CE loss ('adaptive' only)
"""
from __future__ import annotations

from typing import Optional, Sequence

import jax.numpy as jnp
import flax.linen as nn

from gedepth_tpu.models.swin import DepthFormerSwin
from gedepth_tpu.models.hahi import HAHINeck
from gedepth_tpu.models.necks import LightPEMaskNeck, DynamicPENeckSoft
from gedepth_tpu.models.heads import DenseDepthHead
from gedepth_tpu.ops.pallas.pe_fusion import pe_fusion_xla
from gedepth_tpu.ops.resize import resize_bilinear


class GEDepth(nn.Module):
    # backbone
    embed_dims: int = 192
    depths: Sequence[int] = (2, 2, 18, 2)
    num_heads: Sequence[int] = (6, 12, 24, 48)
    window: int = 7
    drop_path_rate: float = 0.3
    swin_scan: bool = False   # nn.scan over block pairs (compile-time win)
    # remat granularity (backward-pass memory vs recompute trade):
    swin_remat: bool = True        # rematerialise Swin blocks
    neck_msda_remat: bool = True   # rematerialise MSDA sampling tensors
    # neck
    neck_channels: Sequence[int] = (64, 192, 384, 768, 1536)
    neck_embed_dim: int = 512
    neck_num_points: int = 8
    # 'bilinear' (reference semantics) | 'nearest' (cheap approximation) |
    # 'windowed' (TPU-native dense mode) | 'windowed_compat' (reference
    # parameter tree + dense windowed sampling; see ops/msda.py, hahi.py)
    neck_sampling: str = "bilinear"
    neck_window_radius: int = 4
    neck_hi_min_level: int = 0
    # bf16 VALUE maps through the windowed sampler (halved band DMA, bf16
    # MXU dot with f32 accumulate); offsets/weights/projections stay f32.
    # Independent of bf16_scope — measure the delta before combining on a
    # parity config (models/hahi.py MSDeformAttention.value_bf16).
    neck_value_bf16: bool = False
    # head
    head_channels: int = 64
    min_depth: float = 1e-3
    max_depth: float = 80.0
    # PE
    pe_variant: str = "adaptive"  # 'none' | 'vanilla' | 'adaptive'
    depth_scale: float = 200.0
    vanilla_pe_multiplier: float = 200.0
    default_cam_height: float = 1.65
    # Mixed precision for serving: run the named scope in bfloat16 and the
    # rest in float32. The FLOPs live in the backbone + HAHI + decode-head
    # convs; the accuracy-critical metric path (slope bins, PE prior up to
    # depth_scale=200 — only 8 mantissa bits in bf16 — and the final
    # fusion/clamp) stays f32 in every scope: pe_mask and y are always
    # computed f32, so the head's fusion d*(1-y)+pe promotes back to f32
    # even when the head convs run bf16. The model casts ACTIVATIONS at
    # the scope boundaries; the caller must cast the matching PARAM
    # subtrees to bf16 as well, or XLA's type promotion silently lifts the
    # compute back to f32 (correct, no speedup). See
    # apis.inference.cast_params_bf16(scope=...). Scopes:
    #   'backbone'           Swin only
    #   'backbone_neck'      + HAHI
    #   'backbone_head'      Swin + decode head (HAHI f32)
    #   'backbone_neck_head' everything except PE necks + fusion
    bf16_scope: str = "none"

    @nn.compact
    def __call__(self, img, cam_height=None, train: bool = False):
        assert self.pe_variant in ("none", "vanilla", "adaptive")
        assert self.bf16_scope in ("none", "backbone", "backbone_neck",
                                   "backbone_head", "backbone_neck_head")
        use_pe = self.pe_variant != "none"
        B, H, W, C = img.shape

        backbone = DepthFormerSwin(
            embed_dims=self.embed_dims, depths=self.depths,
            num_heads=self.num_heads, window=self.window,
            drop_path_rate=self.drop_path_rate, use_pe=use_pe,
            scan_pairs=self.swin_scan, remat=self.swin_remat,
            name="backbone")
        x = (img.astype(jnp.bfloat16) if self.bf16_scope != "none" else img)
        feats = backbone(x, train=train)
        if self.bf16_scope in ("backbone", "backbone_head"):
            feats = [f.astype(jnp.float32) for f in feats]

        feats = HAHINeck(
            in_channels=self.neck_channels, out_channels=self.neck_channels,
            embed_dim=self.neck_embed_dim, num_points=self.neck_num_points,
            sampling=self.neck_sampling,
            window_radius=self.neck_window_radius,
            hi_min_level=self.neck_hi_min_level,
            msda_remat=self.neck_msda_remat,
            value_bf16=self.neck_value_bf16,
            name="neck")(feats, train=train)
        if self.bf16_scope in ("backbone_neck", "backbone_neck_head"):
            feats = [f.astype(jnp.float32) for f in feats]

        y = None
        pe_mask = None
        slope_logits = None
        if use_pe:
            y_small, _shared = LightPEMaskNeck(name="pe_mask_neck")(feats)
            # F.interpolate default: align_corners=False
            # (encoder_decoder.py:114)
            y = resize_bilinear(y_small, (H, W), align_corners=False)
            if self.pe_variant == "adaptive":
                logits_small = DynamicPENeckSoft(name="dynamic_pe_neck")(feats)
                slope_logits = resize_bilinear(logits_small, (H, W),
                                               align_corners=False)
                if cam_height is None:
                    h = jnp.full((B,), self.default_cam_height, img.dtype)
                else:
                    h = cam_height.reshape(B).astype(img.dtype)
                # one canonical fusion implementation (ops.pallas.pe_fusion)
                pe_mask = pe_fusion_xla(slope_logits, img[..., 4],
                                        y[..., 0], h,
                                        self.depth_scale)[..., None]
            else:
                pe_mask = img[..., 3:4] * y * self.vanilla_pe_multiplier

        head_in = feats
        if self.bf16_scope in ("backbone_head", "backbone_neck_head"):
            # head convs run bf16; pe_mask/y stay f32 so the fusion
            # d*(1-y)+pe inside the head promotes back to f32
            head_in = [f.astype(jnp.bfloat16) for f in feats]
        depth, _ = DenseDepthHead(
            up_sample_channels=self.neck_channels,
            channels=self.head_channels, min_depth=self.min_depth,
            max_depth=self.max_depth, name="decode_head")(head_in, pe_mask, y)

        return {"depth": depth, "y": y, "slope_logits": slope_logits,
                "pe_mask": pe_mask}

    def predict_depth(self, img, cam_height=None):
        """Inference: clamp to [min, max] depth and resize to input size
        (encoder_decoder.py:126-139; align_corners=True from the head cfg)."""
        out = self(img, cam_height=cam_height, train=False)
        depth = jnp.clip(out["depth"], self.min_depth, self.max_depth)
        return resize_bilinear(depth, img.shape[1:3], align_corners=True)
