"""Stage-1 ground-mask pretraining.

The reference trains a ground-mask segmentation model first
(PEEncoderDecoder + MaskedPE head, depth/models/depther/encoder_decoder_pe.py
+ maskpe_head.py) and unconditionally overlays its backbone onto the depth
model (tools/train.py:65-81). Mask GT is "PE agrees with lidar within 3%"
(loading.py:337-351). We keep the capability but make the overlay an
explicit CLI flag instead of an unconditional hardcoded path.

GroundMaskPretrain reuses the exact production backbone + HAHI neck, fusing
the pyramid to a 64-channel map and classifying ground/not-ground (2-way CE
with class weights [0.2, 1.0], ignore 255) — so the pretrained backbone drops
onto GEDepth with zero key surgery.
"""
from __future__ import annotations

from typing import Sequence

import numpy as np
import jax
import jax.numpy as jnp
import flax.linen as nn

from gedepth_tpu.models.swin import DepthFormerSwin
from gedepth_tpu.models.hahi import HAHINeck
from gedepth_tpu.models.necks import _ScaleFuse
from gedepth_tpu.models.layers import xavier_uniform_init
from gedepth_tpu.ops.resize import resize_bilinear


def ground_mask_gt(pe: np.ndarray, gt: np.ndarray,
                   rel_tol: float = 0.03) -> np.ndarray:
    """Binary ground mask: PE within rel_tol of lidar GT (gt==0 -> class 0,
    matching the reference's uint8 mask semantics)."""
    err = np.divide(np.abs(pe - gt), gt, out=np.zeros_like(gt),
                    where=gt != 0)
    mask = np.logical_and(err <= rel_tol, gt > 0)
    return mask.astype(np.float32)


class GroundMaskPretrain(nn.Module):
    embed_dims: int = 192
    depths: Sequence[int] = (2, 2, 18, 2)
    num_heads: Sequence[int] = (6, 12, 24, 48)
    window: int = 7
    drop_path_rate: float = 0.3
    neck_channels: Sequence[int] = (64, 192, 384, 768, 1536)
    neck_embed_dim: int = 512
    neck_num_points: int = 8
    use_pe_input: bool = True
    num_classes: int = 2

    @nn.compact
    def __call__(self, img, cam_height=None, train: bool = False):
        B, H, W, _ = img.shape
        feats = DepthFormerSwin(
            embed_dims=self.embed_dims, depths=self.depths,
            num_heads=self.num_heads, window=self.window,
            drop_path_rate=self.drop_path_rate, use_pe=self.use_pe_input,
            name="backbone")(img, train=train)
        feats = HAHINeck(
            in_channels=self.neck_channels, out_channels=self.neck_channels,
            embed_dim=self.neck_embed_dim, num_points=self.neck_num_points,
            name="neck")(feats, train=train)
        x = _ScaleFuse(64, name="fuse")(feats)
        logits = nn.Conv(self.num_classes, (3, 3), padding=[(1, 1), (1, 1)],
                         kernel_init=xavier_uniform_init,
                         name="classifier")(x)
        return resize_bilinear(logits, (H, W), align_corners=True)


def weighted_ce_ignore(logits, labels, class_weights=(0.2, 1.0),
                       ignore_index=255):
    """torch nn.CrossEntropyLoss(weight=w) semantics: weighted mean =
    sum(w_y * nll) / sum(w_y) over non-ignored pixels."""
    labels = labels.astype(jnp.int32)
    valid = labels != ignore_index
    safe = jnp.where(valid, labels, 0)
    logp = jax.nn.log_softmax(logits, axis=-1)
    nll = -jnp.take_along_axis(logp, safe[..., None], axis=-1)[..., 0]
    w = jnp.asarray(np.asarray(class_weights, np.float32))[safe]
    w = w * valid.astype(logits.dtype)
    return jnp.sum(nll * w) / jnp.maximum(jnp.sum(w), 1e-8)


def extract_backbone(params: dict) -> dict:
    """Backbone subtree for the stage-2 overlay."""
    return {"backbone": params["backbone"]}


def overlay_backbone(target_params, source_params):
    """Replace target's backbone subtree with source's (shape-checked)."""
    import jax

    src = source_params["backbone"]
    tgt = dict(target_params)

    def check(a, b):
        assert a.shape == b.shape, (a.shape, b.shape)
        return jnp.asarray(b, a.dtype)

    tgt["backbone"] = jax.tree.map(check, target_params["backbone"], src)
    return tgt
