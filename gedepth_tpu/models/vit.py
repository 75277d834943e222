"""Vision Transformer backbone (reference depth/models/backbones/vit.py
role; pairs with the DPT head). NHWC flax; emits tokens from selected
layers plus the class token for DPT's readout."""
from __future__ import annotations

from typing import Sequence, Tuple

import numpy as np
import jax
import jax.numpy as jnp
import flax.linen as nn

from gedepth_tpu.models.layers import Mlp, trunc_normal_init


class ViTBlock(nn.Module):
    dim: int
    num_heads: int
    mlp_ratio: int = 4
    drop_path: float = 0.0

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        y = nn.LayerNorm(epsilon=1e-6, name="ln1")(x)
        y = nn.MultiHeadDotProductAttention(
            num_heads=self.num_heads, qkv_features=self.dim,
            kernel_init=trunc_normal_init, name="attn")(y, y)
        x = x + y
        y = nn.LayerNorm(epsilon=1e-6, name="ln2")(x)
        y = Mlp(self.mlp_ratio * self.dim, self.dim, name="ffn")(
            y, deterministic)
        return x + y


class VisionTransformer(nn.Module):
    """ViT with class token; returns [(tokens, (h, w)), ...] per out layer
    (class token separated for DPT readout)."""
    embed_dims: int = 768
    depth: int = 12
    num_heads: int = 12
    patch_size: int = 16
    out_indices: Sequence[int] = (2, 5, 8, 11)
    mlp_ratio: int = 4
    pretrain_grid: int = 14  # 224 / 16

    @nn.compact
    def __call__(self, img, train: bool = False):
        B, H, W, C = img.shape
        p = self.patch_size
        pad_b = (p - H % p) % p
        pad_r = (p - W % p) % p
        if pad_b or pad_r:
            img = jnp.pad(img, ((0, 0), (0, pad_b), (0, pad_r), (0, 0)))
        x = nn.Conv(self.embed_dims, (p, p), strides=(p, p), padding="VALID",
                    name="patch_embed")(img)
        h, w = x.shape[1], x.shape[2]
        x = x.reshape(B, h * w, self.embed_dims)

        cls = self.param("cls_token", nn.initializers.zeros,
                         (1, 1, self.embed_dims))
        pos = self.param("pos_embed", trunc_normal_init,
                         (1, self.pretrain_grid ** 2 + 1, self.embed_dims))
        # interpolate grid positional embeddings to (h, w)
        grid_pos = pos[:, 1:].reshape(
            1, self.pretrain_grid, self.pretrain_grid, self.embed_dims)
        from gedepth_tpu.ops.resize import resize_bilinear
        grid_pos = resize_bilinear(grid_pos, (h, w)).reshape(
            1, h * w, self.embed_dims)
        x = x + grid_pos
        cls_tok = jnp.broadcast_to(cls + pos[:, :1], (B, 1, self.embed_dims))
        x = jnp.concatenate([cls_tok, x], axis=1)

        outs = []
        for i in range(self.depth):
            x = ViTBlock(self.embed_dims, self.num_heads, self.mlp_ratio,
                         name=f"block{i}")(x, not train)
            if i in self.out_indices:
                outs.append((x, (h, w)))
        return outs
