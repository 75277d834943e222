"""AdaBins decode head (reference depth/models/decode_heads/adabins_head.py;
Bhat et al., CVPR 2021). Toolbox model-zoo component (SURVEY.md §2.8).

Decoder = DenseDepth UpSample chain -> 3x3 conv -> mini-ViT over 16x16
patches producing (a) adaptive bin widths via the first token and (b) range
attention maps via pixel-wise dot product with the next `channels` tokens;
depth = sum softmax(attn) * adaptive bin centers.
"""
from __future__ import annotations

from typing import Sequence

import numpy as np
import jax
import jax.numpy as jnp
import flax.linen as nn

from gedepth_tpu.models.layers import ConvModule, torch_conv_kernel_init
from gedepth_tpu.models.heads import UpSampleBlock, _leaky_relu


class TransformerEncoderLayer(nn.Module):
    """Post-LN transformer encoder layer (torch nn.TransformerEncoderLayer
    defaults: MHA -> add&norm -> FF(relu) -> add&norm)."""
    embed_dim: int
    num_heads: int = 4
    ff_dim: int = 1024

    @nn.compact
    def __call__(self, x):
        attn = nn.MultiHeadDotProductAttention(
            num_heads=self.num_heads, qkv_features=self.embed_dim,
            name="self_attn")(x, x)
        x = nn.LayerNorm(epsilon=1e-5, name="norm1")(x + attn)
        ff = nn.Dense(self.ff_dim, name="linear1")(x)
        ff = nn.relu(ff)
        ff = nn.Dense(self.embed_dim, name="linear2")(ff)
        return nn.LayerNorm(epsilon=1e-5, name="norm2")(x + ff)


class PatchTransformerEncoder(nn.Module):
    embed_dim: int = 128
    patch_size: int = 16
    num_heads: int = 4
    num_layers: int = 4

    @nn.compact
    def __call__(self, x):
        # x: (B, H, W, C) -> patch tokens (B, S, E)
        p = self.patch_size
        emb = nn.Conv(self.embed_dim, (p, p), strides=(p, p),
                      padding="VALID", kernel_init=torch_conv_kernel_init,
                      name="embedding_convPxP")(x)
        B, hp, wp, E = emb.shape
        tokens = emb.reshape(B, hp * wp, E)
        pos = self.param("positional_encodings",
                         nn.initializers.uniform(scale=1.0),
                         (500, self.embed_dim))
        tokens = tokens + pos[None, :tokens.shape[1]]
        for i in range(self.num_layers):
            tokens = TransformerEncoderLayer(
                self.embed_dim, self.num_heads, name=f"layer{i}")(tokens)
        return tokens


class MiniViT(nn.Module):
    """Needs >= channels + 1 patch tokens (reference mViT takes the first
    token as the bins regressor input and the next `channels` as range
    queries, adabins_head.py:52) — i.e. input H*W/patch_size^2 > channels;
    smaller toy inputs degrade gracefully to fewer queries."""
    channels: int = 128
    n_bins: int = 256
    patch_size: int = 16

    @nn.compact
    def __call__(self, x):
        tokens = PatchTransformerEncoder(
            self.channels, self.patch_size,
            name="patch_transformer")(x)
        feat = nn.Conv(self.channels, (3, 3), padding=[(1, 1), (1, 1)],
                       kernel_init=torch_conv_kernel_init, name="conv3x3")(x)

        head_tok = tokens[:, 0]                       # (B, E)
        queries = tokens[:, 1:self.channels + 1]      # (B, Q, E)

        # range attention maps: per-pixel dot with the query tokens
        B, H, W, C = feat.shape
        attn_maps = jnp.einsum("bhwc,bqc->bhwq", feat, queries)

        y = nn.Dense(256, name="regressor0")(head_tok)
        y = _leaky_relu(y)
        y = nn.Dense(256, name="regressor1")(y)
        y = _leaky_relu(y)
        y = nn.Dense(self.n_bins, name="regressor2")(y)
        y = nn.relu(y) + 0.1                          # norm='linear'
        y = y / jnp.sum(y, axis=1, keepdims=True)
        return y, attn_maps


class AdabinsHead(nn.Module):
    """Returns (depth, bin_edges); bin_edges feed BinsChamferLoss."""
    up_sample_channels: Sequence[int] = (128, 256, 512, 1024, 2048)
    channels: int = 128
    n_bins: int = 256
    patch_size: int = 16
    min_depth: float = 1e-3
    max_depth: float = 10.0

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
                # toolbox default act (ReLU): the adabins _base_ config does
                # not override act_cfg (reference decode_head.py:305)
                x = UpSampleBlock(ch, act=nn.relu, name=f"up{i}")(x, feat)

        x = nn.Conv(self.channels, (3, 3), padding=[(1, 1), (1, 1)],
                    kernel_init=torch_conv_kernel_init,
                    name="decode_final_conv")(x)

        widths_normed, attn_maps = MiniViT(
            self.channels, self.n_bins, self.patch_size,
            name="adaptive_bins_layer")(x)
        probs = jax.nn.softmax(
            nn.Conv(self.n_bins, (1, 1), kernel_init=torch_conv_kernel_init,
                    name="conv_out")(attn_maps), axis=-1)

        widths = (self.max_depth - self.min_depth) * widths_normed
        widths = jnp.pad(widths, ((0, 0), (1, 0)),
                         constant_values=self.min_depth)
        edges = jnp.cumsum(widths, axis=1)            # (B, n_bins + 1)
        centers = 0.5 * (edges[:, :-1] + edges[:, 1:])
        depth = jnp.einsum("bhwk,bk->bhw", probs, centers)[..., None]
        return depth, edges
