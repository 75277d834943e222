"""BinsFormer decode head (reference
depth/models/decode_heads/binsformer_head.py + the PixelTransformerDecoder in
depth/models/utils/transformer.py; Li et al. 2022).

Double-stream design: an FPN pixel decoder produces a per-pixel feature map;
bin queries cross-attend multi-scale features round-robin over the decoder
layers, each layer emitting (adaptive bin widths, per-pixel bin logits,
optional scene-class logits); depth = softmax(logits) . bin centers. All
decoder layers' outputs are returned for DETR-style auxiliary losses.
"""
from __future__ import annotations

from typing import Optional, Sequence

import numpy as np
import jax
import jax.numpy as jnp
import flax.linen as nn

from gedepth_tpu.models.layers import (
    ConvModule, sine_positional_encoding, xavier_uniform_init)
from gedepth_tpu.models.hahi import (
    MSDeformAttention, _center_reference_points)
from gedepth_tpu.ops.resize import resize_bilinear


class _DecoderLayer(nn.Module):
    """masked-attention-style decoder layer: cross-att -> self-att -> FFN
    (pre-residual, post-LN like the reference's DETR blocks)."""
    dim: int
    num_heads: int = 8
    ff_dim: int = 2048

    @nn.compact
    def __call__(self, queries, query_pe, memory, memory_pe):
        q = queries + query_pe
        att = nn.MultiHeadDotProductAttention(
            num_heads=self.num_heads, qkv_features=self.dim,
            name="cross_attn")(q, memory + memory_pe)
        queries = nn.LayerNorm(epsilon=1e-5, name="norm1")(queries + att)
        q = queries + query_pe
        att = nn.MultiHeadDotProductAttention(
            num_heads=self.num_heads, qkv_features=self.dim,
            name="self_attn")(q, q)
        queries = nn.LayerNorm(epsilon=1e-5, name="norm2")(queries + att)
        ff = nn.Dense(self.ff_dim, name="ffn1")(queries)
        ff = nn.Dense(self.dim, name="ffn2")(nn.relu(ff))
        return nn.LayerNorm(epsilon=1e-5, name="norm3")(queries + ff)


class _EncoderLayer(nn.Module):
    """Deformable-DETR encoder layer (reference PureMSDEnTransformer,
    transformer.py:1129-1240: MSDA self-attention over the multi-scale
    token stack with grid-center reference points, then FFN; post-norm).
    Reuses the HAHI MSDeformAttention (which already adds the residual)."""
    dim: int
    num_heads: int = 8
    ff_dim: int = 2048
    num_points: int = 4

    @nn.compact
    def __call__(self, x, pe, reference_points, spatial_shapes,
                 sampling="bilinear", window_radius=4):
        att = MSDeformAttention(
            self.dim, self.num_heads, len(spatial_shapes), self.num_points,
            dropout=0.0, sampling=sampling, window_radius=window_radius,
            name="self_attn")(x, x, pe, reference_points, spatial_shapes,
                              query_shapes=spatial_shapes)
        x = nn.LayerNorm(epsilon=1e-5, name="norm1")(att)
        ff = nn.Dense(self.ff_dim, name="ffn1")(x)
        ff = nn.Dense(self.dim, name="ffn2")(nn.relu(ff))
        return nn.LayerNorm(epsilon=1e-5, name="norm2")(x + ff)


class BinsFormerHead(nn.Module):
    """Inputs: 5-scale pyramid fine->coarse.

    Returns a list (one per decoder layer, last = final) of dicts:
      depth (B, h, w, 1), bin_edges (B, n_bins+1),
      class_logits (B, class_num) when classify.
    """
    in_channels: Sequence[int] = (64, 192, 384, 768, 1536)
    conv_dim: int = 256
    n_bins: int = 64
    trans_index: Sequence[int] = (2, 3, 4)
    num_encoder_layers: int = 3
    num_decoder_layers: int = 9
    num_heads: int = 8
    classify: bool = True
    class_num: int = 25
    # 'bilinear' keeps reference MSDA semantics; 'windowed' uses the
    # TPU-native dense sampler (see ops/msda.py)
    neck_sampling: str = "bilinear"
    min_depth: float = 1e-3
    max_depth: float = 10.0

    @nn.compact
    def __call__(self, inputs, train: bool = False):
        cd = self.conv_dim
        # ---- multi-scale tokens for the transformer stream ----
        trans_feats = [
            ConvModule(cd, kernel_size=1, use_norm=True, act=nn.relu,
                       name=f"skip_proj{i}")(inputs[idx], train=train)
            for i, idx in enumerate(self.trans_index)]

        level_embed = self.param("level_embed",
                                 nn.initializers.normal(1.0),
                                 (len(self.trans_index), cd))
        tokens, pes, shapes = [], [], []
        for i, f in enumerate(trans_feats):
            B, H_, W_, _ = f.shape
            tokens.append(f.reshape(B, H_ * W_, cd))
            pe = sine_positional_encoding(H_, W_, cd // 2)
            pes.append(jnp.asarray(pe.reshape(1, H_ * W_, cd), f.dtype)
                       + level_embed[i][None, None])
            shapes.append((H_, W_))
        src = jnp.concatenate(tokens, axis=1)
        src_pe = jnp.concatenate(pes, axis=1)

        # DMS encoder: joint DEFORMABLE self-attention over all levels
        # (reference builds a PureMSDEnTransformer; grid-center reference
        # points because the masks are all-valid)
        ref_enc = (None if self.neck_sampling == "windowed"
                   else jnp.asarray(_center_reference_points(tuple(shapes))))
        for i in range(self.num_encoder_layers):
            src = _EncoderLayer(cd, self.num_heads,
                                name=f"encoder{i}")(
                src, src_pe, ref_enc, tuple(shapes),
                sampling=self.neck_sampling)

        # split back per level (coarsest first for round-robin cross-attn)
        per_level = []
        start = 0
        for (H_, W_) in shapes:
            n = H_ * W_
            per_level.append((src[:, start:start + n],
                              src_pe[:, start:start + n]))
            start += n
        per_level = per_level[::-1]  # coarse -> fine

        # ---- FPN pixel decoder over the full pyramid ----
        fpn_levels = len(self.trans_index)
        x = None
        for j, idx in enumerate(range(fpn_levels - 1, -1, -1)):
            lat = ConvModule(cd, kernel_size=1, use_norm=True, act=None,
                             name=f"lateral{j}")(inputs[idx], train=train)
            if x is None:
                x = lat
            else:
                x = lat + resize_bilinear(x, lat.shape[1:3],
                                          align_corners=True)
            x = ConvModule(cd, kernel_size=3, use_norm=True, act=nn.relu,
                           name=f"output{j}")(x, train=train)
        per_pixel = x                              # finest trans level res

        # ---- bin queries ----
        nq = self.n_bins + (1 if self.classify else 0)
        B = per_pixel.shape[0]
        query_feat = self.param("query_feat", nn.initializers.normal(1.0),
                                (nq, cd))
        query_pe = self.param("query_embed", nn.initializers.normal(1.0),
                              (nq, cd))
        queries = jnp.broadcast_to(query_feat[None], (B, nq, cd))
        qpe = jnp.broadcast_to(query_pe[None], (B, nq, cd))

        outputs = []
        for layer in range(self.num_decoder_layers):
            mem, mem_pe = per_level[layer % len(per_level)]
            queries = _DecoderLayer(cd, self.num_heads,
                                    name=f"decoder{layer}")(
                queries, qpe, mem, mem_pe)
            outputs.append(self._predict(queries, per_pixel, layer))
        return outputs

    @nn.compact_name_scope
    def _predict(self, queries, per_pixel, layer):
        cd = self.conv_dim
        bin_q = queries[:, :self.n_bins]
        out = {}
        if self.classify:
            cls_q = queries[:, self.n_bins]
            out["class_logits"] = nn.Dense(
                self.class_num, name=f"class_head{layer}")(cls_q)

        # adaptive bins (softmax norm, reference binsformer_head.py:318-325)
        widths = nn.Dense(1, name=f"bins_head{layer}")(bin_q)[..., 0]
        widths = jax.nn.softmax(widths, axis=1)
        widths = (self.max_depth - self.min_depth) * widths
        widths = jnp.pad(widths, ((0, 0), (1, 0)),
                         constant_values=self.min_depth)
        edges = jnp.cumsum(widths, axis=1)
        centers = 0.5 * (edges[:, :-1] + edges[:, 1:])

        # per-pixel logits = <query embedding, pixel feature>
        emb = nn.Dense(cd, name=f"mask_embed{layer}")(bin_q)
        logits = jnp.einsum("bhwc,bqc->bhwq", per_pixel, emb)
        probs = jax.nn.softmax(logits, axis=-1)
        depth = jnp.einsum("bhwq,bq->bhw", probs, centers)[..., None]
        out["depth"] = depth
        out["bin_edges"] = edges
        return out
