"""Official ViT checkpoint -> gedepth_tpu VisionTransformer converter
(reference tools/model_converters/vit2depth.py role, retargeted at our flax
module tree).

Handles timm/AugReg/DeiT-style naming:
  cls_token, pos_embed, patch_embed.proj.{weight,bias},
  blocks.{i}.norm{1,2}.{weight,bias},
  blocks.{i}.attn.qkv.{weight,bias}, blocks.{i}.attn.proj.{weight,bias},
  blocks.{i}.mlp.fc{1,2}.{weight,bias}

The fused torch qkv (3C, C) splits into flax MultiHeadDotProductAttention's
per-projection kernels of shape (C, heads, head_dim); the output projection
reshapes to (heads, head_dim, C).
"""
from __future__ import annotations

from typing import Dict

import numpy as np


def convert_vit_official(sd: Dict[str, np.ndarray], num_heads: int,
                         num_blocks: int) -> dict:
    """Returns a nested params dict matching VisionTransformer's tree."""
    C = sd["cls_token"].shape[-1]
    hd = C // num_heads
    params: dict = {}

    params["cls_token"] = sd["cls_token"].reshape(1, 1, C)
    params["pos_embed"] = sd["pos_embed"].reshape(1, -1, C)
    params["patch_embed"] = {
        "kernel": np.transpose(sd["patch_embed.proj.weight"], (2, 3, 1, 0)),
        "bias": sd["patch_embed.proj.bias"],
    }

    for i in range(num_blocks):
        pre = f"blocks.{i}."
        qkv_w = sd[pre + "attn.qkv.weight"]          # (3C, C)
        qkv_b = sd[pre + "attn.qkv.bias"]            # (3C,)
        qw, kw, vw = np.split(qkv_w, 3, axis=0)      # each (C, C)
        qb, kb, vb = np.split(qkv_b, 3, axis=0)
        proj_w = sd[pre + "attn.proj.weight"]        # (C, C)

        def in_proj(w, b):
            # torch (out=C, in=C) -> flax (in=C, heads, head_dim)
            return {"kernel": np.transpose(w, (1, 0)).reshape(C, num_heads,
                                                              hd),
                    "bias": b.reshape(num_heads, hd)}

        attn = {
            "query": in_proj(qw, qb),
            "key": in_proj(kw, kb),
            "value": in_proj(vw, vb),
            "out": {
                # torch (out=C, in=C) -> flax (heads, head_dim, C)
                "kernel": np.transpose(proj_w, (1, 0)).reshape(num_heads, hd,
                                                               C),
                "bias": sd[pre + "attn.proj.bias"],
            },
        }
        params[f"block{i}"] = {
            "ln1": {"scale": sd[pre + "norm1.weight"],
                    "bias": sd[pre + "norm1.bias"]},
            "ln2": {"scale": sd[pre + "norm2.weight"],
                    "bias": sd[pre + "norm2.bias"]},
            "attn": attn,
            "ffn": {
                "Dense_0": {"kernel": np.transpose(
                    sd[pre + "mlp.fc1.weight"], (1, 0)),
                    "bias": sd[pre + "mlp.fc1.bias"]},
                "Dense_1": {"kernel": np.transpose(
                    sd[pre + "mlp.fc2.weight"], (1, 0)),
                    "bias": sd[pre + "mlp.fc2.bias"]},
            },
        }
    return params
