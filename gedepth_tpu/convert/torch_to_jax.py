"""PyTorch checkpoint -> flax pytree converter.

Maps the reference's released GEDepth checkpoints (DepthEncoderDecoder state
dicts) and official Swin ImageNet checkpoints onto our module tree, handling
layout changes:
  * conv weights   (O, I, kh, kw) -> (kh, kw, I, O)
  * linear weights (O, I)         -> (I, O)
  * BatchNorm weight/bias -> params scale/bias; running stats -> batch_stats
  * 4th input channel of patch_embed zero-padded when the source is RGB-only
    (reference depthformer_swin.py:1113-1123)

Name mapping follows the reference module tree (SURVEY.md §2.5-2.8); our
module names were chosen to make this a mechanical rewrite. PatchMerging
needs no reorder: we reproduce torch-Unfold channel order natively.
"""
from __future__ import annotations

import re
from typing import Dict, Tuple

import numpy as np


def load_torch_checkpoint(path: str) -> Dict[str, np.ndarray]:
    """Load a .pth into {name: ndarray} without requiring CUDA."""
    import torch

    ckpt = torch.load(path, map_location="cpu", weights_only=False)
    for key in ("state_dict", "model"):
        if isinstance(ckpt, dict) and key in ckpt:
            ckpt = ckpt[key]
            break
    out = {}
    for k, v in ckpt.items():
        if hasattr(v, "numpy"):
            out[k[7:] if k.startswith("module.") else k] = v.numpy()
    return out


def swin_official_to_gedepth(sd: Dict[str, np.ndarray]) -> Dict[str, np.ndarray]:
    """Official Swin checkpoint keys -> reference backbone keys
    (mirrors the behavior of depth/models/utils/ckpt_convert.py swin_convert:
    layers->stages, mlp->ffn with sequential renames, attn->attn.w_msa,
    patch_embed.proj->projection, plus the PatchMerging unfold reorder)."""
    out = {}
    for k, v in sd.items():
        if k.startswith("head."):
            continue
        nk = k
        nk = nk.replace("layers.", "stages.")
        nk = nk.replace("patch_embed.proj", "patch_embed.projection")
        nk = nk.replace("mlp.fc1", "ffn.layers.0.0")
        nk = nk.replace("mlp.fc2", "ffn.layers.1")
        m = re.match(r"(.*)\.attn\.(qkv|proj|relative_position_bias_table|"
                     r"relative_position_index)(.*)", nk)
        if m:
            nk = f"{m.group(1)}.attn.w_msa.{m.group(2)}{m.group(3)}"
        if "downsample.reduction.weight" in nk:
            # official cat [x0;x1;x2;x3] position-major with positions
            # ordered [(0,0),(1,0),(0,1),(1,1)] -> our channel-major raster
            # order (same math as the reference's swin_convert
            # correct_unfold_reduction_order).
            o, i = v.shape
            v = v.reshape(o, 4, i // 4)[:, [0, 2, 1, 3], :]
            v = v.transpose(0, 2, 1).reshape(o, i)
        elif "downsample.norm." in nk:
            i = v.shape[0]
            v = v.reshape(4, i // 4)[[0, 2, 1, 3], :]
            v = v.transpose(1, 0).reshape(i)
        out[nk] = v
    return out


def binsformer_release_remap(sd: Dict[str, np.ndarray]) -> Dict[str, np.ndarray]:
    """Released-BinsFormer key fixup (reference
    tools/model_converters/binsformer.py): the release nests the pixel
    decoder one level deeper than the model expects —
    `decode_head.transformer_decoder.decoder.X` ->
    `decode_head.transformer_decoder.X`."""
    pre = "decode_head.transformer_decoder.decoder."
    tgt = "decode_head.transformer_decoder."
    return {(tgt + k[len(pre):]) if k.startswith(pre) else k: v
            for k, v in sd.items()}


def simipu_backbone_extract(sd: Dict[str, np.ndarray]) -> Dict[str, np.ndarray]:
    """SimIPU pretraining checkpoint -> backbone-only state dict (reference
    tools/model_converters/SimIPU.py): keep `img_backbone.*` keys and strip
    the `img_` prefix so they land on `backbone.*`."""
    return {k[4:]: v for k, v in sd.items() if "img_backbone" in k}


# ---------------------------------------------------------------------------
# reference torch name -> (flax collection, path tuple) mapping
# ---------------------------------------------------------------------------

def _conv_w(v):
    return np.transpose(v, (2, 3, 1, 0))


def _lin_w(v):
    return np.transpose(v, (1, 0))


def _abs_pos_embed(v):
    if v.ndim == 4:  # reference-model layout (1, C, H, W)
        return np.transpose(v, (0, 2, 3, 1))
    n, L, c = v.shape  # official layout (1, L, C); square pretrain grid
    s = int(round(L ** 0.5))
    assert s * s == L, f"non-square absolute_pos_embed (L={L})"
    return v.reshape(n, s, s, c)


def _hrnet_cbn(base, kind, leaf):
    """Leaf of a flax _ConvBN ('conv'/'bn' submodules) from a torch
    conv/bn pair (mmcv Sequential or named conv{n}/bn{n})."""
    if kind == "conv":
        if leaf == "weight":
            return [("params", base + ("conv", "kernel"), _conv_w)]
        return None
    if leaf == "num_batches_tracked":
        return []
    if leaf in ("weight", "bias"):
        return [("params", base + ("bn",
                                   "scale" if leaf == "weight" else "bias"),
                 None)]
    if leaf in ("running_mean", "running_var"):
        return [("batch_stats",
                 base + ("bn", "mean" if leaf == "running_mean" else "var"),
                 None)]
    return None


def _map_hrnet_key(k: str):
    """mmcv HRNet state-dict keys (reference depth/models/backbones/
    hrnet.py:571-931 module layout) -> flax models/hrnet.py tree."""
    m = re.match(r"backbone\.conv([12])\.weight$", k)
    if m:
        return [("params", ("backbone", f"stem{m.group(1)}", "conv",
                            "kernel"), _conv_w)]
    m = re.match(r"backbone\.bn([12])\.(\w+)$", k)
    if m:
        return _hrnet_cbn(("backbone", f"stem{m.group(1)}"), "bn", m.group(2))

    # residual blocks: layer1.{b}.* and stage{s}.{m}.branches.{i}.{b}.*
    m = re.match(r"backbone\.layer1\.(\d+)\.(.*)$", k)
    block_base = None
    if m:
        block_base = ("backbone", f"layer1_block{m.group(1)}")
        rest = m.group(2)
    else:
        m = re.match(r"backbone\.stage(\d)\.(\d+)\.branches\.(\d+)\.(\d+)\."
                     r"(.*)$", k)
        if m:
            block_base = ("backbone",
                          f"stage{m.group(1)}_module{m.group(2)}",
                          f"branch{m.group(3)}_block{m.group(4)}")
            rest = m.group(5)
    if block_base is not None:
        mm = re.match(r"conv(\d)\.weight$", rest)
        if mm:
            return _hrnet_cbn(block_base + (f"convbn{mm.group(1)}",),
                              "conv", "weight")
        mm = re.match(r"bn(\d)\.(\w+)$", rest)
        if mm:
            return _hrnet_cbn(block_base + (f"convbn{mm.group(1)}",),
                              "bn", mm.group(2))
        mm = re.match(r"downsample\.([01])\.(\w+)$", rest)
        if mm:
            return _hrnet_cbn(block_base + ("downsample",),
                              "conv" if mm.group(1) == "0" else "bn",
                              mm.group(2))
        return None

    # transitions: existing-branch adapt Sequential(conv,bn,relu) vs
    # new-branch nested Sequential(Sequential(conv,bn,relu), ...)
    m = re.match(r"backbone\.transition(\d)\.(\d+)\.([01])\.(\w+)$", k)
    if m:
        base = ("backbone", f"t{int(m.group(1)) + 1}_adapt{m.group(2)}")
        return _hrnet_cbn(base, "conv" if m.group(3) == "0" else "bn",
                          m.group(4))
    m = re.match(r"backbone\.transition(\d)\.(\d+)\.(\d+)\.([01])\.(\w+)$",
                 k)
    if m:
        # flax models a single-step new branch (stage transitions only ever
        # add one scale); deeper chains are not produced by parse_arch
        if m.group(3) != "0":
            return None
        base = ("backbone", f"t{int(m.group(1)) + 1}_new{m.group(2)}")
        return _hrnet_cbn(base, "conv" if m.group(4) == "0" else "bn",
                          m.group(5))

    # fuse layers: j>i Sequential(conv1x1,bn,upsample); j<i nested chain
    m = re.match(r"backbone\.stage(\d)\.(\d+)\.fuse_layers\.(\d+)\.(\d+)\."
                 r"([01])\.(\w+)$", k)
    if m:
        s, mod, i, j = m.group(1), m.group(2), int(m.group(3)), int(m.group(4))
        base = ("backbone", f"stage{s}_module{mod}", "fuse", f"up{i}_{j}")
        if j <= i:
            return None
        return _hrnet_cbn(base, "conv" if m.group(5) == "0" else "bn",
                          m.group(6))
    m = re.match(r"backbone\.stage(\d)\.(\d+)\.fuse_layers\.(\d+)\.(\d+)\."
                 r"(\d+)\.([01])\.(\w+)$", k)
    if m:
        s, mod, i, j, kk = (m.group(1), m.group(2), int(m.group(3)),
                            int(m.group(4)), m.group(5))
        if j >= i:
            return None
        base = ("backbone", f"stage{s}_module{mod}", "fuse",
                f"down{i}_{j}_{kk}")
        return _hrnet_cbn(base, "conv" if m.group(6) == "0" else "bn",
                          m.group(7))
    return None


_DDR_SEQ = ("compression3_1", "compression3_2", "compression4",
            "down3_1", "down3_2", "out_conv")


def _map_ddrnet_key(k: str):
    """Reference DDRNet state-dict keys (depth/models/backbones/
    ddrnet.py:190-262 module layout) -> flax models/ddrnet.py tree."""
    k2 = k[len("backbone."):]
    # stem conv1 Sequential: biased convs at 0/3, bns at 1/4
    m = re.match(r"conv1\.([0134])\.(\w+)$", k2)
    if m:
        idx, leaf = m.group(1), m.group(2)
        base = ("backbone", "stem1" if idx in "01" else "stem2")
        if idx in "03":
            if leaf == "weight":
                return [("params", base + ("conv", "kernel"), _conv_w)]
            if leaf == "bias":
                return [("params", base + ("conv", "bias"), None)]
            return None
        return _hrnet_cbn(base, "bn", leaf)
    # residual layers (longest names first: layer3_1_ before layer3_1)
    m = re.match(r"(layer\d(?:_\d)?_?)\.(\d+)\.(.*)$", k2)
    if m:
        base = ("backbone", f"{m.group(1)}_block{m.group(2)}")
        rest = m.group(3)
        mm = re.match(r"conv(\d)\.weight$", rest)
        if mm:
            return _hrnet_cbn(base + (f"convbn{mm.group(1)}",), "conv",
                              "weight")
        mm = re.match(r"bn(\d)\.(\w+)$", rest)
        if mm:
            return _hrnet_cbn(base + (f"convbn{mm.group(1)}",), "bn",
                              mm.group(2))
        mm = re.match(r"downsample\.([01])\.(\w+)$", rest)
        if mm:
            return _hrnet_cbn(base + ("downsample",),
                              "conv" if mm.group(1) == "0" else "bn",
                              mm.group(2))
        return None
    # fusion adapters / out_conv: Sequential(conv at 0, bn at 1)
    m = re.match(r"({})\.([01])\.(\w+)$".format("|".join(_DDR_SEQ)), k2)
    if m:
        return _hrnet_cbn(("backbone", m.group(1)),
                          "conv" if m.group(2) == "0" else "bn", m.group(3))
    m = re.match(r"down4\.([0134])\.(\w+)$", k2)
    if m:
        idx = m.group(1)
        return _hrnet_cbn(("backbone", "down4_a" if idx in "01"
                           else "down4_b"),
                          "conv" if idx in "03" else "bn", m.group(2))
    # DAPPM pre-activation Sequentials: bn at 0 (scale0/process/
    # compression/shortcut) or 1 (pooled scale1..4), conv at 2 or 3
    m = re.match(r"spp\.(scale\d|process\d|compression|shortcut)\."
                 r"(\d)\.(\w+)$", k2)
    if m:
        return _hrnet_cbn(("backbone", "spp", m.group(1)),
                          "conv" if m.group(2) in "23" else "bn",
                          m.group(3))
    return None


def _timm_effnet_bn(base, leaf):
    if leaf == "num_batches_tracked":
        return []
    if leaf in ("weight", "bias"):
        return [("params", base + ("bn",
                                   "scale" if leaf == "weight" else "bias"),
                 None)]
    if leaf in ("running_mean", "running_var"):
        return [("batch_stats",
                 base + ("bn", "mean" if leaf == "running_mean" else "var"),
                 None)]
    return None


def _map_timm_effnet_key(k: str):
    """timm gen-efficientnet keys (reference efficientnet.py wraps
    tf_efficientnet_b5_ap as `backbone.original_model`) ->
    models/efficientnet.py TimmEfficientNet tree."""
    rest = k[len("backbone.original_model."):]
    if rest == "conv_stem.weight":
        return [("params", ("backbone", "conv_stem", "conv", "kernel"),
                 _conv_w)]
    m = re.match(r"bn1\.(\w+)$", rest)
    if m:
        return _timm_effnet_bn(("backbone", "bn1"), m.group(1))
    if rest == "conv_head.weight":
        return [("params", ("backbone", "conv_head", "conv", "kernel"),
                 _conv_w)]
    if re.match(r"(bn2|classifier|global_pool)\.", rest):
        return []  # past the deepest endpoint (out_index stops at 11)
    m = re.match(r"blocks\.(\d+)\.(\d+)\.(.*)$", rest)
    if m:
        base = ("backbone", f"blocks{m.group(1)}_{m.group(2)}")
        sub = m.group(3)
        mm = re.match(r"(conv_pw|conv_dw|conv_pwl)\.weight$", sub)
        if mm:
            return [("params", base + (mm.group(1), "conv", "kernel"),
                     _conv_w)]
        mm = re.match(r"(bn\d)\.(\w+)$", sub)
        if mm:
            return _timm_effnet_bn(base + (mm.group(1),), mm.group(2))
        mm = re.match(r"se\.(conv_reduce|conv_expand)\.(weight|bias)$", sub)
        if mm:
            t = _conv_w if mm.group(2) == "weight" else None
            return [("params", base + ("se", mm.group(1),
                                       "kernel" if mm.group(2) == "weight"
                                       else "bias"), t)]
        return None
    return None


def _map_torch_key(k: str, hrnet: bool = False, ddrnet: bool = False):
    """Return list of (collection, path, transform) for a torch key, or []
    to drop. collection is 'params' or 'batch_stats'."""
    if ddrnet and k.startswith("backbone."):
        return _map_ddrnet_key(k)
    if hrnet and k.startswith("backbone."):
        return _map_hrnet_key(k)
    if k.startswith("backbone.original_model."):
        return _map_timm_effnet_key(k)
    # ---- backbone ----
    if k == "backbone.absolute_pos_embed":
        # official (1, L, C) or reference-model (1, C, H, W) -> our NHWC
        # (1, H, W, C) grid (reference reshape at depthformer_swin.py:
        # 1078-1086; size mismatches handled later by
        # resize_swin_pos_tables)
        return [("params", ("backbone", "absolute_pos_embed"),
                 _abs_pos_embed)]
    m = re.match(r"backbone\.patch_embed\.projection\.(weight|bias)$", k)
    if m:
        t = _conv_w if m.group(1) == "weight" else None
        return [("params", ("backbone", "patch_embed", "projection",
                            "kernel" if m.group(1) == "weight" else "bias"), t)]
    m = re.match(r"backbone\.patch_embed\.norm\.(weight|bias)$", k)
    if m:
        return [("params", ("backbone", "patch_embed", "norm",
                            "scale" if m.group(1) == "weight" else "bias"),
                 None)]
    m = re.match(r"backbone\.stages\.(\d+)\.blocks\.(\d+)\.(.*)$", k)
    if m:
        i, d, rest = int(m.group(1)), int(m.group(2)), m.group(3)
        base = ("backbone", f"stage{i}_block{d}")
        sub = {
            "norm1.weight": (base + ("norm1", "scale"), None),
            "norm1.bias": (base + ("norm1", "bias"), None),
            "norm2.weight": (base + ("norm2", "scale"), None),
            "norm2.bias": (base + ("norm2", "bias"), None),
            "attn.w_msa.relative_position_bias_table":
                (base + ("attn", "relative_position_bias_table"), None),
            "attn.w_msa.qkv.weight": (base + ("attn", "qkv", "kernel"),
                                      _lin_w),
            "attn.w_msa.qkv.bias": (base + ("attn", "qkv", "bias"), None),
            "attn.w_msa.proj.weight": (base + ("attn", "proj", "kernel"),
                                       _lin_w),
            "attn.w_msa.proj.bias": (base + ("attn", "proj", "bias"), None),
            "ffn.layers.0.0.weight": (base + ("ffn", "Dense_0", "kernel"),
                                      _lin_w),
            "ffn.layers.0.0.bias": (base + ("ffn", "Dense_0", "bias"), None),
            "ffn.layers.1.weight": (base + ("ffn", "Dense_1", "kernel"),
                                    _lin_w),
            "ffn.layers.1.bias": (base + ("ffn", "Dense_1", "bias"), None),
        }
        if rest in sub:
            path, t = sub[rest]
            return [("params", path, t)]
        if rest == "attn.w_msa.relative_position_index":
            return []  # recomputed statically
        return None
    m = re.match(r"backbone\.stages\.(\d+)\.downsample\.(norm|reduction)\."
                 r"(weight|bias)$", k)
    if m:
        i, which, wb = int(m.group(1)), m.group(2), m.group(3)
        if which == "norm":
            return [("params", ("backbone", f"downsample{i}", "norm",
                                "scale" if wb == "weight" else "bias"), None)]
        return [("params", ("backbone", f"downsample{i}", "reduction",
                            "kernel"), _lin_w)]
    m = re.match(r"backbone\.norm(\d)\.(weight|bias)$", k)
    if m:
        return [("params", ("backbone", f"norm{m.group(1)}",
                            "scale" if m.group(2) == "weight" else "bias"),
                 None)]
    m = re.match(r"backbone\.conv1\.weight$", k)
    if m:
        return [("params", ("backbone", "conv_stem", "Conv_0", "kernel"),
                 _conv_w)]
    m = re.match(r"backbone\.bn1\.(weight|bias|running_mean|running_var)$", k)
    if m:
        wb = m.group(1)
        if wb in ("weight", "bias"):
            return [("params", ("backbone", "conv_stem", "BatchNorm_0",
                                "scale" if wb == "weight" else "bias"), None)]
        return [("batch_stats", ("backbone", "conv_stem", "BatchNorm_0",
                                 "mean" if wb == "running_mean" else "var"),
                 None)]
    if re.match(r"backbone\.bn1\.num_batches_tracked$", k):
        return []

    # ---- ConvModule-style conv/bn leaves used by neck & heads ----
    def convmodule(flax_base, torch_rest):
        if torch_rest == "conv.weight":
            return [("params", flax_base + ("Conv_0", "kernel"), _conv_w)]
        if torch_rest == "conv.bias":
            return [("params", flax_base + ("Conv_0", "bias"), None)]
        if torch_rest == "bn.weight":
            return [("params", flax_base + ("BatchNorm_0", "scale"), None)]
        if torch_rest == "bn.bias":
            return [("params", flax_base + ("BatchNorm_0", "bias"), None)]
        if torch_rest == "bn.running_mean":
            return [("batch_stats", flax_base + ("BatchNorm_0", "mean"),
                     None)]
        if torch_rest == "bn.running_var":
            return [("batch_stats", flax_base + ("BatchNorm_0", "var"), None)]
        if torch_rest == "bn.num_batches_tracked":
            return []
        return None

    m = re.match(r"neck\.lateral_convs\.(\d+)\.(.*)$", k)
    if m:
        return convmodule(("neck", f"lateral{m.group(1)}"), m.group(2))
    m = re.match(r"neck\.trans_proj\.(\d+)\.(.*)$", k)
    if m:
        return convmodule(("neck", f"trans_proj{m.group(1)}"), m.group(2))
    m = re.match(r"neck\.trans_fusion\.(\d+)\.(.*)$", k)
    if m:
        return convmodule(("neck", f"trans_fusion{m.group(1)}"), m.group(2))
    m = re.match(r"neck\.conv_proj\.0\.(.*)$", k)
    if m:
        return convmodule(("neck", "conv_proj"), m.group(1))
    m = re.match(r"neck\.conv_fusion\.0\.(.*)$", k)
    if m:
        return convmodule(("neck", "conv_fusion"), m.group(1))
    m = re.match(r"neck\.reference_points\.(weight|bias)$", k)
    if m:
        t = _lin_w if m.group(1) == "weight" else None
        return [("params", ("neck", "reference_points",
                            "kernel" if m.group(1) == "weight" else "bias"),
                 t)]
    if k == "neck.level_embed":
        return [("params", ("neck", "level_embed"), None)]
    m = re.match(r"neck\.(self_attn|multi_att)\.(sampling_offsets|"
                 r"attention_weights|value_proj|output_proj)\."
                 r"(weight|bias)$", k)
    if m:
        mod = "self_attn" if m.group(1) == "self_attn" else "cross_attn"
        t = _lin_w if m.group(3) == "weight" else None
        return [("params", ("neck", mod, m.group(2),
                            "kernel" if m.group(3) == "weight" else "bias"),
                 t)]

    # ---- PE necks ----
    m = re.match(r"(pe_mask_neck|dynamic_pe_neck)\.conv(\d)\.(weight|bias)$",
                 k)
    if m:
        t = _conv_w if m.group(3) == "weight" else None
        return [("params", (m.group(1), "fuse", f"conv{m.group(2)}",
                            "kernel" if m.group(3) == "weight" else "bias"),
                 t)]
    m = re.match(r"(pe_mask_neck|dynamic_pe_neck)\.convfinal\.(weight|bias)$",
                 k)
    if m:
        t = _conv_w if m.group(2) == "weight" else None
        return [("params", (m.group(1), "convfinal",
                            "kernel" if m.group(2) == "weight" else "bias"),
                 t)]

    # ---- decode head ----
    m = re.match(r"decode_head\.conv_list\.0\.conv\.(weight|bias)$", k)
    if m:
        t = _conv_w if m.group(1) == "weight" else None
        return [("params", ("decode_head", "conv0", "Conv_0",
                            "kernel" if m.group(1) == "weight" else "bias"),
                 t)]
    m = re.match(r"decode_head\.conv_list\.(\d+)\.(convA|convB)\.conv\."
                 r"(weight|bias)$", k)
    if m:
        t = _conv_w if m.group(3) == "weight" else None
        return [("params", ("decode_head", f"up{m.group(1)}", m.group(2),
                            "Conv_0",
                            "kernel" if m.group(3) == "weight" else "bias"),
                 t)]
    m = re.match(r"decode_head\.conv_depth\.(weight|bias)$", k)
    if m:
        t = _conv_w if m.group(1) == "weight" else None
        return [("params", ("decode_head", "conv_depth",
                            "kernel" if m.group(1) == "weight" else "bias"),
                 t)]

    # ---- BTS decode head (reference bts_head.py module names) ----
    def _bn_leaf(flax_base, leaf):
        if leaf == "num_batches_tracked":
            return []
        if leaf in ("weight", "bias"):
            return [("params", flax_base +
                     ("scale" if leaf == "weight" else "bias",), None)]
        return [("batch_stats", flax_base +
                 ("mean" if leaf == "running_mean" else "var",), None)]

    m = re.match(r"decode_head\.upconv(\d)\.conv\.weight$", k)
    if m:
        return [("params", ("decode_head", f"upconv{m.group(1)}", "conv",
                            "kernel"), _conv_w)]
    m = re.match(r"decode_head\.(bn\d(?:_2)?)\."
                 r"(weight|bias|running_mean|running_var|"
                 r"num_batches_tracked)$", k)
    if m:
        return _bn_leaf(("decode_head", m.group(1)), m.group(2))
    m = re.match(r"decode_head\.conv(\d)\.0\.weight$", k)
    if m:
        return [("params", ("decode_head", f"conv{m.group(1)}", "kernel"),
                 _conv_w)]
    m = re.match(r"decode_head\.daspp_(\d+)\.atrous_conv\.first_bn\.(.*)$", k)
    if m:
        return _bn_leaf(("decode_head", f"daspp_{m.group(1)}", "first_bn"),
                        m.group(2))
    m = re.match(r"decode_head\.daspp_(\d+)\.atrous_conv\.aconv_sequence\."
                 r"(\d)\.(.*)$", k)
    if m:
        base = ("decode_head", f"daspp_{m.group(1)}")
        idx, leaf = m.group(2), m.group(3)
        if idx == "1":
            return [("params", base + ("conv1x1", "kernel"), _conv_w)]
        if idx == "2":
            return _bn_leaf(base + ("bn",), leaf)
        if idx == "4":
            return [("params", base + ("conv3x3", "kernel"), _conv_w)]
        return None
    m = re.match(r"decode_head\.daspp_conv\.0\.weight$", k)
    if m:
        return [("params", ("decode_head", "daspp_conv", "kernel"), _conv_w)]
    # ---- AdaBins decode head (reference adabins_head.py module names) ----
    m = re.match(r"decode_head\.decode_final_conv\.(weight|bias)$", k)
    if m:
        t = _conv_w if m.group(1) == "weight" else None
        return [("params", ("decode_head", "decode_final_conv",
                            "kernel" if m.group(1) == "weight" else "bias"),
                 t)]
    m = re.match(r"decode_head\.conv_out\.0\.(weight|bias)$", k)
    if m:
        t = _conv_w if m.group(1) == "weight" else None
        return [("params", ("decode_head", "conv_out",
                            "kernel" if m.group(1) == "weight" else "bias"),
                 t)]
    m = re.match(r"decode_head\.adaptive_bins_layer\.conv3x3\."
                 r"(weight|bias)$", k)
    if m:
        t = _conv_w if m.group(1) == "weight" else None
        return [("params", ("decode_head", "adaptive_bins_layer", "conv3x3",
                            "kernel" if m.group(1) == "weight" else "bias"),
                 t)]
    m = re.match(r"decode_head\.adaptive_bins_layer\.regressor\.([024])\."
                 r"(weight|bias)$", k)
    if m:
        idx = {"0": "regressor0", "2": "regressor1", "4": "regressor2"}
        t = _lin_w if m.group(2) == "weight" else None
        return [("params", ("decode_head", "adaptive_bins_layer", idx[m.group(1)],
                            "kernel" if m.group(2) == "weight" else "bias"),
                 t)]
    pt = "decode_head.adaptive_bins_layer.patch_transformer."
    if k == pt + "positional_encodings":
        return [("params", ("decode_head", "adaptive_bins_layer",
                            "patch_transformer", "positional_encodings"),
                 None)]
    m = re.match(re.escape(pt) + r"embedding_convPxP\.(weight|bias)$", k)
    if m:
        t = _conv_w if m.group(1) == "weight" else None
        return [("params", ("decode_head", "adaptive_bins_layer",
                            "patch_transformer", "embedding_convPxP",
                            "kernel" if m.group(1) == "weight" else "bias"),
                 t)]
    m = re.match(re.escape(pt) + r"transformer_encoder\.layers\.(\d+)\."
                 r"(.*)$", k)
    if m:
        base = ("decode_head", "adaptive_bins_layer", "patch_transformer",
                f"layer{m.group(1)}")
        rest = m.group(2)
        NH = 4  # reference mViT num_heads (adabins_head.py:31)

        def _split_qkv(which, is_bias):
            def t(v):
                e = v.shape[0] // 3
                part = v[which * e:(which + 1) * e]
                if is_bias:
                    return part.reshape(NH, e // NH)
                return part.transpose(1, 0).reshape(e, NH, e // NH)
            return t

        if rest == "self_attn.in_proj_weight":
            return [("params", base + ("self_attn", nm, "kernel"),
                     _split_qkv(i, False))
                    for i, nm in enumerate(("query", "key", "value"))]
        if rest == "self_attn.in_proj_bias":
            return [("params", base + ("self_attn", nm, "bias"),
                     _split_qkv(i, True))
                    for i, nm in enumerate(("query", "key", "value"))]
        if rest == "self_attn.out_proj.weight":
            return [("params", base + ("self_attn", "out", "kernel"),
                     lambda v: v.transpose(1, 0).reshape(
                         NH, v.shape[1] // NH, v.shape[0]))]
        if rest == "self_attn.out_proj.bias":
            return [("params", base + ("self_attn", "out", "bias"), None)]
        mm = re.match(r"linear(\d)\.(weight|bias)$", rest)
        if mm:
            t = _lin_w if mm.group(2) == "weight" else None
            return [("params", base + (f"linear{mm.group(1)}",
                                       "kernel" if mm.group(2) == "weight"
                                       else "bias"), t)]
        mm = re.match(r"norm(\d)\.(weight|bias)$", rest)
        if mm:
            return [("params", base + (f"norm{mm.group(1)}",
                                       "scale" if mm.group(2) == "weight"
                                       else "bias"), None)]
        return None

    # ---- DPT decode head (reference dpt_head.py module names) ----
    m = re.match(r"decode_head\.reassemble_blocks\.readout_projects\.(\d)\."
                 r"0\.(weight|bias)$", k)
    if m:
        t = _lin_w if m.group(2) == "weight" else None
        return [("params", ("decode_head", f"reassemble{m.group(1)}",
                            "readout",
                            "kernel" if m.group(2) == "weight" else "bias"),
                 t)]
    m = re.match(r"decode_head\.reassemble_blocks\.projects\.(\d)\.conv\."
                 r"(weight|bias)$", k)
    if m:
        t = _conv_w if m.group(2) == "weight" else None
        return [("params", ("decode_head", f"reassemble{m.group(1)}", "proj",
                            "kernel" if m.group(2) == "weight" else "bias"),
                 t)]
    m = re.match(r"decode_head\.reassemble_blocks\.resize_layers\.([013])\."
                 r"(weight|bias)$", k)
    if m:
        i, wb = m.group(1), m.group(2)
        if i == "3":  # stride-2 conv
            t = _conv_w if wb == "weight" else None
            return [("params", ("decode_head", "reassemble3", "resize",
                                "kernel" if wb == "weight" else "bias"), t)]
        # ConvTranspose2d k=s implemented as Dense + depth-to-space:
        # weight (Cin, Cout, k, k) -> dense kernel (Cin, k*k*Cout) ordered
        # (u, v, o); bias (Cout,) tiles over the k*k positions
        if wb == "weight":
            def t(v):
                cin, cout, kh, kw = v.shape
                return v.transpose(0, 2, 3, 1).reshape(cin, kh * kw * cout)
        else:
            def t(v):
                k_ = 4 if i == "0" else 2
                return np.tile(v, k_ * k_)
        return [("params", ("decode_head", f"reassemble{i}", "resize",
                            "dense",
                            "kernel" if wb == "weight" else "bias"), t)]
    m = re.match(r"decode_head\.convs\.(\d)\.conv\.weight$", k)
    if m:
        return [("params", ("decode_head", f"channel_proj{m.group(1)}",
                            "kernel"), _conv_w)]
    m = re.match(r"decode_head\.fusion_blocks\.(\d)\.(.*)$", k)
    if m:
        # reference applies fusion_blocks[0] to the DEEPEST map; our names
        # count by scale: fusion_blocks[i] == fusion{3-i}
        base = ("decode_head", f"fusion{3 - int(m.group(1))}")
        rest = m.group(2)
        mm = re.match(r"project\.conv\.(weight|bias)$", rest)
        if mm:
            t = _conv_w if mm.group(1) == "weight" else None
            return [("params", base + ("out",
                                       "kernel" if mm.group(1) == "weight"
                                       else "bias"), t)]
        mm = re.match(r"res_conv_unit([12])\.conv([12])\.conv\.weight$", rest)
        if mm:
            return [("params", base + (f"rcu{mm.group(1)}",
                                       f"conv{mm.group(2)}", "kernel"),
                     _conv_w)]
        return None
    m = re.match(r"decode_head\.project\.conv\.(weight|bias)$", k)
    if m:
        t = _conv_w if m.group(1) == "weight" else None
        return [("params", ("decode_head", "project",
                            "kernel" if m.group(1) == "weight" else "bias"),
                 t)]
    m = re.match(r"decode_head\.conv_depth\.head\.([024])\.(weight|bias)$", k)
    if m:
        name = {"0": "head_conv1", "2": "head_conv2",
                "4": "conv_depth"}[m.group(1)]
        t = _conv_w if m.group(2) == "weight" else None
        return [("params", ("decode_head", name,
                            "kernel" if m.group(2) == "weight" else "bias"),
                 t)]

    m = re.match(r"decode_head\.(reduc\d+x\d+|reduc1x1)\.reduc\.(.*)$", k)
    if m:
        base = ("decode_head", m.group(1))
        rest = m.group(2)
        mm = re.match(r"(inter_\d+_\d+)\.0\.weight$", rest)
        if mm:
            return [("params", base + (mm.group(1), "kernel"), _conv_w)]
        if rest == "plane_params.weight":
            return [("params", base + ("plane_params", "kernel"), _conv_w)]
        if rest == "final.0.weight":
            return [("params", base + ("final", "kernel"), _conv_w)]
        return None

    # ---- BinsFormer decode head (reference binsformer_head.py:33 +
    #      utils/transformer.py PureMSDEnTransformer/PixelTransformerDecoder
    #      module names) ----
    m = re.match(r"decode_head\.(skip_proj|lateral_convs|output_convs)\."
                 r"(\d+)\.(.*)$", k)
    if m:
        name = {"skip_proj": "skip_proj", "lateral_convs": "lateral",
                "output_convs": "output"}[m.group(1)]
        return convmodule(("decode_head", f"{name}{m.group(2)}"), m.group(3))
    if k == "decode_head.level_embed.weight":
        return [("params", ("decode_head", "level_embed"), None)]
    if k in ("decode_head.query_feat.weight",
             "decode_head.query_embed.weight"):
        name = k.split(".")[1]
        return [("params", ("decode_head", name), None)]
    if k == "decode_head.transformer_encoder.level_embeds":
        return [("params", ("decode_head", "enc_level_embed"), None)]
    if re.match(r"decode_head\.transformer_encoder\.reference_points\.", k):
        return []  # created by PureMSDEnTransformer.init_layers, unused in
        # its encoder-only forward (transformer.py:1146,1227-1267)
    m = re.match(r"decode_head\.transformer_encoder\.encoder\.layers\.(\d+)"
                 r"\.(.*)$", k)
    if m:
        base = ("decode_head", f"encoder{m.group(1)}")
        rest = m.group(2)
        mm = re.match(r"attentions\.0\.(sampling_offsets|attention_weights|"
                      r"value_proj|output_proj)\.(weight|bias)$", rest)
        if mm:
            t = _lin_w if mm.group(2) == "weight" else None
            return [("params", base + ("self_attn", mm.group(1),
                                       "kernel" if mm.group(2) == "weight"
                                       else "bias"), t)]
        mm = re.match(r"ffns\.0\.layers\.(0\.0|1)\.(weight|bias)$", rest)
        if mm:
            name = "ffn1" if mm.group(1) == "0.0" else "ffn2"
            t = _lin_w if mm.group(2) == "weight" else None
            return [("params", base + (name, "kernel" if mm.group(2) ==
                                       "weight" else "bias"), t)]
        mm = re.match(r"norms\.(\d)\.(weight|bias)$", rest)
        if mm:
            return [("params", base + (f"norm{int(mm.group(1)) + 1}",
                                       "scale" if mm.group(2) == "weight"
                                       else "bias"), None)]
        return None

    def _mha_split(base, rest, nh):
        """mmcv MultiheadAttention (torch packed in_proj) -> flax
        MultiHeadDotProductAttention query/key/value/out params."""
        def _part(which, is_bias):
            def t(v):
                e = v.shape[0] // 3
                part = v[which * e:(which + 1) * e]
                if is_bias:
                    return part.reshape(nh, e // nh)
                return part.transpose(1, 0).reshape(e, nh, e // nh)
            return t

        if rest == "attn.in_proj_weight":
            return [("params", base + (nm, "kernel"), _part(i, False))
                    for i, nm in enumerate(("query", "key", "value"))]
        if rest == "attn.in_proj_bias":
            return [("params", base + (nm, "bias"), _part(i, True))
                    for i, nm in enumerate(("query", "key", "value"))]
        if rest == "attn.out_proj.weight":
            return [("params", base + ("out", "kernel"),
                     lambda v: v.transpose(1, 0).reshape(
                         nh, v.shape[1] // nh, v.shape[0]))]
        if rest == "attn.out_proj.bias":
            return [("params", base + ("out", "bias"), None)]
        return None

    m = re.match(r"decode_head\.transformer_decoder\.layers\.(\d+)\.(.*)$",
                 k)
    if m:
        base = ("decode_head", f"decoder{m.group(1)}")
        rest = m.group(2)
        # operation order ('cross_attn','norm','self_attn','norm','ffn',
        # 'norm') => attentions.0 = cross, attentions.1 = self
        mm = re.match(r"attentions\.([01])\.(attn\..*)$", rest)
        if mm:
            name = "cross_attn" if mm.group(1) == "0" else "self_attn"
            return _mha_split(base + (name,), mm.group(2), 8)
        mm = re.match(r"ffns\.0\.layers\.(0\.0|1)\.(weight|bias)$", rest)
        if mm:
            name = "ffn1" if mm.group(1) == "0.0" else "ffn2"
            t = _lin_w if mm.group(2) == "weight" else None
            return [("params", base + (name, "kernel" if mm.group(2) ==
                                       "weight" else "bias"), t)]
        mm = re.match(r"norms\.(\d)\.(weight|bias)$", rest)
        if mm:
            return [("params", base + (f"norm{int(mm.group(1)) + 1}",
                                       "scale" if mm.group(2) == "weight"
                                       else "bias"), None)]
        return None
    m = re.match(r"decode_head\.transformer_decoder\.decoder_norm\."
                 r"(weight|bias)$", k)
    if m:
        return [("params", ("decode_head", "decoder_norm",
                            "scale" if m.group(1) == "weight" else "bias"),
                 None)]
    m = re.match(r"decode_head\.transformer_decoder\.bins_embed\."
                 r"(weight|bias)$", k)
    if m:
        t = _lin_w if m.group(1) == "weight" else None
        return [("params", ("decode_head", "bins_embed",
                            "kernel" if m.group(1) == "weight" else "bias"),
                 t)]
    m = re.match(r"decode_head\.transformer_decoder\.(mask_embed|"
                 r"class_embed)\.layers\.(\d)\.(weight|bias)$", k)
    if m:
        t = _lin_w if m.group(3) == "weight" else None
        return [("params", ("decode_head", m.group(1),
                            f"layers{m.group(2)}",
                            "kernel" if m.group(3) == "weight" else "bias"),
                 t)]
    return None


def convert_state_dict(sd: Dict[str, np.ndarray],
                       strict: bool = False) -> Tuple[dict, dict, list]:
    """Convert a reference-format torch state dict.

    Returns (params, batch_stats, unmapped_keys) as nested dicts.
    """
    params: dict = {}
    stats: dict = {}
    unmapped = []
    # HRNet backbones share the conv1/bn1 stem names with the DepthFormer
    # hybrid conv-stem; disambiguate on HRNet-only structural keys.
    hrnet = any(".fuse_layers." in k or k.startswith("backbone.transition")
                for k in sd)
    # DDRNet-only structural keys (DAPPM scales / bilateral compressions)
    ddrnet = any(k.startswith("backbone.spp.scale")
                 or k.startswith("backbone.compression3_1.") for k in sd)
    for k, v in sd.items():
        mapped = _map_torch_key(k, hrnet=hrnet, ddrnet=ddrnet)
        if mapped is None:
            unmapped.append(k)
            if strict:
                raise KeyError(f"no mapping for {k}")
            continue
        for collection, path, transform in mapped:
            tree = params if collection == "params" else stats
            node = tree
            for p in path[:-1]:
                node = node.setdefault(p, {})
            node[path[-1]] = np.asarray(
                transform(v) if transform else v)
    return params, stats, unmapped


def _cubic_weights(t: np.ndarray, a: float = -0.75) -> np.ndarray:
    """Cubic convolution kernel (Keys), torch's a=-0.75 variant."""
    t = np.abs(t)
    w = np.where(
        t <= 1, (a + 2) * t**3 - (a + 3) * t**2 + 1,
        np.where(t < 2, a * t**3 - 5 * a * t**2 + 8 * a * t - 4 * a, 0.0))
    return w


def _bicubic_axis_matrix(n_in: int, n_out: int) -> np.ndarray:
    """(n_out, n_in) interpolation matrix reproducing torch
    F.interpolate(mode='bicubic', align_corners=False) along one axis
    (half-pixel centers, 4-tap cubic a=-0.75, replicate border)."""
    scale = n_in / n_out
    dst = np.arange(n_out, dtype=np.float64)
    src = (dst + 0.5) * scale - 0.5
    base = np.floor(src).astype(np.int64)
    frac = src - base
    mat = np.zeros((n_out, n_in), dtype=np.float64)
    for k in range(-1, 3):
        idx = np.clip(base + k, 0, n_in - 1)
        w = _cubic_weights(frac - k)
        np.add.at(mat, (np.arange(n_out), idx), w)
    return mat


def bicubic_resize_torch(img: np.ndarray, out_hw) -> np.ndarray:
    """Separable torch-parity bicubic resize of (..., H, W) arrays
    (align_corners=False). Matches torch.nn.functional.interpolate
    within float tolerance — tests/test_convert_interp.py."""
    h2, w2 = out_hw
    mh = _bicubic_axis_matrix(img.shape[-2], h2)
    mw = _bicubic_axis_matrix(img.shape[-1], w2)
    out = np.einsum("oh,...hw->...ow", mh, img.astype(np.float64))
    out = np.einsum("ow,...hw->...ho", mw, out)
    return out.astype(img.dtype)


def resize_swin_pos_tables(converted_backbone: dict,
                           template_backbone: dict) -> dict:
    """Window-size adaptation of converted Swin position tables (reference
    depthformer_swin.py:1078-1111).

    * Every `relative_position_bias_table` leaf (L1, nH) whose L1 differs
      from the template's L2 is bicubically resized through its
      (2w-1, 2w-1) grid — torch-parity kernel, so an official window-12
      checkpoint loads into a window-7 model exactly as the reference
      would load it. Handles both the per-block (L, nH) and the scanned
      stacked (P, L, nH) layouts.
    * `absolute_pos_embed` (1, gh, gw, C) is bicubically resized to the
      template grid on mismatch (the reference warns-and-skips there; we
      resize — documented conscious fix, models/swin.py use_abs_pos_embed).
    Mutates and returns converted_backbone.
    """
    def walk(node, tmpl):
        if not isinstance(node, dict) or not isinstance(tmpl, dict):
            return
        for k, v in node.items():
            t = tmpl.get(k)
            if t is None:
                continue
            if isinstance(v, dict):
                walk(v, t)
                continue
            if k == "relative_position_bias_table" and v.shape != t.shape:
                if v.shape[-1] != t.shape[-1]:
                    continue  # head-count mismatch: reference warns+skips
                s1 = int(round(v.shape[-2] ** 0.5))
                s2 = int(round(t.shape[-2] ** 0.5))
                if s1 * s1 != v.shape[-2] or s2 * s2 != t.shape[-2]:
                    continue
                nh = v.shape[-1]
                lead = v.shape[:-2]
                grid = np.moveaxis(
                    v.reshape(lead + (s1, s1, nh)), -1, -3)  # (..., nH, S, S)
                grid = bicubic_resize_torch(grid, (s2, s2))
                node[k] = np.moveaxis(grid, -3, -1).reshape(
                    lead + (s2 * s2, nh))
            elif k == "absolute_pos_embed" and v.shape != t.shape:
                if v.shape[-1] != t.shape[-1]:
                    continue
                grid = np.moveaxis(v, -1, -3)  # (1, C, gh, gw)
                grid = bicubic_resize_torch(grid, t.shape[1:3])
                node[k] = np.moveaxis(grid, -3, -1)
    walk(converted_backbone, template_backbone)
    return converted_backbone


def pad_patch_embed_for_pe(params: dict) -> dict:
    """Zero-pad the patch-embed conv from 3 to 4 input channels
    (reference depthformer_swin.py:1113-1123)."""
    kern = params["backbone"]["patch_embed"]["projection"]["kernel"]
    if kern.shape[2] == 3:
        pad = np.zeros_like(kern[:, :, :1, :])
        params["backbone"]["patch_embed"]["projection"]["kernel"] = (
            np.concatenate([kern, pad], axis=2))
    return params


def _merge_into(template, converted, path=()):
    """Fill template pytree leaves from converted nested dict; returns
    (tree, missing_paths)."""
    import jax

    missing = []

    def visit(kp, leaf):
        node = converted
        for p in kp:
            key = getattr(p, "key", str(p))
            if not isinstance(node, dict) or key not in node:
                missing.append("/".join(getattr(q, "key", str(q))
                                        for q in kp))
                return leaf
            node = node[key]
        assert node.shape == leaf.shape, (
            f"{'/'.join(getattr(q, 'key', str(q)) for q in kp)}: "
            f"{node.shape} vs {leaf.shape}")
        import jax.numpy as jnp
        return jnp.asarray(node, leaf.dtype)

    tree = jax.tree_util.tree_map_with_path(visit, template)
    return tree, missing


def convert_checkpoint_file(pth_path: str, model, example_img,
                            example_cam_height=None, use_pe=True):
    """Full pipeline: load .pth, convert, fit into the model's variables.

    Returns (params, batch_stats, report dict).
    """
    import jax

    sd = load_torch_checkpoint(pth_path)
    converted_params, converted_stats, unmapped = convert_state_dict(sd)
    if use_pe and "backbone" in converted_params:
        try:
            pad_patch_embed_for_pe(converted_params)
        except KeyError:
            pass
    variables = model.init(jax.random.PRNGKey(0), example_img,
                           example_cam_height)
    params, missing_p = _merge_into(variables["params"], converted_params)
    stats, missing_s = _merge_into(variables.get("batch_stats", {}),
                                   converted_stats)
    report = {"unmapped_torch_keys": unmapped,
              "missing_params": missing_p, "missing_stats": missing_s}
    return params, stats, report
