"""Numerical parity vs torch reference implementations.

Each test builds the textbook torch version of a module (same math as the
reference), converts its weights through gedepth_tpu.convert, and compares
outputs. This validates module semantics AND the checkpoint converter's
layout transforms in one shot.
"""
import numpy as np
import pytest
import torch
import torch.nn as nn
import torch.nn.functional as F
import jax
import jax.numpy as jnp

from gedepth_tpu.convert.torch_to_jax import (
    convert_state_dict, swin_official_to_gedepth)
from gedepth_tpu.models.swin import (
    WindowMSA, PatchMerging, relative_position_index)
from gedepth_tpu.models.layers import ConvModule
from gedepth_tpu.ops.msda import msda_sample


class TorchWindowMSA(nn.Module):
    """Standard Swin W-MSA with relative position bias (textbook impl)."""

    def __init__(self, dim, heads, window):
        super().__init__()
        self.dim, self.heads, self.window = dim, heads, window
        self.scale = (dim // heads) ** -0.5
        self.qkv = nn.Linear(dim, dim * 3, bias=True)
        self.proj = nn.Linear(dim, dim)
        self.table = nn.Parameter(
            torch.randn((2 * window - 1) ** 2, heads) * 0.02)
        idx = relative_position_index(window, window)
        self.register_buffer("idx", torch.from_numpy(np.asarray(idx)).long())

    def forward(self, x, mask=None):
        B, N, C = x.shape
        qkv = self.qkv(x).reshape(B, N, 3, self.heads, C // self.heads)
        qkv = qkv.permute(2, 0, 3, 1, 4)
        q, k, v = qkv[0], qkv[1], qkv[2]
        attn = (q * self.scale) @ k.transpose(-2, -1)
        bias = self.table[self.idx.view(-1)].view(N, N, -1).permute(2, 0, 1)
        attn = attn + bias.unsqueeze(0)
        if mask is not None:
            nW = mask.shape[0]
            attn = attn.view(B // nW, nW, self.heads, N, N) + \
                mask.unsqueeze(1).unsqueeze(0)
            attn = attn.view(-1, self.heads, N, N)
        attn = attn.softmax(dim=-1)
        out = (attn @ v).transpose(1, 2).reshape(B, N, C)
        return self.proj(out)


def test_window_msa_parity():
    torch.manual_seed(0)
    dim, heads, window = 32, 4, 7
    N = window * window
    tm = TorchWindowMSA(dim, heads, window).eval()
    x = torch.randn(6, N, dim)
    mask = torch.randn(3, N, N) * 5
    mask = torch.where(mask > 0, torch.zeros(()), torch.full((), -100.0))
    with torch.no_grad():
        want = tm(x, mask).numpy()

    # convert via the state-dict mapping (reference names)
    sd = {
        "backbone.stages.0.blocks.0.attn.w_msa.qkv.weight":
            tm.qkv.weight.detach().numpy(),
        "backbone.stages.0.blocks.0.attn.w_msa.qkv.bias":
            tm.qkv.bias.detach().numpy(),
        "backbone.stages.0.blocks.0.attn.w_msa.proj.weight":
            tm.proj.weight.detach().numpy(),
        "backbone.stages.0.blocks.0.attn.w_msa.proj.bias":
            tm.proj.bias.detach().numpy(),
        "backbone.stages.0.blocks.0.attn.w_msa.relative_position_bias_table":
            tm.table.detach().numpy(),
    }
    params, _, unmapped = convert_state_dict(sd)
    assert not unmapped
    flax_params = {"params": params["backbone"]["stage0_block0"]["attn"]}

    jm = WindowMSA(embed_dims=dim, num_heads=heads, window=window)
    xq = jnp.asarray(x.numpy())
    scale = (dim // heads) ** -0.5
    got = jm.apply(flax_params, xq, jnp.asarray(mask.numpy()))
    np.testing.assert_allclose(np.asarray(got), want, rtol=1e-4, atol=1e-5)


class TorchPatchMerging(nn.Module):
    """Unfold-based merging, as in the reference (modified for speed)."""

    def __init__(self, c_in, c_out):
        super().__init__()
        self.sampler = nn.Unfold(kernel_size=2, stride=2)
        self.norm = nn.LayerNorm(4 * c_in)
        self.reduction = nn.Linear(4 * c_in, c_out, bias=False)

    def forward(self, x, hw):
        B, L, C = x.shape
        H, W = hw
        x = x.view(B, H, W, C).permute(0, 3, 1, 2)
        x = self.sampler(x).transpose(1, 2)
        return self.reduction(self.norm(x))


def test_patch_merging_parity():
    torch.manual_seed(1)
    c_in, c_out, H, W = 8, 16, 6, 10
    tm = TorchPatchMerging(c_in, c_out).eval()
    x = torch.randn(2, H * W, c_in)
    with torch.no_grad():
        want = tm(x, (H, W)).numpy()

    sd = {
        "backbone.stages.0.downsample.norm.weight":
            tm.norm.weight.detach().numpy(),
        "backbone.stages.0.downsample.norm.bias":
            tm.norm.bias.detach().numpy(),
        "backbone.stages.0.downsample.reduction.weight":
            tm.reduction.weight.detach().numpy(),
    }
    params, _, unmapped = convert_state_dict(sd)
    assert not unmapped
    jm = PatchMerging(out_channels=c_out)
    got, new_hw = jm.apply({"params": params["backbone"]["downsample0"]},
                           jnp.asarray(x.numpy()), (H, W))
    assert new_hw == (H // 2, W // 2)
    np.testing.assert_allclose(np.asarray(got), want, rtol=1e-4, atol=1e-5)


def test_conv_stem_bn_parity():
    torch.manual_seed(2)
    conv = nn.Conv2d(3, 16, 7, stride=2, padding=3, bias=False)
    bn = nn.BatchNorm2d(16)
    bn.running_mean.normal_()
    bn.running_var.uniform_(0.5, 2.0)
    bn.weight.data.normal_()
    bn.bias.data.normal_()
    conv.eval(), bn.eval()
    x = torch.randn(2, 3, 20, 28)
    with torch.no_grad():
        want = F.relu(bn(conv(x))).numpy().transpose(0, 2, 3, 1)

    sd = {
        "backbone.conv1.weight": conv.weight.detach().numpy(),
        "backbone.bn1.weight": bn.weight.detach().numpy(),
        "backbone.bn1.bias": bn.bias.detach().numpy(),
        "backbone.bn1.running_mean": bn.running_mean.numpy(),
        "backbone.bn1.running_var": bn.running_var.numpy(),
        "backbone.bn1.num_batches_tracked":
            bn.num_batches_tracked.numpy(),
    }
    params, stats, unmapped = convert_state_dict(sd)
    assert not unmapped
    jm = ConvModule(16, kernel_size=7, stride=2, use_norm=True,
                    act=jax.nn.relu)
    got = jm.apply(
        {"params": params["backbone"]["conv_stem"],
         "batch_stats": stats["backbone"]["conv_stem"]},
        jnp.asarray(x.numpy().transpose(0, 2, 3, 1)), False)
    np.testing.assert_allclose(np.asarray(got), want, rtol=1e-4, atol=1e-4)


def test_msda_sampling_matches_grid_sample():
    """msda_sample == grid_sample(align_corners=False, zeros padding)."""
    rng = np.random.default_rng(0)
    B, H, W, heads, dim, Nq, P = 2, 9, 13, 2, 4, 17, 5
    value = rng.standard_normal((B, H, W, heads, dim)).astype(np.float32)
    # locations partly outside [0,1] to exercise zero padding
    locs = rng.uniform(-0.2, 1.2, size=(B, Nq, heads, 1, P, 2)).astype(
        np.float32)
    weights = rng.uniform(0, 1, size=(B, Nq, heads, 1, P)).astype(np.float32)

    got = np.asarray(msda_sample([jnp.asarray(value)], jnp.asarray(locs),
                                 jnp.asarray(weights)))

    v_t = torch.from_numpy(
        value.transpose(0, 3, 4, 1, 2).reshape(B * heads, dim, H, W))
    grid = torch.from_numpy(locs[:, :, :, 0] * 2 - 1)      # (B,Nq,h,P,2)
    grid = grid.permute(0, 2, 1, 3, 4).reshape(B * heads, Nq, P, 2)
    sampled = F.grid_sample(v_t, grid, mode="bilinear",
                            padding_mode="zeros", align_corners=False)
    # (B*h, dim, Nq, P)
    w_t = torch.from_numpy(weights[:, :, :, 0])             # (B,Nq,h,P)
    w_t = w_t.permute(0, 2, 1, 3).reshape(B * heads, 1, Nq, P)
    want = (sampled * w_t).sum(-1)                          # (B*h, dim, Nq)
    want = want.reshape(B, heads, dim, Nq).permute(0, 3, 1, 2)
    want = want.reshape(B, Nq, heads * dim).numpy()
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


def test_official_swin_key_conversion():
    """Official-naming keys pass through swin_official_to_gedepth into the
    reference naming that convert_state_dict understands."""
    C = 8
    sd = {
        "patch_embed.proj.weight": np.zeros((C, 3, 4, 4), np.float32),
        "patch_embed.proj.bias": np.zeros((C,), np.float32),
        "patch_embed.norm.weight": np.ones((C,), np.float32),
        "patch_embed.norm.bias": np.zeros((C,), np.float32),
        "layers.0.blocks.0.norm1.weight": np.ones((C,), np.float32),
        "layers.0.blocks.0.attn.qkv.weight":
            np.zeros((3 * C, C), np.float32),
        "layers.0.blocks.0.mlp.fc1.weight": np.zeros((4 * C, C), np.float32),
        "layers.0.blocks.0.mlp.fc2.weight": np.zeros((C, 4 * C), np.float32),
        "layers.0.downsample.reduction.weight":
            np.arange(2 * C * 4 * C, dtype=np.float32).reshape(2 * C, 4 * C),
        "layers.0.downsample.norm.weight":
            np.arange(4 * C, dtype=np.float32),
        "head.fc.weight": np.zeros((10, C), np.float32),
    }
    out = swin_official_to_gedepth({f"backbone.{k}" if False else k: v
                                    for k, v in sd.items()})
    assert "stages.0.blocks.0.attn.w_msa.qkv.weight" in out
    assert "stages.0.blocks.0.ffn.layers.0.0.weight" in out
    assert "stages.0.blocks.0.ffn.layers.1.weight" in out
    assert "patch_embed.projection.weight" in out
    assert not any(k.startswith("head") for k in out)
    # unfold reorder: position-major [0,2,1,3] -> channel-major
    red = out["stages.0.downsample.reduction.weight"]
    src = sd["layers.0.downsample.reduction.weight"]
    o, i = src.shape
    want = src.reshape(o, 4, i // 4)[:, [0, 2, 1, 3], :].transpose(
        0, 2, 1).reshape(o, i)
    np.testing.assert_array_equal(red, want)


def test_full_tiny_state_dict_roundtrip():
    """Whole-model conversion coverage: every leaf of the flax tree must be
    fillable from a reference-named torch state dict (dropout-free)."""
    from gedepth_tpu.models import GEDepth
    from gedepth_tpu.convert.torch_to_jax import _merge_into

    model = GEDepth(pe_variant="adaptive", embed_dims=16, depths=(1, 1),
                    num_heads=(1, 2), neck_channels=(16, 16, 32),
                    neck_embed_dim=32, neck_num_points=2, drop_path_rate=0.0)
    img = jnp.zeros((1, 32, 48, 5), jnp.float32)
    variables = model.init(jax.random.PRNGKey(0), img,
                           jnp.ones((1,), jnp.float32))

    # Build a torch-named random state dict with matching shapes by walking
    # the flax tree through the inverse of the name mapping.
    sd = {}
    inv = _torch_names_for_tiny(variables)
    rng = np.random.default_rng(0)
    for torch_key, (shape, transform) in inv.items():
        if torch_key.endswith("running_var"):
            sd[torch_key] = rng.uniform(0.5, 2.0, shape).astype(np.float32)
        else:
            sd[torch_key] = (rng.standard_normal(shape) * 0.05).astype(
                np.float32)

    params, stats, unmapped = convert_state_dict(sd)
    assert not unmapped, unmapped
    merged, missing = _merge_into(variables["params"], params)
    assert not missing, missing
    merged_stats, missing_s = _merge_into(variables["batch_stats"], stats)
    assert not missing_s, missing_s
    out = model.apply({"params": merged, "batch_stats": merged_stats}, img,
                      jnp.ones((1,), jnp.float32))
    assert np.isfinite(np.asarray(out["depth"])).all()


def _torch_names_for_tiny(variables):
    """Inverse name map for the tiny model in the roundtrip test: flax leaf
    path -> reference torch key with the torch-layout shape."""
    import jax

    out = {}
    for collection in ("params", "batch_stats"):
        flat = jax.tree_util.tree_flatten_with_path(
            variables.get(collection, {}))[0]
        for kp, leaf in flat:
            names = [getattr(p, "key", str(p)) for p in kp]
            key, shape = _flax_to_torch_name(collection, names, leaf.shape)
            if key is not None:
                out[key] = (shape, None)
    return out


def _flax_to_torch_name(collection, names, shape):
    import re as _re

    def conv_shape(s):
        return (s[3], s[2], s[0], s[1])

    def lin_shape(s):
        return (s[1], s[0])

    top = names[0]
    leaf = names[-1]
    # backbone
    if top == "backbone":
        if names[1] == "patch_embed":
            if names[2] == "projection":
                return (f"backbone.patch_embed.projection."
                        f"{'weight' if leaf == 'kernel' else 'bias'}",
                        conv_shape(shape) if leaf == "kernel" else shape)
            return (f"backbone.patch_embed.norm."
                    f"{'weight' if leaf == 'scale' else 'bias'}", shape)
        m = _re.match(r"stage(\d+)_block(\d+)", names[1])
        if m:
            i, d = m.group(1), m.group(2)
            base = f"backbone.stages.{i}.blocks.{d}"
            if names[2] in ("norm1", "norm2"):
                return (f"{base}.{names[2]}."
                        f"{'weight' if leaf == 'scale' else 'bias'}", shape)
            if names[2] == "attn":
                if names[3] == "relative_position_bias_table":
                    return (f"{base}.attn.w_msa."
                            f"relative_position_bias_table", shape)
                w = "weight" if leaf == "kernel" else "bias"
                s = lin_shape(shape) if leaf == "kernel" else shape
                return (f"{base}.attn.w_msa.{names[3]}.{w}", s)
            if names[2] == "ffn":
                idx = "layers.0.0" if names[3] == "Dense_0" else "layers.1"
                w = "weight" if leaf == "kernel" else "bias"
                s = lin_shape(shape) if leaf == "kernel" else shape
                return (f"{base}.ffn.{idx}.{w}", s)
        m = _re.match(r"downsample(\d+)", names[1])
        if m:
            i = m.group(1)
            if names[2] == "norm":
                return (f"backbone.stages.{i}.downsample.norm."
                        f"{'weight' if leaf == 'scale' else 'bias'}", shape)
            return (f"backbone.stages.{i}.downsample.reduction.weight",
                    lin_shape(shape))
        m = _re.match(r"norm(\d+)", names[1])
        if m:
            return (f"backbone.norm{m.group(1)}."
                    f"{'weight' if leaf == 'scale' else 'bias'}", shape)
        if names[1] == "conv_stem":
            if names[2] == "Conv_0":
                return ("backbone.conv1.weight", conv_shape(shape))
            stat = {"scale": "weight", "bias": "bias", "mean": "running_mean",
                    "var": "running_var"}[leaf]
            return (f"backbone.bn1.{stat}", shape)
    if top == "neck":
        sub = names[1]
        convmap = {"Conv_0": "conv", "BatchNorm_0": "bn"}
        if sub.startswith("lateral"):
            i = sub[len("lateral"):]
            return _convmodule_name(f"neck.lateral_convs.{i}", names, shape)
        if sub.startswith("trans_proj"):
            i = sub[len("trans_proj"):]
            return _convmodule_name(f"neck.trans_proj.{i}", names, shape)
        if sub.startswith("trans_fusion"):
            i = sub[len("trans_fusion"):]
            return _convmodule_name(f"neck.trans_fusion.{i}", names, shape)
        if sub == "conv_proj":
            return _convmodule_name("neck.conv_proj.0", names, shape)
        if sub == "conv_fusion":
            return _convmodule_name("neck.conv_fusion.0", names, shape)
        if sub == "level_embed":
            return ("neck.level_embed", shape)
        if sub == "reference_points":
            w = "weight" if leaf == "kernel" else "bias"
            s = lin_shape(shape) if leaf == "kernel" else shape
            return (f"neck.reference_points.{w}", s)
        if sub in ("self_attn", "cross_attn"):
            torch_mod = "self_attn" if sub == "self_attn" else "multi_att"
            w = "weight" if leaf == "kernel" else "bias"
            s = lin_shape(shape) if leaf == "kernel" else shape
            return (f"neck.{torch_mod}.{names[2]}.{w}", s)
    if top in ("pe_mask_neck", "dynamic_pe_neck"):
        conv = names[2] if names[1] == "fuse" else names[1]
        w = "weight" if leaf == "kernel" else "bias"
        s = conv_shape(shape) if leaf == "kernel" else shape
        return (f"{top}.{conv}.{w}", s)
    if top == "decode_head":
        if names[1] == "conv0":
            w = "weight" if leaf == "kernel" else "bias"
            s = conv_shape(shape) if leaf == "kernel" else shape
            return (f"decode_head.conv_list.0.conv.{w}", s)
        m = _re.match(r"up(\d+)", names[1])
        if m:
            w = "weight" if leaf == "kernel" else "bias"
            s = conv_shape(shape) if leaf == "kernel" else shape
            return (f"decode_head.conv_list.{m.group(1)}.{names[2]}.conv.{w}",
                    s)
        if names[1] == "conv_depth":
            w = "weight" if leaf == "kernel" else "bias"
            s = conv_shape(shape) if leaf == "kernel" else shape
            return (f"decode_head.conv_depth.{w}", s)
    raise AssertionError(f"no torch name for {collection}/{'/'.join(names)}")


def _convmodule_name(torch_base, names, shape):
    leaf = names[-1]
    if names[2] == "Conv_0":
        w = "weight" if leaf == "kernel" else "bias"
        s = (shape[3], shape[2], shape[0], shape[1]) if leaf == "kernel" \
            else shape
        return (f"{torch_base}.conv.{w}", s)
    stat = {"scale": "weight", "bias": "bias", "mean": "running_mean",
            "var": "running_var"}[leaf]
    return (f"{torch_base}.bn.{stat}", shape)


def test_vit_official_conversion_parity():
    """Official-ViT naming -> our VisionTransformer: converted weights
    reproduce a textbook torch ViT's tokens."""
    from gedepth_tpu.convert.vit_official import convert_vit_official
    from gedepth_tpu.models.vit import VisionTransformer

    torch.manual_seed(0)
    C, heads, blocks, P, grid = 32, 4, 2, 8, 3

    mods = []
    for _ in range(blocks):
        blk = nn.Module()
        blk.norm1 = nn.LayerNorm(C, eps=1e-6)
        blk.attn_qkv = nn.Linear(C, 3 * C)
        blk.attn_proj = nn.Linear(C, C)
        blk.norm2 = nn.LayerNorm(C, eps=1e-6)
        blk.fc1 = nn.Linear(C, 4 * C)
        blk.fc2 = nn.Linear(4 * C, C)
        mods.append(blk)
    cls_token = torch.zeros(1, 1, C)
    pos_embed = torch.randn(1, grid * grid + 1, C) * 0.02
    patch_proj = nn.Conv2d(3, C, P, stride=P)

    def torch_fwd(x):
        B = x.shape[0]
        x = patch_proj(x).flatten(2).transpose(1, 2)
        x = x + pos_embed[:, 1:]
        cls = (cls_token + pos_embed[:, :1]).expand(B, -1, -1)
        x = torch.cat([cls, x], 1)
        for blk in mods:
            y = blk.norm1(x)
            qkv = blk.attn_qkv(y).reshape(
                B, -1, 3, heads, C // heads).permute(2, 0, 3, 1, 4)
            q, k, v = qkv[0], qkv[1], qkv[2]
            a = ((q @ k.transpose(-2, -1)) * (C // heads) ** -0.5).softmax(-1)
            y = (a @ v).transpose(1, 2).reshape(B, -1, C)
            x = x + blk.attn_proj(y)
            x = x + blk.fc2(F.gelu(blk.fc1(blk.norm2(x))))
        return x

    img = torch.randn(1, 3, grid * P, grid * P)
    with torch.no_grad():
        want = torch_fwd(img).numpy()

    sd = {"cls_token": cls_token.numpy(), "pos_embed": pos_embed.numpy(),
          "patch_embed.proj.weight": patch_proj.weight.detach().numpy(),
          "patch_embed.proj.bias": patch_proj.bias.detach().numpy()}
    for i, blk in enumerate(mods):
        p = f"blocks.{i}."
        sd[p + "norm1.weight"] = blk.norm1.weight.detach().numpy()
        sd[p + "norm1.bias"] = blk.norm1.bias.detach().numpy()
        sd[p + "norm2.weight"] = blk.norm2.weight.detach().numpy()
        sd[p + "norm2.bias"] = blk.norm2.bias.detach().numpy()
        sd[p + "attn.qkv.weight"] = blk.attn_qkv.weight.detach().numpy()
        sd[p + "attn.qkv.bias"] = blk.attn_qkv.bias.detach().numpy()
        sd[p + "attn.proj.weight"] = blk.attn_proj.weight.detach().numpy()
        sd[p + "attn.proj.bias"] = blk.attn_proj.bias.detach().numpy()
        sd[p + "mlp.fc1.weight"] = blk.fc1.weight.detach().numpy()
        sd[p + "mlp.fc1.bias"] = blk.fc1.bias.detach().numpy()
        sd[p + "mlp.fc2.weight"] = blk.fc2.weight.detach().numpy()
        sd[p + "mlp.fc2.bias"] = blk.fc2.bias.detach().numpy()

    params = convert_vit_official(sd, num_heads=heads, num_blocks=blocks)
    vit = VisionTransformer(embed_dims=C, depth=blocks, num_heads=heads,
                            patch_size=P, out_indices=(0, 1),
                            pretrain_grid=grid)
    img_j = jnp.asarray(img.numpy().transpose(0, 2, 3, 1))
    tokens, hw = vit.apply({"params": params}, img_j)[-1]
    np.testing.assert_allclose(np.asarray(tokens), want, rtol=1e-4,
                               atol=1e-5)


def test_binsformer_release_remap():
    """Mirrors reference tools/model_converters/binsformer.py: strips the
    extra `.decoder.` nesting, leaves everything else untouched."""
    from gedepth_tpu.convert import binsformer_release_remap

    sd = {
        "decode_head.transformer_decoder.decoder.layers.0.w": 1,
        "decode_head.conv_depth.weight": 2,
        "backbone.patch_embed.projection.weight": 3,
    }
    out = binsformer_release_remap(sd)
    assert out == {
        "decode_head.transformer_decoder.layers.0.w": 1,
        "decode_head.conv_depth.weight": 2,
        "backbone.patch_embed.projection.weight": 3,
    }


def test_simipu_backbone_extract():
    """Mirrors reference tools/model_converters/SimIPU.py: keeps only
    img_backbone.* keys, stripping the img_ prefix."""
    from gedepth_tpu.convert import simipu_backbone_extract

    sd = {
        "img_backbone.stages.0.blocks.0.attn.w": 1,
        "img_neck.lateral.weight": 2,
        "pts_backbone.conv.weight": 3,
    }
    out = simipu_backbone_extract(sd)
    assert out == {"backbone.stages.0.blocks.0.attn.w": 1}
