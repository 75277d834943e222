"""DepthFormer-Swin backbone (NHWC, flax).

Hybrid backbone: a conv stem over RGB at stride 2 plus a Swin transformer
over the 4-channel RGBP input at stride 4 (reference
depth/models/backbones/depthformer_swin.py:753-1184, GEDepth config
num_stages=0 so the stem is conv7x7-BN-ReLU only).

Window attention runs through `gedepth_tpu.ops.window_attention` (XLA
einsum path; a parity-verified Pallas kernel exists in ops/pallas but XLA's
fused lowering measured faster at Swin-L scale — see NOTES.md).

Outputs (multi-scale pyramid):
  [stem (H/2, 64ch), stage1 (H/4, C), stage2 (H/8, 2C),
   stage3 (H/16, 4C), stage4 (H/32, 8C)]   with per-stage LayerNorm.
"""
from __future__ import annotations

import functools
from typing import Optional, Sequence, Tuple

import numpy as np
import jax
import jax.numpy as jnp
import flax.linen as nn

from gedepth_tpu.models.layers import (
    ConvModule, DropPath, Mlp, trunc_normal_init)
from gedepth_tpu.ops.window_attention import window_attention


@functools.lru_cache(maxsize=32)
def relative_position_index(wh: int, ww: int) -> np.ndarray:
    """(wh*ww, wh*ww) index into the (2wh-1)(2ww-1) rel-pos bias table.

    index[i, j] = (yi - yj + wh - 1) * (2ww - 1) + (xi - xj + ww - 1),
    equal to the reference's double_step_seq construction
    (depthformer_swin.py:167-172, 226-230).
    """
    ys, xs = np.meshgrid(np.arange(wh), np.arange(ww), indexing="ij")
    ys, xs = ys.reshape(-1), xs.reshape(-1)
    rel_y = ys[:, None] - ys[None, :] + wh - 1
    rel_x = xs[:, None] - xs[None, :] + ww - 1
    return (rel_y * (2 * ww - 1) + rel_x).astype(np.int32)


@functools.lru_cache(maxsize=64)
def shifted_window_mask(h_pad: int, w_pad: int, window: int,
                        shift: int) -> np.ndarray:
    """(num_windows, N, N) additive mask (0 / -100) for SW-MSA.

    Static-shape replica of the reference's image-mask construction
    (depthformer_swin.py:304-326).
    """
    img_mask = np.zeros((h_pad, w_pad), dtype=np.int32)
    h_slices = (slice(0, -window), slice(-window, -shift), slice(-shift, None))
    w_slices = (slice(0, -window), slice(-window, -shift), slice(-shift, None))
    cnt = 0
    for hs in h_slices:
        for ws in w_slices:
            img_mask[hs, ws] = cnt
            cnt += 1
    nh, nw = h_pad // window, w_pad // window
    win = img_mask.reshape(nh, window, nw, window).transpose(0, 2, 1, 3)
    win = win.reshape(nh * nw, window * window)
    diff = win[:, None, :] - win[:, :, None]
    return np.where(diff != 0, -100.0, 0.0).astype(np.float32)


def window_partition(x, window: int):
    """(B, H, W, C) -> (B * nH * nW, window*window, C). H, W divisible."""
    B, H, W, C = x.shape
    x = x.reshape(B, H // window, window, W // window, window, C)
    x = x.transpose(0, 1, 3, 2, 4, 5)
    return x.reshape(-1, window * window, C)


def window_reverse(x, window: int, B: int, H: int, W: int):
    C = x.shape[-1]
    x = x.reshape(B, H // window, W // window, window, window, C)
    x = x.transpose(0, 1, 3, 2, 4, 5)
    return x.reshape(B, H, W, C)


class _PackedQKV(nn.Module):
    """Torch-layout packed qkv projection, applied as three weight slices.

    Param paths match nn.Dense ("kernel" (C, 3C), "bias" (3C,)) so the
    checkpoint converter's qkv mapping is unchanged."""

    @nn.compact
    def __call__(self, x, num_heads):
        nWB, N, C = x.shape
        head_dim = C // num_heads
        kern = self.param("kernel", trunc_normal_init, (C, 3 * C))
        bias = self.param("bias", nn.initializers.zeros, (3 * C,))
        outs = []
        for s in range(3):
            w_s = jax.lax.slice_in_dim(kern, s * C, (s + 1) * C, axis=1)
            b_s = jax.lax.slice_in_dim(bias, s * C, (s + 1) * C, axis=0)
            outs.append((x @ w_s + b_s).reshape(nWB, N, num_heads,
                                                head_dim))
        return outs


class WindowMSA(nn.Module):
    """Window multi-head self-attention with relative position bias."""
    embed_dims: int
    num_heads: int
    window: int
    attn_drop: float = 0.0
    proj_drop: float = 0.0

    @nn.compact
    def __call__(self, x, mask=None, deterministic: bool = True):
        # x: (nW*B, N, C); mask: (num_windows, N, N) or None
        nWB, N, C = x.shape
        head_dim = C // self.num_heads
        scale = head_dim ** -0.5

        table = self.param(
            "relative_position_bias_table", trunc_normal_init,
            ((2 * self.window - 1) * (2 * self.window - 1), self.num_heads))
        idx = relative_position_index(self.window, self.window)
        # (N, N, heads) -> (heads, N, N)
        bias = table[idx.reshape(-1)].reshape(N, N, -1).transpose(2, 0, 1)

        # packed qkv parameter (checkpoint-compatible paths) applied as
        # three weight slices: slicing the (C, 3C) weight is free, whereas
        # slicing the (nWB, N, 3, h, hd) activation forced XLA layout
        # copies inside every block (profiled ~10 ms/iter at full res in
        # the scanned stages)
        q, k, v = _PackedQKV(name="qkv")(x, self.num_heads)

        out = window_attention(q * scale, k, v, bias, mask)

        out = out.reshape(nWB, N, C)
        out = nn.Dense(C, kernel_init=trunc_normal_init, name="proj")(out)
        if self.proj_drop > 0:
            out = nn.Dropout(self.proj_drop)(out, deterministic=deterministic)
        return out


class SwinBlock(nn.Module):
    embed_dims: int
    num_heads: int
    window: int
    shift: bool
    mlp_ratio: int = 4
    drop_path: float = 0.0
    drop_rate: float = 0.0

    @nn.compact
    def __call__(self, x, hw_shape, deterministic: bool = True,
                 drop_path_rate=None):
        B, L, C = x.shape
        H, W = hw_shape
        shift = self.window // 2 if self.shift else 0

        identity = x
        x = nn.LayerNorm(epsilon=1e-5, name="norm1")(x)
        x = x.reshape(B, H, W, C)

        pad_b = (self.window - H % self.window) % self.window
        pad_r = (self.window - W % self.window) % self.window
        if pad_b or pad_r:
            x = jnp.pad(x, ((0, 0), (0, pad_b), (0, pad_r), (0, 0)))
        Hp, Wp = H + pad_b, W + pad_r

        if shift > 0:
            x = jnp.roll(x, (-shift, -shift), axis=(1, 2))
            mask = jnp.asarray(shifted_window_mask(Hp, Wp, self.window, shift))
        else:
            mask = None

        windows = window_partition(x, self.window)
        attn = WindowMSA(self.embed_dims, self.num_heads, self.window,
                         name="attn")(windows, mask, deterministic)
        x = window_reverse(attn, self.window, B, Hp, Wp)

        if shift > 0:
            x = jnp.roll(x, (shift, shift), axis=(1, 2))
        if pad_b or pad_r:
            x = x[:, :H, :W, :]
        x = x.reshape(B, L, C)
        x = identity + DropPath(self.drop_path)(x, deterministic,
                                                drop_path_rate)

        identity = x
        y = nn.LayerNorm(epsilon=1e-5, name="norm2")(x)
        y = Mlp(self.mlp_ratio * C, C, self.drop_rate, name="ffn")(
            y, deterministic)
        return identity + DropPath(self.drop_path)(y, deterministic,
                                                   drop_path_rate)


class PatchMerging(nn.Module):
    """2x2 space-to-depth + LN + Linear(4C -> 2C, no bias).

    Channel order matches torch nn.Unfold (channel-major, then row-major
    spatial) so converted checkpoints drop in unchanged
    (depthformer_swin.py:86-121).
    """
    out_channels: int

    @nn.compact
    def __call__(self, x, hw_shape):
        B, L, C = x.shape
        H, W = hw_shape
        x = x.reshape(B, H, W, C)
        if H % 2 or W % 2:
            x = jnp.pad(x, ((0, 0), (0, H % 2), (0, W % 2), (0, 0)))
            H, W = H + H % 2, W + W % 2
        x = x.reshape(B, H // 2, 2, W // 2, 2, C)
        # -> (B, H/2, W/2, C, 2, 2): feature vector is c-major, then (i, j)
        x = x.transpose(0, 1, 3, 5, 2, 4)
        x = x.reshape(B, (H // 2) * (W // 2), 4 * C)
        x = nn.LayerNorm(epsilon=1e-5, name="norm")(x)
        x = nn.Dense(self.out_channels, use_bias=False,
                     kernel_init=trunc_normal_init, name="reduction")(x)
        return x, (H // 2, W // 2)


class PatchEmbed(nn.Module):
    """Non-overlapping patch embedding: conv k=s=patch_size + LN."""
    embed_dims: int
    patch_size: int = 4

    @nn.compact
    def __call__(self, x):
        B, H, W, C = x.shape
        ps = self.patch_size
        pad_b = (ps - H % ps) % ps
        pad_r = (ps - W % ps) % ps
        if pad_b or pad_r:
            x = jnp.pad(x, ((0, 0), (0, pad_b), (0, pad_r), (0, 0)))
        x = nn.Conv(self.embed_dims, (ps, ps), strides=(ps, ps),
                    padding="VALID", name="projection")(x)
        DH, DW = x.shape[1], x.shape[2]
        x = x.reshape(B, DH * DW, self.embed_dims)
        x = nn.LayerNorm(epsilon=1e-5, name="norm")(x)
        return x, (DH, DW)


class _BlockPair(nn.Module):
    """One W-MSA + SW-MSA pair — the scan unit of a Swin stage.

    Per-block drop-path rates arrive as the (2,)-vector scan input so every
    pair shares one compiled body (reference stages are structurally
    identical within a stage; only drop_path varies, depthformer_swin.py
    dpr linspace)."""
    embed_dims: int
    num_heads: int
    window: int
    mlp_ratio: int
    drop_rate: float
    hw: Tuple[int, int]
    deterministic: bool
    remat: bool

    @nn.compact
    def __call__(self, x, dpr):
        block_cls = (nn.remat(SwinBlock, static_argnums=(2, 3))
                     if self.remat else SwinBlock)
        x = block_cls(self.embed_dims, self.num_heads, self.window,
                      shift=False, mlp_ratio=self.mlp_ratio,
                      drop_rate=self.drop_rate, name="block0")(
                          x, self.hw, self.deterministic, dpr[0])
        x = block_cls(self.embed_dims, self.num_heads, self.window,
                      shift=True, mlp_ratio=self.mlp_ratio,
                      drop_rate=self.drop_rate, name="block1")(
                          x, self.hw, self.deterministic, dpr[1])
        return x, None


def stack_swin_params(backbone_params: dict, depths) -> dict:
    """Per-block param tree -> scanned-pair param tree.

    Converts `stage{i}_block{d}` entries (checkpoint-converter / orbax
    layout) into the `stage{i}_pairs/block{0,1}` stacked layout expected by
    `DepthFormerSwin(scan_pairs=True)` (leading axis = pair index). All
    non-block entries pass through unchanged."""
    import jax

    out = {k: v for k, v in backbone_params.items()
           if not (k.startswith("stage") and "_block" in k)}
    for i, depth in enumerate(depths):
        blocks = [backbone_params[f"stage{i}_block{d}"]
                  for d in range(depth)]
        if not blocks:
            continue
        assert depth % 2 == 0, "scan_pairs needs even stage depths"
        pairs = {}
        for j in range(2):
            sub = [blocks[2 * p + j] for p in range(depth // 2)]
            pairs[f"block{j}"] = jax.tree.map(
                lambda *leaves: np.stack(leaves, axis=0), *sub)
        out[f"stage{i}_pairs"] = pairs
    return out


def unstack_swin_params(backbone_params: dict) -> dict:
    """Scanned-pair param tree -> per-block tree (inverse of
    `stack_swin_params`): `stage{i}_pairs/block{j}` stacked entries become
    `stage{i}_block{2p+j}` per-block entries."""
    import jax

    out = {k: v for k, v in backbone_params.items()
           if not (k.startswith("stage") and k.endswith("_pairs"))}
    for k, pairs in backbone_params.items():
        if not (k.startswith("stage") and k.endswith("_pairs")):
            continue
        i = k[len("stage"):-len("_pairs")]
        n_pairs = jax.tree_util.tree_leaves(pairs["block0"])[0].shape[0]
        for p in range(n_pairs):
            for j in range(2):
                out[f"stage{i}_block{2 * p + j}"] = jax.tree.map(
                    lambda a, p=p: np.asarray(a)[p], pairs[f"block{j}"])
    return out


def adapt_swin_layout(backbone_params: dict, template_backbone: dict) -> dict:
    """Convert a backbone param tree between the per-block and scanned-pair
    layouts so it matches `template_backbone`'s layout.

    Checkpoints written from a `scan_pairs=False` model (or the torch
    converter's per-block output) load into a scanned model and vice versa;
    trees already in the template's layout pass through unchanged. Stages
    whose block set is incomplete/odd are left as-is (their entries simply
    won't match the template and stay at fresh init in soft merges)."""
    src_pairs = any(k.startswith("stage") and k.endswith("_pairs")
                    for k in backbone_params)
    dst_pairs = any(k.startswith("stage") and k.endswith("_pairs")
                    for k in template_backbone)
    if src_pairs == dst_pairs:
        return backbone_params
    if not dst_pairs:
        return unstack_swin_params(backbone_params)
    # per-block -> stacked pairs, stage by stage, skipping incomplete stages
    out = {k: v for k, v in backbone_params.items()
           if not (k.startswith("stage") and "_block" in k)}
    stages: dict = {}
    for k, v in backbone_params.items():
        if k.startswith("stage") and "_block" in k:
            i, d = k[len("stage"):].split("_block")
            stages.setdefault(i, {})[int(d)] = v
    for i, blocks in stages.items():
        depth = max(blocks) + 1
        if depth % 2 or set(blocks) != set(range(depth)):
            for d, v in blocks.items():  # incomplete stage: pass through
                out[f"stage{i}_block{d}"] = v
            continue
        staged = stack_swin_params(
            {f"stage0_block{d}": blocks[d] for d in range(depth)}, (depth,))
        out[f"stage{i}_pairs"] = staged["stage0_pairs"]
    return out


class DepthFormerSwin(nn.Module):
    """Conv stem (RGB) + Swin stages (RGBP when use_pe).

    scan_pairs=True runs each stage as an `nn.scan` over its (W-MSA,
    SW-MSA) block pairs: one compiled pair body per stage instead of
    `depth` inlined blocks, shrinking HLO (and cold-compile time) roughly
    by sum(depths)/2/4 at Swin-L scale. Param layout changes to stacked
    `stage{i}_pairs` entries — `stack_swin_params` adapts per-block
    checkpoints."""
    embed_dims: int = 192
    depths: Sequence[int] = (2, 2, 18, 2)
    num_heads: Sequence[int] = (6, 12, 24, 48)
    window: int = 7
    patch_size: int = 4
    mlp_ratio: int = 4
    drop_path_rate: float = 0.3
    drop_rate: float = 0.0
    use_pe: bool = True
    stem_channels: int = 64
    remat: bool = True  # rematerialise blocks in the backward pass
    scan_pairs: bool = False
    # learned absolute position embedding added after patch embed
    # (reference depthformer_swin.py use_abs_pos_embed — off in every
    # shipped config; checkpoint ingestion reshapes the (1, L, C) official
    # table, depthformer_swin.py:1078-1086). pretrain_grid pins the table's
    # (H/4, W/4) grid (e.g. (56, 56) for a 224-pretrained official ckpt);
    # on input-size mismatch the table is bilinearly resized at forward —
    # a conscious fix: the reference would shape-error there.
    use_abs_pos_embed: bool = False
    pretrain_grid: Optional[Tuple[int, int]] = None

    @nn.compact
    def __call__(self, img, train: bool = False):
        deterministic = not train
        rgb = img[..., :3]
        stem = ConvModule(self.stem_channels, kernel_size=7, stride=2,
                          use_norm=True, act=nn.relu, name="conv_stem")(
                              rgb, train=train)
        outs = [stem]

        x = img[..., :4] if self.use_pe else rgb
        x, hw = PatchEmbed(self.embed_dims, self.patch_size,
                           name="patch_embed")(x)
        if self.use_abs_pos_embed:
            gh, gw = self.pretrain_grid or hw
            table = self.param("absolute_pos_embed", trunc_normal_init,
                               (1, gh, gw, self.embed_dims))
            if (gh, gw) != tuple(hw):
                from gedepth_tpu.ops.resize import resize_bilinear
                table = resize_bilinear(table, hw, align_corners=False)
            x = x + table.reshape(1, hw[0] * hw[1], self.embed_dims)

        total_depth = sum(self.depths)
        dpr = np.linspace(0, self.drop_path_rate, total_depth).tolist()
        block_idx = 0
        channels = self.embed_dims
        use_remat = self.remat and train
        block_cls = (nn.remat(SwinBlock, static_argnums=(2, 3))
                     if use_remat else SwinBlock)
        for i, depth in enumerate(self.depths):
            if self.scan_pairs and depth % 2 == 0:
                rates = jnp.asarray(
                    dpr[block_idx:block_idx + depth],
                    jnp.float32).reshape(depth // 2, 2)
                scan_cls = nn.scan(
                    _BlockPair,
                    variable_axes={"params": 0},
                    split_rngs={"params": True, "dropout": True},
                    in_axes=0, out_axes=0)
                x, _ = scan_cls(channels, self.num_heads[i], self.window,
                                self.mlp_ratio, self.drop_rate, hw,
                                deterministic, use_remat,
                                name=f"stage{i}_pairs")(x, rates)
                block_idx += depth
            else:
                for d in range(depth):
                    x = block_cls(channels, self.num_heads[i], self.window,
                                  shift=(d % 2 == 1),
                                  mlp_ratio=self.mlp_ratio,
                                  drop_path=dpr[block_idx],
                                  drop_rate=self.drop_rate,
                                  name=f"stage{i}_block{d}")(x, hw,
                                                             deterministic)
                    block_idx += 1
            out = nn.LayerNorm(epsilon=1e-5, name=f"norm{i}")(x)
            B = out.shape[0]
            outs.append(out.reshape(B, hw[0], hw[1], channels))
            if i < len(self.depths) - 1:
                x, hw = PatchMerging(2 * channels,
                                     name=f"downsample{i}")(x, hw)
                channels *= 2
        return outs
