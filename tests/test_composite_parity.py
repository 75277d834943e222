"""Full-model composite torch parity (VERDICT round-1 item 2).

Builds a complete textbook-torch GEDepth (DepthFormer-Swin backbone + HAHI
deformable neck + PE mask/slope necks + DenseDepth head + fusion) whose
state_dict uses the REFERENCE's key names, runs `convert_state_dict` over
the full dict, loads the result into our flax GEDepth, and asserts
end-to-end forward agreement (vanilla + adaptive + flip TTA). This upgrades
"the converter works per-module" into "a reference-format .pth reproduces
the full forward" — the closest offline stand-in for the released-checkpoint
Abs-Rel acceptance run (reference depth/models/depther/encoder_decoder.py:
21-274; converter gedepth_tpu/convert/torch_to_jax.py).

Model scale is tiny (embed 16, window 2, 64x128 input) but structurally
complete: every converted parameter class is on the path.
"""
import numpy as np
import pytest
import torch
import torch.nn as nn
import torch.nn.functional as F
import jax
import jax.numpy as jnp

from gedepth_tpu.convert.torch_to_jax import convert_state_dict, _merge_into
from gedepth_tpu.models.depther import GEDepth
from gedepth_tpu.models.swin import shifted_window_mask
from gedepth_tpu.models.hahi import _center_reference_points
from gedepth_tpu.models.layers import sine_positional_encoding

pytestmark = pytest.mark.slow  # compile-heavy: full-model jits (test tiers, NOTES r4)

# ---- test scale -----------------------------------------------------------
H_IMG, W_IMG = 64, 128
EMBED = 16
DEPTHS = (1, 1, 2, 1)
HEADS = (2, 2, 4, 8)
WINDOW = 2
NECK_CH = (64, 16, 32, 64, 128)
NECK_EMBED = 32
NECK_HEADS = 8
NECK_POINTS = 4
MIN_D, MAX_D = 1e-3, 80.0
DEPTH_SCALE = 200.0
CAM_H = 1.65


# ---- torch building blocks (reference key names) --------------------------

class TConvModule(nn.Module):
    """mmcv ConvModule: conv(no bias) + BN + ReLU."""

    def __init__(self, cin, cout, k, stride=1):
        super().__init__()
        self.conv = nn.Conv2d(cin, cout, k, stride, k // 2, bias=False)
        self.bn = nn.BatchNorm2d(cout, eps=1e-5)

    def forward(self, x):
        return F.relu(self.bn(self.conv(x)))


class TWMSA(nn.Module):
    def __init__(self, dim, heads, window):
        super().__init__()
        self.dim, self.heads, self.window = dim, heads, window
        self.qkv = nn.Linear(dim, dim * 3)
        self.proj = nn.Linear(dim, dim)
        self.relative_position_bias_table = nn.Parameter(
            torch.randn((2 * window - 1) ** 2, heads) * 0.02)
        from gedepth_tpu.models.swin import relative_position_index
        idx = relative_position_index(window, window)
        self.register_buffer("relative_position_index",
                             torch.from_numpy(np.asarray(idx)).long())

    def forward(self, x, mask=None):
        B, N, C = x.shape
        scale = (C // self.heads) ** -0.5
        qkv = self.qkv(x).reshape(B, N, 3, self.heads, C // self.heads)
        qkv = qkv.permute(2, 0, 3, 1, 4)
        q, k, v = qkv[0], qkv[1], qkv[2]
        attn = (q * scale) @ k.transpose(-2, -1)
        bias = self.relative_position_bias_table[
            self.relative_position_index.view(-1)].view(N, N, -1)
        attn = attn + bias.permute(2, 0, 1).unsqueeze(0)
        if mask is not None:
            nW = mask.shape[0]
            attn = attn.view(B // nW, nW, self.heads, N, N) + \
                mask.unsqueeze(1).unsqueeze(0)
            attn = attn.view(-1, self.heads, N, N)
        attn = attn.softmax(dim=-1)
        return self.proj((attn @ v).transpose(1, 2).reshape(B, N, C))


class TAttnWrap(nn.Module):
    def __init__(self, dim, heads, window):
        super().__init__()
        self.w_msa = TWMSA(dim, heads, window)

    def forward(self, x, mask=None):
        return self.w_msa(x, mask)


class TFFN(nn.Module):
    def __init__(self, dim, hidden):
        super().__init__()
        self.layers = nn.ModuleList([
            nn.Sequential(nn.Linear(dim, hidden), nn.GELU()),
            nn.Linear(hidden, dim)])

    def forward(self, x):
        return self.layers[1](self.layers[0](x))


class TSwinBlock(nn.Module):
    def __init__(self, dim, heads, window, shift):
        super().__init__()
        self.window, self.shift = window, (window // 2 if shift else 0)
        self.norm1 = nn.LayerNorm(dim, eps=1e-5)
        self.attn = TAttnWrap(dim, heads, window)
        self.norm2 = nn.LayerNorm(dim, eps=1e-5)
        self.ffn = TFFN(dim, 4 * dim)

    def forward(self, x, hw):
        B, L, C = x.shape
        H, W = hw
        w = self.window
        identity = x
        x = self.norm1(x).view(B, H, W, C)
        if self.shift:
            x = torch.roll(x, (-self.shift, -self.shift), dims=(1, 2))
            mask = torch.from_numpy(np.asarray(
                shifted_window_mask(H, W, w, self.shift)))
        else:
            mask = None
        x = x.view(B, H // w, w, W // w, w, C).permute(0, 1, 3, 2, 4, 5)
        x = x.reshape(-1, w * w, C)
        x = self.attn(x, mask)
        x = x.view(B, H // w, W // w, w, w, C).permute(0, 1, 3, 2, 4, 5)
        x = x.reshape(B, H, W, C)
        if self.shift:
            x = torch.roll(x, (self.shift, self.shift), dims=(1, 2))
        x = identity + x.reshape(B, L, C)
        return x + self.ffn(self.norm2(x))


class TPatchMerging(nn.Module):
    def __init__(self, cin, cout):
        super().__init__()
        self.norm = nn.LayerNorm(4 * cin, eps=1e-5)
        self.reduction = nn.Linear(4 * cin, cout, bias=False)

    def forward(self, x, hw):
        B, L, C = x.shape
        H, W = hw
        x = x.view(B, H, W, C).permute(0, 3, 1, 2)
        x = F.unfold(x, kernel_size=2, stride=2).transpose(1, 2)
        return self.reduction(self.norm(x)), (H // 2, W // 2)


class TStage(nn.Module):
    def __init__(self, dim, depth, heads, window, downsample):
        super().__init__()
        self.blocks = nn.ModuleList(
            [TSwinBlock(dim, heads, window, shift=(d % 2 == 1))
             for d in range(depth)])
        self.downsample = (TPatchMerging(dim, 2 * dim) if downsample
                           else None)


class TPatchEmbed(nn.Module):
    def __init__(self, cin, dim):
        super().__init__()
        self.projection = nn.Conv2d(cin, dim, 4, 4)
        self.norm = nn.LayerNorm(dim, eps=1e-5)

    def forward(self, x):
        x = self.projection(x)
        B, C, H, W = x.shape
        x = x.flatten(2).transpose(1, 2)
        return self.norm(x), (H, W)


class TBackbone(nn.Module):
    def __init__(self):
        super().__init__()
        self.conv1 = nn.Conv2d(3, 64, 7, 2, 3, bias=False)
        self.bn1 = nn.BatchNorm2d(64, eps=1e-5)
        self.patch_embed = TPatchEmbed(4, EMBED)
        dims = [EMBED * (2 ** i) for i in range(4)]
        self.stages = nn.ModuleList([
            TStage(dims[i], DEPTHS[i], HEADS[i], WINDOW, i < 3)
            for i in range(4)])
        for i in range(4):
            setattr(self, f"norm{i}", nn.LayerNorm(dims[i], eps=1e-5))

    def forward(self, img5):
        stem = F.relu(self.bn1(self.conv1(img5[:, :3])))
        x, hw = self.patch_embed(img5[:, :4])
        outs = [stem]
        for i, stage in enumerate(self.stages):
            for blk in stage.blocks:
                x = blk(x, hw)
            out = getattr(self, f"norm{i}")(x)
            B = out.shape[0]
            outs.append(out.view(B, hw[0], hw[1], -1).permute(0, 3, 1, 2))
            if stage.downsample is not None:
                x, hw = stage.downsample(x, hw)
        return outs


def torch_msda_core(levels, locs, weights):
    """levels: list of (B, h, d, H, W); locs (B, Nq, h, L, P, 2) normalized;
    weights (B, Nq, h, L, P). grid_sample bilinear/zeros/align=False."""
    B, Nq, h, L, P, _ = locs.shape
    out = 0.0
    for l, v in enumerate(levels):
        d = v.shape[2]
        v2 = v.reshape(B * h, d, v.shape[3], v.shape[4])
        grid = locs[:, :, :, l] * 2 - 1                   # (B,Nq,h,P,2)
        grid = grid.permute(0, 2, 1, 3, 4).reshape(B * h, Nq, P, 2)
        s = F.grid_sample(v2, grid, mode="bilinear", padding_mode="zeros",
                          align_corners=False)            # (B*h, d, Nq, P)
        w = weights[:, :, :, l].permute(0, 2, 1, 3).reshape(B * h, 1, Nq, P)
        out = out + (s * w).sum(-1)                       # (B*h, d, Nq)
    out = out.reshape(B, h, -1, Nq).permute(0, 3, 1, 2)
    return out.reshape(B, Nq, -1)


class TMSDA(nn.Module):
    def __init__(self, embed, heads, L, P):
        super().__init__()
        self.heads, self.L, self.P = heads, L, P
        self.value_proj = nn.Linear(embed, embed)
        self.sampling_offsets = nn.Linear(embed, heads * L * P * 2)
        self.attention_weights = nn.Linear(embed, heads * L * P)
        self.output_proj = nn.Linear(embed, embed)

    def forward(self, query, value, qpos, ref, shapes):
        B, Nq, C = query.shape
        h, L, P = self.heads, self.L, self.P
        identity = query
        q = query + qpos
        v = self.value_proj(value)
        off = self.sampling_offsets(q).reshape(B, Nq, h, L, P, 2)
        w = self.attention_weights(q).reshape(B, Nq, h, L * P)
        w = w.softmax(-1).reshape(B, Nq, h, L, P)
        normalizer = torch.tensor([[W_, H_] for (H_, W_) in shapes],
                                  dtype=torch.float32)
        locs = ref[:, :, None, :, None, :] + \
            off / normalizer[None, None, None, :, None, :]
        levels, start = [], 0
        for (H_, W_) in shapes:
            n = H_ * W_
            lv = v[:, start:start + n].reshape(B, H_, W_, h, C // h)
            levels.append(lv.permute(0, 3, 4, 1, 2))
            start += n
        out = torch_msda_core(levels, locs, w)
        return identity + self.output_proj(out)


class TNeck(nn.Module):
    def __init__(self):
        super().__init__()
        self.lateral_convs = nn.ModuleList(
            [TConvModule(c, c, 1) for c in NECK_CH])
        self.trans_proj = nn.ModuleList(
            [TConvModule(c, NECK_EMBED, 1) for c in NECK_CH[1:]])
        self.level_embed = nn.Parameter(torch.randn(4, NECK_EMBED))
        self.self_attn = TMSDA(NECK_EMBED, NECK_HEADS, 4, NECK_POINTS)
        self.reference_points = nn.Linear(NECK_EMBED, 2)
        self.multi_att = TMSDA(NECK_EMBED, NECK_HEADS, 4, NECK_POINTS)
        self.conv_proj = nn.Sequential(TConvModule(NECK_CH[0], NECK_EMBED, 1))
        self.conv_fusion = nn.Sequential(
            TConvModule(NECK_EMBED + NECK_CH[0], NECK_CH[0], 3))
        self.trans_fusion = nn.ModuleList(
            [TConvModule(c + NECK_EMBED, c, 3) for c in NECK_CH[1:]])

    def forward(self, feats):
        feats = [m(f) for m, f in zip(self.lateral_convs, feats)]
        conv_feat, trans = feats[0], feats[1:]
        shapes = tuple((f.shape[2], f.shape[3]) for f in trans)
        num_feats = NECK_EMBED // 2
        src, pos = [], []
        for i, f in enumerate(trans):
            p = self.trans_proj[i](f)
            B, C, H_, W_ = p.shape
            src.append(p.flatten(2).transpose(1, 2))
            sine = np.asarray(sine_positional_encoding(H_, W_, num_feats))
            sine = torch.from_numpy(sine.reshape(1, H_ * W_, -1))
            pos.append(sine + self.level_embed[i][None, None])
        src = torch.cat(src, 1)
        pos = torch.cat(pos, 1)

        ref_self = torch.from_numpy(
            _center_reference_points(shapes).astype(np.float32))[None]
        src = self.self_attn(src, src, pos, ref_self, shapes)

        B, _, Hc, Wc = conv_feat.shape
        query = self.conv_proj(conv_feat).flatten(2).transpose(1, 2)
        qpos = np.asarray(sine_positional_encoding(Hc, Wc, num_feats))
        qpos = torch.from_numpy(qpos.reshape(1, Hc * Wc, -1))
        ref_q = torch.sigmoid(self.reference_points(qpos))
        ref_q = ref_q[:, :, None, :].expand(B, -1, 4, -1)
        fused = self.multi_att(query, src, qpos, ref_q, shapes)
        fused = fused.transpose(1, 2).reshape(B, NECK_EMBED, Hc, Wc)
        out = [self.conv_fusion(torch.cat([fused, conv_feat], 1))]
        start = 0
        for i, f in enumerate(trans):
            H_, W_ = shapes[i]
            n = H_ * W_
            tok = src[:, start:start + n].transpose(1, 2).reshape(
                B, NECK_EMBED, H_, W_)
            start += n
            out.append(self.trans_fusion[i](torch.cat([f, tok], 1)))
        return out


class TScaleNeck(nn.Module):
    """pe_mask_neck / dynamic_pe_neck: 5-scale 3x3 fuse + final conv."""

    def __init__(self, out_ch):
        super().__init__()
        for i, c in enumerate(NECK_CH[::-1]):
            setattr(self, f"conv{i}", nn.Conv2d(c, 64, 3, 1, 1))
        self.convfinal = nn.Conv2d(64, out_ch, 3, 1, 1)

    def forward(self, feats):
        target = feats[0].shape[2:]
        fused = 0.0
        for i, x in enumerate(feats[::-1]):
            y = getattr(self, f"conv{i}")(x)
            if y.shape[2:] != target:
                y = F.interpolate(y, target, mode="bilinear",
                                  align_corners=True)
            fused = fused + y
        return self.convfinal(fused), fused


class TUpBlock(nn.Module):
    def __init__(self, cin, skip, cout):
        super().__init__()
        self.convA = _PlainConv(cin + skip, cout)
        self.convB = _PlainConv(cout, cout)

    def forward(self, x, s):
        x = F.interpolate(x, s.shape[2:], mode="bilinear",
                          align_corners=True)
        x = F.leaky_relu(self.convA.conv(torch.cat([x, s], 1)), 0.01)
        return F.leaky_relu(self.convB.conv(x), 0.01)


class _PlainConv(nn.Module):
    def __init__(self, cin, cout, k=3):
        super().__init__()
        self.conv = nn.Conv2d(cin, cout, k, 1, k // 2)


class THead(nn.Module):
    def __init__(self):
        super().__init__()
        up = list(NECK_CH)[::-1]                  # (128, 64, 32, 16, 64)
        mods = [_PlainConv(up[0], up[0], k=1)]
        for i in range(1, 5):
            skip = list(NECK_CH)[::-1][i]
            mods.append(TUpBlock(up[i - 1], skip, up[i]))
        self.conv_list = nn.ModuleList(mods)
        self.conv_depth = nn.Conv2d(up[-1], 1, 3, 1, 1)

    def forward(self, feats, pe_mask, y):
        fr = feats[::-1]
        x = self.conv_list[0].conv(fr[0])
        for i in range(1, 5):
            x = self.conv_list[i](x, fr[i])
        d = F.relu(self.conv_depth(x))
        if pe_mask is not None:
            pe = F.interpolate(pe_mask, d.shape[2:], mode="bilinear",
                               align_corners=True)
            y_r = F.interpolate(y, d.shape[2:], mode="bilinear",
                                align_corners=True)
            return d * (1 - y_r) + pe + MIN_D
        return d + MIN_D


class TorchGEDepth(nn.Module):
    def __init__(self, variant):
        super().__init__()
        self.variant = variant
        self.backbone = TBackbone()
        self.neck = TNeck()
        self.pe_mask_neck = TScaleNeck(1)
        if variant == "adaptive":
            self.dynamic_pe_neck = TScaleNeck(11)
        self.decode_head = THead()

    def forward(self, img5):
        B, _, H, W = img5.shape
        feats = self.backbone(img5)
        feats = self.neck(feats)
        y_small, _ = self.pe_mask_neck(feats)
        y = torch.sigmoid(y_small)
        y = F.interpolate(y, (H, W), mode="bilinear", align_corners=False)
        if self.variant == "adaptive":
            logits, _ = self.dynamic_pe_neck(feats)
            logits = F.interpolate(logits, (H, W), mode="bilinear",
                                   align_corners=False)
            probs = logits.softmax(1)
            bins = torch.linspace(-5.0, 5.0, 11)
            slope = (probs * bins[None, :, None, None]).sum(1, keepdim=True)
            t = torch.tan(torch.deg2rad(slope))
            pe_comput = img5[:, 4:5]
            a = -CAM_H / (pe_comput + 1e-8)
            off = -CAM_H / ((a - t) + 1e-8)
            valid = ((off > 0) & (off <= DEPTH_SCALE)).float()
            pe_mask = off * valid * y
        else:
            pe_mask = img5[:, 3:4] * y * 200.0
        d = self.decode_head(feats, pe_mask, y)
        d = d.clamp(MIN_D, MAX_D)
        return F.interpolate(d, (H, W), mode="bilinear", align_corners=True)


def _build_jax_model(variant, **kw):
    return GEDepth(
        embed_dims=EMBED, depths=DEPTHS, num_heads=HEADS, window=WINDOW,
        drop_path_rate=0.0, neck_channels=NECK_CH, neck_embed_dim=NECK_EMBED,
        neck_num_points=NECK_POINTS, head_channels=16,
        min_depth=MIN_D, max_depth=MAX_D, pe_variant=variant,
        depth_scale=DEPTH_SCALE, default_cam_height=CAM_H, **kw)


def _rand_batch(rng, flip=False):
    img = rng.standard_normal((2, H_IMG, W_IMG, 5)).astype(np.float32)
    img[..., 3] = np.abs(img[..., 3]) * 0.3
    img[..., 4] = np.abs(img[..., 4]) * 30 + 1.0
    return img


@pytest.mark.parametrize("variant", ["adaptive", "vanilla"])
def test_full_model_composite_parity(variant):
    torch.manual_seed(0)
    tm = TorchGEDepth(variant).eval()
    # randomize BN running stats so stats conversion is load-bearing
    for m in tm.modules():
        if isinstance(m, nn.BatchNorm2d):
            m.running_mean.normal_(0, 0.5)
            m.running_var.uniform_(0.5, 2.0)

    sd = {k: v.numpy() for k, v in tm.state_dict().items()}
    params, stats, unmapped = convert_state_dict(sd)
    assert not unmapped, f"converter missed keys: {unmapped[:8]}"

    jm = _build_jax_model(variant)
    rng = np.random.default_rng(0)
    img = _rand_batch(rng)
    ch = jnp.full((2,), CAM_H, jnp.float32)
    variables = jm.init(jax.random.PRNGKey(0), jnp.asarray(img), ch)
    merged_p, miss_p = _merge_into(variables["params"], params)
    merged_s, miss_s = _merge_into(variables["batch_stats"], stats)
    assert not miss_p, f"params not covered by converter: {miss_p[:8]}"
    assert not miss_s, f"stats not covered: {miss_s[:8]}"

    with torch.no_grad():
        want = tm(torch.from_numpy(img.transpose(0, 3, 1, 2))).numpy()
    got = jm.apply({"params": merged_p, "batch_stats": merged_s},
                   jnp.asarray(img), ch, method=jm.predict_depth)
    got = np.asarray(got).transpose(0, 3, 1, 2)
    np.testing.assert_allclose(got, want, rtol=1e-3, atol=2e-3)

    # flip TTA agreement (reference encoder_decoder.py:249-274)
    with torch.no_grad():
        want_f = tm(torch.from_numpy(
            img[:, :, ::-1].copy().transpose(0, 3, 1, 2))).numpy()
    want_tta = 0.5 * (want + want_f[:, :, :, ::-1])
    got_f = jm.apply({"params": merged_p, "batch_stats": merged_s},
                     jnp.asarray(img[:, :, ::-1].copy()), ch,
                     method=jm.predict_depth)
    got_tta = 0.5 * (got + np.asarray(got_f).transpose(0, 3, 1, 2)
                     [:, :, :, ::-1])
    np.testing.assert_allclose(got_tta, want_tta, rtol=1e-3, atol=2e-3)


def _converted_variables(tm, jm, img, ch):
    sd = {k: v.numpy() for k, v in tm.state_dict().items()}
    params, stats, unmapped = convert_state_dict(sd)
    assert not unmapped, f"converter missed keys: {unmapped[:8]}"
    variables = jm.init(jax.random.PRNGKey(0), jnp.asarray(img), ch)
    merged_p, miss_p = _merge_into(variables["params"], params)
    merged_s, miss_s = _merge_into(variables["batch_stats"], stats)
    assert not miss_p, f"params not covered: {miss_p[:8]}"
    assert not miss_s, f"stats not covered: {miss_s[:8]}"
    return {"params": merged_p, "batch_stats": merged_s}


def test_windowed_compat_checkpoint_parity():
    """VERDICT round-2 item 1: the 'windowed_compat' sampling mode must
    (a) have the SAME parameter tree as the exact config — a converted
        reference state dict loads into it with zero missing keys;
    (b) with a window radius covering the whole level, reproduce the exact
        gather path (and the torch reference) — the windowed machinery is
        then exact bilinear, proving the compat formula p = ref + off
        re-based onto grid centers is correct;
    (c) at a production radius, report the quantified approximation:
        attention mass clamped to the window edge + end-to-end depth delta.
    """
    torch.manual_seed(0)
    tm = TorchGEDepth("adaptive").eval()
    for m in tm.modules():
        if isinstance(m, nn.BatchNorm2d):
            m.running_mean.normal_(0, 0.5)
            m.running_var.uniform_(0.5, 2.0)

    rng = np.random.default_rng(1)
    img = _rand_batch(rng)
    ch = jnp.full((2,), CAM_H, jnp.float32)

    exact = _build_jax_model("adaptive")
    v_exact = _converted_variables(tm, exact, img, ch)

    # (a) identical parameter tree: same paths, same shapes
    wide = _build_jax_model("adaptive", neck_sampling="windowed_compat",
                            neck_window_radius=64)
    v_wide = wide.init(jax.random.PRNGKey(0), jnp.asarray(img), ch)
    flat_e = jax.tree_util.tree_flatten_with_path(v_exact["params"])[0]
    flat_c = jax.tree_util.tree_flatten_with_path(v_wide["params"])[0]
    assert [(p, x.shape) for p, x in flat_e] == \
        [(p, x.shape) for p, x in flat_c]
    v_wide = {"params": v_exact["params"],
              "batch_stats": v_exact["batch_stats"]}

    # (b) radius covering every level => exact equivalence
    with torch.no_grad():
        want = tm(torch.from_numpy(img.transpose(0, 3, 1, 2))).numpy()
    got_exact = np.asarray(exact.apply(
        v_exact, jnp.asarray(img), ch,
        method=exact.predict_depth)).transpose(0, 3, 1, 2)
    got_wide = np.asarray(wide.apply(
        v_wide, jnp.asarray(img), ch,
        method=wide.predict_depth)).transpose(0, 3, 1, 2)
    np.testing.assert_allclose(got_wide, want, rtol=1e-3, atol=2e-3)
    np.testing.assert_allclose(got_wide, got_exact, rtol=1e-3, atol=2e-3)

    # (c) production radius: quantify the clamp
    prod = _build_jax_model("adaptive", neck_sampling="windowed_compat",
                            neck_window_radius=8)
    got_prod, inter = prod.apply(
        v_wide, jnp.asarray(img), ch, method=prod.predict_depth,
        mutable=["intermediates"])
    got_prod = np.asarray(got_prod).transpose(0, 3, 1, 2)
    masses = {
        jax.tree_util.keystr(p): float(np.asarray(x))
        for p, x in jax.tree_util.tree_flatten_with_path(
            inter["intermediates"])[0] if "compat_clamp_mass" in str(p)}
    assert masses, "clamp-mass telemetry missing"
    rel = np.abs(got_prod - got_exact) / np.maximum(got_exact, MIN_D)
    print(f"windowed_compat R=8 (synthetic-weight proxy): "
          f"clamp mass per attn = { {k: round(v, 4) for k, v in masses.items()} }, "
          f"depth delta mean={rel.mean():.4f} p99="
          f"{np.percentile(rel, 99):.4f}")
    # synthetic weights scatter reference points widely; a trained model
    # concentrates them (quantify again on a real converted checkpoint).
    # Bounds here are sanity rails, not accuracy claims.
    assert all(0.0 <= v <= 1.0 for v in masses.values())
    assert np.isfinite(got_prod).all()
