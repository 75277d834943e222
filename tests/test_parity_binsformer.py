"""Full BinsFormer decode-head torch cross-check (VERDICT round-2 item 6).

A textbook torch implementation of the reference BinsFormerDecodeHead
(depth/models/decode_heads/binsformer_head.py:33) with its
PureMSDEnTransformer encoder and PixelTransformerDecoder
(depth/models/utils/transformer.py:1129,1543) is built here with the
reference's state-dict key names, run through `convert_state_dict`, and the
flax head must reproduce every decoder layer's (depth, bin_edges,
class_logits) end-to-end — the same acceptance pattern as the BTS/AdaBins/
DPT cross-checks.
"""
import os.path as osp
import sys

import numpy as np
import pytest

torch = pytest.importorskip("torch")
import torch.nn as nn
import torch.nn.functional as F

import jax
import jax.numpy as jnp

sys.path.insert(0, osp.dirname(osp.abspath(__file__)))
from test_composite_parity import TMSDA  # torch MSDA (reference key names)

from gedepth_tpu.models.binsformer import BinsFormerHead
from gedepth_tpu.models.layers import sine_positional_encoding
from gedepth_tpu.convert import convert_state_dict
from gedepth_tpu.convert.torch_to_jax import _merge_into

CH = (16, 24, 32, 48)          # 4-scale pyramid, toolbox-config style
CD = 32                        # conv_dim
NBINS = 8
TRANS = (1, 2, 3)
ENC_L, DEC_L = 2, 4
HEADS = 8
PTS = 4
CLASSES = 5
MIN_D, MAX_D = 1e-3, 10.0


class TConvBNAct(nn.Module):
    """mmcv ConvModule(conv no-bias + BN + act)."""

    def __init__(self, cin, cout, k, act):
        super().__init__()
        self.conv = nn.Conv2d(cin, cout, k, 1, k // 2, bias=False)
        self.bn = nn.BatchNorm2d(cout, eps=1e-5)
        self.act = act

    def forward(self, x):
        return self.act(self.bn(self.conv(x)))


class TFFNRelu(nn.Module):
    """mmcv FFN key layout: layers.0.0 / layers.1."""

    def __init__(self, dim, hidden):
        super().__init__()
        self.layers = nn.ModuleList([
            nn.Sequential(nn.Linear(dim, hidden), nn.ReLU()),
            nn.Linear(hidden, dim)])

    def forward(self, x):
        return self.layers[1](self.layers[0](x))


class TEncLayer(nn.Module):
    """mmcv BaseTransformerLayer ('self_attn','norm','ffn','norm')."""

    def __init__(self):
        super().__init__()
        self.attentions = nn.ModuleList(
            [TMSDA(CD, HEADS, len(TRANS), PTS)])
        self.ffns = nn.ModuleList([TFFNRelu(CD, 1024)])
        self.norms = nn.ModuleList([nn.LayerNorm(CD), nn.LayerNorm(CD)])

    def forward(self, x, pe, ref, shapes):
        x = self.norms[0](self.attentions[0](x, x, pe, ref, shapes))
        return self.norms[1](x + self.ffns[0](x))


class TMHAWrap(nn.Module):
    """mmcv MultiheadAttention: pos added to q/k, raw value, +identity."""

    def __init__(self):
        super().__init__()
        self.attn = nn.MultiheadAttention(CD, HEADS, batch_first=True)

    def forward(self, q, k, v, qpos, kpos):
        out, _ = self.attn(q + qpos, k + kpos, v, need_weights=False)
        return q + out


class TDecLayer(nn.Module):
    """PixelTransformerDecoderLayer
    ('cross_attn','norm','self_attn','norm','ffn','norm')."""

    def __init__(self):
        super().__init__()
        self.attentions = nn.ModuleList([TMHAWrap(), TMHAWrap()])
        self.ffns = nn.ModuleList([TFFNRelu(CD, 2048)])
        self.norms = nn.ModuleList([nn.LayerNorm(CD) for _ in range(3)])

    def forward(self, q, qpos, mem, mem_pos):
        q = self.norms[0](self.attentions[0](q, mem, mem, qpos, mem_pos))
        q = self.norms[1](self.attentions[1](q, q, q, qpos, qpos))
        return self.norms[2](q + self.ffns[0](q))


class TMLP3(nn.Module):
    def __init__(self, dim, out):
        super().__init__()
        self.layers = nn.ModuleList(
            [nn.Linear(dim, dim), nn.Linear(dim, dim), nn.Linear(dim, out)])

    def forward(self, x):
        x = F.relu(self.layers[0](x))
        x = F.relu(self.layers[1](x))
        return self.layers[2](x)


class TEncoderWrap(nn.Module):
    """PureMSDEnTransformer state-dict shape (level_embeds + encoder.layers;
    the learned reference_points Linear is unused in the encoder-only
    forward, transformer.py:1146)."""

    def __init__(self):
        super().__init__()
        self.level_embeds = nn.Parameter(torch.randn(len(TRANS), CD))
        self.reference_points = nn.Linear(CD, 2)
        self.encoder = nn.Module()
        self.encoder.layers = nn.ModuleList(
            [TEncLayer() for _ in range(ENC_L)])


class TDecoderWrap(nn.Module):
    """PixelTransformerDecoder state-dict shape (shared heads)."""

    def __init__(self):
        super().__init__()
        self.layers = nn.ModuleList([TDecLayer() for _ in range(DEC_L)])
        self.decoder_norm = nn.LayerNorm(CD)
        self.bins_embed = nn.Linear(CD, 1)
        self.mask_embed = TMLP3(CD, CD)
        self.class_embed = TMLP3(CD, CLASSES)


def _sine_pe(h, w):
    pe = sine_positional_encoding(h, w, CD // 2).reshape(h * w, CD)
    return torch.from_numpy(np.asarray(pe, np.float32))[None]


def _center_refs(shapes):
    pts = []
    for (H_, W_) in shapes:
        ys = (np.arange(H_) + 0.5) / H_
        xs = (np.arange(W_) + 0.5) / W_
        gy, gx = np.meshgrid(ys, xs, indexing="ij")
        pts.append(np.stack([gx.reshape(-1), gy.reshape(-1)], -1))
    ref = np.concatenate(pts, 0).astype(np.float32)
    ref = np.tile(ref[:, None, :], (1, len(shapes), 1))
    return torch.from_numpy(ref)[None]


class TBinsFormer(nn.Module):
    """Reference BinsFormerDecodeHead forward
    (binsformer_head.py:185-345), classify=True, binsformer=True."""

    def __init__(self):
        super().__init__()
        leaky = nn.LeakyReLU(0.01)
        self.skip_proj = nn.ModuleList(
            [TConvBNAct(CH[i], CD, 1, leaky) for i in TRANS])
        self.transformer_encoder = TEncoderWrap()
        # lateral/output_convs registered in top-down (coarse->fine) order
        # (binsformer_head.py:133-135 reverses before registration)
        fpn_in = list(CH[:len(TRANS)])[::-1]
        self.lateral_convs = nn.ModuleList(
            [TConvBNAct(c, CD, 1, nn.ReLU()) for c in fpn_in])
        self.output_convs = nn.ModuleList(
            [TConvBNAct(CD, CD, 3, leaky) for _ in fpn_in])
        self.level_embed = nn.Embedding(len(TRANS), CD)
        self.query_feat = nn.Embedding(NBINS + 1, CD)
        self.query_embed = nn.Embedding(NBINS + 1, CD)
        self.transformer_decoder = TDecoderWrap()

    def forward(self, inputs):
        # DMS encoder over trans_index levels
        feats = [proj(inputs[i]) for proj, i in zip(self.skip_proj, TRANS)]
        shapes = [(f.shape[2], f.shape[3]) for f in feats]
        toks, pes = [], []
        for i, f in enumerate(feats):
            B, _, H_, W_ = f.shape
            toks.append(f.flatten(2).transpose(1, 2))
            pes.append(_sine_pe(H_, W_)
                       + self.transformer_encoder.level_embeds[i][None,
                                                                  None])
        src = torch.cat(toks, 1)
        pe = torch.cat(pes, 1)
        ref = _center_refs(shapes)
        for layer in self.transformer_encoder.encoder.layers:
            src = layer(src, pe, ref, shapes)

        out = []
        start = 0
        for (H_, W_) in shapes:
            n = H_ * W_
            out.append(src[:, start:start + n].transpose(1, 2).reshape(
                -1, CD, H_, W_))
            start += n
        out = out[::-1]

        # FPN (top-down over index[:L] reversed), seeded by out[-1]
        for idx, f in enumerate(list(range(len(TRANS)))[::-1]):
            lat = self.lateral_convs[idx](inputs[f])
            y = lat + F.interpolate(out[-1], size=lat.shape[-2:],
                                    mode="bilinear", align_corners=True)
            out.append(self.output_convs[idx](y))
        per_pixel = out[-1]
        ms_feats = out[:len(TRANS)]

        srcs, poss = [], []
        for i, f in enumerate(ms_feats):
            H_, W_ = f.shape[2], f.shape[3]
            srcs.append(f.flatten(2).transpose(1, 2))
            poss.append(_sine_pe(H_, W_)
                        + self.level_embed.weight[i][None, None])

        B = per_pixel.shape[0]
        q = self.query_feat.weight[None].repeat(B, 1, 1)
        qpos = self.query_embed.weight[None].repeat(B, 1, 1)

        dec = self.transformer_decoder
        outs = []
        for idx, layer in enumerate(dec.layers):
            li = idx % len(TRANS)
            q = layer(q, qpos, srcs[li], poss[li])
            # forward_prediction_heads (transformer.py:1606-1630)
            o = dec.decoder_norm(q)
            cls_q, bin_q = o[:, 0], o[:, 1:]
            cls_logits = dec.class_embed(cls_q)
            bins = dec.bins_embed(bin_q).squeeze(2).softmax(1)
            widths = (MAX_D - MIN_D) * bins
            widths = F.pad(widths, (1, 0), value=MIN_D)
            edges = torch.cumsum(widths, 1)
            centers = 0.5 * (edges[:, :-1] + edges[:, 1:])
            emb = dec.mask_embed(bin_q)
            logits = torch.einsum("bqc,bchw->bqhw", emb, per_pixel)
            probs = logits.softmax(1)
            depth = (probs * centers[:, :, None, None]).sum(1, keepdim=True)
            outs.append((depth, edges, cls_logits))
        return outs


def test_binsformer_head_torch_parity():
    torch.manual_seed(0)
    tm = TBinsFormer().eval()
    for m in tm.modules():
        if isinstance(m, nn.BatchNorm2d):
            m.running_mean.normal_(0, 0.5)
            m.running_var.uniform_(0.5, 2.0)

    rng = np.random.default_rng(0)
    H, W = 32, 64
    feats_np = [rng.standard_normal((2, H // s, W // s, c))
                .astype(np.float32)
                for s, c in zip((1, 2, 4, 8), CH)]
    tfeats = [torch.from_numpy(f.transpose(0, 3, 1, 2)) for f in feats_np]
    with torch.no_grad():
        want = tm(tfeats)

    jm = BinsFormerHead(
        in_channels=CH, conv_dim=CD, n_bins=NBINS, trans_index=TRANS,
        num_encoder_layers=ENC_L, num_decoder_layers=DEC_L,
        num_heads=HEADS, enc_num_points=PTS, classify=True,
        class_num=CLASSES, min_depth=MIN_D, max_depth=MAX_D)
    jfeats = [jnp.asarray(f) for f in feats_np]
    variables = jm.init(jax.random.PRNGKey(0), jfeats)

    sd = {("decode_head." + k): v.numpy()
          for k, v in tm.state_dict().items()}
    params, stats, unmapped = convert_state_dict(sd)
    assert not unmapped, f"converter missed keys: {unmapped[:8]}"
    merged_p, miss_p = _merge_into(variables["params"],
                                   params["decode_head"], ())
    assert not miss_p, f"params not covered: {miss_p[:8]}"
    merged_s, miss_s = _merge_into(variables["batch_stats"],
                                   stats["decode_head"], ())
    assert not miss_s, f"stats not covered: {miss_s[:8]}"

    outs = jm.apply({"params": merged_p, "batch_stats": merged_s}, jfeats)
    assert len(outs) == DEC_L
    for (td, te, tc), jo in zip(want, outs):
        np.testing.assert_allclose(
            np.asarray(jo["depth"])[..., 0], td.numpy()[:, 0],
            rtol=1e-3, atol=2e-3)
        np.testing.assert_allclose(np.asarray(jo["bin_edges"]), te.numpy(),
                                   rtol=1e-3, atol=1e-4)
        np.testing.assert_allclose(np.asarray(jo["class_logits"]),
                                   tc.numpy(), rtol=1e-3, atol=2e-3)
