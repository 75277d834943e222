"""TimmEfficientNet torch cross-check (VERDICT round-2 weak #5).

A textbook torch implementation of the timm gen-efficientnet block zoo
(Conv2dSame TF padding, DepthwiseSeparable stage 0, InvertedResidual
stages, SqueezeExcite reduced from block-input channels) with timm's
state-dict naming — the structure the reference wraps as
`backbone.original_model` (depth/models/backbones/efficientnet.py:20-43)
— is converted and the flax TimmEfficientNet must reproduce all five
endpoint feature maps."""
import math

import numpy as np
import pytest

torch = pytest.importorskip("torch")
import torch.nn as tnn
import torch.nn.functional as F

import jax
import jax.numpy as jnp

from gedepth_tpu.models.efficientnet import (
    TimmEfficientNet, _TIMM_SCALES, _B0_STAGES, _round_ch)
from gedepth_tpu.convert import convert_state_dict
from gedepth_tpu.convert.torch_to_jax import _merge_into

TEST_SCALE = (0.5, 0.5)  # width, depth — same structure, small dims


class TConvSame(tnn.Conv2d):
    """timm Conv2dSame: TF 'SAME' asymmetric padding."""

    def __init__(self, cin, cout, k, stride=1, groups=1, bias=False):
        super().__init__(cin, cout, k, stride=stride, padding=0,
                         groups=groups, bias=bias)

    def forward(self, x):
        ih, iw = x.shape[-2:]
        k, s = self.kernel_size[0], self.stride[0]
        ph = max(0, (math.ceil(ih / s) - 1) * s + k - ih)
        pw = max(0, (math.ceil(iw / s) - 1) * s + k - iw)
        x = F.pad(x, (pw // 2, pw - pw // 2, ph // 2, ph - ph // 2))
        return self._conv_forward(x, self.weight, self.bias)


class TSE(tnn.Module):
    def __init__(self, mid, reduced):
        super().__init__()
        self.conv_reduce = tnn.Conv2d(mid, reduced, 1, bias=True)
        self.conv_expand = tnn.Conv2d(reduced, mid, 1, bias=True)

    def forward(self, x):
        s = x.mean((2, 3), keepdim=True)
        s = self.conv_expand(F.silu(self.conv_reduce(s)))
        return x * torch.sigmoid(s)


class TDS(tnn.Module):
    def __init__(self, cin, cout, k, stride):
        super().__init__()
        self.conv_dw = TConvSame(cin, cin, k, stride, groups=cin)
        self.bn1 = tnn.BatchNorm2d(cin, eps=1e-3)
        self.se = TSE(cin, max(1, int(cin * 0.25)))
        self.conv_pw = TConvSame(cin, cout, 1)
        self.bn2 = tnn.BatchNorm2d(cout, eps=1e-3)
        self.res = stride == 1 and cin == cout

    def forward(self, x):
        h = F.silu(self.bn1(self.conv_dw(x)))
        h = self.se(h)
        h = self.bn2(self.conv_pw(h))
        return h + x if self.res else h


class TIR(tnn.Module):
    def __init__(self, cin, cout, expand, k, stride):
        super().__init__()
        mid = cin * expand
        self.conv_pw = TConvSame(cin, mid, 1)
        self.bn1 = tnn.BatchNorm2d(mid, eps=1e-3)
        self.conv_dw = TConvSame(mid, mid, k, stride, groups=mid)
        self.bn2 = tnn.BatchNorm2d(mid, eps=1e-3)
        self.se = TSE(mid, max(1, int(cin * 0.25)))
        self.conv_pwl = TConvSame(mid, cout, 1)
        self.bn3 = tnn.BatchNorm2d(cout, eps=1e-3)
        self.res = stride == 1 and cin == cout

    def forward(self, x):
        h = F.silu(self.bn1(self.conv_pw(x)))
        h = F.silu(self.bn2(self.conv_dw(h)))
        h = self.se(h)
        h = self.bn3(self.conv_pwl(h))
        return h + x if self.res else h


class TTimmEffNet(tnn.Module):
    def __init__(self, wm, dm):
        super().__init__()
        stem = _round_ch(32, wm)
        self.conv_stem = TConvSame(3, stem, 3, 2)
        self.bn1 = tnn.BatchNorm2d(stem, eps=1e-3)
        blocks = []
        cin = stem
        for si, (expand, ch, reps, s0, k) in enumerate(_B0_STAGES):
            ch = _round_ch(ch, wm)
            reps = int(math.ceil(reps * dm))
            stage = []
            for r in range(reps):
                s = s0 if r == 0 else 1
                stage.append(TDS(cin, ch, k, s) if si == 0
                             else TIR(cin, ch, expand, k, s))
                cin = ch
            blocks.append(tnn.ModuleList(stage))
        self.blocks = tnn.ModuleList(blocks)
        self.conv_head = TConvSame(cin, _round_ch(1280, wm), 1)

    def forward(self, x):
        x = F.silu(self.bn1(self.conv_stem(x)))
        outs = []
        for si, stage in enumerate(self.blocks):
            for b in stage:
                x = b(x)
            if si in (0, 1, 2, 4):
                outs.append(x)
        outs.append(self.conv_head(x))
        return outs


def test_timm_efficientnet_full_parity():
    torch.manual_seed(0)
    wm, dm = TEST_SCALE
    tmodel = TTimmEffNet(wm, dm).eval()
    for m in tmodel.modules():
        if isinstance(m, tnn.BatchNorm2d):
            m.running_mean.uniform_(-0.3, 0.3)
            m.running_var.uniform_(0.7, 1.4)

    rng = np.random.default_rng(0)
    # odd-ish size so the asymmetric SAME padding actually differs from
    # symmetric torch padding
    x_np = rng.standard_normal((1, 66, 98, 3)).astype(np.float32)
    with torch.no_grad():
        touts = tmodel(torch.from_numpy(x_np.transpose(0, 3, 1, 2)))
    touts = [t.numpy().transpose(0, 2, 3, 1) for t in touts]

    sd = {f"backbone.original_model.{k}": v.numpy()
          for k, v in tmodel.state_dict().items()}
    params, stats, unmapped = convert_state_dict(sd)
    assert not unmapped, unmapped[:8]

    _TIMM_SCALES["test"] = TEST_SCALE
    try:
        jmodel = TimmEfficientNet(arch="test")
        variables = jmodel.init(jax.random.PRNGKey(0), jnp.asarray(x_np))
        merged_p, missing_p = _merge_into(variables["params"],
                                          params["backbone"])
        merged_s, missing_s = _merge_into(variables["batch_stats"],
                                          stats["backbone"])
        assert not missing_p, missing_p[:8]
        assert not missing_s, missing_s[:8]
        jouts = jmodel.apply({"params": merged_p, "batch_stats": merged_s},
                             jnp.asarray(x_np))
    finally:
        del _TIMM_SCALES["test"]

    assert len(jouts) == len(touts) == 5
    for jo, to in zip(jouts, touts):
        np.testing.assert_allclose(np.asarray(jo), to, rtol=2e-4,
                                   atol=2e-4)
