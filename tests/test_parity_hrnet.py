"""Full HRNet backbone torch cross-check (VERDICT round-2 weak #5).

A textbook torch implementation of the reference mmcv HRNet
(depth/models/backbones/hrnet.py:391-931 — stem, bottleneck stage 1,
transitions, multi-branch stages with full nearest-upsample fusion) is
built with mmcv's state-dict naming (conv1/bn1, layer1.N, transitionT.I,
stageS.M.branches/fuse_layers), run through `convert_state_dict`, and the
flax HRNet must reproduce all pyramid outputs end-to-end."""
import numpy as np
import pytest

torch = pytest.importorskip("torch")
import torch.nn as tnn

import jax
import jax.numpy as jnp

from gedepth_tpu.models.hrnet import HRNet, HRNET_CFGS
from gedepth_tpu.convert import convert_state_dict
from gedepth_tpu.convert.torch_to_jax import _merge_into

# small structural clone of the w18 layout: multi-module stages, every
# transition kind, 1..3-step fuse down-chains
TEST_CFG = ((1, (2,), (16,)),
            (1, (2, 2), (8, 16)),
            (2, (2, 2, 2), (8, 16, 32)),
            (2, (2, 2, 2, 2), (8, 16, 32, 64)))


def _cbr(cin, cout, k=3, stride=1, relu=True):
    mods = [tnn.Conv2d(cin, cout, k, stride=stride, padding=k // 2,
                       bias=False), tnn.BatchNorm2d(cout)]
    if relu:
        mods.append(tnn.ReLU(inplace=True))
    return tnn.Sequential(*mods)


class TBasic(tnn.Module):
    def __init__(self, cin, ch):
        super().__init__()
        self.conv1 = tnn.Conv2d(cin, ch, 3, padding=1, bias=False)
        self.bn1 = tnn.BatchNorm2d(ch)
        self.conv2 = tnn.Conv2d(ch, ch, 3, padding=1, bias=False)
        self.bn2 = tnn.BatchNorm2d(ch)
        self.downsample = (tnn.Sequential(
            tnn.Conv2d(cin, ch, 1, bias=False), tnn.BatchNorm2d(ch))
            if cin != ch else None)

    def forward(self, x):
        idn = x if self.downsample is None else self.downsample(x)
        out = torch.relu(self.bn1(self.conv1(x)))
        out = self.bn2(self.conv2(out))
        return torch.relu(out + idn)


class TBottle(tnn.Module):
    def __init__(self, cin, planes):
        super().__init__()
        cout = planes * 4
        self.conv1 = tnn.Conv2d(cin, planes, 1, bias=False)
        self.bn1 = tnn.BatchNorm2d(planes)
        self.conv2 = tnn.Conv2d(planes, planes, 3, padding=1, bias=False)
        self.bn2 = tnn.BatchNorm2d(planes)
        self.conv3 = tnn.Conv2d(planes, cout, 1, bias=False)
        self.bn3 = tnn.BatchNorm2d(cout)
        self.downsample = (tnn.Sequential(
            tnn.Conv2d(cin, cout, 1, bias=False), tnn.BatchNorm2d(cout))
            if cin != cout else None)

    def forward(self, x):
        idn = x if self.downsample is None else self.downsample(x)
        out = torch.relu(self.bn1(self.conv1(x)))
        out = torch.relu(self.bn2(self.conv2(out)))
        out = self.bn3(self.conv3(out))
        return torch.relu(out + idn)


class THRModule(tnn.Module):
    """Reference HRModule (hrnet.py:391-568): branches then full fusion,
    nearest upsample, relu after each fused sum."""

    def __init__(self, channels):
        super().__init__()
        n = len(channels)
        self.branches = tnn.ModuleList(
            tnn.Sequential(*[TBasic(channels[i], channels[i])
                             for _ in range(2)]) for i in range(n))
        fuse = []
        for i in range(n):
            row = []
            for j in range(n):
                if j > i:
                    row.append(tnn.Sequential(
                        tnn.Conv2d(channels[j], channels[i], 1, bias=False),
                        tnn.BatchNorm2d(channels[i]),
                        tnn.Upsample(scale_factor=2 ** (j - i),
                                     mode="nearest")))
                elif j == i:
                    row.append(tnn.Identity())
                else:
                    chain = []
                    for k in range(i - j):
                        last = k == i - j - 1
                        cout = channels[i] if last else channels[j]
                        chain.append(_cbr(channels[j] if k == 0
                                          else channels[j], cout,
                                          stride=2, relu=not last))
                    row.append(tnn.Sequential(*chain))
            fuse.append(tnn.ModuleList(row))
        self.fuse_layers = tnn.ModuleList(fuse)

    def forward(self, xs):
        xs = [b(x) for b, x in zip(self.branches, xs)]
        outs = []
        for i, row in enumerate(self.fuse_layers):
            y = 0
            for j, x in enumerate(xs):
                y = y + (x if i == j else row[j](x))
            outs.append(torch.relu(y))
        return outs


class THRNet(tnn.Module):
    def __init__(self, cfg):
        super().__init__()
        self.cfg = cfg
        self.conv1 = tnn.Conv2d(3, 64, 3, stride=2, padding=1, bias=False)
        self.bn1 = tnn.BatchNorm2d(64)
        self.conv2 = tnn.Conv2d(64, 64, 3, stride=2, padding=1, bias=False)
        self.bn2 = tnn.BatchNorm2d(64)
        planes1 = cfg[0][2][0]
        cin = 64
        blocks = []
        for b in range(cfg[0][1][0]):
            blocks.append(TBottle(cin, planes1))
            cin = planes1 * 4
        self.layer1 = tnn.Sequential(*blocks)
        prev = (cin,)
        for sidx, (num_modules, _nb, channels) in enumerate(cfg[1:],
                                                            start=2):
            trans = []
            for i, ch in enumerate(channels):
                if i < len(prev):
                    trans.append(_cbr(prev[i], ch) if prev[i] != ch
                                 else tnn.Identity())
                else:
                    trans.append(tnn.Sequential(
                        _cbr(prev[-1], ch, stride=2)))
            setattr(self, f"transition{sidx - 1}", tnn.ModuleList(trans))
            setattr(self, f"stage{sidx}", tnn.Sequential(
                *[THRModule(channels) for _ in range(num_modules)]))
            prev = channels

    def forward(self, x):
        x = torch.relu(self.bn1(self.conv1(x)))
        x = torch.relu(self.bn2(self.conv2(x)))
        x = self.layer1(x)
        x_list = [x]
        for s in range(2, 5):
            trans = getattr(self, f"transition{s - 1}")
            inputs = [layer(x_list[j] if j < len(x_list) else x_list[-1])
                      for j, layer in enumerate(trans)]
            x_list = list(getattr(self, f"stage{s}")(inputs))
        return x_list


def test_hrnet_full_parity():
    torch.manual_seed(0)
    tmodel = THRNet(TEST_CFG).eval()
    for m in tmodel.modules():
        if isinstance(m, tnn.BatchNorm2d):
            m.running_mean.uniform_(-0.3, 0.3)
            m.running_var.uniform_(0.7, 1.4)

    rng = np.random.default_rng(0)
    x_np = rng.standard_normal((1, 64, 96, 3)).astype(np.float32)
    with torch.no_grad():
        touts = tmodel(torch.from_numpy(x_np.transpose(0, 3, 1, 2)))
    touts = [t.numpy().transpose(0, 2, 3, 1) for t in touts]

    sd = {f"backbone.{k}": v.numpy()
          for k, v in tmodel.state_dict().items()}
    params, stats, unmapped = convert_state_dict(sd)
    assert not unmapped, unmapped[:8]

    HRNET_CFGS["testcfg"] = TEST_CFG
    try:
        jmodel = HRNet(arch="testcfg")
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
        del HRNET_CFGS["testcfg"]

    assert len(jouts) == len(touts) == 4
    for jo, to in zip(jouts, touts):
        np.testing.assert_allclose(np.asarray(jo), to, rtol=2e-4, atol=2e-4)
