"""Full DDRNet (DualResNet) torch cross-check (VERDICT round-2 weak #5).

A textbook torch implementation of the reference DDRNet
(depth/models/backbones/ddrnet.py:190-352 — biased double stem, no_relu
trunk blocks, bilateral fusion points, expansion-2 Bottleneck caps, DAPPM
with cumulative process chains) is built with the reference's state-dict
naming (conv1.N, layerX.N.convM/bnM, compression3_1.N, spp.scaleN.M, ...),
run through `convert_state_dict`, and the flax DualResNet must reproduce
the /8 output end-to-end."""
import numpy as np
import pytest

torch = pytest.importorskip("torch")
import torch.nn as tnn
import torch.nn.functional as F

import jax
import jax.numpy as jnp

from gedepth_tpu.models.ddrnet import DualResNet
from gedepth_tpu.convert import convert_state_dict
from gedepth_tpu.convert.torch_to_jax import _merge_into

PLANES, SPP, OUTP = 8, 16, 32
LAYERS = (2, 2, 2, 2)


class TBasic(tnn.Module):
    expansion = 1

    def __init__(self, cin, planes, stride=1, downsample=None,
                 no_relu=False):
        super().__init__()
        self.conv1 = tnn.Conv2d(cin, planes, 3, stride=stride, padding=1,
                                bias=False)
        self.bn1 = tnn.BatchNorm2d(planes)
        self.conv2 = tnn.Conv2d(planes, planes, 3, padding=1, bias=False)
        self.bn2 = tnn.BatchNorm2d(planes)
        self.downsample = downsample
        self.no_relu = no_relu

    def forward(self, x):
        r = x if self.downsample is None else self.downsample(x)
        out = torch.relu(self.bn1(self.conv1(x)))
        out = self.bn2(self.conv2(out)) + r
        return out if self.no_relu else torch.relu(out)


class TBottle(tnn.Module):
    expansion = 2

    def __init__(self, cin, planes, stride=1, downsample=None,
                 no_relu=True):
        super().__init__()
        self.conv1 = tnn.Conv2d(cin, planes, 1, bias=False)
        self.bn1 = tnn.BatchNorm2d(planes)
        self.conv2 = tnn.Conv2d(planes, planes, 3, stride=stride,
                                padding=1, bias=False)
        self.bn2 = tnn.BatchNorm2d(planes)
        self.conv3 = tnn.Conv2d(planes, planes * 2, 1, bias=False)
        self.bn3 = tnn.BatchNorm2d(planes * 2)
        self.downsample = downsample
        self.no_relu = no_relu

    def forward(self, x):
        r = x if self.downsample is None else self.downsample(x)
        out = torch.relu(self.bn1(self.conv1(x)))
        out = torch.relu(self.bn2(self.conv2(out)))
        out = self.bn3(self.conv3(out)) + r
        return out if self.no_relu else torch.relu(out)


def _make_layer(block, cin, planes, blocks, stride=1):
    down = None
    if stride != 1 or cin != planes * block.expansion:
        down = tnn.Sequential(
            tnn.Conv2d(cin, planes * block.expansion, 1, stride=stride,
                       bias=False),
            tnn.BatchNorm2d(planes * block.expansion))
    mods = [block(cin, planes, stride, down)]
    cin = planes * block.expansion
    for i in range(1, blocks):
        mods.append(block(cin, planes, no_relu=(i == blocks - 1)))
    return tnn.Sequential(*mods)


def _bnconv(cin, cout, k=1, pool=None):
    mods = [] if pool is None else [pool]
    mods += [tnn.BatchNorm2d(cin), tnn.ReLU(inplace=True),
             tnn.Conv2d(cin, cout, k, padding=k // 2, bias=False)]
    return tnn.Sequential(*mods)


class TDAPPM(tnn.Module):
    def __init__(self, cin, bp, cout):
        super().__init__()
        self.scale1 = _bnconv(cin, bp, pool=tnn.AvgPool2d(5, 2, 2))
        self.scale2 = _bnconv(cin, bp, pool=tnn.AvgPool2d(9, 4, 4))
        self.scale3 = _bnconv(cin, bp, pool=tnn.AvgPool2d(17, 8, 8))
        self.scale4 = _bnconv(cin, bp, pool=tnn.AdaptiveAvgPool2d((1, 1)))
        self.scale0 = _bnconv(cin, bp)
        for i in range(1, 5):
            setattr(self, f"process{i}", _bnconv(bp, bp, 3))
        self.compression = _bnconv(bp * 5, cout)
        self.shortcut = _bnconv(cin, cout)

    def forward(self, x):
        hw = x.shape[-2:]
        xs = [self.scale0(x)]
        for i in range(1, 5):
            s = getattr(self, f"scale{i}")(x)
            s = F.interpolate(s, size=hw, mode="bilinear") + xs[-1]
            xs.append(getattr(self, f"process{i}")(s))
        return self.compression(torch.cat(xs, 1)) + self.shortcut(x)


class TDDR(tnn.Module):
    def __init__(self, layers=LAYERS, planes=PLANES, spp_planes=SPP,
                 out_planes=OUTP):
        super().__init__()
        hp = planes * 2
        self.conv1 = tnn.Sequential(
            tnn.Conv2d(3, planes, 3, stride=2, padding=1),
            tnn.BatchNorm2d(planes), tnn.ReLU(inplace=True),
            tnn.Conv2d(planes, planes, 3, stride=2, padding=1),
            tnn.BatchNorm2d(planes), tnn.ReLU(inplace=True))
        self.relu = tnn.ReLU(inplace=False)
        self.layer1 = _make_layer(TBasic, planes, planes, layers[0])
        self.layer2 = _make_layer(TBasic, planes, planes * 2, layers[1], 2)
        self.layer3_1 = _make_layer(TBasic, planes * 2, planes * 4,
                                    layers[2] // 2, 2)
        self.layer3_2 = _make_layer(TBasic, planes * 4, planes * 4,
                                    layers[2] // 2)
        self.layer4 = _make_layer(TBasic, planes * 4, planes * 8,
                                  layers[3], 2)
        for tag in ("3_1", "3_2"):
            setattr(self, f"compression{tag}", tnn.Sequential(
                tnn.Conv2d(planes * 4, hp, 1, bias=False),
                tnn.BatchNorm2d(hp)))
            setattr(self, f"down{tag}", tnn.Sequential(
                tnn.Conv2d(hp, planes * 4, 3, stride=2, padding=1,
                           bias=False),
                tnn.BatchNorm2d(planes * 4)))
        self.compression4 = tnn.Sequential(
            tnn.Conv2d(planes * 8, hp, 1, bias=False), tnn.BatchNorm2d(hp))
        self.down4 = tnn.Sequential(
            tnn.Conv2d(hp, planes * 4, 3, stride=2, padding=1, bias=False),
            tnn.BatchNorm2d(planes * 4), tnn.ReLU(inplace=True),
            tnn.Conv2d(planes * 4, planes * 8, 3, stride=2, padding=1,
                       bias=False),
            tnn.BatchNorm2d(planes * 8))
        self.layer3_1_ = _make_layer(TBasic, planes * 2, hp,
                                     layers[2] // 2)
        self.layer3_2_ = _make_layer(TBasic, hp, hp, layers[2] // 2)
        self.layer4_ = _make_layer(TBasic, hp, hp, layers[3])
        self.layer5_ = _make_layer(TBottle, hp, hp, 1)
        self.layer5 = _make_layer(TBottle, planes * 8, planes * 8, 1, 2)
        self.spp = TDAPPM(planes * 16, spp_planes, planes * 4)
        self.out_conv = tnn.Sequential(
            tnn.Conv2d(planes * 4, out_planes, 1, bias=False),
            tnn.BatchNorm2d(out_planes), tnn.ReLU())

    def forward(self, x):
        hw = (x.shape[-2] // 8, x.shape[-1] // 8)
        x = self.conv1(x)
        x = self.layer1(x)
        l1 = x
        x = self.layer2(self.relu(x))
        l2 = x
        x = self.layer3_1(self.relu(x))
        l3_1 = x
        xh = self.layer3_1_(self.relu(l2))
        x = x + self.down3_1(self.relu(xh))
        xh = xh + F.interpolate(self.compression3_1(self.relu(l3_1)),
                                size=hw, mode="bilinear")
        x = self.layer3_2(self.relu(x))
        l3_2 = x
        xh = self.layer3_2_(self.relu(xh))
        x = x + self.down3_2(self.relu(xh))
        xh = xh + F.interpolate(self.compression3_2(self.relu(l3_2)),
                                size=hw, mode="bilinear")
        x = self.layer4(self.relu(x))
        l4 = x
        xh = self.layer4_(self.relu(xh))
        x = x + self.down4(self.relu(xh))
        xh = xh + F.interpolate(self.compression4(self.relu(l4)),
                                size=hw, mode="bilinear")
        xh = self.layer5_(self.relu(xh))
        x = F.interpolate(self.spp(self.layer5(self.relu(x))), size=hw,
                          mode="bilinear")
        del l1
        return self.out_conv(x + xh)


def test_ddrnet_full_parity():
    torch.manual_seed(0)
    tmodel = TDDR().eval()
    for m in tmodel.modules():
        if isinstance(m, tnn.BatchNorm2d):
            m.running_mean.uniform_(-0.3, 0.3)
            m.running_var.uniform_(0.7, 1.4)

    rng = np.random.default_rng(0)
    x_np = rng.standard_normal((1, 128, 192, 3)).astype(np.float32)
    with torch.no_grad():
        tout = tmodel(torch.from_numpy(x_np.transpose(0, 3, 1, 2)))
    tout = tout.numpy().transpose(0, 2, 3, 1)

    sd = {f"backbone.{k}": v.numpy()
          for k, v in tmodel.state_dict().items()}
    params, stats, unmapped = convert_state_dict(sd)
    assert not unmapped, unmapped[:8]

    jmodel = DualResNet(layers=LAYERS, planes=PLANES, spp_planes=SPP,
                        out_planes=OUTP)
    variables = jmodel.init(jax.random.PRNGKey(0), jnp.asarray(x_np))
    merged_p, missing_p = _merge_into(variables["params"],
                                      params["backbone"])
    merged_s, missing_s = _merge_into(variables["batch_stats"],
                                      stats["backbone"])
    assert not missing_p, missing_p[:8]
    assert not missing_s, missing_s[:8]
    jout = jmodel.apply({"params": merged_p, "batch_stats": merged_s},
                        jnp.asarray(x_np))

    assert jout.shape == tout.shape
    np.testing.assert_allclose(np.asarray(jout), tout, atol=5e-4,
                               rtol=1e-3)
