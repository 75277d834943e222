"""DDRNet (dual-resolution) backbone, NHWC flax.

Faithful re-implementation of the reference DualResNet
(depth/models/backbones/ddrnet.py:190-352): biased 3x3/2 double stem,
BasicBlock trunk with the last block of every layer emitting its PRE-relu
sum (no_relu=True, ddrnet.py:294-298), a high-resolution /8 branch split
off after layer2 with bilateral fusion at three points
(compression3_1/3_2/4 down-mixes + down3_1/3_2/4 up-mixes,
ddrnet.py:316-343), Bottleneck(expansion=2) caps on both branches, the
DAPPM context module (ddrnet.py:104-185: pre-activation BN->ReLU->1x1
branches over 5/9/17-avg-pooled + global scales with cumulative 3x3
"process" chains), and out_conv on the fused /8 sum. Returns the single
/8 feature map, matching the reference forward's contract.

Torch checkpoints convert through ``convert_state_dict`` (the DDRNet key
mapping keeps the reference's module names); cross-checked end-to-end in
tests/test_parity_ddrnet.py.
"""
from __future__ import annotations

import jax.numpy as jnp
import flax.linen as nn

from gedepth_tpu.models.layers import torch_conv_kernel_init
from gedepth_tpu.models.resnet import _ConvBN
from gedepth_tpu.ops.resize import resize_bilinear


class _BiasConvBN(nn.Module):
    """Biased conv + BN (the reference stem's nn.Conv2d keeps its default
    bias=True, ddrnet.py:198-203 — unlike every other conv in the net)."""
    features: int
    kernel: int = 3
    stride: int = 2

    @nn.compact
    def __call__(self, x, train: bool = False):
        pad = self.kernel // 2
        x = nn.Conv(self.features, (self.kernel, self.kernel),
                    strides=(self.stride, self.stride),
                    padding=[(pad, pad), (pad, pad)], use_bias=True,
                    kernel_init=torch_conv_kernel_init, name="conv")(x)
        return nn.BatchNorm(use_running_average=not train, momentum=0.9,
                            epsilon=1e-5, name="bn")(x)


class _BNConv(nn.Module):
    """Pre-activation BN -> ReLU -> conv (DAPPM branch unit,
    ddrnet.py:107-161)."""
    features: int
    kernel: int = 1

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                         epsilon=1e-5, name="bn")(x)
        x = nn.relu(x)
        pad = self.kernel // 2
        return nn.Conv(self.features, (self.kernel, self.kernel),
                       padding=[(pad, pad), (pad, pad)], use_bias=False,
                       kernel_init=torch_conv_kernel_init, name="conv")(x)


class BasicBlock(nn.Module):
    """Reference ddrnet.py:28-60 BasicBlock: optional pre-relu output."""
    planes: int
    stride: int = 1
    downsample: bool = False
    no_relu: bool = False

    @nn.compact
    def __call__(self, x, train: bool = False):
        identity = x
        out = nn.relu(_ConvBN(self.planes, 3, self.stride,
                              name="convbn1")(x, train))
        out = _ConvBN(self.planes, 3, 1, name="convbn2")(out, train)
        if self.downsample:
            identity = _ConvBN(self.planes, 1, self.stride,
                               name="downsample")(x, train)
        out = out + identity
        return out if self.no_relu else nn.relu(out)


class Bottleneck(nn.Module):
    """Reference ddrnet.py:62-102 Bottleneck: EXPANSION 2 (not the
    torchvision 4), no_relu defaults True (single-block layer5 caps emit
    pre-relu sums)."""
    planes: int
    stride: int = 1
    downsample: bool = False
    no_relu: bool = True
    expansion: int = 2

    @nn.compact
    def __call__(self, x, train: bool = False):
        identity = x
        out = nn.relu(_ConvBN(self.planes, 1, name="convbn1")(x, train))
        out = nn.relu(_ConvBN(self.planes, 3, self.stride,
                              name="convbn2")(out, train))
        out = _ConvBN(self.planes * self.expansion, 1,
                      name="convbn3")(out, train)
        if self.downsample:
            identity = _ConvBN(self.planes * self.expansion, 1, self.stride,
                               name="downsample")(x, train)
        out = out + identity
        return out if self.no_relu else nn.relu(out)


class DAPPM(nn.Module):
    """Deep aggregation pyramid pooling (reference ddrnet.py:104-185).

    Five pre-activation 1x1 branches — identity, avg-pool k5/s2, k9/s4,
    k17/s8 (count_include_pad, torch AvgPool2d default) and global — each
    coarser branch bilinearly upsampled and summed INTO the previous
    branch's output before its 3x3 "process" conv (cumulative chain,
    ddrnet.py:170-182); concat -> 1x1 compression + 1x1 shortcut."""
    branch_planes: int
    out_planes: int

    @nn.compact
    def __call__(self, x, train: bool = False):
        hw = x.shape[1:3]
        pooled = [x]
        for k, s in ((5, 2), (9, 4), (17, 8)):
            p = k // 2
            pooled.append(nn.avg_pool(
                x, (k, k), strides=(s, s), padding=[(p, p), (p, p)]))
        pooled.append(jnp.mean(x, axis=(1, 2), keepdims=True))

        feats = [_BNConv(self.branch_planes, 1,
                         name="scale0")(pooled[0], train)]
        for i in range(1, 5):
            s = _BNConv(self.branch_planes, 1,
                        name=f"scale{i}")(pooled[i], train)
            s = resize_bilinear(s, hw) + feats[-1]
            feats.append(_BNConv(self.branch_planes, 3,
                                 name=f"process{i}")(s, train))
        cat = jnp.concatenate(feats, axis=-1)
        return (_BNConv(self.out_planes, 1, name="compression")(cat, train)
                + _BNConv(self.out_planes, 1, name="shortcut")(x, train))


def _layer(block, planes, blocks, stride, name, x, train, in_ch=None):
    """Reference _make_layer (ddrnet.py:282-300): stride + channel-change
    downsample on block 0, no_relu on the LAST block when blocks > 1 (a
    single-block layer keeps the block class's default no_relu)."""
    expansion = 2 if block is Bottleneck else 1
    for b in range(blocks):
        down = b == 0 and (stride != 1 or in_ch != planes * expansion)
        kw = {}
        if blocks > 1:
            kw["no_relu"] = b == blocks - 1
        x = block(planes, stride=stride if b == 0 else 1, downsample=down,
                  name=f"{name}_block{b}", **kw)(x, train)
    return x


class DualResNet(nn.Module):
    """Reference DualResNet (ddrnet.py:190-352). `layers` is the per-layer
    BasicBlock count (DDRNet-23-slim = (2, 2, 4, 2), reference __main__
    uses (3, 4, 6, 3)); layer3 is split into two halves (layers[2] // 2
    each) around the first bilateral fusion."""
    layers: tuple = (2, 2, 4, 2)
    planes: int = 32
    spp_planes: int = 128
    out_planes: int = 256

    @nn.compact
    def __call__(self, x, train: bool = False):
        p = self.planes
        hp = 2 * p  # highres_planes
        h8 = (x.shape[1] // 8, x.shape[2] // 8)

        x = nn.relu(_BiasConvBN(p, name="stem1")(x, train))
        x = nn.relu(_BiasConvBN(p, name="stem2")(x, train))

        x = _layer(BasicBlock, p, self.layers[0], 1, "layer1", x, train,
                   in_ch=p)
        l1 = x
        x = _layer(BasicBlock, 2 * p, self.layers[1], 2, "layer2",
                   nn.relu(x), train, in_ch=p)
        l2 = x

        half3 = self.layers[2] // 2
        x = _layer(BasicBlock, 4 * p, half3, 2, "layer3_1", nn.relu(x),
                   train, in_ch=2 * p)
        l3_1 = x
        xh = _layer(BasicBlock, hp, half3, 1, "layer3_1_", nn.relu(l2),
                    train, in_ch=2 * p)
        x = x + _ConvBN(4 * p, 3, 2, name="down3_1")(nn.relu(xh), train)
        xh = xh + resize_bilinear(
            _ConvBN(hp, 1, name="compression3_1")(nn.relu(l3_1), train), h8)

        x = _layer(BasicBlock, 4 * p, half3, 1, "layer3_2", nn.relu(x),
                   train, in_ch=4 * p)
        l3_2 = x
        xh = _layer(BasicBlock, hp, half3, 1, "layer3_2_", nn.relu(xh),
                    train, in_ch=hp)
        x = x + _ConvBN(4 * p, 3, 2, name="down3_2")(nn.relu(xh), train)
        xh = xh + resize_bilinear(
            _ConvBN(hp, 1, name="compression3_2")(nn.relu(l3_2), train), h8)

        x = _layer(BasicBlock, 8 * p, self.layers[3], 2, "layer4",
                   nn.relu(x), train, in_ch=4 * p)
        l4 = x
        xh = _layer(BasicBlock, hp, self.layers[3], 1, "layer4_",
                    nn.relu(xh), train, in_ch=hp)
        d = nn.relu(_ConvBN(4 * p, 3, 2, name="down4_a")(nn.relu(xh),
                                                         train))
        x = x + _ConvBN(8 * p, 3, 2, name="down4_b")(d, train)
        xh = xh + resize_bilinear(
            _ConvBN(hp, 1, name="compression4")(nn.relu(l4), train), h8)

        xh = _layer(Bottleneck, hp, 1, 1, "layer5_", nn.relu(xh), train,
                    in_ch=hp)
        x = _layer(Bottleneck, 8 * p, 1, 2, "layer5", nn.relu(x), train,
                   in_ch=8 * p)
        x = resize_bilinear(
            DAPPM(self.spp_planes, 4 * p, name="spp")(x, train), h8)

        out = nn.relu(_ConvBN(self.out_planes, 1,
                              name="out_conv")(x + xh, train))
        return out
