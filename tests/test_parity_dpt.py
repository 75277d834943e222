"""Full DPT decode-head torch cross-check.

Textbook torch implementation of the reference DPTHead
(depth/models/decode_heads/dpt_head.py:13-316: project-readout reassemble
with learned resize layers, pre-act residual fusion, HeadDepth), state dict
through `convert_state_dict`, flax head must match."""
import numpy as np
import pytest

torch = pytest.importorskip("torch")
import torch.nn as tnn
import torch.nn.functional as F

import jax
import jax.numpy as jnp

from gedepth_tpu.models.dpt import DPTHead
from gedepth_tpu.convert import convert_state_dict
from gedepth_tpu.convert.torch_to_jax import _merge_into

E = 32                      # ViT embed dim
POST = (8, 16, 24, 32)      # post-process channels
CH = 16                     # head channels
MIND = 1e-3


class TReassemble(tnn.Module):
    def __init__(self):
        super().__init__()
        self.projects = tnn.ModuleList()
        for c in POST:
            m = tnn.Module()
            m.conv = tnn.Conv2d(E, c, 1)
            self.projects.append(m)
        self.resize_layers = tnn.ModuleList([
            tnn.ConvTranspose2d(POST[0], POST[0], 4, stride=4),
            tnn.ConvTranspose2d(POST[1], POST[1], 2, stride=2),
            tnn.Identity(),
            tnn.Conv2d(POST[3], POST[3], 3, stride=2, padding=1)])
        self.readout_projects = tnn.ModuleList([
            tnn.Sequential(tnn.Linear(2 * E, E), tnn.GELU())
            for _ in POST])

    def forward(self, inputs):
        out = []
        for i, (x, cls) in enumerate(inputs):
            shape = x.shape
            x = x.flatten(2).permute(0, 2, 1)
            readout = cls.unsqueeze(1).expand_as(x)
            x = self.readout_projects[i](torch.cat((x, readout), -1))
            x = x.permute(0, 2, 1).reshape(shape)
            x = self.projects[i].conv(x)
            x = self.resize_layers[i](x)
            out.append(x)
        return out


class TRCU(tnn.Module):
    def __init__(self, c):
        super().__init__()
        for name in ("conv1", "conv2"):
            m = tnn.Module()
            m.conv = tnn.Conv2d(c, c, 3, padding=1, bias=False)
            setattr(self, name, m)

    def forward(self, x):
        y = self.conv1.conv(F.relu(x))
        y = self.conv2.conv(F.relu(y))
        return x + y


class TFusion(tnn.Module):
    def __init__(self, c, first=False):
        super().__init__()
        self.project = tnn.Module()
        self.project.conv = tnn.Conv2d(c, c, 1)
        if not first:
            self.res_conv_unit1 = TRCU(c)
        self.res_conv_unit2 = TRCU(c)

    def forward(self, x, skip=None):
        if skip is not None:
            if x.shape != skip.shape:
                skip = F.interpolate(skip, size=x.shape[2:],
                                     mode="bilinear", align_corners=False)
            x = x + self.res_conv_unit1(skip)
        x = self.res_conv_unit2(x)
        x = F.interpolate(x, scale_factor=2, mode="bilinear",
                          align_corners=True)
        return self.project.conv(x)


class TDPTHead(tnn.Module):
    def __init__(self):
        super().__init__()
        self.reassemble_blocks = TReassemble()
        self.convs = tnn.ModuleList()
        for c in POST:
            m = tnn.Module()
            m.conv = tnn.Conv2d(c, CH, 3, padding=1, bias=False)
            self.convs.append(m)
        self.fusion_blocks = tnn.ModuleList(
            [TFusion(CH, first=(i == 0)) for i in range(4)])
        self.project = tnn.Module()
        self.project.conv = tnn.Conv2d(CH, CH, 3, padding=1)
        self.conv_depth = tnn.Module()
        self.conv_depth.head = tnn.Sequential(
            tnn.Conv2d(CH, CH // 2, 3, padding=1),
            tnn.Upsample(scale_factor=2, mode="bilinear",
                         align_corners=True),
            tnn.Conv2d(CH // 2, 32, 3, padding=1), tnn.ReLU(),
            tnn.Conv2d(32, 1, 1))

    def forward(self, inputs):
        x = self.reassemble_blocks(inputs)
        x = [self.convs[i].conv(f) for i, f in enumerate(x)]
        out = self.fusion_blocks[0](x[-1])
        for i in range(1, 4):
            out = self.fusion_blocks[i](out, x[-(i + 1)])
        out = F.relu(self.project.conv(out))
        return F.relu(self.conv_depth.head(out)) + MIND


def test_dpt_head_full_parity():
    torch.manual_seed(0)
    tm = TDPTHead().eval()

    hp, wp = 8, 12   # patch grid
    rng = np.random.default_rng(2)
    token_maps = [rng.standard_normal((1, E, hp, wp)).astype(np.float32)
                  for _ in range(4)]
    cls_toks = [rng.standard_normal((1, E)).astype(np.float32)
                for _ in range(4)]
    with torch.no_grad():
        want = tm([(torch.from_numpy(x), torch.from_numpy(c))
                   for x, c in zip(token_maps, cls_toks)]).numpy()
    want = want.transpose(0, 2, 3, 1)

    sd = {f"decode_head.{k}": v.numpy()
          for k, v in tm.state_dict().items()}
    params, stats, unmapped = convert_state_dict(sd)
    assert not unmapped, unmapped[:8]

    # flax input contract: (tokens, (h, w)) with cls first
    jinputs = []
    for x, c in zip(token_maps, cls_toks):
        grid = x.reshape(1, E, hp * wp).transpose(0, 2, 1)
        toks = np.concatenate([c[:, None, :], grid], axis=1)
        jinputs.append((jnp.asarray(toks), (hp, wp)))

    jm = DPTHead(post_process_channels=POST, channels=CH, min_depth=MIND)
    variables = jm.init(jax.random.PRNGKey(0), jinputs)
    merged_p, missing = _merge_into(variables["params"],
                                    params["decode_head"])
    assert not missing, missing[:8]
    got = np.asarray(jm.apply({"params": merged_p}, jinputs))
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-4)
