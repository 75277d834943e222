"""VisionTransformer torch cross-check (VERDICT round-2 weak #5).

A textbook torch timm/AugReg-style ViT (the naming `convert_vit_official`
ingests — reference tools/model_converters/vit2depth.py role) is converted
and the flax VisionTransformer must reproduce every out-index token map,
class token included (DPT readout path)."""
import numpy as np
import pytest

torch = pytest.importorskip("torch")
import torch.nn as tnn
import torch.nn.functional as F

import jax
import jax.numpy as jnp

from gedepth_tpu.models.vit import VisionTransformer
from gedepth_tpu.convert.vit_official import convert_vit_official
from gedepth_tpu.convert.torch_to_jax import _merge_into

C, HEADS, DEPTH, PATCH, GRID = 32, 4, 3, 8, 6


class TBlock(tnn.Module):
    def __init__(self):
        super().__init__()
        self.norm1 = tnn.LayerNorm(C, eps=1e-6)
        self.norm2 = tnn.LayerNorm(C, eps=1e-6)

        class A(tnn.Module):
            def __init__(self):
                super().__init__()
                self.qkv = tnn.Linear(C, 3 * C)
                self.proj = tnn.Linear(C, C)

            def forward(self, x):
                B, N, _ = x.shape
                qkv = self.qkv(x).reshape(B, N, 3, HEADS,
                                          C // HEADS).permute(2, 0, 3, 1, 4)
                q, k, v = qkv[0], qkv[1], qkv[2]
                att = (q @ k.transpose(-2, -1)) * (C // HEADS) ** -0.5
                att = att.softmax(-1)
                return self.proj((att @ v).transpose(1, 2).reshape(B, N, C))

        class M(tnn.Module):
            def __init__(self):
                super().__init__()
                self.fc1 = tnn.Linear(C, 4 * C)
                self.fc2 = tnn.Linear(4 * C, C)

            def forward(self, x):
                return self.fc2(F.gelu(self.fc1(x)))

        self.attn = A()
        self.mlp = M()

    def forward(self, x):
        x = x + self.attn(self.norm1(x))
        return x + self.mlp(self.norm2(x))


class TViT(tnn.Module):
    def __init__(self):
        super().__init__()
        self.cls_token = tnn.Parameter(torch.randn(1, 1, C) * 0.02)
        self.pos_embed = tnn.Parameter(
            torch.randn(1, GRID * GRID + 1, C) * 0.02)

        class P(tnn.Module):
            def __init__(self):
                super().__init__()
                self.proj = tnn.Conv2d(3, C, PATCH, stride=PATCH)
        self.patch_embed = P()
        self.blocks = tnn.ModuleList(TBlock() for _ in range(DEPTH))

    def forward(self, img, out_indices):
        B = img.shape[0]
        x = self.patch_embed.proj(img).flatten(2).transpose(1, 2)
        x = torch.cat([self.cls_token.expand(B, -1, -1), x], 1)
        x = x + self.pos_embed
        outs = []
        for i, b in enumerate(self.blocks):
            x = b(x)
            if i in out_indices:
                outs.append(x)
        return outs


def test_vit_full_parity():
    torch.manual_seed(0)
    tmodel = TViT().eval()
    rng = np.random.default_rng(0)
    H = W = GRID * PATCH
    x_np = rng.standard_normal((1, H, W, 3)).astype(np.float32)
    out_idx = (0, 2)
    with torch.no_grad():
        touts = tmodel(torch.from_numpy(x_np.transpose(0, 3, 1, 2)),
                       out_idx)
    touts = [t.numpy() for t in touts]

    sd = {k: v.numpy() for k, v in tmodel.state_dict().items()}
    conv = convert_vit_official(sd, num_heads=HEADS, num_blocks=DEPTH)

    jmodel = VisionTransformer(embed_dims=C, depth=DEPTH, num_heads=HEADS,
                               patch_size=PATCH, out_indices=out_idx,
                               pretrain_grid=GRID)
    variables = jmodel.init(jax.random.PRNGKey(0), jnp.asarray(x_np))
    merged, missing = _merge_into(variables["params"], conv)
    assert not missing, missing[:8]

    jouts = jmodel.apply({"params": merged}, jnp.asarray(x_np))
    assert len(jouts) == len(touts) == 2
    for (jo, hw), to in zip(jouts, touts):
        assert hw == (GRID, GRID)
        np.testing.assert_allclose(np.asarray(jo), to, rtol=2e-4,
                                   atol=2e-4)
