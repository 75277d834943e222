"""Common flax building blocks (NHWC layout).

Initializers mirror the reference's effective init scheme where it matters
for from-scratch training: trunc-normal(0.02) linears in the transformer,
xavier-uniform convs in the necks, torch-default (kaiming-uniform) convs
elsewhere. Checkpoint conversion bypasses init entirely.
"""
from __future__ import annotations

from typing import Callable, Optional, Sequence

import numpy as np
import jax
import jax.numpy as jnp
import flax.linen as nn

trunc_normal_init = nn.initializers.truncated_normal(stddev=0.02)
xavier_uniform_init = nn.initializers.xavier_uniform()


def torch_conv_kernel_init(key, shape, dtype=jnp.float32):
    """Torch Conv2d default: kaiming_uniform(a=sqrt(5)) == U(+-1/sqrt(fan_in)).

    flax conv kernels are (kh, kw, in, out); fan_in = kh*kw*in.
    """
    fan_in = int(np.prod(shape[:-1]))
    # fan_in == 0 only for degenerate 0-channel convs (e.g. AdaBins mViT on
    # toy image sizes); the kernel is empty, any finite bound works.
    bound = 1.0 / np.sqrt(max(fan_in, 1))
    return jax.random.uniform(key, shape, dtype, -bound, bound)


def torch_linear_kernel_init(key, shape, dtype=jnp.float32):
    fan_in = shape[0]
    bound = 1.0 / np.sqrt(fan_in)
    return jax.random.uniform(key, shape, dtype, -bound, bound)


def torch_bias_init(fan_in):
    bound = 1.0 / np.sqrt(fan_in) if fan_in > 0 else 0.0

    def init(key, shape, dtype=jnp.float32):
        return jax.random.uniform(key, shape, dtype, -bound, bound)

    return init


class ConvModule(nn.Module):
    """conv -> (BN) -> (act), the mmcv ConvModule shape. NHWC.

    BatchNorm statistics are computed over the *global* logical batch under
    GSPMD jit, which reproduces the reference's SyncBN conversion
    (tools/train.py:157-160) without any explicit cross-device plumbing.
    """
    features: int
    kernel_size: int = 3
    stride: int = 1
    padding: Optional[int] = None
    use_norm: bool = False
    act: Optional[Callable] = None
    use_bias: Optional[bool] = None
    kernel_init: Callable = torch_conv_kernel_init

    @nn.compact
    def __call__(self, x, train: bool = False):
        pad = self.kernel_size // 2 if self.padding is None else self.padding
        use_bias = (not self.use_norm) if self.use_bias is None else self.use_bias
        fan_in = self.kernel_size * self.kernel_size * x.shape[-1]
        x = nn.Conv(self.features, (self.kernel_size, self.kernel_size),
                    strides=(self.stride, self.stride),
                    padding=[(pad, pad), (pad, pad)],
                    use_bias=use_bias,
                    kernel_init=self.kernel_init,
                    bias_init=torch_bias_init(fan_in))(x)
        if self.use_norm:
            x = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                             epsilon=1e-5)(x)
        if self.act is not None:
            x = self.act(x)
        return x


class DropPath(nn.Module):
    """Stochastic depth: drop the residual branch per sample.

    `rate_override` (a traced scalar) replaces the static rate — used by the
    scanned Swin stages where the per-block rate is a scan input."""
    rate: float

    @nn.compact
    def __call__(self, x, deterministic: bool, rate_override=None):
        if deterministic or (rate_override is None and self.rate == 0.0):
            return x
        keep = (1.0 - self.rate if rate_override is None
                else 1.0 - rate_override)
        rng = self.make_rng("dropout")
        shape = (x.shape[0],) + (1,) * (x.ndim - 1)
        mask = jax.random.bernoulli(rng, keep, shape)
        # divide in f32 (keep can be a traced f32 scalar) but return in
        # x's dtype — a traced override must not promote a bf16 residual
        # stream to f32, or the scanned-stage carry changes type mid-scan
        return jnp.where(mask, x / keep, 0.0).astype(x.dtype)


class Mlp(nn.Module):
    """Transformer FFN: Linear -> GELU -> Linear (+dropout)."""
    hidden: int
    out: int
    drop_rate: float = 0.0

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        x = nn.Dense(self.hidden, kernel_init=trunc_normal_init)(x)
        x = nn.gelu(x, approximate=False)
        if self.drop_rate > 0:
            x = nn.Dropout(self.drop_rate)(x, deterministic=deterministic)
        x = nn.Dense(self.out, kernel_init=trunc_normal_init)(x)
        if self.drop_rate > 0:
            x = nn.Dropout(self.drop_rate)(x, deterministic=deterministic)
        return x


def sine_positional_encoding(h: int, w: int, num_feats: int = 256,
                             temperature: float = 10000.0):
    """DETR-style sine positional encoding over an (h, w) grid.

    Matches mmcv SinePositionalEncoding(normalize=False) on an all-valid
    mask: 1-based cumsum coordinates (reference
    depth/utils/position_encoding.py:66-89). Returns (h, w, 2*num_feats).

    Computed with jnp ops so it materialises ON DEVICE: at eval resolution
    the table is >200MB and embedding it as an HLO literal blows compile
    payload limits (and bloats every executable).
    """
    y_embed = jnp.arange(1, h + 1, dtype=jnp.float32)[:, None]
    x_embed = jnp.arange(1, w + 1, dtype=jnp.float32)[None, :]
    dim_t = np.arange(num_feats, dtype=np.float32)
    dim_t = jnp.asarray(temperature ** (2 * (dim_t // 2) / num_feats))
    pos_x = x_embed[:, :, None] / dim_t          # (1, w, F)
    pos_y = y_embed[:, :, None] / dim_t          # (h, 1, F)
    pos_x = jnp.stack([jnp.sin(pos_x[..., 0::2]), jnp.cos(pos_x[..., 1::2])],
                      axis=3).reshape(1, w, num_feats)
    pos_y = jnp.stack([jnp.sin(pos_y[..., 0::2]), jnp.cos(pos_y[..., 1::2])],
                      axis=3).reshape(h, 1, num_feats)
    pos_x = jnp.broadcast_to(pos_x, (h, w, num_feats))
    pos_y = jnp.broadcast_to(pos_y, (h, w, num_feats))
    return jnp.concatenate([pos_y, pos_x], axis=2)


class LearnedPositionalEncoding(nn.Module):
    """Learned row/col embeddings (reference
    depth/utils/position_encoding.py:103 and hahi.py PositionEmbeddingLearned
    role): pos[h, w] = concat(col_embed[w], row_embed[h])."""
    num_feats: int = 256
    max_len: int = 50

    @nn.compact
    def __call__(self, h: int, w: int):
        rows = self.param("row_embed", nn.initializers.uniform(1.0),
                          (self.max_len, self.num_feats))
        cols = self.param("col_embed", nn.initializers.uniform(1.0),
                          (self.max_len, self.num_feats))
        r = jnp.broadcast_to(rows[:h][:, None, :], (h, w, self.num_feats))
        c = jnp.broadcast_to(cols[:w][None, :, :], (h, w, self.num_feats))
        return jnp.concatenate([c, r], axis=-1)
