"""Dictionary-encoding layer (reference depth/ops/encoding.py role,
Zhang et al. "Context Encoding"): soft-assign features to K learned
codewords with learned smoothing, aggregate residuals."""
from __future__ import annotations

import jax
import jax.numpy as jnp
import flax.linen as nn


class Encoding(nn.Module):
    num_codes: int = 32

    @nn.compact
    def __call__(self, x):
        """x: (B, H, W, C) or (B, N, C) -> (B, num_codes, C)."""
        if x.ndim == 4:
            B, H, W, C = x.shape
            x = x.reshape(B, H * W, C)
        B, N, C = x.shape
        k = self.num_codes
        std = 1.0 / ((k * C) ** 0.5)
        codewords = self.param("codewords", nn.initializers.uniform(std),
                               (k, C))
        scale = self.param("scale", nn.initializers.uniform(1.0), (k,))
        scale = -jnp.abs(scale)  # negative smoothing factors

        resid = x[:, :, None, :] - codewords[None, None]     # (B,N,K,C)
        dist = jnp.sum(resid ** 2, axis=-1)                  # (B,N,K)
        assign = jax.nn.softmax(scale[None, None] * dist, axis=-1)
        return jnp.einsum("bnk,bnkc->bkc", assign, resid)
