"""Window attention compute core.

`window_attention(q, k, v, bias, mask)` is the hot op of the Swin backbone:
batched (nW*B) attention over N = window**2 tokens with a relative-position
bias shared across windows and an optional per-window-group additive mask.

Two implementations:
  * `window_attention_xla`: einsum formulation — THE production path on all
    backends (XLA's fused attention beat the Pallas kernel 1165 vs 1500 us
    at Swin-L stage-1 scale on v5e, so the kernel is not dispatched).
  * `window_attention_pallas` (gedepth_tpu/ops/pallas/window_attn.py):
    fused QK^T + bias + mask + softmax + PV kernel, parity-tested, kept as
    the starting point for future layout experiments only.

q is expected PRE-SCALED (caller multiplies by head_dim**-0.5), matching the
reference (depthformer_swin.py:198).

Shapes:
  q, k, v: (nWB, N, heads, head_dim)
  bias:    (heads, N, N)
  mask:    (num_windows, N, N) or None; when set, nWB % num_windows == 0 and
           window w of batch row r uses mask[r % num_windows]
           (windows are laid out (B, nH, nW) -> row-major, so consecutive
           groups of num_windows rows share the batch element).
Returns:
  (nWB, N, heads, head_dim)
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


def window_attention_xla(q, k, v, bias, mask=None):
    nWB, N, H, D = q.shape
    attn = jnp.einsum("bnhd,bmhd->bhnm", q, k)
    # keep reduced-precision activations reduced: the f32 mask/bias
    # constants must not promote a bf16 attention path (the scanned Swin
    # stages require a dtype-stable carry)
    attn = attn + bias[None].astype(attn.dtype)
    if mask is not None:
        nW = mask.shape[0]
        attn = attn.reshape(nWB // nW, nW, H, N, N)
        attn = attn + mask[None, :, None].astype(attn.dtype)
        attn = attn.reshape(nWB, H, N, N)
    attn = jax.nn.softmax(attn, axis=-1)
    out = jnp.einsum("bhnm,bmhd->bnhd", attn, v)
    return out


def window_attention(q, k, v, bias, mask=None):
    """XLA path unconditionally (measured faster than the Pallas kernel on
    v5e; see module docstring)."""
    return window_attention_xla(q, k, v, bias, mask)
