"""Window attention compute core.

`window_attention(q, k, v, bias, mask)` is the hot op of the Swin backbone:
batched (nW*B) attention over N = window**2 tokens with a relative-position
bias shared across windows and an optional per-window-group additive mask.

Two implementations:
  * `window_attention_xla`: einsum reference (all backends, grads via AD).
  * `window_attention_pallas`: fused Pallas TPU kernel (QK^T + bias + mask +
    softmax + PV in VMEM) — used on TPU for the forward pass; see
    gedepth_tpu/ops/pallas/window_attn.py.

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
    attn = attn + bias[None]
    if mask is not None:
        nW = mask.shape[0]
        attn = attn.reshape(nWB // nW, nW, H, N, N)
        attn = attn + mask[None, :, None]
        attn = attn.reshape(nWB, H, N, N)
    attn = jax.nn.softmax(attn, axis=-1)
    out = jnp.einsum("bhnm,bmhd->bnhd", attn, v)
    return out


def window_attention(q, k, v, bias, mask=None):
    """Dispatch: Pallas kernel on TPU (inference/forward), XLA otherwise.

    The Pallas path is wired in via gedepth_tpu.ops.pallas once its parity
    tests pass; until then this is the XLA path unconditionally.
    """
    return window_attention_xla(q, k, v, bias, mask)
