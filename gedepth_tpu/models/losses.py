"""Training losses.

SigLoss — scale-invariant log loss, sqrt(var(g) + 0.15 mean(g)^2) over valid
(gt > 0) pixels (reference depth/models/losses/sigloss.py:36-53; torch.var is
unbiased, replicated here). Implemented masked with static shapes: no boolean
indexing, so it jits with fixed shapes and shards cleanly.

softmax_ce_ignore — 11-way slope-bin cross entropy with ignore_index=255 and
mean reduction over non-ignored pixels (reference celoss.py via
decode_head.py:313-316, weight 0.08).

binary_ce — BCE-with-logits used by the mask-pretrain path.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


def sigloss(pred, gt, valid=None, eps=1e-3, max_depth=None,
            variance_focus=0.15):
    """pred, gt: (..., H, W) or (B, H, W, 1); masked scale-invariant loss.

    Returns a scalar: sqrt(Var_masked(g) + 0.15 * Mean_masked(g)^2) with the
    unbiased (n-1) variance to match torch.var.
    """
    pred = pred.reshape(pred.shape[0], -1)
    gt = gt.reshape(gt.shape[0], -1)
    mask = gt > 0
    if max_depth is not None:
        mask = mask & (gt <= max_depth)
    if valid is not None:
        mask = mask & (valid.reshape(valid.shape[0], -1) > 0)
    m = mask.astype(pred.dtype)
    n = jnp.sum(m)
    n_safe = jnp.maximum(n, 1.0)

    g = jnp.log(pred + eps) - jnp.log(gt + eps)
    g = jnp.where(mask, g, 0.0)
    mean = jnp.sum(g) / n_safe
    var = jnp.sum(jnp.where(mask, (g - mean) ** 2, 0.0)) / jnp.maximum(
        n - 1.0, 1.0)
    return jnp.sqrt(var + variance_focus * mean ** 2)


def softmax_ce_ignore(logits, labels, ignore_index=255, num_classes=11):
    """Cross entropy, mean over pixels whose label != ignore_index.

    logits: (B, H, W, K); labels: (B, H, W) float or int class ids.
    """
    labels = labels.astype(jnp.int32)
    valid = labels != ignore_index
    safe_labels = jnp.where(valid, labels, 0)
    logp = jax.nn.log_softmax(logits, axis=-1)
    nll = -jnp.take_along_axis(logp, safe_labels[..., None], axis=-1)[..., 0]
    m = valid.astype(logits.dtype)
    return jnp.sum(nll * m) / jnp.maximum(jnp.sum(m), 1.0)


def binary_ce(logits, targets, valid=None):
    """BCE with logits, mean-reduced (optionally masked)."""
    loss = jnp.maximum(logits, 0) - logits * targets + jnp.log1p(
        jnp.exp(-jnp.abs(logits)))
    if valid is not None:
        m = valid.astype(loss.dtype)
        return jnp.sum(loss * m) / jnp.maximum(jnp.sum(m), 1.0)
    return jnp.mean(loss)
