"""Auxiliary loss zoo (reference depth/models/losses/*, SURVEY.md §2.8).

Unused by the four shipped GEDepth configs but part of the framework surface
(Adabins/BinsFormer/experiment heads depend on them). All masked variants
use static shapes (no boolean indexing) so they jit and shard.
"""
from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp


def _masked_mean(x, mask):
    m = mask.astype(x.dtype)
    return jnp.sum(x * m) / jnp.maximum(jnp.sum(m), 1.0)


def l1_loss(pred, target, valid_mask=True, loss_weight=1.0):
    diff = jnp.abs(pred - target)
    if valid_mask:
        return loss_weight * _masked_mean(diff, target > 0)
    return loss_weight * jnp.mean(diff)


def mse_loss(pred, target, valid_mask=True, loss_weight=1.0):
    diff = (pred - target) ** 2
    if valid_mask:
        return loss_weight * _masked_mean(diff, target > 0)
    return loss_weight * jnp.mean(diff)


def cosine_similarity_loss(pred, target, mask=None, is_abs=False,
                           loss_weight=1.0, axis=-1, eps=1e-8):
    """1 - cos(pred, target) per position (abs variant: 1 - |cos|)."""
    dot = jnp.sum(pred * target, axis=axis)
    norm = (jnp.linalg.norm(pred, axis=axis)
            * jnp.linalg.norm(target, axis=axis) + eps)
    cos = dot / norm
    val = 1.0 - (jnp.abs(cos) if is_abs else cos)
    if mask is not None:
        return loss_weight * _masked_mean(val, mask)
    return loss_weight * jnp.mean(val)


def focal_loss(logits, labels, gamma=2.0, alpha=0.25, ignore_index=255,
               loss_weight=1.0):
    """Multi-class focal loss with ignore label. logits (..., K)."""
    labels = labels.astype(jnp.int32)
    valid = labels != ignore_index
    safe = jnp.where(valid, labels, 0)
    logp = jax.nn.log_softmax(logits, axis=-1)
    logp_t = jnp.take_along_axis(logp, safe[..., None], axis=-1)[..., 0]
    p_t = jnp.exp(logp_t)
    val = -alpha * (1 - p_t) ** gamma * logp_t
    return loss_weight * _masked_mean(val, valid)


def dice_loss(logits, labels, num_classes=2, ignore_index=255, eps=1.0,
              loss_weight=1.0):
    """Soft Dice over one-hot labels; ignored pixels excluded."""
    labels = labels.astype(jnp.int32)
    valid = (labels != ignore_index).astype(logits.dtype)[..., None]
    safe = jnp.where(labels == ignore_index, 0, labels)
    probs = jax.nn.softmax(logits, axis=-1) * valid
    onehot = jax.nn.one_hot(safe, num_classes, dtype=logits.dtype) * valid
    dims = tuple(range(labels.ndim))
    inter = jnp.sum(probs * onehot, axis=dims[1:] if labels.ndim > 1 else 0)
    denom = jnp.sum(probs + onehot, axis=dims[1:] if labels.ndim > 1 else 0)
    dice = (2 * inter + eps) / (denom + eps)
    return loss_weight * jnp.mean(1.0 - dice)


def ohem_ce_loss(logits, labels, ignore_index=255, thresh=0.7,
                 min_kept=100000, loss_weight=1.0):
    """Online hard-example mining CE: keep pixels with prob(label) < thresh,
    at least min_kept (by hardness), mean over kept."""
    labels = labels.astype(jnp.int32)
    valid = labels != ignore_index
    safe = jnp.where(valid, labels, 0)
    logp = jax.nn.log_softmax(logits, axis=-1)
    nll = -jnp.take_along_axis(logp, safe[..., None], axis=-1)[..., 0]
    p_t = jnp.exp(-nll)
    flat_nll = nll.reshape(-1)
    flat_valid = valid.reshape(-1)
    flat_pt = jnp.where(flat_valid, p_t.reshape(-1), jnp.inf)
    k = min(min_kept, flat_nll.shape[0])
    # hardness threshold: k-th smallest prob (if stricter than thresh)
    kth = jnp.sort(flat_pt)[k - 1]
    cut = jnp.maximum(kth, thresh)
    kept = flat_valid & (flat_pt < cut)
    return loss_weight * _masked_mean(flat_nll, kept)


def bins_chamfer_loss(bin_edges, target_depth, min_depth=1e-3,
                      loss_weight=0.1):
    """Adabins bin-center chamfer distance (reference chamferloss.py:24-37).

    bin_edges: (B, n_bins+1); target_depth: (B, H, W) or (B, H, W, 1).
    Static-shape variant: invalid target pixels are masked out of both
    chamfer directions instead of ragged packing.
    """
    centers = 0.5 * (bin_edges[:, 1:] + bin_edges[:, :-1])   # (B, P)
    t = target_depth.reshape(target_depth.shape[0], -1)       # (B, T)
    valid = t >= min_depth

    # d2(x, y) pairwise: (B, P, T)
    d2 = (centers[:, :, None] - t[:, None, :]) ** 2
    big = jnp.asarray(1e10, d2.dtype)
    d2_masked = jnp.where(valid[:, None, :], d2, big)

    # x -> y: for each bin center, nearest valid target
    x2y = jnp.min(d2_masked, axis=2)                          # (B, P)
    any_valid = jnp.any(valid, axis=1)
    x2y = jnp.where(any_valid[:, None], x2y, 0.0).mean(axis=1)

    # y -> x: for each valid target, nearest bin center
    y2x = jnp.min(d2, axis=1)                                 # (B, T)
    y2x = jnp.sum(jnp.where(valid, y2x, 0.0), axis=1) / jnp.maximum(
        jnp.sum(valid, axis=1), 1)

    return loss_weight * jnp.mean(x2y + y2x)


def edge_aware_smoothness_loss(inv_depth, image, loss_weight=0.001):
    """Single-scale edge-aware smoothness (reference
    edge_aware_smooth_loss.py calc_smoothness, num_scales=1).

    inv_depth (B, H, W, 1); image (B, H, W, 3).
    """
    mean_inv = jnp.mean(inv_depth, axis=(1, 2), keepdims=True)
    d = inv_depth / (mean_inv + 1e-7)
    dx = jnp.abs(d[:, :, :-1] - d[:, :, 1:])
    dy = jnp.abs(d[:, :-1] - d[:, 1:])
    ix = jnp.mean(jnp.abs(image[:, :, :-1] - image[:, :, 1:]), axis=-1,
                  keepdims=True)
    iy = jnp.mean(jnp.abs(image[:, :-1] - image[:, 1:]), axis=-1,
                  keepdims=True)
    sx = dx * jnp.exp(-ix)
    sy = dy * jnp.exp(-iy)
    return loss_weight * (jnp.mean(sx) + jnp.mean(sy))


def accuracy(logits, labels, topk=1, ignore_index=None):
    """Top-k classification accuracy (reference accuracy.py role)."""
    labels = labels.astype(jnp.int32)
    if ignore_index is not None:
        valid = labels != ignore_index
    else:
        valid = jnp.ones_like(labels, dtype=bool)
    top = jnp.argsort(logits, axis=-1)[..., ::-1][..., :topk]
    hit = jnp.any(top == labels[..., None], axis=-1)
    return _masked_mean(hit.astype(jnp.float32), valid)
