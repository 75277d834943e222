"""Region Mutual Information loss (reference depth/models/losses/rmiloss.py;
Zhao et al. 2019). I(A; B) >= H(A) - H(A|B): maximise a lower bound of the
mutual information between label neighborhoods and prediction neighborhoods.

loss = lambda * BCE(probs, labels) + (1 - lambda) * MI_lowerbound, where the
MI term is 0.5 * logdet of the conditional covariance of label vectors given
prediction vectors, over rmi_radius x rmi_radius neighborhoods after
pooling.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp


def _neighborhood_vectors(x, radius):
    """(B, H, W, C) -> (B, C, radius*radius, M) stacked shifted crops."""
    B, H, W, C = x.shape
    nh, nw = H - (radius - 1), W - (radius - 1)
    vecs = []
    for dy in range(radius):
        for dx in range(radius):
            vecs.append(x[:, dy:dy + nh, dx:dx + nw, :])
    v = jnp.stack(vecs, axis=-1)                  # (B, nh, nw, C, d2)
    return v.reshape(B, nh * nw, C, radius * radius).transpose(0, 2, 3, 1)


def rmi_loss(logits, labels, num_classes=11, ignore_index=255,
             rmi_radius=3, pool_size=3, bce_weight=0.5):
    """logits (B, H, W, K); labels (B, H, W) int/float class ids.

    Returns a scalar. Matches the reference's sigmoid formulation: per-class
    one-vs-rest BCE plus the per-class MI lower bound of pooled neighborhood
    vectors.
    """
    labels = labels.astype(jnp.int32)
    valid = (labels != ignore_index)
    safe = jnp.where(valid, labels, 0)
    onehot = jax.nn.one_hot(safe, num_classes, dtype=logits.dtype)
    onehot = onehot * valid[..., None].astype(logits.dtype)
    probs = jax.nn.sigmoid(logits) * valid[..., None].astype(logits.dtype)

    # BCE part (masked, one-vs-rest like the reference forward_sigmoid)
    bce = (jnp.maximum(logits, 0) - logits * onehot
           + jnp.log1p(jnp.exp(-jnp.abs(logits))))
    bce = jnp.sum(bce * valid[..., None]) / jnp.maximum(
        jnp.sum(valid) * num_classes, 1.0)

    # average-pool both maps (pool_way 0/1 analogue)
    def pool(x):
        B, H, W, C = x.shape
        ph, pw = H // pool_size, W // pool_size
        x = x[:, :ph * pool_size, :pw * pool_size]
        x = x.reshape(B, ph, pool_size, pw, pool_size, C)
        return x.mean(axis=(2, 4))

    la = pool(onehot)
    pr = pool(probs)

    y = _neighborhood_vectors(la, rmi_radius)     # (B, C, d2, M)
    p = _neighborhood_vectors(pr, rmi_radius)
    d2 = rmi_radius * rmi_radius

    y = y - y.mean(axis=-1, keepdims=True)
    p = p - p.mean(axis=-1, keepdims=True)
    M = y.shape[-1]
    eye = jnp.eye(d2, dtype=logits.dtype)
    var_y = jnp.einsum("bcdm,bcem->bcde", y, y) / M
    var_p = jnp.einsum("bcdm,bcem->bcde", p, p) / M + 5e-4 * eye
    cov_yp = jnp.einsum("bcdm,bcem->bcde", y, p) / M

    # conditional covariance: var_y - cov_yp var_p^-1 cov_yp^T
    sol = jnp.linalg.solve(var_p, cov_yp.transpose(0, 1, 3, 2))
    cond = var_y - jnp.einsum("bcde,bcef->bcdf", cov_yp, sol)
    cond = cond + 5e-4 * eye
    sign, logdet = jnp.linalg.slogdet(cond)
    mi = 0.5 * logdet / float(d2)                 # (B, C)
    mi_term = jnp.mean(jnp.sum(mi, axis=1))

    return bce_weight * bce + (1.0 - bce_weight) * jnp.maximum(mi_term, 0.0)
