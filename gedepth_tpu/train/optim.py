"""Optimizer and LR schedule (recipe parity with the reference configs).

AdamW(lr 1e-4, betas (0.9, 0.999), wd 0.01) with zero weight decay on
LayerNorm parameters and relative-position-bias tables — the reference's
paramwise custom_keys match torch parameter names containing 'norm' /
'relative_position_bias_table' (configs/depthformer/depthformer_a.py:131-141);
note mmcv ConvModule batch norms are named 'bn' there and therefore DO decay,
which we reproduce (flax BatchNorm params live under 'BatchNorm_*', excluded
from the no-decay mask on purpose).

LR: mmcv CosineAnnealing(by_epoch=False) with linear warmup — the cosine is
evaluated over the full iteration range and *multiplied* by the warmup factor
k(t) = 1 - (1 - t/warmup_iters)(1 - warmup_ratio) during warmup.

Gradient clipping: global L2 norm 35, applied before the update
(optimizer_config grad_clip, depthformer_a.py:150).
"""
from __future__ import annotations

import jax.numpy as jnp
import numpy as np
import optax


def lr_schedule(max_lr: float, max_iters: int, warmup_iters: int,
                warmup_ratio: float = 1e-3, min_lr_ratio: float = 1e-8):
    min_lr = max_lr * min_lr_ratio

    def schedule(step):
        t = jnp.minimum(step.astype(jnp.float32), float(max_iters))
        cos = min_lr + (max_lr - min_lr) * 0.5 * (
            1.0 + jnp.cos(jnp.pi * t / float(max_iters)))
        if warmup_iters > 0:
            frac = jnp.clip(t / float(warmup_iters), 0.0, 1.0)
            k = 1.0 - (1.0 - frac) * (1.0 - warmup_ratio)
            cos = cos * k
        return cos

    return schedule


def _no_decay(path_tuple) -> bool:
    names = [getattr(p, "key", str(p)) for p in path_tuple]
    for n in names:
        if "relative_position_bias_table" in n:
            return True
        # LayerNorms are explicitly named norm*/ norm{i} in our modules.
        if n.startswith("norm"):
            return True
    return False


def decay_mask(params):
    import jax
    return jax.tree_util.tree_map_with_path(
        lambda path, _: not _no_decay(path), params)


def make_optimizer(max_lr: float, max_iters: int, warmup_iters: int,
                   warmup_ratio: float = 1e-3, min_lr_ratio: float = 1e-8,
                   weight_decay: float = 0.01, betas=(0.9, 0.999),
                   grad_clip_norm: float = 35.0):
    schedule = lr_schedule(max_lr, max_iters, warmup_iters, warmup_ratio,
                           min_lr_ratio)
    tx = optax.chain(
        optax.clip_by_global_norm(grad_clip_norm),
        optax.adamw(schedule, b1=betas[0], b2=betas[1], eps=1e-8,
                    weight_decay=weight_decay, mask=decay_mask),
    )
    return tx, schedule
