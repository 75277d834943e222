"""Depth evaluation metrics and evaluation crops.

Parity targets (reference files, verified behavior):
  * 9 metrics + masking: depth/core/evaluation/metrics.py:8-45
  * nanmean aggregation over per-image tuples: metrics.py:77-100
  * kb-crop for eval: depth/datasets/kitti.py:355-366
  * garg / eigen crops: depth/datasets/kitti.py:368-385

Two implementations:
  * numpy, per-image — bit-parity with the reference eval protocol.
  * jnp, batched + masked with fixed shapes — runs inside jit on TPU so the
    full eval loop stays on device (predictions never round-trip to host per
    image). The numpy path remains the source of truth in tests.
"""
from __future__ import annotations

from collections import OrderedDict

import numpy as np

METRIC_NAMES = (
    "a1", "a2", "a3", "abs_rel", "rmse", "log_10", "rmse_log", "silog", "sq_rel"
)


def calculate_metrics(gt: np.ndarray, pred: np.ndarray) -> tuple:
    """The 9 metrics over already-masked 1-D gt/pred arrays.

    Empty input returns a tuple of NaNs (skipped by nanmean aggregation).
    Order matches METRIC_NAMES.
    """
    if gt.shape[0] == 0:
        return tuple(np.nan for _ in METRIC_NAMES)

    thresh = np.maximum(gt / pred, pred / gt)
    a1 = (thresh < 1.25).mean()
    a2 = (thresh < 1.25 ** 2).mean()
    a3 = (thresh < 1.25 ** 3).mean()

    abs_rel = np.mean(np.abs(gt - pred) / gt)
    sq_rel = np.mean(((gt - pred) ** 2) / gt)

    rmse = np.sqrt(((gt - pred) ** 2).mean())
    rmse_log = np.sqrt(((np.log(gt) - np.log(pred)) ** 2).mean())

    err = np.log(pred) - np.log(gt)
    silog = np.sqrt(np.mean(err ** 2) - np.mean(err) ** 2) * 100
    if np.isnan(silog):
        silog = 0

    log_10 = np.abs(np.log10(gt) - np.log10(pred)).mean()
    return (a1, a2, a3, abs_rel, rmse, log_10, rmse_log, silog, sq_rel)


def masked_metrics(gt: np.ndarray,
                   pred: np.ndarray,
                   min_depth: float = 1e-3,
                   max_depth: float = 80) -> tuple:
    """Metrics over the (min_depth, max_depth) open-interval validity mask."""
    mask = np.logical_and(gt > min_depth, gt < max_depth)
    return calculate_metrics(gt[mask], pred[mask])


def aggregate_metrics(per_image_results) -> "OrderedDict[str, float]":
    """nanmean over a list of per-image metric tuples -> name->value dict."""
    columns = tuple(zip(*per_image_results))
    out = OrderedDict()
    for name, col in zip(METRIC_NAMES, columns):
        out[name] = float(np.nanmean(np.asarray(col, dtype=np.float64)))
    return out


def eval_kb_crop(depth: np.ndarray, height: int = 352, width: int = 1216) -> np.ndarray:
    """Bottom-centered KITTI benchmark crop used at eval time."""
    h, w = depth.shape[:2]
    top = int(h - height)
    left = int((w - width) / 2)
    return depth[top:top + height, left:left + width]


def garg_crop_mask(shape) -> np.ndarray:
    """Garg eval crop: rows [0.40810811H, 0.99189189H), cols [0.03594771W, 0.96405229W)."""
    h, w = shape
    m = np.zeros((h, w), dtype=bool)
    m[int(0.40810811 * h):int(0.99189189 * h),
      int(0.03594771 * w):int(0.96405229 * w)] = True
    return m


def eigen_crop_mask(shape) -> np.ndarray:
    """Eigen eval crop: rows [0.3324324H, 0.91351351H), cols [0.0359477W, 0.96405229W)."""
    h, w = shape
    m = np.zeros((h, w), dtype=bool)
    m[int(0.3324324 * h):int(0.91351351 * h),
      int(0.0359477 * w):int(0.96405229 * w)] = True
    return m


def eval_crop_mask(gt: np.ndarray,
                   min_depth: float,
                   max_depth: float,
                   garg_crop: bool = True,
                   eigen_crop: bool = False) -> np.ndarray:
    """Validity mask combining depth range with the garg/eigen eval crop.

    With neither crop enabled, only the depth-range mask applies. (The
    reference would crash in that configuration — kitti.py:372-383; we fix it.)
    """
    valid = np.logical_and(gt > min_depth, gt < max_depth)
    if garg_crop:
        valid = np.logical_and(valid, garg_crop_mask(gt.shape))
    elif eigen_crop:
        valid = np.logical_and(valid, eigen_crop_mask(gt.shape))
    return valid


# --------------------------------------------------------------------------
# Batched on-device metrics (jax). Fixed shapes, mask-weighted; suitable for
# running the whole eval accumulation under jit on TPU.
# --------------------------------------------------------------------------

def batched_masked_metrics_jax(gt, pred, valid_mask):
    """Per-image metric tuples for a batch, computed on device.

    Args:
      gt, pred: (B, H, W) float arrays. pred must be > 0 everywhere the mask
        is set (the model clamps to [min_depth, max_depth]).
      valid_mask: (B, H, W) bool — range mask AND eval-crop mask.

    Returns:
      (B, 9) float32 array ordered as METRIC_NAMES. Images with an empty mask
      yield NaN rows (matching the numpy path).

    Masked means are computed as sum(x*m)/sum(m); log terms are evaluated on a
    mask-safe input (gt/pred replaced by 1 where invalid) so no NaNs leak.
    """
    import jax.numpy as jnp

    m = valid_mask.astype(jnp.float32)
    n = jnp.sum(m, axis=(1, 2))  # (B,)
    safe_n = jnp.maximum(n, 1.0)

    def mmean(x):
        return jnp.sum(x * m, axis=(1, 2)) / safe_n

    gt_s = jnp.where(valid_mask, gt, 1.0)
    pred_s = jnp.where(valid_mask, pred, 1.0)

    thresh = jnp.maximum(gt_s / pred_s, pred_s / gt_s)
    a1 = mmean((thresh < 1.25).astype(jnp.float32))
    a2 = mmean((thresh < 1.25 ** 2).astype(jnp.float32))
    a3 = mmean((thresh < 1.25 ** 3).astype(jnp.float32))

    diff = gt_s - pred_s
    abs_rel = mmean(jnp.abs(diff) / gt_s)
    sq_rel = mmean(diff ** 2 / gt_s)
    rmse = jnp.sqrt(mmean(diff ** 2))

    log_gt = jnp.log(gt_s)
    log_pred = jnp.log(pred_s)
    rmse_log = jnp.sqrt(mmean((log_gt - log_pred) ** 2))

    err = log_pred - log_gt
    silog_var = mmean(err ** 2) - mmean(err) ** 2
    # Clamp tiny negative variance from float error; the reference maps NaN
    # silog to 0, which only occurs for n == 0 (handled by the NaN row below).
    silog = jnp.sqrt(jnp.maximum(silog_var, 0.0)) * 100

    log_10 = mmean(jnp.abs(log_gt - log_pred) / jnp.log(10.0))

    stacked = jnp.stack(
        [a1, a2, a3, abs_rel, rmse, log_10, rmse_log, silog, sq_rel], axis=-1)
    return jnp.where((n > 0)[:, None], stacked, jnp.nan)
