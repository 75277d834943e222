"""Ground-mask IoU evaluation machinery (reference depth/datasets/kitti.py
mask-PE evaluators, :27-98 and :387-461 — off by default there via
mask_pe=False; provided here as standalone utilities).

Measures how well a predicted ground mask matches the "PE agrees with
lidar" ground truth, per image and aggregated, with the reference's
>=60 / >=75 IoU bucket counting.
"""
from __future__ import annotations

import numpy as np


def mask_iou(pred_mask: np.ndarray, gt_mask: np.ndarray,
             eps: float = 1e-9) -> float:
    """Binary IoU in percent."""
    pred = np.asarray(pred_mask) > 0.5
    gt = np.asarray(gt_mask) > 0.5
    inter = np.logical_and(pred, gt).sum()
    union = np.logical_or(pred, gt).sum()
    return float(100.0 * inter / (union + eps))


class MaskIoUAccumulator:
    """Tracks per-image ground-mask IoU + the reference's bucket stats."""

    def __init__(self):
        self.ious = []

    def add(self, pred_mask, gt_mask):
        self.ious.append(mask_iou(pred_mask, gt_mask))

    def summary(self) -> dict:
        ious = np.asarray(self.ious, dtype=np.float64)
        if ious.size == 0:
            return {"miou": float("nan"), "n": 0,
                    "frac_over_60": float("nan"),
                    "frac_over_75": float("nan")}
        return {
            "miou": float(ious.mean()),
            "n": int(ious.size),
            "frac_over_60": float((ious >= 60).mean()),
            "frac_over_75": float((ious >= 75).mean()),
        }


def pe_ground_truth_mask(pe: np.ndarray, gt_depth: np.ndarray,
                         rel_tol: float = 0.05) -> np.ndarray:
    """Reference maskpe_eval GT: PE within rel_tol of lidar, gt>0
    (kitti.py:387-412 uses 0.05)."""
    err = np.divide(np.abs(pe - gt_depth), gt_depth,
                    out=np.zeros_like(gt_depth), where=gt_depth != 0)
    return np.logical_and(err <= rel_tol, gt_depth > 0)
