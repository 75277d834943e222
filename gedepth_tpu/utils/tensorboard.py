"""TensorBoard logging (reference TextLoggerHook + TensorboardImageLoggerHook
roles, depth/models/utils/hooks/tensorboard_hook.py:10-63): scalar tags every
log interval plus rgb/pred/gt image triptychs at eval points."""
from __future__ import annotations

from typing import Optional

import numpy as np


class TensorboardLogger:
    """Thin tf.summary wrapper; silently no-ops if tensorflow is absent."""

    def __init__(self, log_dir: str):
        try:
            import tensorflow as tf
            self._tf = tf
            self._writer = tf.summary.create_file_writer(log_dir)
        except Exception:
            self._tf = None
            self._writer = None

    @property
    def active(self):
        return self._writer is not None

    def scalars(self, step: int, values: dict, prefix: str = ""):
        if not self.active:
            return
        with self._writer.as_default():
            for k, v in values.items():
                if isinstance(v, (int, float, np.floating, np.integer)):
                    self._tf.summary.scalar(prefix + k, float(v), step=step)
            self._writer.flush()

    def depth_triptych(self, step: int, rgb: np.ndarray, pred: np.ndarray,
                       gt: Optional[np.ndarray] = None, tag: str = "val"):
        """Log rgb / colorized pred / colorized gt images."""
        if not self.active:
            return
        from gedepth_tpu.utils.color_depth import colorize_depth

        with self._writer.as_default():
            rgb_u8 = np.clip(rgb, 0, 255).astype(np.uint8)
            self._tf.summary.image(f"{tag}/rgb", rgb_u8[None], step=step)
            self._tf.summary.image(f"{tag}/pred",
                                   colorize_depth(pred)[None], step=step)
            if gt is not None:
                self._tf.summary.image(f"{tag}/gt",
                                       colorize_depth(gt)[None], step=step)
            self._writer.flush()
