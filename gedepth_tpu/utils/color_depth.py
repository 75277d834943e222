"""Depth colorization for dumps/tensorboard (reference
depth/utils/color_depth.py behavior: normalized colormap render)."""
from __future__ import annotations

import numpy as np


def colorize_depth(depth: np.ndarray, vmin=None, vmax=None,
                   cmap: str = "magma_r") -> np.ndarray:
    """(H, W) depth -> (H, W, 3) uint8 colormap render."""
    import matplotlib
    import matplotlib.cm

    d = np.asarray(depth, dtype=np.float32)
    vmin = np.nanmin(d) if vmin is None else vmin
    vmax = np.nanmax(d) if vmax is None else vmax
    if vmax - vmin < 1e-10:
        vmax = vmin + 1e-10
    norm = np.clip((d - vmin) / (vmax - vmin), 0, 1)
    mapper = matplotlib.cm.get_cmap(cmap) if hasattr(
        matplotlib.cm, "get_cmap") else matplotlib.colormaps[cmap]
    rgba = mapper(norm)
    return (rgba[..., :3] * 255).astype(np.uint8)
