"""Feature -> RGB colormaps.

Reference spec: nerfstudio-0.3.3/nerfstudio/utils/colormaps.py:212-234
(apply_feature_colormap: 64-d DINO feature -> RGB via a stored PCA
reduction with per-channel min/max normalization).
"""

from __future__ import annotations

from typing import Dict

import jax.numpy as jnp
import numpy as np


def apply_feature_colormap(features, dino_to_rgb: Dict):
    """features (..., D) -> rgb (..., 3) in [0, 1]. Works for jnp or np."""
    xp = jnp if isinstance(features, jnp.ndarray) else np
    red = xp.asarray(np.asarray(dino_to_rgb["reduction_matrix"], np.float32))
    rgb_min = xp.asarray(np.asarray(dino_to_rgb["rgb_min"], np.float32))
    rgb_max = xp.asarray(np.asarray(dino_to_rgb["rgb_max"], np.float32))
    mean = xp.asarray(np.asarray(dino_to_rgb["mean"], np.float32))

    img = (features.astype(red.dtype) - mean) @ red
    img = (img - rgb_min) / (rgb_max - rgb_min)
    return xp.clip(img, 0.0, 1.0)
