"""Gaussian patch-importance map (reference evaluate_amos.py:184-197).

Computed once per tile shape on the host with scipy (static data baked into
the jit'd blend), sigma = tile/8, normalized to max 1, zeros replaced by the
smallest positive value.
"""

from __future__ import annotations

import numpy as np
from scipy.ndimage import gaussian_filter


def gaussian_importance_map(patch_size, sigma_scale: float = 1.0 / 8) -> np.ndarray:
    tmp = np.zeros(patch_size)
    center = [i // 2 for i in patch_size]
    sigmas = [i * sigma_scale for i in patch_size]
    tmp[tuple(center)] = 1
    g = gaussian_filter(tmp, sigmas, 0, mode="constant", cval=0)
    g = (g / np.max(g)).astype(np.float32)
    g[g == 0] = np.min(g[g != 0])
    return g
