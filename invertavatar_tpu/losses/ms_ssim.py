"""Multi-scale SSIM (reference encoder_inversion/criteria/ms_ssim.py semantics).

Standard Wang et al. MS-SSIM: per-scale SSIM/contrast-structure with an 11-tap
Gaussian window, 2× average-pool between scales, weights
[0.0448, 0.2856, 0.3001, 0.2363, 0.1333]. NHWC, inputs in [0, 1] by default
(`val_range` configurable). Listed in the reference criteria inventory
(SURVEY §2.2) though unused by shipped configs.
"""

from __future__ import annotations

from typing import Sequence

import jax
import jax.numpy as jnp
import numpy as np

_MSSSIM_WEIGHTS = (0.0448, 0.2856, 0.3001, 0.2363, 0.1333)


def _gaussian_window(size: int = 11, sigma: float = 1.5) -> jnp.ndarray:
    xs = np.arange(size) - size // 2
    g = np.exp(-(xs**2) / (2 * sigma**2))
    g /= g.sum()
    return jnp.asarray(g, jnp.float32)


def _blur(x: jnp.ndarray, win: jnp.ndarray) -> jnp.ndarray:
    C = x.shape[-1]
    k = win.shape[0]
    precision = jax.lax.Precision.HIGHEST
    kx = jnp.tile(win[None, :, None, None], (1, 1, 1, C))
    ky = jnp.tile(win[:, None, None, None], (1, 1, 1, C))
    x = jax.lax.conv_general_dilated(
        x, kx, (1, 1), "VALID", dimension_numbers=("NHWC", "HWIO", "NHWC"),
        feature_group_count=C, precision=precision,
    )
    return jax.lax.conv_general_dilated(
        x, ky, (1, 1), "VALID", dimension_numbers=("NHWC", "HWIO", "NHWC"),
        feature_group_count=C, precision=precision,
    )


def ssim(x: jnp.ndarray, y: jnp.ndarray, val_range: float = 1.0,
         win_size: int = 11, sigma: float = 1.5):
    """Returns (mean SSIM, mean contrast-structure)."""
    win = _gaussian_window(win_size, sigma)
    C1 = (0.01 * val_range) ** 2
    C2 = (0.03 * val_range) ** 2
    mu_x = _blur(x, win)
    mu_y = _blur(y, win)
    sxx = _blur(x * x, win) - mu_x * mu_x
    syy = _blur(y * y, win) - mu_y * mu_y
    sxy = _blur(x * y, win) - mu_x * mu_y
    cs = (2 * sxy + C2) / (sxx + syy + C2)
    s = ((2 * mu_x * mu_y + C1) / (mu_x**2 + mu_y**2 + C1)) * cs
    return jnp.mean(s), jnp.mean(cs)


def ms_ssim(x: jnp.ndarray, y: jnp.ndarray, val_range: float = 1.0,
            weights: Sequence[float] = _MSSSIM_WEIGHTS) -> jnp.ndarray:
    """MS-SSIM over `len(weights)` scales; inputs NHWC."""
    levels = len(weights)
    vals = []
    for i in range(levels):
        s, cs = ssim(x, y, val_range)
        vals.append(s if i == levels - 1 else cs)
        if i < levels - 1:
            x = jax.lax.reduce_window(x, 0.0, jax.lax.add, (1, 2, 2, 1), (1, 2, 2, 1), "VALID") / 4
            y = jax.lax.reduce_window(y, 0.0, jax.lax.add, (1, 2, 2, 1), (1, 2, 2, 1), "VALID") / 4
    vals = jnp.stack([jnp.maximum(v, 0.0) for v in vals])
    w = jnp.asarray(weights)
    return jnp.prod(vals ** w)


def ms_ssim_loss(x, y, val_range: float = 1.0):
    return 1.0 - ms_ssim(x, y, val_range)
