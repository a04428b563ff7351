"""MipNeRF-style ray marching (reference volumetric_rendering/ray_marcher.py:20-63).

Midpoint colors/densities, softplus(σ−1) density activation, alpha compositing
with cumulative-product transmittance, depth clamped to the sampled range, rgb
scaled to (−1, 1). All fp32 — this is numerically sensitive and cheap relative
to the decoder MLP.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp


def mip_ray_march(
    colors: jnp.ndarray,  # [B, R, S, C]
    densities: jnp.ndarray,  # [B, R, S, 1]
    depths: jnp.ndarray,  # [B, R, S, 1]
    white_back: bool = False,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    colors = colors.astype(jnp.float32)
    densities = densities.astype(jnp.float32)
    depths = depths.astype(jnp.float32)

    deltas = depths[:, :, 1:] - depths[:, :, :-1]
    colors_mid = (colors[:, :, :-1] + colors[:, :, 1:]) * 0.5
    densities_mid = (densities[:, :, :-1] + densities[:, :, 1:]) * 0.5
    depths_mid = (depths[:, :, :-1] + depths[:, :, 1:]) * 0.5

    # activation bias of -1 makes things initialize better (clamp_mode=softplus)
    densities_mid = jax.nn.softplus(densities_mid - 1.0)

    density_delta = densities_mid * deltas
    alpha = 1.0 - jnp.exp(-density_delta)

    alpha_shifted = jnp.concatenate(
        [jnp.ones_like(alpha[:, :, :1]), 1.0 - alpha + 1e-10], axis=-2
    )
    weights = alpha * jnp.cumprod(alpha_shifted, axis=-2)[:, :, :-1]

    composite_rgb = jnp.sum(weights * colors_mid, axis=-2)
    weight_total = jnp.sum(weights, axis=2)
    composite_depth = jnp.sum(weights * depths_mid, axis=-2) / weight_total
    composite_depth = jnp.nan_to_num(composite_depth, posinf=jnp.inf, nan=jnp.inf)
    composite_depth = jnp.clip(composite_depth, jnp.min(depths), jnp.max(depths))

    if white_back:
        composite_rgb = composite_rgb + 1.0 - weight_total

    composite_rgb = composite_rgb * 2.0 - 1.0  # scale to (-1, 1)
    return composite_rgb, composite_depth, weights
