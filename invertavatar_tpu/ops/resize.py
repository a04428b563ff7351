"""Bilinear resize helpers matching torch F.interpolate semantics, NHWC.

The reference uses `F.interpolate(..., mode='bilinear', antialias=True)` for
every feature-pyramid rescale (e.g. triplane_v20.py:332-337) and
`antialias=False, align_corners=False` in a few places. `jax.image.resize`
with method='linear' uses the same half-pixel convention as
align_corners=False, and its `antialias=True` (default) scales the triangle
kernel on downsampling exactly like torch's antialiased path.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def resize_bilinear(x: jnp.ndarray, size, antialias: bool = True) -> jnp.ndarray:
    """Resize NHWC (or NHW1-style) images to `size=(H, W)`."""
    H, W = size
    B, _, _, C = x.shape
    out = jax.image.resize(
        x.astype(jnp.float32),
        (B, H, W, C),
        method="linear",
        antialias=antialias,
    )
    return out.astype(x.dtype)
