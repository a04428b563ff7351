"""Visualization utilities (training-loop image snapshots + condition vis).

Counterparts of the reference's tick-time artifacts: `reals.png` / `fakes.png`
grids (training_loop.py:460-472) and `visualize_mesh_condition`
(triplane_v20.py:71-87).
"""

from __future__ import annotations

from typing import List, Optional, Tuple

import numpy as np
import PIL.Image


def save_image_grid(images: np.ndarray, path: str, drange=(-1, 1), grid_wh: Optional[Tuple[int, int]] = None):
    """[N, H, W, C] floats -> tiled PNG (reference training_loop.py:107-125 idiom)."""
    lo, hi = drange
    imgs = np.clip((np.asarray(images, np.float32) - lo) * (255 / (hi - lo)), 0, 255).astype(np.uint8)
    N, H, W, C = imgs.shape
    if grid_wh is None:
        gw = int(np.ceil(np.sqrt(N)))
        gh = int(np.ceil(N / gw))
    else:
        gw, gh = grid_wh
    grid = np.zeros((gh * H, gw * W, C), np.uint8)
    for i in range(min(N, gw * gh)):
        r, c = divmod(i, gw)
        grid[r * H : (r + 1) * H, c * W : (c + 1) * W] = imgs[i]
    if C == 1:
        grid = grid[..., 0]
    PIL.Image.fromarray(grid).save(path)


def visualize_mesh_condition(uvcoords_image: np.ndarray, fill_alpha: Optional[np.ndarray] = None) -> np.ndarray:
    """uvcoords_image [B, H, W, 3] -> uint8 visualization (triplane_v20.py:71-87):
    uv channels mapped to RGB, masked region set to black."""
    vis = np.asarray(uvcoords_image, np.float32).copy()
    mask = vis[..., 2:3] if fill_alpha is None else fill_alpha
    vis = np.where(mask > 0, vis, -1.0)
    return np.clip((vis + 1) * 127.5, 0, 255).astype(np.uint8)


def sample_cross_section(sample_mixed_fn, ws, mesh_condition, resolution: int = 256, w: float = 1.2):
    """Density cross-section through the x=0 plane for shape snapshots
    (reference training/crosssection_utils.py:13-23)."""
    import jax.numpy as jnp

    a = jnp.linspace(w / 2, -w / 2, resolution)
    b = jnp.linspace(-w / 2, w / 2, resolution)
    A, B = jnp.meshgrid(a, b, indexing="ij")
    coords = jnp.stack([jnp.zeros_like(A), A, B], axis=-1).reshape(1, -1, 3)
    coords = jnp.broadcast_to(coords, (ws.shape[0], coords.shape[1], 3))
    sigma = sample_mixed_fn(coords, ws, mesh_condition)["sigma"]
    return np.asarray(sigma).reshape(-1, resolution, resolution, 1)
