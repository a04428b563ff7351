"""Camera-ray generation.

Counterpart of reference `RaySampler_zxc` (volumetric_rendering/ray_sampler.py:65-107):
pixel-index homogeneous coordinates through K⁻¹ (intrinsics scaled by the render
resolution), rotated into world space by cam2world, normalized. The reference
loops over the batch in python; here it is fully batched (einsum on the MXU).
"""

from __future__ import annotations

from typing import Tuple

import jax.numpy as jnp


def sample_rays(
    cam2world: jnp.ndarray,  # [N, 4, 4]
    intrinsics: jnp.ndarray,  # [N, 3, 3] normalized (focal/principal in units of image size)
    resolution: int,
    normalize: bool = True,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Returns (ray_origins [N, R², 3], ray_dirs [N, R², 3]); pixel order row-major."""
    N = cam2world.shape[0]
    K = intrinsics.astype(jnp.float32)
    K = K.at[:, :2].multiply(resolution)
    K_inv = jnp.linalg.inv(K)

    # Reference builds meshgrid(linspace, linspace).t(): homo = (x_idx, y_idx, 1)
    # with x varying fastest along the row (W axis).
    xs = jnp.arange(resolution, dtype=jnp.float32)
    ys = jnp.arange(resolution, dtype=jnp.float32)
    xg, yg = jnp.meshgrid(xs, ys, indexing="xy")  # [H, W]
    homo = jnp.stack([xg, yg, jnp.ones_like(xg)], axis=-1).reshape(-1, 3)  # [R², 3]

    dirs_cam = jnp.einsum("nij,mj->nmi", K_inv, homo)  # [N, R², 3]
    rays_d = jnp.einsum("nij,nmj->nmi", cam2world[:, :3, :3].astype(jnp.float32), dirs_cam)
    if normalize:
        rays_d = rays_d / jnp.linalg.norm(rays_d, axis=-1, keepdims=True)
    rays_o = jnp.broadcast_to(cam2world[:, None, :3, 3].astype(jnp.float32), rays_d.shape)
    return rays_o, rays_d
