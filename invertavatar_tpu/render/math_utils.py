"""Ray/box helpers (reference volumetric_rendering/math_utils.py)."""

from __future__ import annotations

import jax.numpy as jnp


def normalize_vecs(v: jnp.ndarray, eps: float = 1e-12) -> jnp.ndarray:
    """math_utils.py:17-21."""
    return v / jnp.maximum(jnp.linalg.norm(v, axis=-1, keepdims=True), eps)


def get_ray_limits_box(rays_o: jnp.ndarray, rays_d: jnp.ndarray, box_side_length: float):
    """Slab-test ray/box intersection (math_utils.py:46-98): entry/exit
    distances with the [-box/2, box/2]³ cube; invalid rays get (-1, -2)."""
    shape = rays_o.shape
    o = rays_o.reshape(-1, 3)
    d = rays_d.reshape(-1, 3)
    half = box_side_length / 2.0

    invdir = 1.0 / d
    # per-axis near/far planes depending on ray direction sign
    t_lo = (-half - o) * invdir
    t_hi = (half - o) * invdir
    tmin_ax = jnp.minimum(t_lo, t_hi)  # [M, 3]
    tmax_ax = jnp.maximum(t_lo, t_hi)

    tmin_xy = jnp.maximum(tmin_ax[:, 0], tmin_ax[:, 1])
    tmax_xy = jnp.minimum(tmax_ax[:, 0], tmax_ax[:, 1])
    valid = ~((tmin_ax[:, 0] > tmax_ax[:, 1]) | (tmin_ax[:, 1] > tmax_ax[:, 0]))
    valid &= ~((tmin_xy > tmax_ax[:, 2]) | (tmin_ax[:, 2] > tmax_xy))
    tmin = jnp.maximum(tmin_xy, tmin_ax[:, 2])
    tmax = jnp.minimum(tmax_xy, tmax_ax[:, 2])

    tmin = jnp.where(valid, tmin, -1.0)
    tmax = jnp.where(valid, tmax, -2.0)
    return tmin.reshape(*shape[:-1], 1), tmax.reshape(*shape[:-1], 1)


def linspace_batch(start: jnp.ndarray, stop: jnp.ndarray, num: int) -> jnp.ndarray:
    """Broadcast linspace along a new leading axis (math_utils.py:101-118)."""
    steps = jnp.arange(num, dtype=jnp.float32) / (num - 1)
    return start[None] + steps.reshape(-1, *([1] * start.ndim)) * (stop - start)[None]
