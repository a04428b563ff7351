"""Camera pose sampling + intrinsics (reference camera_utils.py:22-149).

OpenCV camera convention, y-up look-at; intrinsics normalized by image size.
Samplers are pure functions taking an explicit PRNG key.
"""

from __future__ import annotations

import math
from typing import Optional

import jax
import jax.numpy as jnp


def normalize_vecs(v: jnp.ndarray) -> jnp.ndarray:
    return v / jnp.linalg.norm(v, axis=-1, keepdims=True)


def create_cam2world_matrix(forward_vector: jnp.ndarray, origin: jnp.ndarray) -> jnp.ndarray:
    """[B,3] forward + [B,3] origin -> [B,4,4] cam2world (camera_utils.py:118-137)."""
    forward_vector = normalize_vecs(forward_vector)
    B = forward_vector.shape[0]
    up = jnp.broadcast_to(jnp.array([0.0, 1.0, 0.0]), forward_vector.shape)
    right = -normalize_vecs(jnp.cross(up, forward_vector))
    up = normalize_vecs(jnp.cross(forward_vector, right))

    rotation = jnp.tile(jnp.eye(4)[None], (B, 1, 1))
    rotation = rotation.at[:, :3, :3].set(jnp.stack([right, up, forward_vector], axis=-1))
    translation = jnp.tile(jnp.eye(4)[None], (B, 1, 1))
    translation = translation.at[:, :3, 3].set(origin)
    return translation @ rotation


def _spherical_origin(h, v, radius):
    theta = h
    v = v / math.pi
    phi = jnp.arccos(1 - 2 * v)
    x = radius * jnp.sin(phi) * jnp.cos(math.pi - theta)
    z = radius * jnp.sin(phi) * jnp.sin(math.pi - theta)
    y = radius * jnp.cos(phi)
    return jnp.concatenate([x, y, z], axis=-1)


def gaussian_camera_pose(
    rng: Optional[jax.Array],
    horizontal_mean: float,
    vertical_mean: float,
    horizontal_stddev: float = 0.0,
    vertical_stddev: float = 0.0,
    radius: float = 1.0,
    batch_size: int = 1,
) -> jnp.ndarray:
    """GaussianCameraPoseSampler.sample (camera_utils.py:22-55)."""
    if rng is None or (horizontal_stddev == 0 and vertical_stddev == 0):
        h = jnp.full((batch_size, 1), horizontal_mean)
        v = jnp.full((batch_size, 1), vertical_mean)
    else:
        kh, kv = jax.random.split(rng)
        h = jax.random.normal(kh, (batch_size, 1)) * horizontal_stddev + horizontal_mean
        v = jax.random.normal(kv, (batch_size, 1)) * vertical_stddev + vertical_mean
    v = jnp.clip(v, 1e-5, math.pi - 1e-5)
    origins = _spherical_origin(h, v, radius)
    return create_cam2world_matrix(normalize_vecs(-origins), origins)


def lookat_camera_pose(
    rng: Optional[jax.Array],
    horizontal_mean: float,
    vertical_mean: float,
    lookat_position: jnp.ndarray,
    horizontal_stddev: float = 0.0,
    vertical_stddev: float = 0.0,
    radius: float = 1.0,
    batch_size: int = 1,
) -> jnp.ndarray:
    """LookAtPoseSampler.sample (camera_utils.py:58-85)."""
    if rng is None or (horizontal_stddev == 0 and vertical_stddev == 0):
        h = jnp.full((batch_size, 1), horizontal_mean)
        v = jnp.full((batch_size, 1), vertical_mean)
    else:
        kh, kv = jax.random.split(rng)
        h = jax.random.normal(kh, (batch_size, 1)) * horizontal_stddev + horizontal_mean
        v = jax.random.normal(kv, (batch_size, 1)) * vertical_stddev + vertical_mean
    v = jnp.clip(v, 1e-5, math.pi - 1e-5)
    origins = _spherical_origin(h, v, radius)
    forward = normalize_vecs(lookat_position[None] - origins)
    return create_cam2world_matrix(forward, origins)


def uniform_camera_pose(
    rng: jax.Array,
    horizontal_mean: float,
    vertical_mean: float,
    horizontal_stddev: float = 0.0,
    vertical_stddev: float = 0.0,
    radius: float = 1.0,
    batch_size: int = 1,
) -> jnp.ndarray:
    """UniformCameraPoseSampler.sample (camera_utils.py:88-115)."""
    kh, kv = jax.random.split(rng)
    h = (jax.random.uniform(kh, (batch_size, 1)) * 2 - 1) * horizontal_stddev + horizontal_mean
    v = (jax.random.uniform(kv, (batch_size, 1)) * 2 - 1) * vertical_stddev + vertical_mean
    v = jnp.clip(v, 1e-5, math.pi - 1e-5)
    origins = _spherical_origin(h, v, radius)
    return create_cam2world_matrix(normalize_vecs(-origins), origins)


def fov_to_intrinsics(fov_degrees: float) -> jnp.ndarray:
    """Normalized 3×3 intrinsics from FOV (camera_utils.py:140-149)."""
    focal_length = float(1 / (math.tan(fov_degrees * 3.14159 / 360) * 1.414))
    return jnp.array([[focal_length, 0, 0.5], [0, focal_length, 0.5], [0, 0, 1]], jnp.float32)
