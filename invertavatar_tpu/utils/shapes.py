"""Shape extraction helpers (reference inversion/model_utils.py:90-113 and the
eg3d `--shapes` tradition): dense voxel density sampling over the tri-plane
generator for marching-cubes export. The reference's `sample_generator_ide3d`
targets the unrelated ide3d voxel generator; this targets our `sample_mixed`.
"""

from __future__ import annotations

from typing import Callable, Optional

import numpy as np


def create_samples(N: int = 512, voxel_origin=(0, 0, 0), cube_length: float = 2.0):
    """Voxel-grid sample coordinates (model_utils.py:90-112): z fastest, then
    y, then x; returns ([1, N³, 3], origin_corner, voxel_size)."""
    origin = np.array(voxel_origin, np.float64) - cube_length / 2
    voxel_size = cube_length / (N - 1)

    idx = np.arange(N**3, dtype=np.int64)
    samples = np.zeros((N**3, 3), np.float32)
    samples[:, 2] = idx % N
    samples[:, 1] = (idx // N) % N
    samples[:, 0] = (idx // (N * N)) % N
    samples[:, 0] = samples[:, 0] * voxel_size + origin[2]
    samples[:, 1] = samples[:, 1] * voxel_size + origin[1]
    samples[:, 2] = samples[:, 2] * voxel_size + origin[0]
    return samples[None], origin, voxel_size


def sample_density_grid(
    sample_mixed_fn: Callable,  # (coords [1, M, 3], ws, mesh_condition) -> {'sigma'}
    ws,
    mesh_condition,
    voxel_resolution: int = 256,
    voxel_origin=(0, 0, 0),
    cube_length: float = 0.3,
    coordinate_scale: float = 0.9,  # model_utils.py:117 `0.9 * samples`
    max_batch: int = 100000,
) -> np.ndarray:
    """Chunked σ evaluation over the voxel grid -> [N, N, N] density volume.

    Feed the result to marching cubes (skimage/mcubes, user-side) for mesh
    export; chunking keeps peak device memory flat like the reference loop.
    """
    import jax.numpy as jnp

    samples, _, _ = create_samples(voxel_resolution, voxel_origin, cube_length)
    samples = samples * coordinate_scale
    M = samples.shape[1]
    # pad to a whole number of max_batch chunks so every device call shares
    # one compiled shape
    n_chunks = -(-M // max_batch)
    pad = n_chunks * max_batch - M
    coords = np.pad(samples[0], ((0, pad), (0, 0)))
    sigmas = []
    for i in range(n_chunks):
        chunk = jnp.asarray(coords[i * max_batch : (i + 1) * max_batch])[None]
        out = sample_mixed_fn(chunk, ws, mesh_condition)
        sigmas.append(np.asarray(out["sigma"]).reshape(-1))
    vol = np.concatenate(sigmas)[:M]
    return vol.reshape(voxel_resolution, voxel_resolution, voxel_resolution)
