"""Fast tri-plane sampling paths: exactness vs the naive grid_sample."""

import pytest
import numpy as np
import jax.numpy as jnp

from invertavatar_tpu.ops.grid_sample import grid_sample
from invertavatar_tpu.ops.plane_sample import (
    grid_sample_patch,
    pad_planes_for_patch,
    sample_planes_coarse_windowed,
)

pytestmark = pytest.mark.smoke


def test_patch_gather_matches_grid_sample():
    rng = np.random.RandomState(0)
    planes = jnp.asarray(rng.randn(3, 32, 32, 8).astype(np.float32))
    grid = jnp.asarray(((rng.rand(3, 500, 2) * 2.4) - 1.2).astype(np.float32))  # incl OOB
    ref = grid_sample(planes, grid)
    out = grid_sample_patch(pad_planes_for_patch(planes, channel_pad=16), grid, out_channels=8)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-5)


def test_windowed_coarse_matches_grid_sample():
    # production-like geometry: a tile's plane footprint (tile/res fraction of
    # the span + per-stratum jitter) must fit the window — here ≈12px << 32.
    rng = np.random.RandomState(1)
    N, H, C = 3, 64, 8
    res, S, tile = 64, 6, 8
    planes = jnp.asarray(rng.randn(N, H, H, C).astype(np.float32))

    ys, xs = np.mgrid[0:res, 0:res].astype(np.float32) / res
    base = np.stack([xs * 2 - 1, ys * 2 - 1], -1).reshape(res * res, 2)
    offs = (rng.rand(res * res, S, 2) - 0.5) * 0.08
    grid_np = np.clip(base[:, None, :] * 1.1 + offs, -1.15, 1.15).astype(np.float32)
    grid = jnp.asarray(np.broadcast_to(grid_np[None], (N, res * res, S, 2)).copy())

    ref = grid_sample(planes, grid.reshape(N, -1, 2)).reshape(N, res * res, S, C)
    out = sample_planes_coarse_windowed(planes, grid, res=res, tile=tile, window=32, s_chunk=4)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-4)
