"""Synthetic FaceVerse assets at the real topology scale.

The published model dict (faceverse_v3_1.npy, data_preprocess/FaceVerse/v3/)
is not available in this zero-egress image; benches and fidelity harnesses
that need the online-driving raster build assets with the real vertex/face
counts (~15.4k verts / ~30.3k tris at the default n_grid — SURVEY.md §2.1:
"~30k tris, 512² ortho") so the raster cost and the uvcoords_image structure
are representative. Coefficient *semantics* (dims, split order) follow
FaceVerseModel_v3.py:139.
"""

from __future__ import annotations

import numpy as np

from .manager import FaceverseManager
from .model import FaceVerseAssets

ID_D, EXP_D, TEX_D = 150, 52, 251
COEFF_DIM = ID_D + EXP_D + TEX_D + 38  # + rot/gamma/trans/eye tail


def synthetic_assets(n_grid: int = 124, seed: int = 0) -> FaceVerseAssets:
    """Grid-triangulated face disc with random blendshape bases."""
    rng = np.random.RandomState(seed)
    us, vs = np.meshgrid(np.linspace(0.05, 0.95, n_grid), np.linspace(0.05, 0.95, n_grid))
    uv = np.stack([us.ravel(), vs.ravel()], -1).astype(np.float32)
    V = uv.shape[0]
    xy = (uv - 0.5) * 0.5
    z = 0.15 - ((uv - 0.5) ** 2).sum(-1) * 0.4
    meanshape = np.stack([xy[:, 0], xy[:, 1], z], -1).reshape(1, -1).astype(np.float32)
    faces = []
    for r in range(n_grid - 1):
        for c in range(n_grid - 1):
            a = r * n_grid + c
            faces.append([a, a + 1, a + n_grid])
            faces.append([a + 1, a + n_grid + 1, a + n_grid])
    tri = np.asarray(faces, np.int32)
    return FaceVerseAssets(
        meanshape=meanshape,
        id_base=(rng.randn(3 * V, ID_D) * 1e-3).astype(np.float32),
        exp_base=(rng.randn(3 * V, EXP_D) * 2e-3).astype(np.float32),
        uv_per_ver=uv,
        tri=tri,
        ver_inds=(0, 8, 16),
        id_dims=ID_D,
        exp_dims=EXP_D,
        tex_dims=TEX_D,
    )


def synthetic_manager(n_grid: int = 124, seed: int = 0):
    """(FaceverseManager with identity set, drive-coeff bank [8, COEFF_DIM])."""
    rng = np.random.RandomState(seed)
    assets = synthetic_assets(n_grid, seed)
    fv2fl = np.eye(4, dtype=np.float32) * 0.6
    fv2fl[3, 3] = 1.0
    V = assets.uv_per_ver.shape[0]
    mgr = FaceverseManager(assets, fv2fl=fv2fl, face_mask=np.ones(V, np.float32))
    coeffs = (rng.randn(8, COEFF_DIM) * 0.1).astype(np.float32)
    mgr.set_identity(coeffs[0])
    return mgr, coeffs


def coeff_trajectory(n_frames: int, seed: int = 3) -> np.ndarray:
    """Smooth sinusoidal drive-coefficient trajectory [n_frames, COEFF_DIM]
    (expression + eye channels animated, identity/texture held) — a realistic
    stand-in for a fitted coefficient sequence driving the reenact loop."""
    rng = np.random.RandomState(seed)
    base = (rng.randn(COEFF_DIM) * 0.1).astype(np.float32)
    amp = np.zeros(COEFF_DIM, np.float32)
    amp[ID_D:ID_D + EXP_D] = rng.rand(EXP_D) * 0.6  # expression sweep
    amp[-4:] = 0.2  # eye coeffs
    phase = rng.rand(COEFF_DIM) * 2 * np.pi
    freq = 0.3 + rng.rand(COEFF_DIM) * 0.8
    t = np.arange(n_frames, dtype=np.float32)[:, None]
    return base[None] + amp[None] * np.sin(freq[None] * t + phase[None])
