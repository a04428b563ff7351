"""Parity: volume-rendering stack vs the PyTorch reference components."""

import os
import sys
import types

import numpy as np
import pytest

REF = "/root/reference"
pytestmark = pytest.mark.skipif(not os.path.isdir(REF), reason="reference repo not mounted")

if os.path.isdir(REF) and REF not in sys.path:
    sys.path.insert(0, REF)

import torch  # noqa: E402
import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from invertavatar_tpu.render.mouth import fill_mouth  # noqa: E402
from invertavatar_tpu.render.ray_marcher import mip_ray_march  # noqa: E402
from invertavatar_tpu.render.ray_sampler import sample_rays  # noqa: E402
from invertavatar_tpu.render.renderer import (  # noqa: E402
    ImportanceRenderer,
    sample_from_planes,
    sample_pdf,
)


def test_sample_from_planes_parity():
    from training_avatar_texture.volumetric_rendering import renderer as ref_r

    rng = np.random.RandomState(0)
    planes = rng.randn(2, 3, 8, 16, 16).astype(np.float32)  # [B,3,C,H,W] torch layout
    coords = (rng.rand(2, 33, 3).astype(np.float32) - 0.5) * 0.9

    plane_axes = ref_r.generate_planes()
    with torch.no_grad():
        ref = ref_r.sample_from_planes(
            plane_axes, torch.tensor(planes), torch.tensor(coords), box_warp=1.0
        ).numpy()  # [B, 3, M, C]

    planes_nhwc = jnp.asarray(np.transpose(planes, (0, 1, 3, 4, 2)))
    out = sample_from_planes(planes_nhwc, jnp.asarray(coords), box_warp=1.0)
    np.testing.assert_allclose(np.asarray(out), ref, atol=1e-5)


def test_ray_marcher_parity():
    from training_avatar_texture.volumetric_rendering.ray_marcher import MipRayMarcher2

    rng = np.random.RandomState(1)
    B, R, S, C = 2, 7, 12, 5
    colors = rng.rand(B, R, S, C).astype(np.float32)
    densities = rng.randn(B, R, S, 1).astype(np.float32)
    depths = np.sort(rng.rand(B, R, S, 1).astype(np.float32) + 2.0, axis=2)
    opts = {"clamp_mode": "softplus"}
    with torch.no_grad():
        rgb_ref, depth_ref, w_ref = MipRayMarcher2()(
            torch.tensor(colors), torch.tensor(densities), torch.tensor(depths), opts
        )
    rgb, depth, w = mip_ray_march(jnp.asarray(colors), jnp.asarray(densities), jnp.asarray(depths))
    np.testing.assert_allclose(np.asarray(rgb), rgb_ref.numpy(), atol=1e-5)
    np.testing.assert_allclose(np.asarray(depth), depth_ref.numpy(), atol=1e-5)
    np.testing.assert_allclose(np.asarray(w), w_ref.numpy(), atol=1e-5)


def test_ray_sampler_parity():
    from training_avatar_texture.volumetric_rendering.ray_sampler import RaySampler_zxc

    rng = np.random.RandomState(2)
    from invertavatar_tpu.camera import fov_to_intrinsics, lookat_camera_pose

    c2w = np.asarray(
        lookat_camera_pose(None, 3.14 / 2 + 0.2, 3.14 / 2 - 0.1, jnp.array([0.0, 0.0, 0.2]), radius=2.7, batch_size=2)
    ).astype(np.float32)
    K = np.tile(np.asarray(fov_to_intrinsics(18.837))[None], (2, 1, 1)).astype(np.float32)
    with torch.no_grad():
        ro_ref, rd_ref = RaySampler_zxc()(torch.tensor(c2w), torch.tensor(K), 16)
    ro, rd = sample_rays(jnp.asarray(c2w), jnp.asarray(K), 16)
    np.testing.assert_allclose(np.asarray(ro), ro_ref.numpy(), atol=1e-5)
    np.testing.assert_allclose(np.asarray(rd), rd_ref.numpy(), atol=1e-5)


def test_sample_pdf_parity():
    from training_avatar_texture.volumetric_rendering.renderer import ImportanceRenderer_bsMotion

    rng = np.random.RandomState(3)
    R, S = 9, 21
    bins = np.sort(rng.rand(R, S).astype(np.float32) + 2.0, axis=1)
    weights = rng.rand(R, S - 2).astype(np.float32) ** 2
    n_imp = 8
    ref_obj = ImportanceRenderer_bsMotion()
    with torch.no_grad():
        ref = ref_obj.sample_pdf(torch.tensor(bins), torch.tensor(weights), n_imp, det=True).numpy()
    u = np.broadcast_to(np.linspace(0, 1, n_imp, dtype=np.float32), (R, n_imp))
    out = sample_pdf(jnp.asarray(bins), jnp.asarray(weights), n_imp, jnp.asarray(u))
    np.testing.assert_allclose(np.asarray(out), ref, atol=1e-5)


def _make_mask(batch=2, res=128):
    """Face-like alpha with an enclosed mouth hole."""
    yy, xx = np.mgrid[0:res, 0:res].astype(np.float32) / res
    face = (((xx - 0.5) / 0.32) ** 2 + ((yy - 0.5) / 0.42) ** 2) < 1.0
    mouth = (((xx - 0.5) / 0.12) ** 2 + ((yy - 0.68) / 0.05) ** 2) < 1.0
    alpha = face & ~mouth
    return np.tile(alpha[None, :, :, None].astype(np.float32), (batch, 1, 1, 1))


def test_fill_mouth_matches_cv2_floodfill():
    from training_avatar_texture.volumetric_rendering.renderer import fill_mouth as ref_fill

    alpha = _make_mask()
    with torch.no_grad():
        filled_ref, mouth_ref = ref_fill(
            torch.tensor(np.transpose(alpha, (0, 3, 1, 2))), blur_mouth_edge=False
        )
    filled, mouth = fill_mouth(jnp.asarray(alpha))
    np.testing.assert_allclose(
        np.transpose(np.asarray(filled), (0, 3, 1, 2)), filled_ref.numpy(), atol=1e-5
    )
    np.testing.assert_allclose(
        np.transpose(np.asarray(mouth), (0, 3, 1, 2)), mouth_ref.numpy(), atol=1e-5
    )


def test_importance_renderer_parity(monkeypatch):
    """Full two-pass renderer vs ImportanceRenderer_bsMotion with a fixed linear
    decoder on both sides; stratified jitter pinned to 0.5 via monkeypatch."""
    from training_avatar_texture.volumetric_rendering.renderer import ImportanceRenderer_bsMotion

    rng = np.random.RandomState(4)
    B, C = 1, 8
    planes = rng.randn(B, 3, C, 16, 16).astype(np.float32)
    W_dec = rng.randn(C, 6).astype(np.float32) * 0.5  # -> sigma + 5 color ch

    # rays looking at origin from distance ~2.7
    from invertavatar_tpu.camera import fov_to_intrinsics, lookat_camera_pose

    c2w = np.asarray(lookat_camera_pose(None, 3.14 / 2, 3.14 / 2, jnp.zeros(3), radius=2.7, batch_size=B))
    K = np.tile(np.asarray(fov_to_intrinsics(18.837))[None], (B, 1, 1))
    ro, rd = sample_rays(jnp.asarray(c2w, jnp.float32), jnp.asarray(K, jnp.float32), 8)
    ro_np, rd_np = np.asarray(ro), np.asarray(rd)

    opts = {
        "depth_resolution": 12,
        "depth_resolution_importance": 12,
        "box_warp": 1.0,
        "clamp_mode": "softplus",
        "disparity_space_sampling": False,
        "det_stratified": True,
    }

    class TorchDecoder(torch.nn.Module):
        def forward(self, feats, dirs):
            x = feats.mean(1) @ torch.tensor(W_dec)
            return {"sigma": x[..., :1], "rgb": torch.sigmoid(x[..., 1:])}

    monkeypatch.setattr(torch, "rand_like", lambda t: torch.full_like(t, 0.5))
    ref_r = ImportanceRenderer_bsMotion()
    with torch.no_grad():
        rgb_ref, depth_ref, w_ref = ref_r(
            torch.tensor(planes), TorchDecoder(), torch.tensor(ro_np), torch.tensor(rd_np),
            opts, evaluation=True,
        )

    def jax_decoder(feats):
        x = jnp.mean(feats, axis=1) @ jnp.asarray(W_dec)
        return {"sigma": x[..., :1], "rgb": jax.nn.sigmoid(x[..., 1:])}

    planes_nhwc = jnp.asarray(np.transpose(planes, (0, 1, 3, 4, 2)))
    rgb, depth, wsum = ImportanceRenderer()(
        planes_nhwc, jax_decoder, ro, rd, opts, evaluation=True
    )
    np.testing.assert_allclose(np.asarray(rgb), rgb_ref.numpy(), atol=1e-4)
    np.testing.assert_allclose(np.asarray(depth), depth_ref.numpy(), atol=1e-3)
    np.testing.assert_allclose(np.asarray(wsum), w_ref.numpy(), atol=1e-4)


def test_get_ray_limits_box():
    """Slab test vs a brute-force numpy port of math_utils.py:46-98."""
    from invertavatar_tpu.render.math_utils import get_ray_limits_box

    rng = np.random.RandomState(0)
    o = rng.randn(2, 64, 3).astype(np.float32) * 2
    d = rng.randn(2, 64, 3).astype(np.float32)
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    start, end = get_ray_limits_box(jnp.asarray(o), jnp.asarray(d), 1.0)
    start, end = np.asarray(start)[..., 0], np.asarray(end)[..., 0]

    # brute force: march t densely; box hit interval
    t = np.linspace(-10, 10, 20001, dtype=np.float64)
    pts = o[..., None, :] + t[:, None] * d[..., None, :]  # [2,64,T,3]
    inside = np.all(np.abs(pts) <= 0.5 + 1e-9, axis=-1)
    for b in range(2):
        for r in range(64):
            hits = t[inside[b, r]]
            if len(hits) > 1:
                assert abs(start[b, r] - hits.min()) < 2e-3, (b, r)
                assert abs(end[b, r] - hits.max()) < 2e-3
            else:
                assert end[b, r] < start[b, r]  # marked invalid


def test_renderer_auto_box_bounds_and_flip_z():
    """'auto' per-ray bounds and flip_z run end-to-end and differ from default."""
    from invertavatar_tpu.render.renderer import ImportanceRenderer

    rng = np.random.RandomState(1)
    planes = jnp.asarray(rng.randn(1, 3, 32, 32, 4).astype(np.float32))
    res = 8
    o = np.tile(np.array([0.0, 0.0, 2.7], np.float32), (1, res * res, 1))
    yy, xx = np.mgrid[0:res, 0:res].astype(np.float32) / res - 0.5
    d = np.stack([xx * 0.4, yy * 0.4, -np.ones_like(xx)], -1).reshape(1, -1, 3)
    d /= np.linalg.norm(d, axis=-1, keepdims=True)

    def dec(feats):
        x = jnp.mean(feats, axis=1)
        return {"rgb": jax.nn.sigmoid(x[..., 1:]), "sigma": x[..., :1]}

    opts = {"depth_resolution": 6, "depth_resolution_importance": 6, "box_warp": 1.0,
            "det_stratified": True, "fast_sampling": False}
    r = ImportanceRenderer()
    rgb_a, _, _ = r(planes, dec, jnp.asarray(o), jnp.asarray(d),
                    dict(opts, ray_start="auto", ray_end="auto"), evaluation=True)
    rgb_h, _, _ = r(planes, dec, jnp.asarray(o), jnp.asarray(d), opts, evaluation=True)
    rgb_f, _, _ = r(planes, dec, jnp.asarray(o), jnp.asarray(d),
                    dict(opts, flip_z=True), evaluation=True)
    for arr in (rgb_a, rgb_h, rgb_f):
        assert np.all(np.isfinite(np.asarray(arr)))
    assert np.abs(np.asarray(rgb_f) - np.asarray(rgb_h)).max() > 1e-6

