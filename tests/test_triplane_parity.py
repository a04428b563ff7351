"""End-to-end parity: TriPlaneGenerator vs the reference triplane_v20 on CPU.

The reference model is built with a shrunken config (small channel counts, 64²
neural render, 12+12 ray samples) so the test runs in seconds; every structural
element (3 backbones, UV rasterize, plane blending, volume render, 512² SR) is
still exercised. Stratified jitter is pinned on both sides.
"""

import os
import sys

import numpy as np
import pytest

REF = "/root/reference"
pytestmark = pytest.mark.skipif(not os.path.isdir(REF), reason="reference repo not mounted")

if os.path.isdir(REF) and REF not in sys.path:
    sys.path.insert(0, REF)

# triplane_v20 imports torchvision (only used in visualize_mesh_condition) and
# `from turtle import update` (stray dead import) — stub both.
from tests.oracle_utils import stub_reference_modules

stub_reference_modules()

import torch  # noqa: E402
import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from invertavatar_tpu.models.triplane import TriPlaneGenerator  # noqa: E402
from invertavatar_tpu.utils.torch_import import (  # noqa: E402
    convert_state_dict,
    state_dict_from_torch_module,
)

RENDER_KWARGS = {
    "image_resolution": 512,
    "disparity_space_sampling": False,
    "clamp_mode": "softplus",
    "superresolution_module": "training_avatar_texture.superresolution.SuperresolutionHybrid8XDC",
    "c_gen_conditioning_zero": True,
    "c_scale": 1.0,
    "superresolution_noise_mode": "none",
    "density_reg": 0.25,
    "density_reg_p_dist": 0.004,
    "reg_type": "l1",
    "decoder_lr_mul": 1.0,
    "sr_antialias": True,
    "depth_resolution": 12,
    "depth_resolution_importance": 12,
    "ray_start": 2.25,
    "ray_end": 3.3,
    "box_warp": 1.0,
    "det_stratified": True,
}

CFG = dict(z_dim=32, c_dim=25, w_dim=512, img_resolution=512, img_channels=3)  # SR hardcodes w_dim=512
SMALL = dict(channel_base=2048, channel_max=128, num_fp16_res=0, conv_clamp=256)


def _uvcoords(batch=1, res=256):
    """Synthetic FaceVerse-style uvcoords_image: uv grid + face alpha with mouth hole."""
    yy, xx = np.mgrid[0:res, 0:res].astype(np.float32) / res
    face = (((xx - 0.5) / 0.3) ** 2 + ((yy - 0.47) / 0.38) ** 2) < 1.0
    mouth = (((xx - 0.5) / 0.1) ** 2 + ((yy - 0.62) / 0.04) ** 2) < 1.0
    alpha = (face & ~mouth).astype(np.float32)
    u = (xx * 2 - 1) * 0.9
    v = (yy * 2 - 1) * 0.9
    uvc = np.stack([u, v, alpha], axis=-1)
    uvc[alpha == 0, :2] = 0.0
    return np.tile(uvc[None], (batch, 1, 1, 1))


@pytest.fixture(scope="module")
def pair():
    torch.manual_seed(0)
    from training_avatar_texture.triplane_v20 import TriPlaneGenerator as RefG

    g_t = RefG(**CFG, sr_num_fp16_res=0, mapping_kwargs={"num_layers": 2},
               rendering_kwargs=dict(RENDER_KWARGS), **SMALL)
    g_t.eval()
    g_t.neural_rendering_resolution = 64

    g_j = TriPlaneGenerator(
        **CFG, sr_num_fp16_res=0, rendering_kwargs=dict(RENDER_KWARGS),
        neural_rendering_resolution=64, map_num_layers=2,
        **{k: (float(v) if k == "conv_clamp" else v) for k, v in SMALL.items()},
    )
    variables = convert_state_dict(state_dict_from_torch_module(g_t))
    return g_t, g_j, variables


def _camera(batch=1):
    from invertavatar_tpu.camera import fov_to_intrinsics, lookat_camera_pose

    c2w = np.asarray(lookat_camera_pose(None, 3.14 / 2, 3.14 / 2, jnp.array([0.0, 0.0, 0.2]), radius=2.7, batch_size=batch))
    K = np.tile(np.asarray(fov_to_intrinsics(18.837))[None], (batch, 1, 1))
    return np.concatenate([c2w.reshape(batch, 16), K.reshape(batch, 9)], axis=1).astype(np.float32)


def test_triplane_mapping_parity(pair):
    g_t, g_j, variables = pair
    rng = np.random.RandomState(0)
    z = rng.randn(2, CFG["z_dim"]).astype(np.float32)
    c = _camera(2)
    with torch.no_grad():
        ws_ref = g_t.mapping(torch.tensor(z), torch.tensor(c)).numpy()
    ws = g_j.apply(variables, jnp.asarray(z), jnp.asarray(c), method=lambda m, z, c: m.mapping(z, c))
    np.testing.assert_allclose(np.asarray(ws), ws_ref, atol=1e-5)


def test_triplane_synthesis_parity(pair, monkeypatch):
    g_t, g_j, variables = pair
    rng = np.random.RandomState(1)
    num_ws = g_t.backbone.mapping.num_ws
    ws = rng.randn(1, num_ws, CFG["w_dim"]).astype(np.float32)
    c = _camera(1)
    uvc = _uvcoords(1)

    monkeypatch.setattr(torch, "rand_like", lambda t: torch.full_like(t, 0.5))
    with torch.no_grad():
        out_ref = g_t.synthesis(
            torch.tensor(ws), torch.tensor(c), {"uvcoords_image": torch.tensor(uvc)},
            noise_mode="const", evaluation=True,
        )
    out = g_j.apply(
        variables, jnp.asarray(ws), jnp.asarray(c), {"uvcoords_image": jnp.asarray(uvc)},
        method=lambda m, ws, c, v: m.synthesis(ws, c, v, noise_mode="const", evaluation=True),
    )
    for key, tol in [("image_raw", 3e-3), ("image", 8e-3), ("image_depth", 3e-3)]:
        ref = out_ref[key].numpy()
        got = np.transpose(np.asarray(out[key]), (0, 3, 1, 2))
        err = np.abs(ref - got).max()
        assert err < tol, f"{key}: max abs err {err}"


def test_triplane_synthesis_with_texture_parity(pair, monkeypatch):
    """The animation-loop entry point with precomputed features (eval_seq path)."""
    g_t, g_j, variables = pair
    rng = np.random.RandomState(2)
    num_ws = g_t.backbone.mapping.num_ws
    ws = rng.randn(1, num_ws, CFG["w_dim"]).astype(np.float32)
    c = _camera(1)
    uvc = _uvcoords(1)

    monkeypatch.setattr(torch, "rand_like", lambda t: torch.full_like(t, 0.5))
    with torch.no_grad():
        tex_t = g_t.texture_backbone.synthesis(torch.tensor(ws), cond_list=None, return_list=True, noise_mode="const")
        static_t = g_t.backbone.synthesis(torch.tensor(ws), cond_list=None, return_list=True, noise_mode="const")
        out_ref = g_t.synthesis_withTexture(
            torch.tensor(ws), tex_t, torch.tensor(c), {"uvcoords_image": torch.tensor(uvc)},
            static_feats=static_t, noise_mode="const", evaluation=True,
        )

    def run(m, ws, c, v):
        tex = m.texture_backbone.synthesis(ws, return_list=True, noise_mode="const")
        static = m.backbone.synthesis(ws, return_list=True, noise_mode="const")
        return m.synthesis_withTexture(ws, tex, c, v, static_feats=static, noise_mode="const", evaluation=True)

    out = g_j.apply(
        variables, jnp.asarray(ws), jnp.asarray(c), {"uvcoords_image": jnp.asarray(uvc)}, method=run
    )
    for key, tol in [("image_raw", 3e-3), ("image", 8e-3)]:
        ref = out_ref[key].numpy()
        got = np.transpose(np.asarray(out[key]), (0, 3, 1, 2))
        err = np.abs(ref - got).max()
        assert err < tol, f"{key}: max abs err {err}"
