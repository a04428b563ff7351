"""Fixture-driven parity smoke tests (VERDICT r2 #6).

These run WITHOUT torch or /root/reference: scripts/make_goldens.py
precomputed the reference oracle outputs (and the converted parameter trees)
into tests/fixtures/golden_*.npz; here we only load arrays, run the JAX side,
and assert the same tolerances the live-oracle suites use
(tests/test_stylegan_parity.py, tests/test_triplane_parity.py). Together with
the pure-math tests this forms the <5-min `-m smoke` tier; the live-oracle
suites remain the source of truth and regenerate these fixtures.
"""

import os

import numpy as np
import pytest

import jax.numpy as jnp

from flax import serialization

FIXTURES = os.path.join(os.path.dirname(os.path.abspath(__file__)), "fixtures")

pytestmark = pytest.mark.smoke


def _load(name):
    path = os.path.join(FIXTURES, name + ".npz")
    if not os.path.exists(path):
        pytest.skip(f"{name}.npz not generated (run scripts/make_goldens.py)")
    data = np.load(path)
    variables = serialization.msgpack_restore(data["__variables__"].tobytes())
    return variables, data


def nchw(x):
    return np.transpose(np.asarray(x), (0, 3, 1, 2))


@pytest.fixture(scope="module")
def stylegan():
    from invertavatar_tpu.models import Generator

    variables, data = _load("golden_stylegan")
    gen = Generator(z_dim=16, c_dim=0, w_dim=64, img_resolution=32, img_channels=8,
                    channel_base=1024, channel_max=64, num_fp16_res=0, conv_clamp=256.0,
                    map_num_layers=2)
    return gen, variables, data


def test_golden_stylegan_mapping(stylegan):
    gen, variables, data = stylegan
    ws = gen.apply(variables, jnp.asarray(data["z"]), None,
                   method=lambda m, z, c: m.mapping(z, c))
    np.testing.assert_allclose(np.asarray(ws), data["ws_ref"], atol=1e-5)


def test_golden_stylegan_mapping_truncation(stylegan):
    import jax

    gen, variables, data = stylegan
    variables = dict(variables)
    buffers = jax.tree_util.tree_map(lambda x: x, variables["buffers"])
    buffers["mapping"]["w_avg"] = jnp.asarray(data["w_avg"])
    variables["buffers"] = buffers
    ws = gen.apply(
        variables, jnp.asarray(data["z"]), None,
        method=lambda m, z, c: m.mapping(z, c, truncation_psi=0.7, truncation_cutoff=5),
    )
    np.testing.assert_allclose(np.asarray(ws), data["ws_trunc_ref"], atol=1e-5)


def test_golden_stylegan_forward(stylegan):
    gen, variables, data = stylegan
    img = gen.apply(variables, jnp.asarray(data["z"]), None,
                    method=lambda m, z, c: m(z, c, noise_mode="const"))
    np.testing.assert_allclose(nchw(img), data["img_ref"], atol=2e-4)


# mirrors tests/test_triplane_parity.py (kept inline so this module never
# imports torch or the reference tree)
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
CFG = dict(z_dim=32, c_dim=25, w_dim=512, img_resolution=512, img_channels=3)
SMALL = dict(channel_base=2048, channel_max=128, num_fp16_res=0, conv_clamp=256)


@pytest.fixture(scope="module")
def triplane():
    from invertavatar_tpu.models.triplane import TriPlaneGenerator

    variables, data = _load("golden_triplane")
    g_j = TriPlaneGenerator(
        **CFG, sr_num_fp16_res=0, rendering_kwargs=dict(RENDER_KWARGS),
        neural_rendering_resolution=64, map_num_layers=2,
        **{k: (float(v) if k == "conv_clamp" else v) for k, v in SMALL.items()},
    )
    return g_j, variables, data


def test_golden_triplane_synthesis(triplane):
    g_j, variables, data = triplane
    out = g_j.apply(
        variables, jnp.asarray(data["ws"]), jnp.asarray(data["c"]),
        {"uvcoords_image": jnp.asarray(data["uvc"])},
        method=lambda m, ws, c, v: m.synthesis(ws, c, v, noise_mode="const", evaluation=True),
    )
    for key, tol in [("image_raw", 3e-3), ("image", 8e-3), ("image_depth", 3e-3)]:
        err = np.abs(data[f"syn_{key}_ref"] - nchw(out[key])).max()
        assert err < tol, f"{key}: max abs err {err}"


def test_golden_triplane_synthesis_with_texture(triplane):
    g_j, variables, data = triplane

    def run(m, ws, c, v):
        tex = m.texture_backbone.synthesis(ws, return_list=True, noise_mode="const")
        static = m.backbone.synthesis(ws, return_list=True, noise_mode="const")
        return m.synthesis_withTexture(ws, tex, c, v, static_feats=static,
                                       noise_mode="const", evaluation=True)

    out = g_j.apply(variables, jnp.asarray(data["ws"]), jnp.asarray(data["c"]),
                    {"uvcoords_image": jnp.asarray(data["uvc"])}, method=run)
    for key, tol in [("image_raw", 3e-3), ("image", 8e-3)]:
        err = np.abs(data[f"wt_{key}_ref"] - nchw(out[key])).max()
        assert err < tol, f"{key}: max abs err {err}"
