"""End-to-end checkpoint import: reference pkl -> JAX model, output parity."""

import os
import pickle
import sys

import numpy as np
import pytest

REF = "/root/reference"
pytestmark = pytest.mark.skipif(not os.path.isdir(REF), reason="reference repo not mounted")

if os.path.isdir(REF) and REF not in sys.path:
    sys.path.insert(0, REF)

from tests.oracle_utils import stub_reference_modules

stub_reference_modules()

import torch  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from invertavatar_tpu.utils.checkpoint import (  # noqa: E402
    load_triplane_from_pkl,
    restore_orbax,
    save_orbax,
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
    "depth_resolution": 8,
    "depth_resolution_importance": 8,
    "ray_start": 2.25,
    "ray_end": 3.3,
    "box_warp": 1.0,
}


def test_pkl_to_jax_model(tmp_path):
    torch.manual_seed(0)
    from training_avatar_texture.triplane_v20 import TriPlaneGenerator as RefG

    g_t = RefG(z_dim=16, c_dim=25, w_dim=512, img_resolution=512, img_channels=3,
               sr_num_fp16_res=0, mapping_kwargs={"num_layers": 2},
               rendering_kwargs=dict(RENDER_KWARGS),
               channel_base=1024, channel_max=64, num_fp16_res=0, conv_clamp=256)
    g_t.eval()

    pkl_path = tmp_path / "snapshot.pkl"
    with open(pkl_path, "wb") as f:
        pickle.dump({"G_ema": g_t, "training_set_kwargs": {"resolution": 512}}, f)

    G, variables = load_triplane_from_pkl(str(pkl_path))
    assert G.z_dim == 16 and G.map_num_layers == 2 and G.channel_max == 64

    rng = np.random.RandomState(0)
    z = rng.randn(1, 16).astype(np.float32)
    c = np.concatenate([np.eye(4).reshape(1, 16), np.asarray([[4.26, 0, 0.5, 0, 4.26, 0.5, 0, 0, 1]])], axis=1).astype(np.float32)
    with torch.no_grad():
        ws_ref = g_t.mapping(torch.tensor(z), torch.tensor(c)).numpy()
    ws = G.apply(variables, jnp.asarray(z), jnp.asarray(c), method=lambda m, z, c: m.mapping(z, c))
    np.testing.assert_allclose(np.asarray(ws), ws_ref, atol=1e-5)

    # orbax round-trip of the imported variables
    ck = tmp_path / "orbax"
    save_orbax(str(ck), variables)
    restored = restore_orbax(str(ck))
    a = variables["params"]["backbone"]["mapping"]["fc0"]["weight"]
    b = restored["params"]["backbone"]["mapping"]["fc0"]["weight"]
    np.testing.assert_allclose(np.asarray(a), np.asarray(b))
