"""Legacy Next3D family: backbone parity vs reference + stitch math + smoke."""

import os
import sys

import numpy as np
import pytest
import jax
import jax.numpy as jnp

REF = "/root/reference"
HAVE_REF = os.path.isdir(REF)
if HAVE_REF and REF not in sys.path:
    sys.path.insert(0, REF)

from invertavatar_tpu.models.next3d import (
    CondGenerator,
    CondSynthesisNetwork,
    FlameTopology,
    Next3DTriPlaneGenerator,
    crop_resize_boxes,
    gen_mouth_mask,
    generate_dense_grid_triangles,
    make_topology,
    parse_obj,
    paste_boxes,
)


def nhwc(x):
    return jnp.asarray(np.transpose(x, (0, 2, 3, 1)))


def nchw(x):
    return np.transpose(np.asarray(x), (0, 3, 1, 2))


# --------------------------------------------------------------------- parity


@pytest.mark.skipif(not HAVE_REF, reason="reference repo not mounted")
def test_cond_synthesis_network_parity():
    import torch

    torch.manual_seed(0)
    from training_avatar_texture.networks_stylegan2_styleunet_next3d import (
        SynthesisNetwork as RefNet,
    )

    from invertavatar_tpu.utils.torch_import import (
        convert_state_dict,
        state_dict_from_torch_module,
    )

    kw = dict(w_dim=64, img_resolution=64, img_channels=8, cond_channels=6,
              in_size=16, final_size=4, channel_base=512, channel_max=64,
              num_fp16_res=0, num_cond_res=16)
    net_t = RefNet(**kw)
    net_t.eval()
    rng = np.random.RandomState(0)
    x = rng.randn(2, 6, 16, 16).astype(np.float32)
    ws = rng.randn(2, net_t.num_ws, 64).astype(np.float32)
    with torch.no_grad():
        ref = net_t(torch.tensor(x), torch.tensor(ws), noise_mode="const").numpy()

    net_j = CondSynthesisNetwork(**kw)
    assert net_j.num_ws == net_t.num_ws
    variables = convert_state_dict(state_dict_from_torch_module(net_t))
    # drop params of blocks the forward never runs (the reference builds the
    # full pyramid but skips blocks below final_size*2)
    used = {f"b{r}" for r in net_j.block_resolutions[int(np.log2(kw["final_size"])) - 1 :]}
    params = {k: v for k, v in variables["params"].items()
              if not (k.startswith("b") and k not in used)}
    buffers = {k: v for k, v in variables.get("buffers", {}).items()
               if not (k.startswith("b") and k.split("/")[0] not in used)}
    out = net_j.apply({"params": params, "buffers": buffers}, nhwc(x), jnp.asarray(ws),
                      noise_mode="const")
    np.testing.assert_allclose(nchw(out), ref, atol=2e-3)


@pytest.mark.skipif(not HAVE_REF, reason="reference repo not mounted")
def test_next3d_vanilla_generator_parity():
    """networks_stylegan2_next3d.Generator (vanilla + mapping_ws) vs my Generator."""
    import torch

    torch.manual_seed(1)
    from training_avatar_texture.networks_stylegan2_next3d import Generator as RefGen

    from invertavatar_tpu.models.synthesis import Generator
    from invertavatar_tpu.utils.torch_import import (
        convert_state_dict,
        state_dict_from_torch_module,
    )

    g_t = RefGen(z_dim=32, c_dim=0, w_dim=64, img_resolution=32, img_channels=3,
                 mapping_ws=7, channel_base=512, channel_max=64, num_fp16_res=0,
                 mapping_kwargs={"num_layers": 2})
    g_t.eval()
    rng = np.random.RandomState(1)
    ws = rng.randn(2, g_t.synthesis.num_ws, 64).astype(np.float32)
    with torch.no_grad():
        ref = g_t.synthesis(torch.tensor(ws), noise_mode="const").numpy()

    g_j = Generator(z_dim=32, c_dim=0, w_dim=64, img_resolution=32, img_channels=3,
                    mapping_ws=7, channel_base=512, channel_max=64, num_fp16_res=0,
                    map_num_layers=2)
    variables = convert_state_dict(state_dict_from_torch_module(g_t))
    out = g_j.apply(variables, jnp.asarray(ws), noise_mode="const",
                    method=lambda m, w, **kw: m.synthesis(w, **kw))
    np.testing.assert_allclose(nchw(out), ref, atol=1e-4)
    assert g_t.mapping.num_ws == 7


# ---------------------------------------------------------------- stitch math


def test_gen_mouth_mask_matches_reference_math():
    """Continuous boxes vs the reference's numpy int math (:352-367), ±1px."""
    rng = np.random.RandomState(2)
    lm = rng.rand(3, 68, 2).astype(np.float32) * 0.6 - 0.3
    boxes = np.asarray(gen_mouth_mask(jnp.asarray(lm)))

    px = lm * 128 + 128
    outer = px[:, 48:60]
    mouth_avg = (outer[:, 0] + outer[:, 6]) * 0.5
    ups = np.max(outer[..., 0], axis=1)
    bottoms = np.min(outer[..., 0], axis=1)
    lefts = np.min(outer[..., 1], axis=1)
    rights = np.max(outer[..., 1], axis=1)
    mask_res = (np.maximum(ups - bottoms, rights - lefts) * 1.2).astype(int)
    ref = np.stack(
        [
            (mouth_avg[:, 1] - mask_res // 2).astype(int),
            (mouth_avg[:, 1] + mask_res // 2).astype(int),
            (mouth_avg[:, 0] - mask_res // 2).astype(int),
            (mouth_avg[:, 0] + mask_res // 2).astype(int),
        ],
        axis=-1,
    )
    # continuous boxes differ from the int-floored reference by < 2px
    assert np.abs(boxes - ref).max() < 2.5


def test_crop_paste_boxes_roundtrip():
    """Integer boxes: crop→resize matches torch bilinear; paste is exact."""
    import torch
    import torch.nn.functional as F

    rng = np.random.RandomState(3)
    img = rng.randn(2, 128, 128, 4).astype(np.float32)
    boxes = np.array([[32.0, 96.0, 40.0, 104.0], [16.0, 80.0, 20.0, 84.0]], np.float32)

    crop = np.asarray(crop_resize_boxes(jnp.asarray(img), jnp.asarray(boxes), out=32))
    for b in range(2):
        m0, m1, m2, m3 = boxes[b].astype(int)
        ref = F.interpolate(
            torch.tensor(img[b].transpose(2, 0, 1)[None, :, m0:m1, m2:m3]),
            size=(32, 32), mode="bilinear", align_corners=False,
        )[0].numpy().transpose(1, 2, 0)
        np.testing.assert_allclose(crop[b], ref, atol=1e-5)

    patch = rng.randn(2, 32, 32, 4).astype(np.float32)
    pasted = np.asarray(paste_boxes(jnp.asarray(img), jnp.asarray(patch), jnp.asarray(boxes)))
    for b in range(2):
        m0, m1, m2, m3 = boxes[b].astype(int)
        up = F.interpolate(
            torch.tensor(patch[b].transpose(2, 0, 1)[None]),
            size=(m1 - m0, m1 - m0), mode="bilinear", align_corners=False,
        )[0].numpy().transpose(1, 2, 0)
        expected = img[b].copy()
        expected[m0:m1, m2:m3] = up
        np.testing.assert_allclose(pasted[b], expected, atol=1e-5)


def test_parse_obj_and_dense_triangles(tmp_path):
    p = tmp_path / "t.obj"
    p.write_text(
        "v 0 0 0\nv 1 0 0\nv 0 1 0\nvt 0 0\nvt 1 0\nvt 0 1\nf 1/1 2/2 3/3\n"
    )
    verts, uvs, faces, uvfaces = parse_obj(str(p))
    assert verts.shape == (3, 3) and uvs.shape == (3, 2)
    np.testing.assert_array_equal(faces, [[0, 1, 2]])
    np.testing.assert_array_equal(uvfaces, [[0, 1, 2]])

    tris = generate_dense_grid_triangles(16, 16)
    ref = []
    for x in range(2, 16 - 3):
        for y in range(5, 16 - 6):
            ref.append([y * 16 + x, y * 16 + x + 1, (y + 1) * 16 + x])
            ref.append([y * 16 + x + 1, (y + 1) * 16 + x + 1, (y + 1) * 16 + x])
    ref = np.array(ref)[:, [0, 2, 1]]
    np.testing.assert_array_equal(tris, ref)


# -------------------------------------------------------------------- smoke


def _sphere_topology(n_lat=24, n_lon=32):
    """UV-sphere with CCW-from-outside winding + trivial uv chart."""
    lat = np.linspace(0.12, np.pi - 0.12, n_lat)
    lon = np.linspace(0, 2 * np.pi, n_lon, endpoint=False)
    verts, uvs = [], []
    for i, th in enumerate(lat):
        for j, ph in enumerate(lon):
            verts.append([np.sin(th) * np.sin(ph), np.cos(th), np.sin(th) * np.cos(ph)])
            uvs.append([j / n_lon, i / (n_lat - 1)])
    faces = []
    for i in range(n_lat - 1):
        for j in range(n_lon):
            a = i * n_lon + j
            b = i * n_lon + (j + 1) % n_lon
            c = (i + 1) * n_lon + j
            d = (i + 1) * n_lon + (j + 1) % n_lon
            faces.append([a, b, c])
            faces.append([b, d, c])
    verts = np.asarray(verts, np.float32) * 0.12  # head-sized for the ortho window
    uvs = np.asarray(uvs, np.float32)
    faces = np.asarray(faces, np.int32)
    mask = np.ones((1, 256, 256, 1), np.float32)
    return verts, make_topology(uvs, faces, faces, mask, n_verts=len(verts))


RENDER_KWARGS_NEXT3D = {
    "image_resolution": 128,
    "disparity_space_sampling": False,
    "clamp_mode": "softplus",
    "superresolution_module": "invertavatar_tpu.models.superresolution.SuperresolutionHybrid2X",
    "c_gen_conditioning_zero": False,
    "c_scale": 1.0,
    "superresolution_noise_mode": "const",
    "density_reg": 0.25,
    "decoder_lr_mul": 1.0,
    "sr_antialias": True,
    "depth_resolution": 6,
    "depth_resolution_importance": 6,
    "ray_start": 2.25,
    "ray_end": 3.3,
    "box_warp": 1.0,
}


@pytest.mark.slow
def test_next3d_generator_smoke():
    from invertavatar_tpu.camera import fov_to_intrinsics, lookat_camera_pose

    verts, topo = _sphere_topology()
    B = 1
    # w_dim=512: the SR blocks are built at w_dim 512 (reference superresolution.py)
    G = Next3DTriPlaneGenerator(
        z_dim=32, c_dim=25, w_dim=512, img_resolution=128, img_channels=3,
        topology=topo, rendering_kwargs=RENDER_KWARGS_NEXT3D,
        neural_rendering_resolution=32, channel_base=512, channel_max=64,
        num_fp16_res=0, map_num_layers=2, faces_per_tile=512,
    )
    rng = np.random.RandomState(0)
    # pack "vertices + 68 landmarks" like the reference v
    lms = verts[rng.choice(len(verts), 68)]
    v = jnp.asarray(np.concatenate([verts, lms], axis=0))[None]
    v = jnp.tile(v, (B, 1, 1))

    c2w = np.asarray(lookat_camera_pose(None, np.pi / 2, np.pi / 2,
                                        jnp.array([0.0, 0.0, 0.0]), radius=2.7, batch_size=B))
    K = np.tile(np.asarray(fov_to_intrinsics(18.837))[None], (B, 1, 1))
    c = jnp.asarray(np.concatenate([c2w.reshape(B, 16), K.reshape(B, 9)], axis=1).astype(np.float32))
    z = jnp.asarray(rng.randn(B, 32).astype(np.float32))

    keys = jax.random.PRNGKey(0)
    init_rngs = {"params": keys, "buffers": jax.random.fold_in(keys, 1),
                 "noise": jax.random.fold_in(keys, 2), "ray": jax.random.fold_in(keys, 3)}
    variables = G.init(init_rngs, z, c, v, noise_mode="const")
    out = jax.jit(
        lambda vr, z_, c_, v_: G.apply(vr, z_, c_, v_, noise_mode="const",
                                       rngs={"ray": jax.random.PRNGKey(5)})
    )(variables, z, c, v)
    assert out["image"].shape == (B, 128, 128, 3)
    assert out["image_raw"].shape == (B, 32, 32, 3)
    for k in ("image", "image_raw", "image_depth"):
        assert np.all(np.isfinite(np.asarray(out[k]))), k


@pytest.mark.slow
def test_legacy_triplane_generator_smoke():
    from invertavatar_tpu.camera import fov_to_intrinsics, lookat_camera_pose
    from invertavatar_tpu.models.next3d import LegacyTriPlaneGenerator

    verts, topo = _sphere_topology()
    B = 1
    G = LegacyTriPlaneGenerator(
        z_dim=32, c_dim=25, w_dim=512, img_resolution=128, img_channels=3,
        topology=topo, rendering_kwargs=RENDER_KWARGS_NEXT3D,
        neural_rendering_resolution=32, channel_base=512, channel_max=64,
        num_fp16_res=0, map_num_layers=2, faces_per_tile=512,
    )
    rng = np.random.RandomState(1)
    v = jnp.asarray(verts)[None]
    c2w = np.asarray(lookat_camera_pose(None, np.pi / 2, np.pi / 2,
                                        jnp.array([0.0, 0.0, 0.0]), radius=2.7, batch_size=B))
    K = np.tile(np.asarray(fov_to_intrinsics(18.837))[None], (B, 1, 1))
    c = jnp.asarray(np.concatenate([c2w.reshape(B, 16), K.reshape(B, 9)], axis=1).astype(np.float32))
    z = jnp.asarray(rng.randn(B, 32).astype(np.float32))

    keys = jax.random.PRNGKey(0)
    init_rngs = {"params": keys, "buffers": jax.random.fold_in(keys, 1),
                 "noise": jax.random.fold_in(keys, 2), "ray": jax.random.fold_in(keys, 3)}
    variables = G.init(init_rngs, z, c, v, noise_mode="const")
    out = G.apply(variables, z, c, v, noise_mode="const", rngs={"ray": jax.random.PRNGKey(5)})
    assert out["image"].shape == (B, 128, 128, 3)
    for k in ("image", "image_raw", "image_depth"):
        assert np.all(np.isfinite(np.asarray(out[k]))), k


@pytest.mark.skipif(not HAVE_REF, reason="reference repo not mounted")
def test_cond_generator_full_parity():
    """CondGenerator (mapping + cond synthesis) vs the reference Generator."""
    import torch

    torch.manual_seed(7)
    from training_avatar_texture.networks_stylegan2_styleunet_next3d import (
        Generator as RefGen,
    )

    from invertavatar_tpu.utils.torch_import import (
        convert_state_dict,
        state_dict_from_torch_module,
    )

    kw = dict(z_dim=16, c_dim=0, w_dim=64, img_resolution=64, img_channels=8,
              cond_channels=6, in_size=16, final_size=4, channel_base=512,
              channel_max=64, num_fp16_res=0, num_cond_res=16)
    g_t = RefGen(mapping_kwargs={"num_layers": 2}, **kw)
    g_t.eval()
    rng = np.random.RandomState(7)
    z = rng.randn(2, 16).astype(np.float32)
    x = rng.randn(2, 6, 16, 16).astype(np.float32)
    with torch.no_grad():
        ws_ref = g_t.mapping(torch.tensor(z), None)
        ref = g_t.synthesis(torch.tensor(x), ws_ref, noise_mode="const").numpy()

    g_j = CondGenerator(map_num_layers=2, **kw)
    variables = convert_state_dict(state_dict_from_torch_module(g_t))
    # drop the unused sub-final_size pyramid blocks (see cond network test)
    block_res = [2**i for i in range(2, int(np.log2(kw["img_resolution"])) + 1)]
    used = {f"b{r}" for r in block_res[int(np.log2(kw["final_size"])) - 1 :]}
    sp = variables["params"]["synthesis"]
    variables["params"]["synthesis"] = {
        k: v for k, v in sp.items() if not (k.startswith("b") and k not in used)
    }
    sb = variables["buffers"].get("synthesis", {})
    variables["buffers"]["synthesis"] = {
        k: v for k, v in sb.items() if not (k.startswith("b") and k.split("/")[0] not in used)
    }
    out = g_j.apply(variables, jnp.asarray(z), None, nhwc(x), noise_mode="const")
    np.testing.assert_allclose(nchw(out), ref, atol=2e-3)
