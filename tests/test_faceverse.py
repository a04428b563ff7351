"""FaceVerse motion driver: coefficient math + online uvcoords rendering."""

import numpy as np
import jax.numpy as jnp

from invertavatar_tpu.faceverse.manager import FaceverseManager
from invertavatar_tpu.faceverse.model import FaceVerseAssets, FaceVerseModel

ID_D, EXP_D, TEX_D = 150, 52, 251


def synthetic_assets(rng, n_grid=24):
    """Blobby 'head': a grid-triangulated disc around the origin."""
    us, vs = np.meshgrid(np.linspace(0.2, 0.8, n_grid), np.linspace(0.3, 0.7, n_grid))
    uv = np.stack([us.ravel(), vs.ravel()], -1).astype(np.float32)
    V = uv.shape[0]
    # mean shape: disc in xy around origin (FLAME-ish scale), z bulge
    xy = (uv - 0.5) * 0.4
    z = 0.1 - ((uv - 0.5) ** 2).sum(-1)
    mean = np.stack([xy[:, 0], xy[:, 1] - 1.0, -z], -1)  # will be y,z-flipped+shifted by loader-equivalent
    # Build assets directly in post-load convention:
    meanshape = np.stack([xy[:, 0], xy[:, 1], z], -1).reshape(1, -1).astype(np.float32)
    faces = []
    for r in range(n_grid - 1):
        for c in range(n_grid - 1):
            a = r * n_grid + c
            faces.append([a, a + 1, a + n_grid])
            faces.append([a + 1, a + n_grid + 1, a + n_grid])
    tri = np.asarray(faces, np.int32)
    id_base = (rng.randn(3 * V, ID_D) * 1e-3).astype(np.float32)
    exp_base = (rng.randn(3 * V, EXP_D) * 1e-3).astype(np.float32)
    return FaceVerseAssets(
        meanshape=meanshape,
        id_base=id_base,
        exp_base=exp_base,
        uv_per_ver=uv,
        tri=tri,
        ver_inds=(0, 8, 16),
        id_dims=ID_D,
        exp_dims=EXP_D,
        tex_dims=TEX_D,
    )


def coeff(rng):
    all_dims = ID_D + EXP_D + TEX_D
    return (rng.randn(all_dims + 38) * 0.1).astype(np.float32)


def test_split_merge_roundtrip():
    rng = np.random.RandomState(0)
    model = FaceVerseModel(synthetic_assets(rng))
    c = jnp.asarray(coeff(rng))[None]
    parts = model.split_coeffs(c)
    assert parts[1].shape == (1, EXP_D)
    assert parts[6].shape == (1, 4)  # eye coeffs (2 per eye)
    merged = model.merge_coeffs(*parts)
    np.testing.assert_allclose(np.asarray(merged), np.asarray(c), atol=1e-6)


def test_get_vs_blendshapes():
    rng = np.random.RandomState(1)
    assets = synthetic_assets(rng)
    model = FaceVerseModel(assets)
    c = jnp.asarray(coeff(rng))[None]
    id_c, exp_c, *_, eye_c, _ = model.split_coeffs(c)
    vs = model.get_vs(id_c, exp_c)
    V = assets.uv_per_ver.shape[0]
    assert vs.shape == (1, V, 3)
    # numpy oracle
    expect = (
        assets.id_base @ np.asarray(id_c)[0]
        + assets.exp_base @ np.asarray(exp_c)[0]
        + assets.meanshape[0]
    ).reshape(V, 3)
    np.testing.assert_allclose(np.asarray(vs)[0], expect, atol=1e-5)

    # eye rotation: rotating with identity mats leaves vs unchanged
    eye0 = jnp.zeros((1, 2))
    lmat = model.compute_eye_rotation_matrix(eye0)
    np.testing.assert_allclose(np.asarray(lmat)[0], np.eye(3), atol=1e-6)
    vs2 = model.get_vs(
        id_c, exp_c, lmat, lmat,
        model.get_l_eye_center(id_c), model.get_r_eye_center(id_c),
    )
    np.testing.assert_allclose(np.asarray(vs2), np.asarray(vs), atol=1e-5)


def test_manager_driven_rendering():
    rng = np.random.RandomState(2)
    assets = synthetic_assets(rng)
    # fv2fl: pick a transform that drops the head into the crop window
    fv2fl = np.eye(4, dtype=np.float32)
    fv2fl[:3, :3] *= 0.8
    face_mask = np.ones(assets.uv_per_ver.shape[0], np.float32)
    base = coeff(rng)
    mgr = FaceverseManager(assets, fv2fl, face_mask, base_coeff=base, faces_per_tile=256)

    uvc = mgr.make_driven_rendering(coeff(rng))
    assert uvc.shape == (1, 256, 256, 3)
    arr = np.asarray(uvc)
    mask = arr[..., 2]
    assert set(np.unique(mask)).issubset({0.0, 1.0}), "mask must be binarized"
    assert mask.sum() > 100, "head should cover part of the crop"
    # uv channels only nonzero where mask (or nearly so)
    assert np.abs(arr[..., :2][mask == 0]).max() < 1e-5

    # delta-transfer path
    uvc2 = mgr.make_driven_rendering(coeff(rng), base_drive_coeff=coeff(rng))
    assert uvc2.shape == (1, 256, 256, 3)


def test_get_color_and_sh_illumination():
    """Texture basis + SH lighting vs a torch oracle transcribing
    FaceVerseModel_v3.py:266-269 and :359-391."""
    import torch

    rng = np.random.RandomState(3)
    assets = synthetic_assets(rng)
    V = assets.uv_per_ver.shape[0]
    tex_base = rng.randn(3 * V, TEX_D).astype(np.float32) * 1e-2
    meantex = (rng.rand(1, 3 * V).astype(np.float32) * 255)
    assets = assets._replace(tex_base=tex_base, meantex=meantex)
    model = FaceVerseModel(assets)

    B = 2
    tex_coeff = jnp.asarray(rng.randn(B, TEX_D).astype(np.float32))
    color = model.get_color(tex_coeff)
    assert color.shape == (B, V, 3)
    expect = (tex_base @ np.asarray(tex_coeff).T).T + meantex
    np.testing.assert_allclose(np.asarray(color), expect.reshape(B, V, 3), atol=2e-4)

    # SH illumination oracle (torch, transcribed from the reference)
    norm = rng.randn(B, V, 3).astype(np.float32)
    norm /= np.linalg.norm(norm, axis=-1, keepdims=True)
    gamma = rng.randn(B, 27).astype(np.float32) * 0.3
    got = model.add_illumination(color, jnp.asarray(norm), jnp.asarray(gamma))

    t_gamma = torch.tensor(gamma).view(-1, 3, 9).clone()
    t_gamma[:, :, 0] += 0.8
    t_gamma = t_gamma.permute(0, 2, 1)
    a0, a1, a2 = np.pi, 2 * np.pi / np.sqrt(3.0), 2 * np.pi / np.sqrt(8.0)
    c0 = 1 / np.sqrt(4 * np.pi)
    c1 = np.sqrt(3.0) / np.sqrt(4 * np.pi)
    c2 = 3 * np.sqrt(5.0) / np.sqrt(12 * np.pi)
    d0 = 0.5 / np.sqrt(3.0)
    tn = torch.tensor(norm).view(-1, 3)
    nx, ny, nz = tn[:, 0], tn[:, 1], tn[:, 2]
    H = torch.stack(
        [a0 * c0 * (nx * 0 + 1), -a1 * c1 * ny, a1 * c1 * nz, -a1 * c1 * nx,
         a2 * c2 * nx * ny, -a2 * c2 * ny * nz, a2 * c2 * d0 * (3 * nz.pow(2) - 1),
         -a2 * c2 * nx * nz, a2 * c2 * 0.5 * (nx.pow(2) - ny.pow(2))], 1,
    ).view(B, V, 9)
    lighting = H.bmm(t_gamma)
    expect_lit = torch.tensor(np.asarray(color)) * lighting
    np.testing.assert_allclose(np.asarray(got), expect_lit.numpy(), atol=3e-4, rtol=2e-4)


def test_compute_norm_and_project_vs():
    """Vertex normals + pinhole projection vs torch oracles
    (FaceVerseModel_v3.py:271-284, :500-508)."""
    import torch

    from invertavatar_tpu.faceverse.model import compute_norm, project_vs

    rng = np.random.RandomState(4)
    assets = synthetic_assets(rng)
    V = assets.uv_per_ver.shape[0]
    tri = np.concatenate([assets.tri, [[0, 0, 0]]]).astype(np.int32)  # pad face
    # point_buf: adjacency padded with the degenerate face
    lists = [[] for _ in range(V)]
    for f, (a, b, c) in enumerate(assets.tri):
        for v in (a, b, c):
            lists[v].append(f)
    k = max(len(l) for l in lists)
    buf = np.full((V, k), len(assets.tri), np.int64)
    for v, l in enumerate(lists):
        buf[v, : len(l)] = l

    vs = rng.randn(2, V, 3).astype(np.float32)
    got = compute_norm(jnp.asarray(vs), jnp.asarray(tri), jnp.asarray(buf))

    tvs = torch.tensor(vs)
    ttri = torch.tensor(tri.astype(np.int64))
    v1, v2, v3 = tvs[:, ttri[:, 0]], tvs[:, ttri[:, 1]], tvs[:, ttri[:, 2]]
    face_norm = torch.cross(v1 - v2, v2 - v3, dim=-1)
    v_norm = face_norm[:, torch.tensor(buf)].sum(2)
    v_norm = v_norm / (v_norm.norm(dim=2).unsqueeze(2) + 1e-9)
    np.testing.assert_allclose(np.asarray(got), v_norm.numpy(), atol=1e-5)

    K = np.eye(3, dtype=np.float32)
    K[0, 0] = K[1, 1] = 4.2647 * 512
    K[0, 2] = K[1, 2] = 256
    proj = project_vs(jnp.asarray(vs) * 0.1, K, cam_dist=5.0)
    rz = torch.tensor([[-1.0, 0, 0], [0, 1.0, 0], [0, 0, -1.0]])
    p = (tvs * 0.1) @ rz + torch.tensor([0.0, 0.0, 5.0])
    aug = p @ torch.tensor(K).T
    expect_p = aug[..., :2] / aug[..., 2:3]
    np.testing.assert_allclose(np.asarray(proj), expect_p.numpy(), atol=1e-3)
