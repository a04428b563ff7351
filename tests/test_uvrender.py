"""uvRender preprocessing round-trip (reference preprocess_faceverse.py:330-411):
synthetic mesh -> uv_pverts (fp16 npy) + uvgttex (uint8 png) -> consumed by
`uvnet.get_unet_uvinput` with the dataset byte layout."""

import os

import numpy as np
import jax
import jax.numpy as jnp
import PIL.Image

from invertavatar_tpu.faceverse.model import FaceVerseModel
from invertavatar_tpu.data.preprocess import (
    build_uv_raster,
    expand_uv_islands,
    render_uv_for_video,
    uv_gttex_image,
    uv_pverts_map,
)

from test_faceverse import coeff, synthetic_assets


def _point_buf(tri, V, pad_k=8):
    """Per-vertex face adjacency, padded with a dummy all-zero-normal face
    (the reference's point_buf pads with an extra degenerate face index)."""
    lists = [[] for _ in range(V)]
    for f, (a, b, c) in enumerate(np.asarray(tri)):
        lists[a].append(f)
        lists[b].append(f)
        lists[c].append(f)
    k = max(pad_k, max(len(l) for l in lists))
    # pad with the index of a degenerate face we append on the caller side;
    # simplest: pad with the vertex's own first face (double-counting a face
    # only scales the pre-normalization sum, not the normalized direction,
    # when the duplicate is the same face... it does bias -- so pad with F
    # and let callers append one zero-area face)
    buf = np.full((V, k), len(tri), np.int64)
    for v, l in enumerate(lists):
        buf[v, : len(l)] = l
    return buf


def test_uvrender_roundtrip(tmp_path):
    rng = np.random.RandomState(0)
    assets = synthetic_assets(rng)
    model = FaceVerseModel(assets)
    V = assets.uv_per_ver.shape[0]
    # append one degenerate face so point_buf padding contributes zero normals
    tri = np.concatenate([assets.tri, [[0, 0, 0]]], axis=0).astype(np.int32)
    point_buf = _point_buf(assets.tri, V)
    vert_mask = np.ones(V, np.float32)
    model_dict = {"uv_per_ver": assets.uv_per_ver, "tri": tri, "point_buf": point_buf}

    # per-frame inputs on disk
    c0 = coeff(rng)
    np.save(tmp_path / "0001.npy", c0)
    img = (rng.rand(512, 512, 3) * 255).astype(np.uint8)
    PIL.Image.fromarray(img).save(tmp_path / "0001.png")

    out_dir = tmp_path / "uvRender256x256"
    render_uv_for_video(
        model, model_dict, vert_mask,
        [str(tmp_path / "0001.npy")], [str(tmp_path / "0001.png")], str(out_dir),
    )

    # ---- byte layout (dataset contract) ----
    pverts = np.load(out_dir / "0001.npy")
    assert pverts.dtype == np.float16 and pverts.shape == (256, 256, 3)
    tex = np.asarray(PIL.Image.open(out_dir / "0001_uvgttex.png"))
    assert tex.dtype == np.uint8 and tex.shape == (256, 256, 3)

    mask = pverts[..., 2].astype(np.float32)
    assert mask.max() <= 1.0 and mask.min() >= 0.0
    assert mask.sum() > 50, "face region should cover part of the UV atlas"
    # xy only nonzero under the mask (coverage multiply)
    assert np.abs(pverts[..., :2][mask == 0]).max() <= 1e-2
    # white background where coverage is exactly zero (boundary pixels carry
    # fractional interpolated masks and blend, reference :411 semantics)
    assert tex[mask == 0].min() >= 250

    # projected positions stay in [-1, 1] for the synthetic head
    assert np.abs(pverts[..., :2][mask > 0.5]).max() <= 1.0

    # ---- gttex actually samples the source frame where visible ----
    uv_input_xy = pverts[..., :2].astype(np.float32)
    ys, xs = np.where(mask > 0.5)
    i = len(ys) // 2
    u, v = uv_input_xy[ys[i], xs[i]]
    px = int(round((u + 1) / 2 * 512 - 0.5))
    py = int(round((v + 1) / 2 * 512 - 0.5))
    if 1 <= px < 511 and 1 <= py < 511:
        patch = img[max(py - 1, 0) : py + 2, max(px - 1, 0) : px + 2].astype(np.int32)
        got = tex[ys[i], xs[i]].astype(np.int32)
        # bilinear of a random image stays within the 3x3 patch min/max
        assert (got >= patch.min(axis=(0, 1)) - 2).all()
        assert (got <= patch.max(axis=(0, 1)) + 2).all()

    # ---- consumed by the inversion net input assembly (uvnet.py:117-121) ----
    from invertavatar_tpu.models.encoders.uvnet import InversionNet
    from invertavatar_tpu.train.dryrun import TINY_RENDERING_KWARGS

    gen_cfg = dict(
        z_dim=32, c_dim=25, w_dim=512, img_resolution=128, img_channels=3,
        rendering_kwargs=dict(TINY_RENDERING_KWARGS, depth_resolution=4,
                              depth_resolution_importance=4),
        neural_rendering_resolution=32, channel_base=512, channel_max=32,
        map_num_layers=2,
    )
    net = InversionNet(generator_cfg=gen_cfg, texture_out_channels=(32, 32, 16, 8))
    uv6 = jnp.concatenate(
        [jnp.asarray(tex, jnp.float32)[None] / 127.5 - 1.0,
         jnp.asarray(pverts.astype(np.float32))[None]], axis=-1,
    )  # [1, 256, 256, 6] = (uv_gttex | uv_pverts) — the dataset 'uv' tensor
    delta = jnp.zeros((1, 256, 256, 3), jnp.float32)
    variables = net.init(
        {"params": jax.random.PRNGKey(0), "buffers": jax.random.PRNGKey(1)},
        uv6, delta, method=lambda m, uv, d: m.get_unet_uvinput(uv, d),
    )
    out = net.apply(variables, uv6, delta, method=lambda m, uv, d: m.get_unet_uvinput(uv, d))
    assert out.shape == (1, 256, 256, 7)
    assert np.all(np.isfinite(np.asarray(out)))


def test_expand_uv_islands_block():
    uv = np.array([[0.5, 0.5], [0.1, 0.1], [0.3, 0.5]], np.float32)
    out, idx = expand_uv_islands(uv)
    assert idx.tolist() == [True, False, True]
    np.testing.assert_allclose(out[0], [0.5, 0.5], atol=1e-6)
    np.testing.assert_allclose(out[1], [0.1, 0.1], atol=1e-6)
    np.testing.assert_allclose(out[2], [(0.3 - 0.5) * 1.4 + 0.5, 0.5], atol=1e-6)
