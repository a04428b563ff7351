"""TPU rasterizer correctness vs a brute-force numpy oracle."""

import pytest
import numpy as np
import jax.numpy as jnp

from invertavatar_tpu.render.rasterizer import (
    RasterOut,
    face_vertices,
    interpolate_attributes,
    rasterize,
)

pytestmark = pytest.mark.smoke


def brute_force_raster(verts, faces, H, W, window=(-1, 1, -1, 1), cull=False):
    """Reference oracle: same conventions, O(pixels × faces)."""
    x0, x1, y0, y1 = window
    px = (verts[:, 0] - x0) / (x1 - x0) * W
    py = (verts[:, 1] - y0) / (y1 - y0) * H
    pz = verts[:, 2]
    face_id = np.full((H, W), -1, np.int32)
    zbuf = np.full((H, W), np.inf, np.float32)
    bary = np.zeros((H, W, 3), np.float32)
    for f, (i, j, k) in enumerate(faces):
        ax, ay, az = px[i], py[i], pz[i]
        bx, by, bz = px[j], py[j], pz[j]
        cx, cy, cz = px[k], py[k], pz[k]
        det = (bx - ax) * (cy - ay) - (cx - ax) * (by - ay)
        if cull and det <= 0:
            continue
        if abs(det) < 1e-12:
            continue
        for r in range(H):
            for col in range(W):
                sx, sy = col + 0.5, r + 0.5
                w1 = ((sx - ax) * (cy - ay) - (sy - ay) * (cx - ax)) / det
                w2 = ((sy - ay) * (bx - ax) - (sx - ax) * (by - ay)) / det
                w0 = 1 - w1 - w2
                if w0 >= 0 and w1 >= 0 and w2 >= 0:
                    z = w0 * az + w1 * bz + w2 * cz
                    if z < zbuf[r, col]:
                        zbuf[r, col] = z
                        face_id[r, col] = f
                        bary[r, col] = (w0, w1, w2)
    return face_id, bary, zbuf


def test_rasterize_matches_bruteforce():
    rng = np.random.RandomState(0)
    V, F, H = 30, 40, 64
    verts = np.stack(
        [
            rng.uniform(-1, 1, V),
            rng.uniform(-1, 1, V),
            rng.uniform(0.5, 2.0, V),
        ],
        axis=-1,
    ).astype(np.float32)
    faces = rng.randint(0, V, (F, 3)).astype(np.int32)

    ref_f, ref_b, ref_z = brute_force_raster(verts, faces, H, H)
    out = rasterize(jnp.asarray(verts), jnp.asarray(faces), height=H, width=H,
                    tile=16, faces_per_tile=64, chunk=16, cull_backfaces=False)

    # hit mask + z agree everywhere; face ids may differ only on exact z ties
    np.testing.assert_array_equal(np.asarray(out.face_id) >= 0, ref_f >= 0)
    hits = ref_f >= 0
    np.testing.assert_allclose(np.asarray(out.zbuf)[hits], ref_z[hits], atol=1e-4)
    same = np.asarray(out.face_id) == ref_f
    assert same[hits].mean() > 0.999
    np.testing.assert_allclose(np.asarray(out.bary)[hits & same], ref_b[hits & same], atol=1e-4)


def test_rasterize_backface_culling():
    # CCW triangle in (x right, y down) screen space has negative det -> culled
    verts = np.array([[-0.5, -0.5, 1.0], [0.5, -0.5, 1.0], [0.0, 0.5, 1.0]], np.float32)
    faces_cw = np.array([[0, 2, 1]], np.int32)
    faces_ccw = np.array([[0, 1, 2]], np.int32)
    out_cw = rasterize(jnp.asarray(verts), jnp.asarray(faces_cw), height=32, width=32,
                       tile=16, faces_per_tile=16, chunk=8, cull_backfaces=True)
    out_ccw = rasterize(jnp.asarray(verts), jnp.asarray(faces_ccw), height=32, width=32,
                        tile=16, faces_per_tile=16, chunk=8, cull_backfaces=True)
    n_cw = int((np.asarray(out_cw.face_id) >= 0).sum())
    n_ccw = int((np.asarray(out_ccw.face_id) >= 0).sum())
    assert (n_cw > 0) != (n_ccw > 0), "exactly one orientation should survive culling"


def test_interpolate_attributes_linear_exact():
    """Barycentric interpolation of a linear function reproduces the plane."""
    verts = np.array([[-0.9, -0.9, 1.0], [0.9, -0.9, 1.0], [-0.9, 0.9, 1.0]], np.float32)
    faces = np.array([[0, 1, 2]], np.int32)
    H = 32
    # attribute = x + 2y evaluated at vertices
    attr_v = (verts[:, 0] + 2 * verts[:, 1])[:, None].astype(np.float32)
    attrs = face_vertices(jnp.asarray(attr_v), jnp.asarray(faces))
    out = rasterize(jnp.asarray(verts), jnp.asarray(faces), height=H, width=H,
                    tile=16, faces_per_tile=16, chunk=8, cull_backfaces=False)
    img = np.asarray(interpolate_attributes(out, attrs))
    hit = img[..., 1] > 0
    # expected: x + 2y at pixel centers
    ii, jj = np.mgrid[0:H, 0:H]
    x = (jj + 0.5) / H * 2 - 1
    y = (ii + 0.5) / H * 2 - 1
    expected = x + 2 * y
    np.testing.assert_allclose(img[..., 0][hit], expected[hit], atol=1e-5)


def test_zbuffer_ordering():
    # two stacked quads; nearer (smaller z) must win
    def quad(cx, z):
        v = np.array(
            [[cx - 0.5, -0.5, z], [cx + 0.5, -0.5, z], [cx + 0.5, 0.5, z], [cx - 0.5, 0.5, z]],
            np.float32,
        )
        f = np.array([[0, 1, 2], [0, 2, 3]], np.int32)
        return v, f

    v1, f1 = quad(0.0, 1.0)
    v2, f2 = quad(0.0, 0.5)
    verts = np.concatenate([v1, v2])
    faces = np.concatenate([f1, f2 + 4])
    out = rasterize(jnp.asarray(verts), jnp.asarray(faces), height=32, width=32,
                    tile=16, faces_per_tile=16, chunk=8, cull_backfaces=False)
    fid = np.asarray(out.face_id)
    hits = fid >= 0
    assert hits.any()
    assert (fid[hits] >= 2).all(), "nearer quad (faces 2,3) must win everywhere"


def test_anchor_binning_matches_sort_binning():
    """binning='anchor' (one 4F-key sort + overflow list) ≡ binning='sort'.

    Random meshes mix tiny faces (span ≤2 tiles — the anchor class) with a few
    image-spanning ones (the big_cap overflow class); both capacity classes
    must reproduce the per-tile membership raster exactly."""
    rng = np.random.RandomState(1)
    V, H = 60, 64
    verts = np.stack(
        [
            rng.uniform(-1, 1, V),
            rng.uniform(-1, 1, V),
            rng.uniform(0.5, 2.0, V),
        ],
        axis=-1,
    ).astype(np.float32)
    # tiny faces: clusters of 3 nearby vertices
    centers = rng.uniform(-0.9, 0.9, (50, 2))
    sv = np.concatenate(
        [centers[:, None, :] + rng.uniform(-0.05, 0.05, (50, 3, 2)),
         rng.uniform(0.5, 2.0, (50, 3, 1))], axis=-1
    ).astype(np.float32).reshape(-1, 3)
    all_verts = np.concatenate([verts, sv])
    big_faces = rng.randint(0, V, (12, 3)).astype(np.int32)  # span many tiles
    small_faces = (V + np.arange(150).reshape(50, 3)).astype(np.int32)
    faces = np.concatenate([big_faces, small_faces])

    for cull in (False, True):
        a = rasterize(jnp.asarray(all_verts), jnp.asarray(faces), height=H, width=H,
                      tile=16, faces_per_tile=64, chunk=16, cull_backfaces=cull,
                      binning="sort")
        b = rasterize(jnp.asarray(all_verts), jnp.asarray(faces), height=H, width=H,
                      tile=16, faces_per_tile=64, chunk=16, cull_backfaces=cull,
                      binning="anchor", big_cap=16)
        np.testing.assert_array_equal(np.asarray(a.face_id), np.asarray(b.face_id))
        np.testing.assert_allclose(np.asarray(a.zbuf), np.asarray(b.zbuf), atol=0)
        np.testing.assert_allclose(np.asarray(a.bary), np.asarray(b.bary), atol=0)


def test_exact_cover_matches_bbox_binning():
    """exact_cover=True (separating-edge candidate pruning) is output-equal to
    plain anchor binning: pruned candidates are faces whose triangle cannot
    touch the tile square, so no pixel-center hit is lost. Thin diagonal
    slivers exercise the pruning (their bbox covers tiles the triangle
    misses)."""
    rng = np.random.RandomState(7)
    H = 64
    # thin diagonal slivers + regular tiny faces
    base = rng.uniform(-0.9, 0.9, (60, 2))
    d = rng.uniform(-1, 1, (60, 2))
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    perp = np.stack([-d[:, 1], d[:, 0]], 1)
    p0 = base
    p1 = base + d * rng.uniform(0.2, 0.5, (60, 1))  # long axis: spans tiles
    p2 = base + perp * rng.uniform(0.002, 0.02, (60, 1))  # very thin
    sv = np.stack([p0, p1, p2], axis=1)  # [60, 3, 2]
    z = rng.uniform(0.5, 2.0, (60, 3, 1))
    verts = np.concatenate([sv, z], axis=-1).astype(np.float32).reshape(-1, 3)
    faces = np.arange(180).reshape(60, 3).astype(np.int32)

    for cull in (False, True):
        a = rasterize(jnp.asarray(verts), jnp.asarray(faces), height=H, width=H,
                      tile=16, faces_per_tile=64, chunk=16, cull_backfaces=cull,
                      binning="anchor", big_cap=64)
        b = rasterize(jnp.asarray(verts), jnp.asarray(faces), height=H, width=H,
                      tile=16, faces_per_tile=64, chunk=16, cull_backfaces=cull,
                      binning="anchor", big_cap=64, exact_cover=True)
        np.testing.assert_array_equal(np.asarray(a.face_id), np.asarray(b.face_id))
        np.testing.assert_allclose(np.asarray(a.zbuf), np.asarray(b.zbuf), atol=0)
        np.testing.assert_allclose(np.asarray(a.bary), np.asarray(b.bary), atol=0)
