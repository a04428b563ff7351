"""TPU-native triangle rasterizer (orthographic, z-buffered, barycentric).

Replaces pytorch3d's `rasterize_meshes` in the online reenactment path
(reference `data_preprocess/FaceVerse/renderer.py:68-71` →
`render_after_rasterize`, volumetric_rendering/renderer.py:556-571): the
FaceVerse head mesh (~30k tris) is rasterized orthographically to produce the
`uvcoords_image` driving signal — per-pixel interpolated UV + face mask.

Design (XLA-first; SURVEY.md §7 hard part 2):
  * Static-shape tile binning: the image is cut into TILE×TILE tiles; each
    face's screen bbox selects candidate tiles; per tile a fixed-capacity list
    of face indices is compacted with a cumsum-based scatter (no dynamic
    shapes anywhere).
  * Per tile, faces stream through a `lax.scan` in chunks, maintaining a
    running (z, face, barycentrics) winner per pixel — the z-buffer — so peak
    memory is tile_pixels × chunk, independent of the face count.
  * Conventions match the reference chain after its double sign-flip:
    pixel (i, j) center sits at x = (2(j+.5)/W − 1), y = (2(i+.5)/H − 1)
    (x right, y down), smaller z wins, and back faces (counter-clockwise in
    this screen space) are culled like pytorch3d's `cull_backfaces=True`.

Everything is jit-compatible; a Pallas variant can later fuse the edge tests
with the attribute interpolation.
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np


class RasterOut(NamedTuple):
    face_id: jnp.ndarray  # [H, W] int32, -1 = no hit
    bary: jnp.ndarray  # [H, W, 3] float32
    zbuf: jnp.ndarray  # [H, W] float32 (+inf = no hit)


def _face_screen_xy(verts_xy: jnp.ndarray, faces: jnp.ndarray) -> jnp.ndarray:
    """[V, 2], [F, 3] -> [F, 3, 2] per-face vertex xy."""
    return verts_xy[faces]


@partial(jax.jit, static_argnames=("height", "width", "tile", "faces_per_tile", "chunk", "cull_backfaces", "map_batch", "binning", "big_cap", "exact_cover"))
def rasterize(
    verts: jnp.ndarray,  # [V, 3] screen-space (x, y in the window, z for depth)
    faces: jnp.ndarray,  # [F, 3] int32
    height: int = 256,
    width: int = 256,
    window: Tuple[float, float, float, float] = (-1.0, 1.0, -1.0, 1.0),  # x0, x1, y0, y1
    tile: int = 32,
    faces_per_tile: int = 1024,
    chunk: int = 256,
    cull_backfaces: bool = True,
    map_batch: Optional[int] = None,  # None = all tiles in one vmap; int = lax.map batch
    binning: str = "sort",  # "sort" = per-tile batched sort; "anchor" = one 4F-key sort
    big_cap: int = 128,  # "anchor" only: capacity for faces spanning >2 tiles per axis
    exact_cover: bool = False,  # "anchor" only: drop bbox-only candidates by a
    # separating-edge tri/square test — output-equal (the z-loop's inside test
    # already makes candidate lists superset-exact); shrinks tile occupancy so
    # a smaller faces_per_tile cap is safe (docs/raster_profile.json r4)
) -> RasterOut:
    """Rasterize one mesh over a rectangular NDC window."""
    x0, x1, y0, y1 = window
    V = verts.shape[0]
    F = faces.shape[0]
    th, tw = height // tile, width // tile
    n_tiles = th * tw

    # vertex -> continuous pixel coords (pixel centers at integer + 0.5)
    px = (verts[:, 0] - x0) / (x1 - x0) * width
    py = (verts[:, 1] - y0) / (y1 - y0) * height
    pz = verts[:, 2]
    pverts = jnp.stack([px, py, pz], axis=-1)

    tri = pverts[faces]  # [F, 3, 3]
    tx, ty = tri[..., 0], tri[..., 1]

    # signed area ×2 in pixel space (y down): positive = clockwise on screen,
    # which corresponds to pytorch3d's front-facing after its flips.
    area2 = (tx[:, 1] - tx[:, 0]) * (ty[:, 2] - ty[:, 0]) - (
        tx[:, 2] - tx[:, 0]
    ) * (ty[:, 1] - ty[:, 0])
    if cull_backfaces:
        valid_face = area2 > 1e-12
    else:
        valid_face = jnp.abs(area2) > 1e-12

    # face bbox -> covered tile span
    fx0 = jnp.clip(jnp.floor(jnp.min(tx, axis=1) / tile), 0, tw - 1).astype(jnp.int32)
    fx1 = jnp.clip(jnp.floor(jnp.max(tx, axis=1) / tile), 0, tw - 1).astype(jnp.int32)
    fy0 = jnp.clip(jnp.floor(jnp.min(ty, axis=1) / tile), 0, th - 1).astype(jnp.int32)
    fy1 = jnp.clip(jnp.floor(jnp.max(ty, axis=1) / tile), 0, th - 1).astype(jnp.int32)
    off_screen = (
        (jnp.max(tx, axis=1) < 0)
        | (jnp.min(tx, axis=1) >= width)
        | (jnp.max(ty, axis=1) < 0)
        | (jnp.min(ty, axis=1) >= height)
    )
    valid_face = valid_face & ~off_screen

    # --- static-shape binning -------------------------------------------------
    # membership[t, f] would be F×T bools (30k × 64 = 2M — fine); compact each
    # tile's face list to `faces_per_tile` slots via argwhere-with-size.
    tile_ids = jnp.arange(n_tiles, dtype=jnp.int32)
    t_y = tile_ids // tw
    t_x = tile_ids % tw

    def tile_members(ty_i, tx_i):
        m = (fy0 <= ty_i) & (fy1 >= ty_i) & (fx0 <= tx_i) & (fx1 >= tx_i) & valid_face
        # stable compaction: indices of member faces, -1 padded. The sort IS
        # the cheap option here — measured on v5e at F=59k/T=64 (docs/
        # raster_profile.json): batched sort 4.5 ms vs cumsum+scatter 34.7 ms
        # (TPU scatters serialize; sorts vectorize across the tile batch).
        idx = jnp.where(m, jnp.arange(F, dtype=jnp.int32), F)
        idx = jnp.sort(idx)
        if F >= faces_per_tile:
            idx = idx[:faces_per_tile]
        else:
            idx = jnp.pad(idx, (0, faces_per_tile - F), constant_values=F)
        return jnp.where(idx == F, -1, idx)

    def anchor_binning():
        # The per-tile batched sort above sorts T×F keys (64×59k = 3.8M at the
        # FaceVerse driving config — 4.3 of the raster's 7 ms). Head-mesh faces
        # are a few pixels wide, so ~all of them span ≤2 tiles per axis: emit
        # exactly one entry per (face × covered tile) for that class — ≤4F
        # keys, ONE sort — and route the rare wide-span faces (silhouette/neck
        # slivers) through a `big_cap` overflow list appended to every tile
        # (the z-loop's inside test makes superset candidate lists exact).
        sy = fy1 - fy0 + 1
        sx = fx1 - fx0 + 1
        small = valid_face & (sy <= 2) & (sx <= 2)
        f_idx = jnp.arange(F, dtype=jnp.int32)
        E = 4 * F
        SENT = jnp.int32(2**31 - 1)

        def overlaps_square(qx0, qy0):
            """Exact tri/axis-aligned-square overlap via the 3 edge separating
            axes ([F] square origins in pixel coords; the 2 axis-aligned
            separating axes are already covered by the bbox candidate test).
            Conservative on degenerate edges (zero edge ⇒ no separation)."""
            cxs = jnp.stack([qx0, qx0 + tile, qx0, qx0 + tile], 1)  # [F, 4]
            cys = jnp.stack([qy0, qy0, qy0 + tile, qy0 + tile], 1)
            sep = jnp.zeros(F, bool)
            for e in range(3):
                px_, py_ = tx[:, e], ty[:, e]
                ex = tx[:, (e + 1) % 3] - px_
                ey = ty[:, (e + 1) % 3] - py_
                s3 = (tx[:, (e + 2) % 3] - px_) * ey - (ty[:, (e + 2) % 3] - py_) * ex
                ec = (cxs - px_[:, None]) * ey[:, None] - (cys - py_[:, None]) * ex[:, None]
                sep |= jnp.all(ec * s3[:, None] < 0, axis=1)
            return ~sep

        keys = []
        for dy in (0, 1):
            for dx in (0, 1):
                covered = small & (dy < sy) & (dx < sx)
                if exact_cover:
                    covered &= overlaps_square(
                        ((fx0 + dx) * tile).astype(jnp.float32),
                        ((fy0 + dy) * tile).astype(jnp.float32),
                    )
                t_id = (fy0 + dy) * tw + (fx0 + dx)
                c = 2 * dy + dx
                # key = tile·4F + (4f + c): sorts by tile, then face index —
                # the same within-tile stable-by-face order as tile_members
                keys.append(jnp.where(covered, t_id * E + 4 * f_idx + c, SENT))
        keys = jnp.sort(jnp.concatenate(keys))  # [4F], one sort
        keys = jnp.pad(keys, (0, faces_per_tile), constant_values=SENT)
        seg_start = jnp.searchsorted(keys, jnp.arange(n_tiles, dtype=jnp.int32) * E)

        cap_a = max(faces_per_tile - big_cap, 0)

        def tile_list(t_id, start):
            seg = jax.lax.dynamic_slice(keys, (start,), (cap_a,))
            ok = seg < (t_id + 1) * E  # entries past this tile's segment masked
            return jnp.where(ok, (seg - t_id * E) // 4, -1)

        lists_a = jax.vmap(tile_list)(tile_ids, seg_start.astype(jnp.int32))

        # wide-span overflow faces, compacted by one F-length sort
        big = valid_face & ~small
        big_idx = jnp.sort(jnp.where(big, f_idx, F))[:big_cap]
        if F < big_cap:  # meshes smaller than the overflow capacity
            big_idx = jnp.pad(big_idx, (0, big_cap - F), constant_values=F)
        big_idx = jnp.where(big_idx == F, -1, big_idx)
        return jnp.concatenate(
            [lists_a, jnp.broadcast_to(big_idx, (n_tiles, big_cap))], axis=1
        )

    if binning == "anchor":
        tile_faces = anchor_binning()  # [T, faces_per_tile]
    else:
        tile_faces = jax.vmap(tile_members)(t_y, t_x)  # [T, faces_per_tile]

    # --- per-tile z-buffered rasterization -----------------------------------
    pix_in_tile = tile * tile
    yy, xx = jnp.meshgrid(
        jnp.arange(tile, dtype=jnp.float32) + 0.5,
        jnp.arange(tile, dtype=jnp.float32) + 0.5,
        indexing="ij",
    )

    def raster_tile(tile_idx, face_list):
        base_y = (tile_idx // tw) * tile
        base_x = (tile_idx % tw) * tile
        pxs = (xx + base_x).reshape(-1)  # [P]
        pys = (yy + base_y).reshape(-1)

        # One gather of the tile's face data, then affine edge/z coefficients
        # per face — the scan body becomes pure FMA broadcasts + reductions.
        # (The old body's per-chunk argmin + 4× take_along_axis were the cost:
        # XLA TPU lowers per-pixel gathers serially — ~18 ms of the measured
        # 23 ms raster; this formulation removes every gather from the loop.)
        safe = jnp.maximum(face_list, 0)
        t = tri[safe]  # [fpt, 3, 3]
        ok_all = face_list >= 0
        ax, ay, az = t[:, 0, 0], t[:, 0, 1], t[:, 0, 2]
        bx, by, bz = t[:, 1, 0], t[:, 1, 1], t[:, 1, 2]
        cx, cy, cz = t[:, 2, 0], t[:, 2, 1], t[:, 2, 2]
        det = (bx - ax) * (cy - ay) - (cx - ax) * (by - ay)  # [fpt]
        inv_det = jnp.where(jnp.abs(det) > 1e-12, 1.0 / det, 0.0)
        # w1 = [(px−ax)(cy−ay) − (py−ay)(cx−ax)]·inv_det = px·A1 + py·B1 + C1
        A1 = (cy - ay) * inv_det
        B1 = -(cx - ax) * inv_det
        C1 = -(ax * A1 + ay * B1)
        # w2 = [(py−ay)(bx−ax) − (px−ax)(by−ay)]·inv_det = px·A2 + py·B2 + C2
        A2 = -(by - ay) * inv_det
        B2 = (bx - ax) * inv_det
        C2 = -(ax * A2 + ay * B2)
        # z = az + w1(bz−az) + w2(cz−az), also affine in (px, py)
        e1, e2 = bz - az, cz - az
        Az = A1 * e1 + A2 * e2
        Bz = B1 * e1 + B2 * e2
        Cz = az + C1 * e1 + C2 * e2

        n_chunks = faces_per_tile // chunk
        csh = (n_chunks, chunk)
        coeffs = (
            A1.reshape(csh), B1.reshape(csh), C1.reshape(csh),
            A2.reshape(csh), B2.reshape(csh), C2.reshape(csh),
            Az.reshape(csh), Bz.reshape(csh), Cz.reshape(csh),
            ok_all.reshape(csh), face_list.reshape(csh),
        )

        init = (
            jnp.full((pix_in_tile,), jnp.inf, jnp.float32),  # z
            jnp.full((pix_in_tile,), -1, jnp.int32),  # face id
            jnp.zeros((pix_in_tile, 3), jnp.float32),  # bary
        )
        pos = jnp.arange(chunk, dtype=jnp.int32)

        def body(carry, cs):
            zbuf, fbuf, bbuf = carry
            a1, b1, c1, a2, b2, c2, azc, bzc, czc, ok, fidx = cs
            w1 = pxs[:, None] * a1[None] + pys[:, None] * b1[None] + c1[None]
            w2 = pxs[:, None] * a2[None] + pys[:, None] * b2[None] + c2[None]
            w0 = 1.0 - w1 - w2
            z = pxs[:, None] * azc[None] + pys[:, None] * bzc[None] + czc[None]
            inside = (w0 >= 0) & (w1 >= 0) & (w2 >= 0) & ok[None, :]
            z = jnp.where(inside, z, jnp.inf)

            zmin = jnp.min(z, axis=1)  # [P]
            # first face reaching zmin, as a unique one-hot (gather-free)
            cand = jnp.where(z == zmin[:, None], pos[None, :], chunk)
            first = jnp.min(cand, axis=1)  # [P]; == chunk when no hit
            onehot = pos[None, :] == first[:, None]  # [P, chunk]
            w0s = jnp.sum(jnp.where(onehot, w0, 0.0), axis=1)
            w1s = jnp.sum(jnp.where(onehot, w1, 0.0), axis=1)
            w2s = jnp.sum(jnp.where(onehot, w2, 0.0), axis=1)
            fsel = jnp.sum(jnp.where(onehot, fidx[None, :], 0), axis=1)

            improve = zmin < zbuf
            new_z = jnp.where(improve, zmin, zbuf)
            new_f = jnp.where(improve, fsel, fbuf)
            new_b = jnp.where(improve[:, None], jnp.stack([w0s, w1s, w2s], -1), bbuf)
            return (new_z, new_f, new_b), None

        (zbuf, fbuf, bbuf), _ = jax.lax.scan(body, init, coeffs)
        return zbuf, fbuf, bbuf

    # all tiles in one vmapped step by default: peak temp is [T, tile², chunk]
    # f32 per body array (64·1024·256·4B = 64 MB at the driving config) and
    # the work is one parallel VPU pass instead of T/map_batch sequential map
    # segments. `map_batch` bounds the footprint for very large rasters.
    if map_batch is None:
        z_t, f_t, b_t = jax.vmap(raster_tile)(tile_ids, tile_faces)
    else:
        z_t, f_t, b_t = jax.lax.map(
            lambda args: raster_tile(*args), (tile_ids, tile_faces),
            batch_size=map_batch,
        )

    # reassemble tiles -> full image
    def untile(x, extra=()):
        x = x.reshape(th, tw, tile, tile, *extra)
        x = jnp.transpose(x, (0, 2, 1, 3) + tuple(4 + i for i in range(len(extra))))
        return x.reshape(th * tile, tw * tile, *extra)

    return RasterOut(
        face_id=untile(f_t.reshape(n_tiles, tile, tile)),
        bary=untile(b_t.reshape(n_tiles, tile, tile, 3), (3,)),
        zbuf=untile(z_t.reshape(n_tiles, tile, tile)),
    )


def interpolate_attributes(
    out: RasterOut, attributes: jnp.ndarray  # [F, 3, D] per-face vertex attrs
) -> jnp.ndarray:
    """Reference `render_after_rasterize` (renderer.py:556-571): barycentric
    attribute interpolation + visibility mask channel -> [H, W, D+1]."""
    face = jnp.maximum(out.face_id, 0)
    attr = attributes[face]  # [H, W, 3, D]
    vals = jnp.sum(out.bary[..., None] * attr, axis=-2)
    vis = (out.face_id >= 0).astype(jnp.float32)
    vals = vals * vis[..., None]
    return jnp.concatenate([vals, vis[..., None]], axis=-1)


def face_vertices(vertices: jnp.ndarray, faces: jnp.ndarray) -> jnp.ndarray:
    """[V, D], [F, 3] -> [F, 3, D] (reference renderer.py:575-593, batch-free)."""
    return vertices[faces]
