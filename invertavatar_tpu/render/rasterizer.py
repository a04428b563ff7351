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


@partial(jax.jit, static_argnames=("height", "width", "tile", "faces_per_tile", "chunk", "cull_backfaces", "map_batch"))
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
        # stable compaction via prefix-sum + scatter: member k of the tile
        # lands in slot k (ascending face order, like the sort it replaces —
        # but a [T, F] scatter is ~wall-clock-free next to T sorts of F keys
        # on TPU, which dominated the whole raster at F≈40k).
        pos = jnp.cumsum(m.astype(jnp.int32)) - 1
        slot = jnp.where(m & (pos < faces_per_tile), pos, faces_per_tile)
        out = jnp.full((faces_per_tile + 1,), -1, jnp.int32)
        out = out.at[slot].max(jnp.arange(F, dtype=jnp.int32), mode="drop")
        return out[:faces_per_tile]

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

        n_chunks = faces_per_tile // chunk
        face_chunks = face_list.reshape(n_chunks, chunk)

        init = (
            jnp.full((pix_in_tile,), jnp.inf, jnp.float32),  # z
            jnp.full((pix_in_tile,), -1, jnp.int32),  # face id
            jnp.zeros((pix_in_tile, 3), jnp.float32),  # bary
        )

        def body(carry, fidx):
            zbuf, fbuf, bbuf = carry
            safe = jnp.maximum(fidx, 0)
            t = tri[safe]  # [chunk, 3, 3]
            ok = fidx >= 0
            ax, ay, az = t[:, 0, 0], t[:, 0, 1], t[:, 0, 2]
            bx, by, bz = t[:, 1, 0], t[:, 1, 1], t[:, 1, 2]
            cx, cy, cz = t[:, 2, 0], t[:, 2, 1], t[:, 2, 2]
            det = (bx - ax) * (cy - ay) - (cx - ax) * (by - ay)  # [chunk]
            inv_det = jnp.where(jnp.abs(det) > 1e-12, 1.0 / det, 0.0)

            dx = pxs[:, None] - ax[None, :]  # [P, chunk]
            dy = pys[:, None] - ay[None, :]
            w1 = (dx * (cy - ay)[None] - dy * (cx - ax)[None]) * inv_det[None]
            w2 = (dy * (bx - ax)[None] - dx * (by - ay)[None]) * inv_det[None]
            w0 = 1.0 - w1 - w2
            inside = (w0 >= 0) & (w1 >= 0) & (w2 >= 0) & ok[None, :]
            z = w0 * az[None] + w1 * bz[None] + w2 * cz[None]
            z = jnp.where(inside, z, jnp.inf)

            best = jnp.argmin(z, axis=1)  # [P]
            best_z = jnp.take_along_axis(z, best[:, None], axis=1)[:, 0]
            improve = best_z < zbuf
            new_z = jnp.where(improve, best_z, zbuf)
            new_f = jnp.where(improve, fidx[best], fbuf)
            b_sel = jnp.stack(
                [
                    jnp.take_along_axis(w0, best[:, None], axis=1)[:, 0],
                    jnp.take_along_axis(w1, best[:, None], axis=1)[:, 0],
                    jnp.take_along_axis(w2, best[:, None], axis=1)[:, 0],
                ],
                axis=-1,
            )
            new_b = jnp.where(improve[:, None], b_sel, bbuf)
            return (new_z, new_f, new_b), None

        (zbuf, fbuf, bbuf), _ = jax.lax.scan(body, init, face_chunks)
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
